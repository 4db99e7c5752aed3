"""Matroska sampler: EBML-walk edge cases beyond the oracle entry."""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.operators.mkv import (
    encode_mkv,
    sample_mkv_frames,
)
from simple_data_engineering_project_spark.operators.multimodal import (
    sample_video_frames,
)

FRAMES = [bytes([i]) * (10 + i) for i in range(10)]


def test_keyframe_bucket_sampling():
    p = encode_mkv(FRAMES)  # 500ms frames, keyframe every 2nd
    assert sample_mkv_frames(p, every_ms=1000) == FRAMES[0::2]
    assert sample_mkv_frames(p, every_ms=2000) == FRAMES[0::4]


def test_all_keyframes_and_cluster_relative_timestamps():
    # sync_every=0 → every frame a keyframe; 3-frame clusters make the
    # SimpleBlock relative timestamps nonzero within each cluster
    p = encode_mkv(FRAMES, sync_every=0, frames_per_cluster=3)
    assert sample_mkv_frames(p, every_ms=500) == FRAMES


def test_nondefault_timestamp_scale():
    # 2 ms ticks at half the tick count → identical absolute times
    p = encode_mkv(FRAMES, timestamp_scale=2_000_000, delta_ms=250)
    assert sample_mkv_frames(p, every_ms=1000) == FRAMES[0::2]


def test_dispatch_and_envelope():
    p = encode_mkv(FRAMES)
    assert sample_video_frames(p, every_ms=1000) == FRAMES[0::2]
    # laced SimpleBlock raises: set a lacing flag bit on the first block
    raw = bytearray(p)
    # first SimpleBlock id AFTER the Cluster id (0xA3 also occurs as the
    # last byte of the EBML magic)
    i = raw.index(b"\xa3", raw.index(b"\x1f\x43\xb6\x75"))
    # id(1) + size VINT(len<127 → 1 byte) + track VINT(1) + rel(2) → flags
    raw[i + 2 + 1 + 2] |= 0x02
    with pytest.raises(NotImplementedError, match="laced"):
        sample_mkv_frames(bytes(raw))
    with pytest.raises(NotImplementedError):
        sample_mkv_frames(b"RIFF1234WEBP not ebml")
