"""ISO-BMFF sampler: box-walk edge cases the oracle entry can't isolate.

The catalog entry (multimodal_mp4_frames) hash-verifies the happy path
end-to-end; these pin the envelope boundaries and the sample-table
arithmetic variants — 64-bit offsets, absent stss, short tail chunks,
fragmented/EBML rejection — against closed-form frame bytes.
"""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.operators.mp4 import (
    encode_mp4,
    sample_mp4_frames,
)
from simple_data_engineering_project_spark.operators.multimodal import (
    sample_video_frames,
)

FRAMES = [bytes([i]) * (10 + i) for i in range(10)]


def test_keyframe_bucket_sampling():
    # delta=500ms, sync every 2nd sample → sync at 0,1000,2000… ms;
    # 1000ms buckets keep every sync sample, 2000ms buckets every other
    p = encode_mp4(FRAMES)
    assert sample_mp4_frames(p, every_ms=1000) == FRAMES[0::2]
    assert sample_mp4_frames(p, every_ms=2000) == FRAMES[0::4]


def test_no_stss_means_all_samples_sync():
    p = encode_mp4(FRAMES, sync_every=0)
    assert sample_mp4_frames(p, every_ms=500) == FRAMES
    assert sample_mp4_frames(p, every_ms=1000) == FRAMES[0::2]


def test_co64_and_largesize_mdat():
    p = encode_mp4(FRAMES, use_co64=True)
    assert sample_mp4_frames(p, every_ms=1000) == FRAMES[0::2]


def test_short_tail_chunk_offsets():
    # 10 samples at 4/chunk → chunks of 4,4,2: the tail chunk needs its
    # own stsc run; per-sample offsets accumulate within each chunk
    p = encode_mp4(FRAMES, sync_every=0, samples_per_chunk=4)
    assert sample_mp4_frames(p, every_ms=500) == FRAMES
    p1 = encode_mp4(FRAMES, sync_every=0, samples_per_chunk=1)
    assert sample_mp4_frames(p1, every_ms=500) == FRAMES


def test_variable_sample_sizes_slice_exact_bytes():
    frames = [b"a" * 3, b"bb" * 5, b"c", b"dddd" * 9, b"e" * 2]
    p = encode_mp4(frames, sync_every=0, samples_per_chunk=2)
    assert sample_mp4_frames(p, every_ms=500) == frames


def test_dispatch_from_generic_sampler():
    # sample_video_frames routes ftyp payloads to the MP4 walk
    p = encode_mp4(FRAMES)
    assert sample_video_frames(p, every_ms=1000) == FRAMES[0::2]


def test_fragmented_cmaf_layout():
    from simple_data_engineering_project_spark.operators.mp4 import (
        encode_mp4_fragmented,
    )

    # the CMAF/DASH layout: init moov (empty stbl, trex defaults) +
    # moof/mdat pairs; durations inherit from trex, sizes/flags ride the
    # trun, data offsets are moof-relative, sync = the non-sync flag bit
    p = encode_mp4_fragmented(FRAMES)
    assert sample_mp4_frames(p, every_ms=1000) == FRAMES[0::2]
    assert sample_mp4_frames(p, every_ms=2000) == FRAMES[0::4]
    assert sample_mp4_frames(
        encode_mp4_fragmented(FRAMES, sync_every=0), every_ms=500
    ) == FRAMES
    # odd fragment sizes exercise tfdt base-time accumulation
    assert sample_mp4_frames(
        encode_mp4_fragmented(FRAMES, frames_per_fragment=3), every_ms=1000
    ) == FRAMES[0::2]
    assert sample_video_frames(p, every_ms=1000) == FRAMES[0::2]


def test_ebml_rejected_by_mp4_walker():
    with pytest.raises(NotImplementedError):
        sample_mp4_frames(b"\x1a\x45\xdf\xa3" + b"\x00" * 32)  # EBML/MKV
    # the generic dispatch now routes EBML magic to the REAL MKV walker,
    # so a garbage body is a corrupt container (ValueError)
    with pytest.raises(ValueError):
        sample_video_frames(b"\x1a\x45\xdf\xa3" + b"\x00" * 32)
