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
    with pytest.raises(NotImplementedError):
        sample_mkv_frames(b"RIFF1234WEBP not ebml")


@pytest.mark.parametrize("mode", ["xiph", "fixed", "ebml"])
def test_laced_blocks_decode(mode):
    # one laced block per 3-frame cluster at the cluster timestamp;
    # every cluster-leading frame is a keyframe (sync_every=0 ⇒ all),
    # laced frames share the block's time so the 1 ms bucket keeps the
    # FIRST frame of each laced block
    frames = (
        [bytes([65 + i]) * 16 for i in range(6)]  # fixed: equal sizes
        if mode == "fixed"
        else [b"A" * 7, b"B" * 300, b"C" * 2, b"D" * 300, b"E" * 40, b"F"]
    )
    p = encode_mkv(
        frames, sync_every=0, frames_per_cluster=3, lacing=mode
    )
    assert sample_mkv_frames(p, every_ms=1) == [frames[0], frames[3]]
    # a huge bucket keeps only the very first laced frame
    assert sample_mkv_frames(p, every_ms=10**9) == [frames[0]]


@pytest.mark.parametrize("lacing", [None, "xiph"])
def test_block_groups_decode(lacing):
    # keyframe-ness inside BlockGroup = ReferenceBlock ABSENCE; with
    # sync_every=2 odd frames carry a ReferenceBlock and are skipped
    p = encode_mkv(
        FRAMES,
        sync_every=0 if lacing else 2,
        frames_per_cluster=2,
        block_groups=True,
        lacing=lacing,
    )
    if lacing:
        # laced groups: first frame of each 2-frame cluster survives
        assert sample_mkv_frames(p, every_ms=1) == FRAMES[0::2]
    else:
        assert sample_mkv_frames(p, every_ms=1) == FRAMES[0::2]


def test_fixed_lacing_rejects_ragged_frames():
    with pytest.raises(ValueError, match="equal frame sizes"):
        encode_mkv([b"ab", b"c"], lacing="fixed", frames_per_cluster=2)


@pytest.mark.parametrize("mode", ["xiph", "fixed", "ebml"])
def test_single_frame_laced_cluster(mode):
    # count-1 coded sizes means a 1-frame laced block codes ZERO sizes
    # (regression: the EBML encoder wrote a spurious first-size VINT
    # that decoded into the frame bytes)
    p = encode_mkv(
        [b"x" * 54], sync_every=0, frames_per_cluster=2, lacing=mode
    )
    assert sample_mkv_frames(p, every_ms=1) == [b"x" * 54]
    # odd frame count: last cluster is a single laced frame
    frames = [b"A" * 10, b"B" * 10, b"C" * 54]
    p2 = encode_mkv(frames, sync_every=0, frames_per_cluster=2, lacing=mode)
    assert sample_mkv_frames(p2, every_ms=1) == [b"A" * 10, b"C" * 54]


def test_truncated_block_raises_cleanly():
    # a SimpleBlock body ending right after the track VINT must raise
    # the module's ValueError, not IndexError
    p = bytearray(encode_mkv([b"frame-bytes"], sync_every=0))
    i = p.index(b"\xa3", p.index(b"\x1f\x43\xb6\x75"))
    # shrink the SimpleBlock's declared size to 1 (track VINT only)
    assert p[i + 1] & 0x80  # 1-byte size VINT
    p[i + 1] = 0x81
    with pytest.raises(ValueError, match="truncated before timestamp"):
        sample_mkv_frames(bytes(p))


def test_fixture_guard_rejects_misaligned_sync_every(spark):
    import pytest as _pytest

    from simple_data_engineering_project_spark.operators.multimodal import (
        media_mkv_from_documents,
    )

    docs = spark.createDataFrame([(1, "x" * 200)], "doc_id long, text string")
    with _pytest.raises(ValueError, match="sync_every"):
        media_mkv_from_documents(docs, sync_every=3)
