"""Matroska/WebM (EBML) keyframe sampling in pure stdlib (SURVEY §2 C5).

Like RIFF/AVI and ISO-BMFF, slicing frames out of an MKV needs NO codec
— it is a pure EBML element walk: variable-length-integer IDs and sizes
(the VINT leading-zero scheme), ``Segment → Info.TimestampScale`` for
the clock, ``Tracks → TrackEntry`` to find the video track number
(TrackType 1), then ``Cluster → Timestamp`` plus ``SimpleBlock``
elements whose 4-byte prefix (track VINT, 2-byte signed relative
timestamp, flags with the 0x80 keyframe bit) fronts the raw frame
bytes. Keyframe sampling keeps the first keyframe per ``every_ms``
bucket of absolute time — the same bucket rule as the MP4 path.

Out of envelope (honest ``NotImplementedError``): laced SimpleBlocks
(Xiph/EBML/fixed lacing packs several frames per block — rare for
video, which is overwhelmingly unlaced) and BlockGroup-coded streams
(used when reference frames must be signalled; keyframe-only sampling
reads SimpleBlocks). The companion :func:`encode_mkv` synthesizes real
containers with caller-chosen frame bytes so an oracle can predict
sampled-frame hashes without a parser. (∅ in reference; Tier C
extension; mirrors operators/mp4.py.)
"""

from __future__ import annotations

# EBML element IDs (with marker bits, as they appear on the wire)
_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0


def _read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``pos`` → (value, next_pos).
    IDs keep the length-marker bit; sizes strip it."""
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid VINT")
    width = 9 - first.bit_length()  # leading zeros + 1
    v = first if keep_marker else first & ((1 << (8 - width)) - 1)
    for i in range(1, width):
        v = (v << 8) | buf[pos + i]
    return v, pos + width


def _walk(buf: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for EBML children."""
    pos = start
    while pos < end:
        eid, pos = _read_vint(buf, pos, keep_marker=True)
        size, pos = _read_vint(buf, pos, keep_marker=False)
        yield eid, pos, pos + size
        pos += size


def _uint(buf: bytes, start: int, end: int) -> int:
    v = 0
    for i in range(start, end):
        v = (v << 8) | buf[i]
    return v


def sample_mkv_frames(payload: bytes, every_ms: int = 1000) -> list[bytes]:
    """Keyframe-sample a Matroska/WebM payload: EBML walk to the video
    track's SimpleBlocks, absolute time = cluster timestamp + block
    relative timestamp (scaled by TimestampScale), keep the first
    keyframe per ``every_ms`` bucket."""
    if payload is None or len(payload) < 8 or payload[:4] != b"\x1a\x45\xdf\xa3":
        raise NotImplementedError("not an EBML/Matroska payload")
    n = len(payload)
    segment = None
    for eid, b, e in _walk(payload, 0, n):
        if eid == _SEGMENT:
            segment = (b, e)
    if segment is None:
        raise ValueError("MKV missing Segment")

    ts_scale = 1_000_000  # ns per tick (Matroska default: 1 ms ticks)
    video_track = None
    blocks: list[tuple[int, int, bool, bytes]] = []  # (track, ticks, key, data)
    for eid, b, e in _walk(payload, *segment):
        if eid == _INFO:
            for eid2, b2, e2 in _walk(payload, b, e):
                if eid2 == _TIMESTAMP_SCALE:
                    ts_scale = _uint(payload, b2, e2)
        elif eid == _TRACKS:
            for eid2, b2, e2 in _walk(payload, b, e):
                if eid2 != _TRACK_ENTRY:
                    continue
                num = ttype = None
                for eid3, b3, e3 in _walk(payload, b2, e2):
                    if eid3 == _TRACK_NUMBER:
                        num = _uint(payload, b3, e3)
                    elif eid3 == _TRACK_TYPE:
                        ttype = _uint(payload, b3, e3)
                if ttype == 1 and video_track is None:  # video
                    video_track = num
        elif eid == _CLUSTER:
            cluster_ts = 0
            for eid2, b2, e2 in _walk(payload, b, e):
                if eid2 == _CLUSTER_TS:
                    cluster_ts = _uint(payload, b2, e2)
                elif eid2 == _SIMPLE_BLOCK:
                    track, p = _read_vint(payload, b2, keep_marker=False)
                    rel = int.from_bytes(
                        payload[p : p + 2], "big", signed=True
                    )
                    flags = payload[p + 2]
                    if flags & 0x06:
                        raise NotImplementedError(
                            "laced SimpleBlock (Xiph/EBML/fixed lacing)"
                        )
                    # collect with the TRACK NUMBER and filter after the
                    # walk: Segment element order is not mandated, so a
                    # legal file may put Clusters before Tracks — a
                    # during-walk video_track check would drop them all
                    blocks.append(
                        (track, cluster_ts + rel, bool(flags & 0x80),
                         payload[p + 3 : e2])
                    )
                elif eid2 == _BLOCK_GROUP:
                    raise NotImplementedError(
                        "BlockGroup-coded stream (reference-frame "
                        "signalling) — keyframe sampling reads SimpleBlocks"
                    )
    if video_track is None:
        raise ValueError("MKV has no video track")

    kept, seen = [], set()
    for track, ticks, key, data in blocks:
        if track != video_track or not key:
            continue
        t_ms = ticks * ts_scale // 1_000_000
        bucket = t_ms // every_ms
        if bucket not in seen:
            seen.add(bucket)
            kept.append(data)
    return kept


# --------------------------------------------------------------- encoder


def _enc_vint_size(v: int) -> bytes:
    """Encode a size VINT (marker bit in the leading byte)."""
    for width in range(1, 9):
        if v < (1 << (7 * width)) - 1:
            out = v | (1 << (7 * width))
            return out.to_bytes(width, "big")
    raise ValueError("size too large")


def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_vint_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_mkv(
    frames: list[bytes],
    delta_ms: int = 500,
    sync_every: int = 2,
    frames_per_cluster: int = 4,
    timestamp_scale: int = 1_000_000,
) -> bytes:
    """Minimal Matroska writer: EBML header + Segment(Info, Tracks with
    one video track, Clusters of ``frames_per_cluster`` SimpleBlocks).
    Frame i sits at t = i·delta_ms with the keyframe flag on every
    ``sync_every``-th frame (0 = all keyframes); block timestamps are
    cluster-relative, exercising the two-level clock."""
    ebml = _el(
        _EBML_HEADER,
        _el_uint(0x4286, 1)  # EBMLVersion
        + _el_uint(0x42F7, 1)  # EBMLReadVersion
        + _el(0x4282, b"matroska")  # DocType
        + _el_uint(0x4287, 4)  # DocTypeVersion
        + _el_uint(0x4285, 2),  # DocTypeReadVersion
    )
    info = _el(_INFO, _el_uint(_TIMESTAMP_SCALE, timestamp_scale))
    track = _el(
        _TRACKS,
        _el(
            _TRACK_ENTRY,
            _el_uint(_TRACK_NUMBER, 1)
            + _el_uint(0x73C5, 1)  # TrackUID
            + _el_uint(_TRACK_TYPE, 1)  # video
            + _el(0x86, b"V_UNCOMPRESSED"),  # CodecID
        ),
    )
    clusters = b""
    for c0 in range(0, len(frames), frames_per_cluster):
        chunk = frames[c0 : c0 + frames_per_cluster]
        cluster_ts = c0 * delta_ms
        body = _el_uint(_CLUSTER_TS, cluster_ts)
        for j, data in enumerate(chunk):
            i = c0 + j
            rel = i * delta_ms - cluster_ts
            key = 0x80 if (sync_every == 0 or i % sync_every == 0) else 0
            blk = (
                (0x80 | 1).to_bytes(1, "big")  # track 1 as 1-byte VINT
                + rel.to_bytes(2, "big", signed=True)
                + bytes([key])  # flags: keyframe bit, no lacing
                + data
            )
            body += _el(_SIMPLE_BLOCK, blk)
        clusters += _el(_CLUSTER, body)
    return ebml + _el(_SEGMENT, info + track + clusters)
