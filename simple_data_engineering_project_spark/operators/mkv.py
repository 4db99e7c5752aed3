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

All three LACING modes decode (Xiph 255-run sizes, fixed equal-split,
EBML first-size-plus-signed-VINT-deltas; last frame implicit in each)
— WebM audio tracks lace routinely — and ``BlockGroup``-coded streams
decode too: a Block inside a group has no keyframe flag; keyframe-ness
is the ABSENCE of a ReferenceBlock sibling. Laced frames share their
block's timestamp (the container stores only one per block), so the
bucket rule sees them as one instant. The companion :func:`encode_mkv`
synthesizes real containers — optionally laced and/or BlockGroup-coded
— with caller-chosen frame bytes so an oracle can predict
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
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB


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


def _laced_frames(buf: bytes, pos: int, end: int, flags: int) -> list[bytes]:
    """Frame payloads of a (Simple)Block body after its 3-byte prefix,
    honoring the lacing mode in flag bits 0x06: 0b00 none, 0b01 Xiph
    (sizes as 255-runs), 0b10 fixed (equal split), 0b11 EBML (first
    size a VINT, then signed-VINT deltas). The LAST frame's size is
    implicit in every laced mode."""
    mode = flags & 0x06
    if mode == 0x00:
        return [buf[pos:end]]
    if pos >= end:
        raise ValueError("laced block truncated before frame count")
    count = buf[pos] + 1
    pos += 1
    sizes: list[int] = []
    if mode == 0x02:  # Xiph
        for _ in range(count - 1):
            s = 0
            while True:
                if pos >= end:
                    raise ValueError("Xiph lacing sizes truncated")
                b = buf[pos]
                pos += 1
                s += b
                if b != 255:
                    break
            sizes.append(s)
    elif mode == 0x04:  # fixed
        total = end - pos
        if count == 0 or total % count:
            raise ValueError("fixed lacing payload not evenly divisible")
        sizes = [total // count] * (count - 1)
    else:  # 0x06 EBML
        if count > 1:
            first, pos = _read_vint(buf, pos, keep_marker=False)
            sizes.append(first)
            prev = first
            for _ in range(count - 2):
                raw, npos = _read_vint(buf, pos, keep_marker=False)
                width = npos - pos
                pos = npos
                # signed VINT: stored = delta + (2^(7w-1) - 1)
                prev += raw - ((1 << (7 * width - 1)) - 1)
                if prev < 0:
                    raise ValueError("EBML lacing size went negative")
                sizes.append(prev)
    frames = []
    for s in sizes:
        if pos + s > end:
            raise ValueError("laced frame runs past block end")
        frames.append(buf[pos : pos + s])
        pos += s
    frames.append(buf[pos:end])  # implicit last frame
    return frames


def _parse_block(buf: bytes, b: int, e: int) -> tuple[int, int, int, list[bytes]]:
    """(track, relative_ts, flags, frames) of a Block/SimpleBlock body."""
    track, p = _read_vint(buf, b, keep_marker=False)
    if p + 3 > e:
        raise ValueError("(Simple)Block truncated before timestamp/flags")
    rel = int.from_bytes(buf[p : p + 2], "big", signed=True)
    flags = buf[p + 2]
    return track, rel, flags, _laced_frames(buf, p + 3, e, flags)


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
                    track, rel, flags, frames = _parse_block(
                        payload, b2, e2
                    )
                    # collect with the TRACK NUMBER and filter after the
                    # walk: Segment element order is not mandated, so a
                    # legal file may put Clusters before Tracks — a
                    # during-walk video_track check would drop them all
                    for data in frames:
                        blocks.append(
                            (track, cluster_ts + rel, bool(flags & 0x80),
                             data)
                        )
                elif eid2 == _BLOCK_GROUP:
                    # keyframe-ness of a grouped Block is the ABSENCE
                    # of a ReferenceBlock sibling (the 0x80 flag bit is
                    # reserved-zero inside a group)
                    parsed = None
                    has_ref = False
                    for eid3, b3, e3 in _walk(payload, b2, e2):
                        if eid3 == _BLOCK:
                            parsed = _parse_block(payload, b3, e3)
                        elif eid3 == _REFERENCE_BLOCK:
                            has_ref = True
                    if parsed is not None:
                        track, rel, _flags, frames = parsed
                        for data in frames:
                            blocks.append(
                                (track, cluster_ts + rel, not has_ref,
                                 data)
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


def _enc_signed_vint(delta: int) -> bytes:
    """EBML-lacing signed VINT: stored = delta + (2^(7w-1) - 1) in the
    smallest width whose stored value fits below the all-ones marker."""
    for width in range(1, 9):
        bias = (1 << (7 * width - 1)) - 1
        raw = delta + bias
        if 0 <= raw < (1 << (7 * width)) - 1:
            return (raw | (1 << (7 * width))).to_bytes(width, "big")
    raise ValueError("lacing delta out of range")


def _lace_body(frames: list[bytes], mode: str) -> tuple[int, bytes]:
    """(flag bits, laced payload) packing ALL of ``frames`` into one
    block body (count byte + coded sizes + concatenated frames)."""
    out = bytearray([len(frames) - 1])
    if mode == "xiph":
        bits = 0x02
        for f in frames[:-1]:
            s = len(f)
            while s >= 255:
                out.append(255)
                s -= 255
            out.append(s)
    elif mode == "fixed":
        bits = 0x04
        if len({len(f) for f in frames}) != 1:
            raise ValueError("fixed lacing needs equal frame sizes")
    elif mode == "ebml":
        bits = 0x06
        if len(frames) > 1:  # count-1 coded sizes: none for one frame
            out += _enc_vint_size(len(frames[0]))
            for prev, f in zip(frames[:-1], frames[1:-1]):
                out += _enc_signed_vint(len(f) - len(prev))
    else:
        raise ValueError(f"unknown lacing mode {mode!r}")
    for f in frames:
        out += f
    return bits, bytes(out)


def encode_mkv(
    frames: list[bytes],
    delta_ms: int = 500,
    sync_every: int = 2,
    frames_per_cluster: int = 4,
    timestamp_scale: int = 1_000_000,
    lacing: str | None = None,
    block_groups: bool = False,
) -> bytes:
    """Minimal Matroska writer: EBML header + Segment(Info, Tracks with
    one video track, Clusters of ``frames_per_cluster`` SimpleBlocks).
    Frame i sits at t = i·delta_ms with the keyframe flag on every
    ``sync_every``-th frame (0 = all keyframes); block timestamps are
    cluster-relative, exercising the two-level clock.

    ``lacing`` ('xiph' | 'fixed' | 'ebml') packs each cluster's frames
    into ONE laced block at the cluster timestamp (keyframe iff the
    cluster's first frame is one). ``block_groups`` emits Block inside
    BlockGroup with keyframe-ness signalled by ReferenceBlock absence
    instead of SimpleBlocks."""
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
    def _is_key(i: int) -> bool:
        return sync_every == 0 or i % sync_every == 0

    prefix = (0x80 | 1).to_bytes(1, "big")  # track 1 as 1-byte VINT
    clusters = b""
    for c0 in range(0, len(frames), frames_per_cluster):
        chunk = frames[c0 : c0 + frames_per_cluster]
        cluster_ts = c0 * delta_ms
        body = _el_uint(_CLUSTER_TS, cluster_ts)
        if lacing is not None:
            bits, laced = _lace_body(chunk, lacing)
            key = 0x80 if _is_key(c0) else 0
            blk = (
                prefix
                + (0).to_bytes(2, "big", signed=True)
                + bytes([key | bits])
                + laced
            )
            if block_groups:
                group = _el(_BLOCK, blk[:3] + bytes([bits]) + laced)
                if not _is_key(c0):
                    group += _el(
                        _REFERENCE_BLOCK,
                        (-delta_ms).to_bytes(2, "big", signed=True),
                    )
                body += _el(_BLOCK_GROUP, group)
            else:
                body += _el(_SIMPLE_BLOCK, blk)
        else:
            for j, data in enumerate(chunk):
                i = c0 + j
                rel = i * delta_ms - cluster_ts
                if block_groups:
                    blk = (
                        prefix
                        + rel.to_bytes(2, "big", signed=True)
                        + bytes([0])  # no keyframe flag inside a group
                        + data
                    )
                    group = _el(_BLOCK, blk)
                    if not _is_key(i):
                        group += _el(
                            _REFERENCE_BLOCK,
                            (-delta_ms).to_bytes(2, "big", signed=True),
                        )
                    body += _el(_BLOCK_GROUP, group)
                else:
                    key = 0x80 if _is_key(i) else 0
                    blk = (
                        prefix
                        + rel.to_bytes(2, "big", signed=True)
                        + bytes([key])  # flags: keyframe bit, no lacing
                        + data
                    )
                    body += _el(_SIMPLE_BLOCK, blk)
        clusters += _el(_CLUSTER, body)
    return ebml + _el(_SEGMENT, info + track + clusters)
