"""ISO-BMFF (MP4) keyframe sampling in pure stdlib (SURVEY §2 C5).

Slicing samples out of an MP4 needs NO codec — like the RIFF/AVI path
(multimodal.sample_video_frames) it is a pure container walk, just over
the ISO base-media box tree instead of LIST chunks: ``moov → trak →
mdia`` locates the video track (``hdlr`` = 'vide'), ``mdhd`` carries the
media timescale, and the sample table ``stbl`` is a set of parallel
arrays that closed-form every sample's byte extent and timestamp:

- ``stts``  run-length (count, delta) pairs → per-sample timestamps
- ``stsz``  per-sample byte sizes (or one constant size)
- ``stsc``  run-length sample→chunk mapping
- ``stco``/``co64``  absolute file offset of each chunk
- ``stss``  sync (key) sample numbers, 1-based; absent = all sync

Sample n's bytes sit at chunk_offset + Σ sizes of its chunk-predecessors
— reading them is pure arithmetic over ``mdat``. Keyframe sampling keeps
the FIRST sync sample in each ``every_ms`` bucket of media time, the
ISO-BMFF analogue of the AVI stride (reference has no video surface at
all — Tier C extension; mirrors the AVI walk at
multimodal.sample_video_frames).

The companion :func:`encode_mp4` synthesizes real containers (ftyp +
mdat + moov with a full stbl, multi-sample chunks, optional 64-bit
largesize/co64) whose frame payloads are caller-chosen bytes, so an
oracle can predict each sampled frame's hash without any parser —
proving the box walk recovers the exact sample extents. Codec-entangled
containers (MKV/EBML, fragmented MP4 ``moof``) still raise
``NotImplementedError`` — honest envelope boundaries.
"""

from __future__ import annotations

import struct


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end).
    Handles 32-bit sizes, 64-bit largesize (size==1) and to-end
    (size==0) boxes."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(buf[off : off + 4], "big")
        fourcc = buf[off + 4 : off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated largesize box")
            size = int.from_bytes(buf[off + 8 : off + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError(f"bad box size {size} for {fourcc!r}")
        yield fourcc, off + hdr, off + size
        off += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for tag, b, e in _walk_boxes(buf, start, end):
        if tag == fourcc:
            return b, e
    return None


def _u32s(buf: bytes, off: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", buf[off : off + 4 * n]))


def sample_mp4_frames(payload: bytes, every_ms: int = 1000) -> list[bytes]:
    """Keyframe-sample an ISO-BMFF (MP4) payload: walk moov/trak/stbl,
    compute every sample's (offset, size, timestamp), and return the
    bytes of the first sync sample in each ``every_ms`` bucket of media
    time. See the module docstring for the box inventory."""
    if payload is None or len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError(
            "not an ISO-BMFF payload (MKV/EBML needs ffmpeg)"
        )
    n = len(payload)
    if _find(payload, 0, n, b"moof") is not None:
        raise NotImplementedError(
            "fragmented MP4 (moof) carries its sample table per-fragment"
        )
    moov = _find(payload, 0, n, b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")

    # locate the video track: trak whose mdia/hdlr handler is 'vide'
    stbl = timescale = None
    for tag, b, e in _walk_boxes(payload, *moov):
        if tag != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(payload, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("video trak missing mdhd")
        version = payload[mdhd[0]]
        # v0: ctime/mtime/timescale/duration as u32; v1: u64 times
        timescale = int.from_bytes(
            payload[mdhd[0] + (20 if version else 12) :][:4], "big"
        )
        minf = _find(payload, *mdia, b"minf")
        stbl = _find(payload, *minf, b"stbl") if minf else None
        break
    if stbl is None or not timescale:
        raise ValueError("MP4 has no video sample table")

    def full(fourcc: bytes, required: bool = True):
        box = _find(payload, *stbl, fourcc)
        if box is None:
            if required:
                raise ValueError(f"stbl missing {fourcc!r}")
            return None
        return box[0] + 4  # skip version+flags

    # stsz → per-sample sizes
    p = full(b"stsz")
    const_size, n_samples = struct.unpack(">II", payload[p : p + 8])
    sizes = (
        [const_size] * n_samples
        if const_size
        else _u32s(payload, p + 8, n_samples)
    )

    # stts → per-sample timestamps (run-length deltas)
    p = full(b"stts")
    (n_ent,) = struct.unpack(">I", payload[p : p + 4])
    ts, t = [], 0
    for cnt, delta in zip(*[iter(_u32s(payload, p + 4, 2 * n_ent))] * 2):
        for _ in range(cnt):
            ts.append(t)
            t += delta
    if len(ts) < n_samples:
        raise ValueError("stts covers fewer samples than stsz")

    # stco/co64 → chunk offsets
    box = _find(payload, *stbl, b"stco")
    if box is not None:
        p = box[0] + 4
        (n_chunks,) = struct.unpack(">I", payload[p : p + 4])
        chunk_offs = _u32s(payload, p + 4, n_chunks)
    else:
        box = _find(payload, *stbl, b"co64")
        if box is None:
            raise ValueError("stbl missing stco/co64")
        p = box[0] + 4
        (n_chunks,) = struct.unpack(">I", payload[p : p + 4])
        chunk_offs = list(
            struct.unpack(f">{n_chunks}Q", payload[p + 4 : p + 4 + 8 * n_chunks])
        )

    # stsc → samples-per-chunk runs: (first_chunk, spc, desc_idx)
    p = full(b"stsc")
    (n_ent,) = struct.unpack(">I", payload[p : p + 4])
    runs = list(zip(*[iter(_u32s(payload, p + 4, 3 * n_ent))] * 3))

    # expand to per-sample absolute offsets
    offsets: list[int] = []
    sample = 0
    for i, (first, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        for chunk in range(first, last + 1):
            off = chunk_offs[chunk - 1]
            for _ in range(spc):
                if sample >= n_samples:
                    break
                offsets.append(off)
                off += sizes[sample]
                sample += 1
    if len(offsets) < n_samples:
        raise ValueError("stsc/stco cover fewer samples than stsz")

    # stss → sync samples (1-based); absent = every sample is sync
    box = _find(payload, *stbl, b"stss")
    if box is not None:
        p = box[0] + 4
        (n_sync,) = struct.unpack(">I", payload[p : p + 4])
        sync = [s - 1 for s in _u32s(payload, p + 4, n_sync)]
    else:
        sync = list(range(n_samples))

    # keep the first sync sample in each every_ms bucket of media time
    kept, seen = [], set()
    for s in sync:
        bucket = (ts[s] * 1000 // timescale) // every_ms
        if bucket not in seen:
            seen.add(bucket)
            kept.append(payload[offsets[s] : offsets[s] + sizes[s]])
    return kept


def encode_mp4(
    frames: list[bytes],
    timescale: int = 1000,
    delta: int = 500,
    sync_every: int = 2,
    samples_per_chunk: int = 3,
    use_co64: bool = False,
) -> bytes:
    """Minimal ISO-BMFF writer: ftyp + mdat (all frames concatenated) +
    moov with a complete video sample table. Samples are grouped
    ``samples_per_chunk`` per chunk (a short final chunk gets its own
    stsc run, exercising the run-length chunk walk); every
    ``sync_every``-th sample is a keyframe in ``stss`` (0 disables stss
    = all sync). ``use_co64`` writes 64-bit chunk offsets and a
    largesize mdat header, covering the >4 GiB container layout. Frame
    bytes are opaque — any sampler that recovers them proves it walked
    the real sample table."""

    def box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + fourcc + body

    def fullbox(fourcc: bytes, body: bytes, version: int = 0) -> bytes:
        return box(fourcc, bytes([version, 0, 0, 0]) + body)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    data = b"".join(frames)
    if use_co64:
        mdat_hdr = struct.pack(">I", 1) + b"mdat" + struct.pack(
            ">Q", len(data) + 16
        )
    else:
        mdat_hdr = struct.pack(">I", len(data) + 8) + b"mdat"
    data_start = len(ftyp) + len(mdat_hdr)

    nf = len(frames)
    duration = nf * delta
    # chunk layout: groups of samples_per_chunk, short tail chunk
    chunk_offs, chunk_sizes = [], []
    off = data_start
    for i in range(0, nf, samples_per_chunk):
        chunk = frames[i : i + samples_per_chunk]
        chunk_offs.append(off)
        chunk_sizes.append(len(chunk))
        off += sum(len(f) for f in chunk)
    stsc_runs = [(1, samples_per_chunk, 1)] if chunk_sizes else []
    if chunk_sizes and chunk_sizes[-1] != samples_per_chunk:
        stsc_runs.append((len(chunk_sizes), chunk_sizes[-1], 1))

    stts = fullbox(b"stts", struct.pack(">III", 1, nf, delta))
    stsz = fullbox(
        b"stsz",
        struct.pack(">II", 0, nf)
        + struct.pack(f">{nf}I", *(len(f) for f in frames)),
    )
    stsc = fullbox(
        b"stsc",
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", *r) for r in stsc_runs),
    )
    if use_co64:
        stco = fullbox(
            b"co64",
            struct.pack(">I", len(chunk_offs))
            + struct.pack(f">{len(chunk_offs)}Q", *chunk_offs),
        )
    else:
        stco = fullbox(
            b"stco",
            struct.pack(">I", len(chunk_offs))
            + struct.pack(f">{len(chunk_offs)}I", *chunk_offs),
        )
    stbl_body = stts + stsc + stsz + stco
    if sync_every:
        syncs = list(range(1, nf + 1, sync_every))
        stbl_body += fullbox(
            b"stss",
            struct.pack(">I", len(syncs))
            + struct.pack(f">{len(syncs)}I", *syncs),
        )
    # minimal stsd: one opaque 'raw ' visual entry (the walker never
    # reads it, but real demuxers expect the box to exist)
    entry = struct.pack(">I", 16) + b"raw " + b"\x00" * 8
    stbl_body = fullbox(b"stsd", struct.pack(">I", 1) + entry) + stbl_body
    stbl = box(b"stbl", stbl_body)

    # dref: one self-contained url entry (flags=1 → data in this file)
    url = struct.pack(">I", 12) + b"url " + bytes([0, 0, 0, 1])
    dref = fullbox(b"dref", struct.pack(">I", 1) + url)
    dinf = box(b"dinf", dref)
    vmhd = fullbox(b"vmhd", b"\x00" * 8, version=0)
    minf = box(b"minf", vmhd + dinf + stbl)
    hdlr = fullbox(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    mdhd = fullbox(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, duration) + b"\x55\xc4\x00\x00",
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = fullbox(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 60,
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = fullbox(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + b"\x00" * 76
        + struct.pack(">I", 2),  # next track id
    )
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat_hdr + data + moov
