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

Fragmented MP4 (the CMAF/DASH ``moof`` layout) decodes too: the sample
table then lives per-fragment — ``mvex/trex`` defaults, ``tfhd``
overrides, ``tfdt`` base decode times, ``trun`` per-sample
size/duration/flags walks with first-sample-flags, data offsets
relative to each moof (``_sample_fragmented``).

The companion :func:`encode_mp4` / :func:`encode_mp4_fragmented`
synthesize real containers (full-stbl progressive-download layout with
multi-sample chunks and optional 64-bit largesize/co64; init-segment +
moof/mdat fragment layout) whose frame payloads are caller-chosen
bytes, so an oracle can predict each sampled frame's hash without any
parser — proving the box walk recovers the exact sample extents.
MKV/EBML routes to operators/mkv.py via the generic dispatch.
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
            "not an ISO-BMFF payload (MKV/EBML routes via operators/mkv.py)"
        )
    n = len(payload)
    if _find(payload, 0, n, b"moof") is not None:
        return _sample_fragmented(payload, every_ms)
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


def _video_track_fmp4(payload: bytes, moov) -> tuple[int, int]:
    """(track_ID, media timescale) of the init segment's video track."""
    for tag, b, e in _walk_boxes(payload, *moov):
        if tag != b"trak":
            continue
        tkhd = _find(payload, b, e, b"tkhd")
        mdia = _find(payload, b, e, b"mdia")
        if tkhd is None or mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        ver = payload[tkhd[0]]
        off = tkhd[0] + 4 + (16 if ver else 8)
        tid = int.from_bytes(payload[off : off + 4], "big")
        mdhd = _find(payload, *mdia, b"mdhd")
        ver2 = payload[mdhd[0]]
        ts = int.from_bytes(
            payload[mdhd[0] + (20 if ver2 else 12) :][:4], "big"
        )
        return tid, ts
    raise ValueError("fMP4 has no video track in its init segment")


def _sample_fragmented(payload: bytes, every_ms: int) -> list[bytes]:
    """Fragmented MP4 (CMAF/DASH layout): the sample table lives in
    per-fragment moof/traf/trun boxes — timescale and track id come from
    the init segment's moov, per-sample defaults from mvex/trex, sample
    times accumulate from tfdt + durations, byte extents from the trun
    size walk relative to each moof (default-base-is-moof), and sync
    detection reads the sample_is_non_sync_sample flag bit (0x10000),
    honoring first-sample-flags overrides."""
    n = len(payload)
    moov = _find(payload, 0, n, b"moov")
    if moov is None:
        raise ValueError("fMP4 missing init-segment moov")
    tid, timescale = _video_track_fmp4(payload, moov)
    d_dur = d_size = d_flags = 0
    mvex = _find(payload, *moov, b"mvex")
    if mvex is not None:
        for tag, b, e in _walk_boxes(payload, *mvex):
            if tag == b"trex" and int.from_bytes(
                payload[b + 4 : b + 8], "big"
            ) == tid:
                d_dur = int.from_bytes(payload[b + 12 : b + 16], "big")
                d_size = int.from_bytes(payload[b + 16 : b + 20], "big")
                d_flags = int.from_bytes(payload[b + 20 : b + 24], "big")

    def u32(p, signed=False):
        return int.from_bytes(payload[p : p + 4], "big", signed=signed)

    kept: list[bytes] = []
    seen: set[int] = set()
    for tag, b, e in _walk_boxes(payload, 0, n):
        if tag != b"moof":
            continue
        moof_start = b - 8
        for tag2, b2, e2 in _walk_boxes(payload, b, e):
            if tag2 != b"traf":
                continue
            tfhd = _find(payload, b2, e2, b"tfhd")
            if tfhd is None:
                raise ValueError("traf missing tfhd")
            fl = int.from_bytes(payload[tfhd[0] + 1 : tfhd[0] + 4], "big")
            p = tfhd[0] + 4
            t_id = u32(p)
            p += 4
            base_off = None
            if fl & 0x1:
                base_off = int.from_bytes(payload[p : p + 8], "big")
                p += 8
            if fl & 0x2:
                p += 4  # sample-description-index
            dur, size, flags_d = d_dur, d_size, d_flags
            if fl & 0x8:
                dur = u32(p)
                p += 4
            if fl & 0x10:
                size = u32(p)
                p += 4
            if fl & 0x20:
                flags_d = u32(p)
                p += 4
            if base_off is None:
                base_off = moof_start  # default-base-is-moof semantics
            if t_id != tid:
                continue
            t = 0
            tfdt = _find(payload, b2, e2, b"tfdt")
            if tfdt is not None:
                ver = payload[tfdt[0]]
                t = int.from_bytes(
                    payload[tfdt[0] + 4 : tfdt[0] + 4 + (8 if ver else 4)],
                    "big",
                )
            for tag3, b3, e3 in _walk_boxes(payload, b2, e2):
                if tag3 != b"trun":
                    continue
                tfl = int.from_bytes(payload[b3 + 1 : b3 + 4], "big")
                p3 = b3 + 4
                cnt = u32(p3)
                p3 += 4
                data_off = 0
                if tfl & 0x1:
                    data_off = u32(p3, signed=True)
                    p3 += 4
                first_flags = None
                if tfl & 0x4:
                    first_flags = u32(p3)
                    p3 += 4
                off = base_off + data_off
                for i in range(cnt):
                    sdur, ssize, sflags = dur, size, flags_d
                    if tfl & 0x100:
                        sdur = u32(p3)
                        p3 += 4
                    if tfl & 0x200:
                        ssize = u32(p3)
                        p3 += 4
                    if tfl & 0x400:
                        sflags = u32(p3)
                        p3 += 4
                    if tfl & 0x800:
                        p3 += 4  # composition time offset
                    if i == 0 and first_flags is not None:
                        sflags = first_flags
                    if not ssize:
                        raise ValueError("fMP4 sample with no size")
                    if (sflags & 0x10000) == 0:  # sync sample
                        bucket = (t * 1000 // timescale) // every_ms
                        if bucket not in seen:
                            seen.add(bucket)
                            kept.append(payload[off : off + ssize])
                    off += ssize
                    t += sdur
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


def _mkbox(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _mkfull(fourcc: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _mkbox(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


def encode_mp4_fragmented(
    frames: list[bytes],
    timescale: int = 1000,
    delta: int = 500,
    sync_every: int = 2,
    frames_per_fragment: int = 4,
) -> bytes:
    """Minimal fragmented MP4 (CMAF/DASH layout): ftyp + an init-segment
    moov (empty stbl, mvex/trex with the default sample duration) +
    one moof/mdat pair per ``frames_per_fragment`` samples. Each traf
    carries tfhd (default-base-is-moof), tfdt (base decode time), and a
    trun with per-sample sizes + flags (every ``sync_every``-th sample
    sync; 0 = all sync); durations ride the trex default, exercising the
    defaults-inheritance path."""
    empty_stbl = _mkbox(
        b"stbl",
        _mkfull(b"stsd", struct.pack(">I", 1)
                + struct.pack(">I", 16) + b"raw " + b"\x00" * 8)
        + _mkfull(b"stts", struct.pack(">I", 0))
        + _mkfull(b"stsc", struct.pack(">I", 0))
        + _mkfull(b"stsz", struct.pack(">II", 0, 0))
        + _mkfull(b"stco", struct.pack(">I", 0)),
    )
    url = struct.pack(">I", 12) + b"url " + bytes([0, 0, 0, 1])
    dinf = _mkbox(b"dinf", _mkfull(b"dref", struct.pack(">I", 1) + url))
    minf = _mkbox(b"minf", _mkfull(b"vmhd", b"\x00" * 8) + dinf + empty_stbl)
    hdlr = _mkfull(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    mdhd = _mkfull(
        b"mdhd", struct.pack(">IIII", 0, 0, timescale, 0) + b"\x55\xc4\x00\x00"
    )
    mdia = _mkbox(b"mdia", mdhd + hdlr + minf)
    tkhd = _mkfull(
        b"tkhd", struct.pack(">IIIII", 0, 0, 1, 0, 0) + b"\x00" * 60
    )
    trak = _mkbox(b"trak", tkhd + mdia)
    mvhd = _mkfull(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">I", 0x00010000)
        + b"\x00" * 76
        + struct.pack(">I", 2),
    )
    # trex: track 1 defaults — duration carries the frame clock
    trex = _mkfull(
        b"trex", struct.pack(">IIIII", 1, 1, delta, 0, 0)
    )
    moov = _mkbox(b"moov", mvhd + trak + _mkbox(b"mvex", trex))
    out = _mkbox(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso5")
    out += moov
    seq = 0
    for f0 in range(0, len(frames), frames_per_fragment):
        chunk = frames[f0 : f0 + frames_per_fragment]
        seq += 1
        mfhd = _mkfull(b"mfhd", struct.pack(">I", seq))
        # tfhd: default-base-is-moof (0x20000), no other fields
        tfhd = _mkfull(b"tfhd", struct.pack(">I", 1), flags=0x20000)
        tfdt = _mkfull(b"tfdt", struct.pack(">I", f0 * delta))
        # trun: data-offset + per-sample size + per-sample flags
        entries = b""
        for j, data in enumerate(chunk):
            i = f0 + j
            sync = sync_every == 0 or i % sync_every == 0
            sflags = 0x02000000 if sync else 0x00010001
            entries += struct.pack(">II", len(data), sflags)
        trun_wo_off = _mkfull(
            b"trun",
            struct.pack(">Ii", len(chunk), 0) + entries,
            flags=0x1 | 0x200 | 0x400,
        )
        traf = _mkbox(b"traf", tfhd + tfdt + trun_wo_off)
        moof_len = len(_mkbox(b"moof", mfhd + traf))
        # data_offset: first sample byte relative to moof start
        data_offset = moof_len + 8
        trun = _mkfull(
            b"trun",
            struct.pack(">Ii", len(chunk), data_offset) + entries,
            flags=0x1 | 0x200 | 0x400,
        )
        traf = _mkbox(b"traf", tfhd + tfdt + trun)
        moof = _mkbox(b"moof", mfhd + traf)
        out += moof + _mkbox(b"mdat", b"".join(chunk))
    return out
