"""MP3 frame-header walking in pure stdlib (SURVEY §2 C5).

Auditing an MP3 corpus (duration, bitrate mix, frame integrity) needs
NO audio decode — an MP3 file is a sequence of frames whose 4-byte
headers declare everything: 11-bit sync, MPEG version, layer, bitrate
and sample-rate indices, padding. The walk is header-driven: each
frame's byte length follows from its own header
(``144·bitrate/samplerate + padding`` for Layer III), so the walker
JUMPS frame bodies by declared length and never pattern-scans payload
bytes — frame bodies legally contain 0xFFE sync lookalikes (the same
rule as the PDF/TIFF/MP4/zip walkers). ID3v2 prefix tags (syncsafe
size) and the trailing 128-byte ID3v1 ``TAG`` block are skipped.

Decoding actual audio (Huffman spectral data, IMDCT) is explicitly out
of scope and unrelated to this metadata surface; free-format bitrate
(index 0) and Layer II/I lengths outside the tables raise
``NotImplementedError``. The companion :func:`encode_mp3_frames`
synthesizes spec-valid frame sequences (headers + deterministic filler
that embeds sync lookalikes) so the oracle predicts every aggregate in
closed form. (∅ in reference; Tier C extension.)
"""

from __future__ import annotations

# bitrate tables, kbps; index 1..14 (0 = free format, 15 = bad)
_BITRATES = {
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}
# sample rates by (version, index); version 25 = MPEG-2.5
_RATES = {
    (1, 0): 44100, (1, 1): 48000, (1, 2): 32000,
    (2, 0): 22050, (2, 1): 24000, (2, 2): 16000,
    (25, 0): 11025, (25, 1): 12000, (25, 2): 8000,
}


def _frame_info(hdr: int) -> tuple[int, int, int]:
    """(frame_bytes, samples, sample_rate) from a 32-bit frame header."""
    if hdr >> 21 != 0x7FF:
        raise ValueError("bad MP3 frame sync")
    vbits = (hdr >> 19) & 0x3  # 00=2.5, 10=2, 11=1 (01 reserved)
    version = {0: 25, 2: 2, 3: 1}.get(vbits)
    if version is None:
        raise ValueError("reserved MPEG version")
    lbits = (hdr >> 17) & 0x3  # 01=III, 10=II, 11=I
    layer = {1: 3, 2: 2, 3: 1}.get(lbits)
    if layer is None:
        raise ValueError("reserved layer")
    br_idx = (hdr >> 12) & 0xF
    sr_idx = (hdr >> 10) & 0x3
    padding = (hdr >> 9) & 0x1
    if br_idx == 0:
        raise NotImplementedError("free-format MP3 bitrate")
    if br_idx == 15 or sr_idx == 3:
        raise ValueError("invalid bitrate/samplerate index")
    bitrate = _BITRATES[(1 if version == 1 else 2, layer)][br_idx] * 1000
    rate = _RATES[(version, sr_idx)]
    if layer == 1:
        length = (12 * bitrate // rate + padding) * 4
        samples = 384
    else:
        per = 144 if (layer == 3 and version == 1) or layer == 2 else 72
        length = per * bitrate // rate + padding
        samples = per * 8
    return length, samples, rate


def walk_mp3(payload: bytes) -> dict:
    """Frame walk → {n_frames, total_samples, sample_rate, total_bytes,
    bitrates (sorted distinct kbps)}. Jumps each frame by its declared
    length; anything that is not a frame, ID3v2, or ID3v1 where a frame
    should start is an error."""
    pos = 0
    n = len(payload)
    # ID3v2: "ID3" + ver(2) + flags(1) + 4-byte syncsafe size; the v2.4
    # footer flag (0x10) appends a 10-byte "3DI" footer NOT counted in
    # the size field
    if payload[:3] == b"ID3":
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size + (10 if payload[5] & 0x10 else 0)
    n_frames = 0
    total_samples = 0
    total_bytes = 0
    rate0 = None
    bitrates = set()
    while pos < n:
        if payload[pos : pos + 3] == b"TAG" and n - pos == 128:
            break  # trailing ID3v1
        if pos + 4 > n:
            raise ValueError("truncated MP3 frame header")
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        length, samples, rate = _frame_info(hdr)
        if rate0 is None:
            rate0 = rate
        elif rate != rate0:
            raise ValueError("sample-rate change mid-stream")
        bitrates.add(((hdr >> 12) & 0xF, (hdr >> 19) & 0x3, (hdr >> 17) & 0x3))
        if pos + length > n:
            raise ValueError("frame runs past end of payload")
        n_frames += 1
        total_samples += samples
        total_bytes += length
        pos += length
    if n_frames == 0:
        raise ValueError("no MP3 frames")
    # distinct at the kbps level: the walked set is distinct per
    # (bitrate_idx, version, layer) tuple, and a spec-legal mixed-layer
    # stream can map two tuples to the same kbps value
    kbps = sorted(
        {
            _BITRATES[
                (
                    1 if {0: 25, 2: 2, 3: 1}[v] == 1 else 2,
                    {1: 3, 2: 2, 3: 1}[l],
                )
            ][b]
            for b, v, l in bitrates
        }
    )
    return {
        "n_frames": n_frames,
        "total_samples": total_samples,
        "sample_rate": rate0,
        "total_bytes": total_bytes,
        "bitrates_kbps": kbps,
    }


_BODY_WHEEL = bytes(range(251))  # the mod-251 cycle frame bodies follow


def encode_mp3_frames(
    n_frames: int,
    bitrate_idx: int = 9,
    rate_idx: int = 0,
    version: int = 1,
    pad_every: int = 2,
    id3v2_bytes: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Spec-valid MPEG Layer-III frame sequence: headers per the real
    tables, bodies filled with a deterministic pattern that EMBEDS sync
    lookalikes (0xFF 0xFB) so a scanning parser would desync."""
    vbits = {1: 3, 2: 2, 25: 0}[version]
    out = bytearray()
    if id3v2_bytes:
        size = id3v2_bytes
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
             (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + bytes(id3v2_bytes)
    for i in range(n_frames):
        padding = 1 if pad_every and i % pad_every == 0 else 0
        hdr = (
            (0x7FF << 21) | (vbits << 19) | (0x1 << 17)  # layer III
            | (0x1 << 16)  # no CRC
            | (bitrate_idx << 12) | (rate_idx << 10) | (padding << 9)
        )
        length, _s, _r = _frame_info(hdr)
        # body byte k is (i + k) % 251 — a pure cycle, so build it by
        # slicing the precomputed mod-251 wheel at offset i % 251
        # instead of a per-byte Python generator (the generator was
        # 96% of encode time: ~170M iterations per sf0.1 corpus);
        # bytes are identical
        n_body = length - 4
        start = i % 251
        reps = (start + n_body + 250) // 251
        body = bytearray((_BODY_WHEEL * reps)[start : start + n_body])
        if len(body) >= 6:  # plant a sync lookalike mid-body
            body[2:4] = b"\xff\xfb"
        out += hdr.to_bytes(4, "big") + body
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)

# ------------------------------------------------------------- ID3v2


def parse_id3v2(payload: bytes) -> dict[str, str]:
    """Text frames of an ID3v2.3/2.4 tag -> {frame_id: text}. v2.3
    frame sizes are PLAIN big-endian; v2.4 are syncsafe — the classic
    cross-version bug, handled per the header's major version. Text
    encodings 0 (latin-1), 1 (utf-16 with BOM), and 3 (utf-8) decode;
    compressed/encrypted frames and other versions raise."""
    if payload[:3] != b"ID3":
        raise ValueError("no ID3v2 tag")
    major = payload[3]
    if major not in (3, 4):
        raise NotImplementedError(f"ID3v2.{major}")
    if payload[5] & 0x40:
        raise NotImplementedError("ID3v2 extended header")
    size = 0
    for b in payload[6:10]:
        size = (size << 7) | (b & 0x7F)
    end = 10 + size
    pos = 10
    out: dict[str, str] = {}
    while pos + 10 <= end:
        fid = payload[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if major == 4:  # syncsafe
            fsize = 0
            for b in payload[pos + 4 : pos + 8]:
                fsize = (fsize << 7) | (b & 0x7F)
        else:  # v2.3: plain big-endian
            fsize = int.from_bytes(payload[pos + 4 : pos + 8], "big")
        flags = int.from_bytes(payload[pos + 8 : pos + 10], "big")
        # v2.3 keeps compression/encryption in bits 7-6 of the second
        # flag byte; v2.4 moved them to bits 3-2.
        comp_enc_mask = 0x00C0 if major == 3 else 0x000C
        if flags & comp_enc_mask:
            raise NotImplementedError("compressed/encrypted ID3 frame")
        body = payload[pos + 10 : pos + 10 + fsize]
        if fid[:1] == b"T" and body:
            enc = body[0]
            raw = body[1:]
            if enc == 0:
                text = raw.decode("latin-1")
            elif enc == 1:
                text = raw.decode("utf-16")  # BOM-driven
            elif enc == 3:
                text = raw.decode("utf-8")
            else:
                raise NotImplementedError(f"ID3 text encoding {enc}")
            out[fid.decode("ascii")] = text.rstrip("\x00")
        pos += 10 + fsize
    return out


def encode_id3v2(
    frames: list[tuple[str, str]], major: int = 3, encoding: int = 0,
    padding: int = 16, footer: bool = False,
) -> bytes:
    """Conformant ID3v2.3/2.4 tag with text frames in the chosen
    encoding (0 latin-1, 1 utf-16+BOM, 3 utf-8); ``footer`` appends
    the v2.4 10-byte "3DI" footer (flag 0x10, not counted in size)."""
    body = bytearray()
    for fid, text in frames:
        if encoding == 0:
            raw = text.encode("latin-1")
        elif encoding == 1:
            raw = b"\xff\xfe" + text.encode("utf-16-le")
        else:
            raw = text.encode("utf-8")
        data = bytes([encoding]) + raw
        if major == 4:
            n = len(data)
            fsize = bytes(
                [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F,
                 n & 0x7F]
            )
        else:
            fsize = len(data).to_bytes(4, "big")
        body += fid.encode("ascii") + fsize + b"\x00\x00" + data
    body += bytes(padding)
    n = len(body)
    ss = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    flags = 0x10 if footer else 0x00
    out = b"ID3" + bytes([major, 0, flags]) + ss + bytes(body)
    if footer:
        out += b"3DI" + bytes([major, 0, flags]) + ss
    return out
