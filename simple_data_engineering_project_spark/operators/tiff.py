"""Baseline TIFF codec in pure stdlib (SURVEY §2 C5).

Scanned-document corpora (the OCR side of a training-data pipeline) are
TIFF-heavy. This decodes baseline TIFF for real: both byte orders
(``II``/``MM``), IFD tag walk, strip-based layout (multiple strips via
RowsPerStrip, offsets/byte-counts arrays), 8-bit grayscale and RGB
(chunky planar), and the three compressions that cover the vast
majority of corpus TIFFs:

- **1 (none)** — raw strip bytes;
- **32773 (PackBits)** — the Apple RLE scheme: n in [0,127] copies n+1
  literals, n in [-127,-1] repeats the next byte 1-n times, -128 noop;
- **5 (LZW)** — the TIFF flavor: MSB-first code packing with EarlyChange
  (code width bumps at 2^n − 1, one code earlier than GIF's LSB-first
  variant), Clear=256, EOI=257, KwKwK handling.

Out of envelope (honest ``NotImplementedError``): tiled layouts, planar
configuration 2, bit depths other than 8, palette color, CCITT fax and
JPEG-in-TIFF compressions, predictor 2 (horizontal differencing).

The companion :func:`encode_tiff` writes conformant files with a chosen
compression/byte order/strip height, so the oracle entry can verify all
three decompressors against one closed-form pixel formula.
(∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import struct


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # 128: noop
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Simple run/literal PackBits: runs ≥3 compress, else literals."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + run
            while j < n and j - i < 128:
                r = 1
                while j + r < n and r < 3 and data[j + r] == data[j]:
                    r += 1
                if r >= 3:
                    break
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW: MSB-first code packing, EarlyChange width bumps
    at table size 2^n − 1, Clear=256, EOI=257."""
    CLEAR, EOI = 256, 257
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return EOI
        v = 0
        for _ in range(width):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        code = read(width)
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        # EarlyChange: width bumps when the NEXT code could overflow
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    accn = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accn
        acc = (acc << width) | code
        accn += width
        while accn >= 8:
            out.append((acc >> (accn - 8)) & 0xFF)
            accn -= 8
        acc &= (1 << accn) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # Width must mirror the DECODER's EarlyChange rule (libtiff:
        # bump when the next free entry reaches 2^n − 1). The decoder's
        # table runs one entry BEHIND this encoder (it appends on the
        # code after the one that created the entry here), so at the
        # next emission its free entry is next_code − 1: bump exactly
        # when next_code − 1 ≥ 2^n − 1.
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # reset before the table fills
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if accn:
        out.append((acc << (8 - accn)) & 0xFF)
    return bytes(out)


_COMP_NONE, _COMP_LZW, _COMP_PACKBITS = 1, 5, 32773


def decode_tiff_pixels(payload: bytes):
    """Decode a baseline TIFF to (h, w) gray or (h, w, 3) RGB uint8."""
    import numpy as np

    if payload[:4] == b"II\x2a\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00\x2a":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    (n_tags,) = struct.unpack(endian + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack(
            endian + "HHI", payload[off : off + 8]
        )
        tags[tag] = (ttype, count, payload[off + 8 : off + 12])

    def values(tag: int, default=None) -> list[int]:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing tag {tag}")
            return default
        ttype, count, raw = tags[tag]
        size = {1: 1, 3: 2, 4: 4}.get(ttype)
        if size is None:
            raise NotImplementedError(f"TIFF tag type {ttype}")
        fmt = {1: "B", 3: "H", 4: "I"}[ttype]
        if size * count <= 4:
            buf = raw
        else:
            (ptr,) = struct.unpack(endian + "I", raw)
            buf = payload[ptr : ptr + size * count]
        return list(struct.unpack(endian + fmt * count, buf[: size * count]))

    w = values(256)[0]
    h = values(257)[0]
    spp = values(277, [1])[0]
    bits = values(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError("non-8-bit TIFF")
    comp = values(259, [1])[0]
    if values(284, [1])[0] != 1:
        raise NotImplementedError("planar configuration 2")
    if values(322, [0])[0] or 324 in tags:
        raise NotImplementedError("tiled TIFF")
    if values(317, [1])[0] != 1:
        raise NotImplementedError("TIFF predictor")
    offsets = values(273)
    counts = values(279)
    raw = bytearray()
    for o, c in zip(offsets, counts):
        strip = payload[o : o + c]
        if comp == _COMP_NONE:
            raw += strip
        elif comp == _COMP_PACKBITS:
            raw += _packbits_decode(strip)
        elif comp == _COMP_LZW:
            raw += _tiff_lzw_decode(strip)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("TIFF strips shorter than image")
    arr = np.frombuffer(bytes(raw[:need]), dtype=np.uint8)
    return arr.reshape(h, w) if spp == 1 else arr.reshape(h, w, spp)


def encode_tiff(
    px,
    compression: int = _COMP_NONE,
    big_endian: bool = False,
    rows_per_strip: int = 8,
) -> bytes:
    """Write a baseline TIFF from a (h, w) or (h, w, 3) uint8 array with
    the chosen compression, byte order, and strip height."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    endian = ">" if big_endian else "<"
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = px[y0 : y0 + rows_per_strip].tobytes()
        if compression == _COMP_PACKBITS:
            chunk = _packbits_encode(chunk)
        elif compression == _COMP_LZW:
            chunk = _tiff_lzw_encode(chunk)
        elif compression != _COMP_NONE:
            raise ValueError("unsupported compression")
        strips.append(chunk)

    n_strips = len(strips)

    def tag(tid: int, ttype: int, count: int, value: bytes) -> bytes:
        return struct.pack(endian + "HHI", tid, ttype, count) + value.ljust(
            4, b"\x00"
        )[:4]

    # layout: header(8: magic + IFD pointer) + strips + [arrays] + IFD
    header = (
        b"MM\x00\x2a" if big_endian else b"II\x2a\x00"
    ) + b"\x00\x00\x00\x00"  # IFD pointer patched at the end
    data_off = 8
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    arrays = b""
    if n_strips > 1:
        off_arr_pos = pos
        arrays += struct.pack(endian + "I" * n_strips, *strip_offsets)
        cnt_arr_pos = pos + 4 * n_strips
        arrays += struct.pack(
            endian + "I" * n_strips, *(len(s) for s in strips)
        )
        pos += len(arrays)
    bits_pos = None
    if spp == 3:
        bits_pos = pos
        arrays += struct.pack(endian + "HHH", 8, 8, 8)
        pos += 6
    ifd_off = pos

    def long_val(v: int) -> bytes:
        return struct.pack(endian + "I", v)

    def short_val(v: int) -> bytes:
        return struct.pack(endian + "H", v)

    entries = [
        tag(256, 4, 1, long_val(w)),
        tag(257, 4, 1, long_val(h)),
        tag(
            258, 3, spp,
            short_val(8) if spp == 1 else long_val(bits_pos),
        ),
        tag(259, 3, 1, short_val(compression)),
        tag(262, 3, 1, short_val(1 if spp == 1 else 2)),
        tag(
            273, 4, n_strips,
            long_val(strip_offsets[0]) if n_strips == 1 else long_val(off_arr_pos),
        ),
        tag(277, 3, 1, short_val(spp)),
        tag(278, 4, 1, long_val(rows_per_strip)),
        tag(
            279, 4, n_strips,
            long_val(len(strips[0])) if n_strips == 1 else long_val(cnt_arr_pos),
        ),
    ]
    ifd = (
        struct.pack(endian + "H", len(entries))
        + b"".join(entries)
        + struct.pack(endian + "I", 0)
    )
    out = header + b"".join(strips) + arrays + ifd
    # header's IFD pointer
    return out[:4] + struct.pack(endian + "I", ifd_off) + out[8:]
