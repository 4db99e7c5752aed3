"""GIF87a/89a codec in pure stdlib (SURVEY §2 C5).

A REAL decoder: logical-screen/image-descriptor parse, global and local
color tables, extension-block skipping, and genuine variable-width LZW
decompression (LSB-first sub-block bitstream, CLEAR/EOI codes,
dictionary growth to 12 bits, the KwKwK self-reference case) plus
4-pass interlace reordering. Animated GIFs decode their first frame.

The companion encoder performs real LZW COMPRESSION (sequence
dictionary, width growth, table-overflow CLEAR), not the
uncompressed-GIF literal trick — so round-trip tests exercise
multi-symbol dictionary entries on both sides. With a grayscale palette
(palette[i] = (i,i,i)) pixel values equal palette indices, making
decoded pixel sums closed-form for synthesized gradients — the same
oracle-without-a-codec proof pattern as the BMP/PNG/JPEG/WAV paths.
(∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import struct

import numpy as np


class _LZWWriter:
    """GIF-flavor LZW compressor emitting LSB-first variable-width codes."""

    def __init__(self, min_code_size: int) -> None:
        self.mcs = min_code_size
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self._reset()

    def _reset(self) -> None:
        self.table: dict[bytes, int] = {
            bytes([i]): i for i in range(self.clear)
        }
        self.next_code = self.eoi + 1
        self.width = self.mcs + 1

    def _emit(self, code: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += self.width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def compress(self, data: bytes) -> bytes:
        self._emit(self.clear)
        w = b""
        for i in range(len(data)):
            ch = data[i : i + 1]
            wk = w + ch
            if wk in self.table:
                w = wk
                continue
            self._emit(self.table[w])
            if self.next_code < 4096:
                self.table[wk] = self.next_code
                # Width alignment (the classic compress-derived rule):
                # the decoder appends its copy of this entry one code
                # LATER than we assign it, so it widens after reading
                # the NEXT code — we must widen one assignment after
                # the naive next_code == 2^width point.
                if self.next_code == (1 << self.width) and self.width < 12:
                    self.width += 1
                self.next_code += 1
            else:  # table full: reset both sides
                self._emit(self.clear)
                self._reset()
            w = ch
        if w:
            self._emit(self.table[w])
        self._emit(self.eoi)
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate truncation
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(
    width: int,
    height: int,
    indices: "np.ndarray",
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode an (h, w) uint8 index array as a single-frame GIF89a with
    real LZW compression. Default palette is 256-gray (value == index)."""
    if palette is None:
        palette = [(i, i, i) for i in range(256)]
    nbits = max(2, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | ((nbits - 1) & 7), 0, 0)
    for i in range(1 << nbits):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    rows = np.asarray(indices, dtype=np.uint8)
    if interlace:
        order = [
            y
            for start, step in _INTERLACE_PASSES
            for y in range(start, height, step)
        ]
        rows = rows[order]
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, width, height, 0x40 if interlace else 0
    )
    mcs = max(2, nbits)
    out.append(mcs)
    data = _LZWWriter(mcs).compress(rows.tobytes())
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif_pixels(payload: bytes) -> "np.ndarray":
    """Decode the first frame of a GIF to (h, w, 3) uint8 RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 7) + 1)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 1 << ((ipacked & 7) + 1)
                ct = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(data), mcs)[: w * h], dtype=np.uint8
            ).reshape(h, w)
            if ipacked & 0x40:  # interlaced: invert the 4-pass order
                order = [
                    y
                    for start, step in _INTERLACE_PASSES
                    for y in range(start, h, step)
                ]
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            return ct[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF has no image data")


def encode_gif_animated(
    frames: "list[np.ndarray]",
    delays_cs: list[int],
    palette: list[tuple[int, int, int]] | None = None,
    rects: list[tuple[int, int]] | None = None,
    transparent: int | None = None,
    disposals: list[int] | None = None,
) -> bytes:
    """Multi-frame GIF89a: one Graphic Control Extension (delay,
    disposal, optional transparency) + image descriptor per frame;
    ``rects`` gives each frame's (left, top) offset for partial
    updates. Frames are (h, w) index arrays into the shared palette."""
    if palette is None:
        palette = [(i, i, i) for i in range(256)]
    sw = max((r[0] if rects else 0) + f.shape[1] for r, f in
             zip(rects or [(0, 0)] * len(frames), frames))
    sh = max((r[1] if rects else 0) + f.shape[0] for r, f in
             zip(rects or [(0, 0)] * len(frames), frames))
    nbits = max(2, (len(palette) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | ((nbits - 1) & 7), 0, 0)
    for i in range(1 << nbits):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    for fi, frame in enumerate(frames):
        left, top = (rects[fi] if rects else (0, 0))
        disposal = (disposals[fi] if disposals else 1) & 7
        gce_packed = (disposal << 2) | (1 if transparent is not None else 0)
        out += struct.pack(
            "<BBBBHBB", 0x21, 0xF9, 4, gce_packed, delays_cs[fi],
            transparent if transparent is not None else 0, 0,
        )
        h, w = frame.shape
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        mcs = max(2, nbits)
        out.append(mcs)
        data = _LZWWriter(mcs).compress(
            np.asarray(frame, dtype=np.uint8).tobytes()
        )
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> "list[tuple[int, np.ndarray]]":
    """Decode an animated GIF to composed frames: [(delay_cs, (sh, sw, 3)
    RGB)] — Graphic Control Extensions drive delay/transparency/
    disposal, partial frames paint at their (left, top) rects, and
    disposal methods 1 (leave), 2 (restore background) and 3 (restore
    previous) compose exactly per GIF89a."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 7) + 1)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[bg if bg < len(gct) else 0]
    frames: list[tuple[int, "np.ndarray"]] = []
    delay = 0
    transparent = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                ln = payload[pos]
                gce = payload[pos + 1 : pos + 1 + ln]
                gpacked = gce[0]
                delay = struct.unpack("<H", gce[1:3])[0]
                disposal = (gpacked >> 2) & 7
                transparent = gce[3] if gpacked & 1 else None
                pos += 1 + ln
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            else:  # other extensions: skip sub-blocks
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
        elif block == 0x2C:
            left, top, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 1 << ((ipacked & 7) + 1)
                ct = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(data), mcs)[: w * h], dtype=np.uint8
            ).reshape(h, w)
            if ipacked & 0x40:
                order = [
                    y
                    for start, step in _INTERLACE_PASSES
                    for y in range(start, h, step)
                ]
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + h, left : left + w]
            rgb = ct[idx]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            frames.append((delay, canvas.copy()))
            if disposal == 2:  # restore background in the frame rect
                bg_rgb = gct[bg if bg < len(gct) else 0] if gct is not None \
                    else np.zeros(3, dtype=np.uint8)
                canvas[top : top + h, left : left + w] = bg_rgb
            elif disposal == 3 and before is not None:
                canvas = before
            # a GCE scopes to ONE render block (GIF89a §23): a later
            # frame without its own GCE must paint opaque with default
            # delay/disposal, not inherit this frame's settings
            delay = 0
            transparent = None
            disposal = 0
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return frames
