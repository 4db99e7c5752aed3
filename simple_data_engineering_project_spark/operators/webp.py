"""WebP lossless (VP8L) codec in pure stdlib (SURVEY §2 C5).

A REAL decoder for the VP8L bitstream (RFC 9649 §4, the WebP lossless
format): RIFF/WEBP container walk (VP8X extended files included) →
LSB-first bit reader → prefix-code (Huffman) decoding in both spec
forms (simple 1/2-symbol codes and full code-length codes with 16/17/18
RLE and the optional max-symbol cap) → literal ARGB decoding +
LZ77 backward references with the 120-entry 2D distance mapping +
color-cache lookups (the 0x1e35a7bd multiplicative hash) → inverse
transforms: SUBTRACT_GREEN, PREDICTOR (all 14 modes, per-tile), CROSS
COLOR (signed 3.5 fixed-point deltas), and COLOR_INDEXING (palette with
sub-byte pixel packing). Meta prefix codes (the spatially-varying
code-group image) decode too — the sub-image recursion is the same
image stream without transforms.

Lossy WebP ('VP8 ' chunks) is a full video intra codec and raises
``NotImplementedError`` — the same honest-envelope policy as the other
media codecs (∅ in reference; Tier C extension).

The companion :func:`encode_webp_lossless` writes spec-conformant VP8L
streams from an ARGB array (canonical prefix codes over the actual
symbol histogram, optional subtract-green / single-mode predictor /
palette transforms, optional LZ77 run coding), so tests and the oracle
entry can round-trip closed-form pixel content through genuine entropy
coding — not a fixture file.

Bit order note (the one detail everything hinges on): VALUES are read
LSB-first; canonical prefix codes are emitted MSB-first into the same
LSB-first byte stream, exactly DEFLATE's convention (libwebp builds its
lookup tables with the reversed-increment trick for this reason).
"""

from __future__ import annotations

import struct

# 120-entry (xoffset, yoffset) map for distance codes 1..120 (RFC 9649)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (8, 5),
    (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 6), (8, 7), (7, 7), (-7, 7),
]

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# transform tags (read order; applied inverse in reverse order)
_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEX = 0, 1, 2, 3


class _BitReader:
    """LSB-first bit reader over bytes (DEFLATE byte order)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:  # LSB-first value
        for i in range(n):
            self.cur |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_code(self, code: int, length: int) -> None:  # MSB-first code
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur)
            self.cur, self.nbits = 0, 0
        return bytes(self.out)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (length, canonical code); RFC 1951 assignment."""
    by_len: dict[int, list[int]] = {}
    for sym, ln in lengths.items():
        if ln:
            by_len.setdefault(ln, []).append(sym)
    code = 0
    out: dict[int, tuple[int, int]] = {}
    for ln in range(1, max(by_len, default=0) + 1):
        for sym in sorted(by_len.get(ln, [])):
            out[sym] = (ln, code)
            code += 1
        code <<= 1
    return out


class _Tree:
    """Prefix-code matcher: walks one stream bit at a time, first bit =
    MSB of the canonical code."""

    def __init__(self, lengths: dict[int, int]) -> None:
        codes = _canonical_codes(lengths)
        self.map = {(ln, code): sym for sym, (ln, code) in codes.items()}
        # degenerate one-symbol code: zero bits per emission
        self.single = next(iter(lengths)) if len(lengths) == 1 else None

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.bit()
            ln += 1
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("invalid prefix code")


def _read_code(br: _BitReader, alphabet_size: int) -> _Tree:
    """One prefix code: simple (1-2 symbols) or code-length coded."""
    if br.bit():  # simple
        num = br.bit() + 1
        first_8bit = br.bit()
        s0 = br.bits(8 if first_8bit else 1)
        if num == 1:
            return _Tree({s0: 0})
        s1 = br.bits(8)
        return _Tree({s0: 1, s1: 1})
    num_codes = br.bits(4) + 4
    cl_lens = {s: 0 for s in range(19)}
    for i in range(num_codes):
        cl_lens[_CL_ORDER[i]] = br.bits(3)
    cl_tree = _Tree({s: l for s, l in cl_lens.items() if l})
    if br.bit():  # optional cap on coded symbols
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lens: list[int] = []
    prev = 8
    while len(lens) < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_tree.read(br)
        if s < 16:
            lens.append(s)
            if s:
                prev = s
        elif s == 16:
            lens.extend([prev] * (3 + br.bits(2)))
        elif s == 17:
            lens.extend([0] * (3 + br.bits(3)))
        else:
            lens.extend([0] * (11 + br.bits(7)))
    lens = lens[:alphabet_size]
    return _Tree({i: l for i, l in enumerate(lens) if l})


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §4.4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image(
    br: _BitReader, w: int, h: int, level0: bool
) -> tuple[list[int], list]:
    """Decode one VP8L image stream → (row-major ARGB ints, transforms).
    Transforms (level0 only) are returned in read order."""
    transforms = []
    pal = None
    while level0 and br.bit():
        t = br.bits(2)
        if t == _T_PREDICTOR or t == _T_COLOR:
            bits = br.bits(3) + 2
            tw, th = _subsample_size(w, bits), _subsample_size(h, bits)
            sub, _ = _decode_image(br, tw, th, False)
            transforms.append((t, bits, sub))
        elif t == _T_SUBTRACT_GREEN:
            transforms.append((t,))
        else:  # COLOR_INDEX
            n_colors = br.bits(8) + 1
            sub, _ = _decode_image(br, n_colors, 1, False)
            # palette entries are delta-coded per channel
            for i in range(1, n_colors):
                sub[i] = _add_pixels(sub[i], sub[i - 1])
            transforms.append((t, n_colors, sub))
            pal = n_colors
            if n_colors <= 2:
                w = _subsample_size(w, 3)
            elif n_colors <= 4:
                w = _subsample_size(w, 2)
            elif n_colors <= 16:
                w = _subsample_size(w, 1)

    cache_bits = br.bits(4) if br.bit() else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix image: maps 2^bits tiles to code groups
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.bit():
        meta_bits = br.bits(3) + 2
        mw, mh = _subsample_size(w, meta_bits), _subsample_size(h, meta_bits)
        meta, _ = _decode_image(br, mw, mh, False)
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_code(br, green_size),
                _read_code(br, 256),  # red
                _read_code(br, 256),  # blue
                _read_code(br, 256),  # alpha
                _read_code(br, 40),  # distance
            )
        )

    pixels: list[int] = [0] * (w * h)
    pos = 0
    n = w * h
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            mp = meta[(y >> meta_bits) * _subsample_size(w, meta_bits)
                      + (x >> meta_bits)]
            g_tree, r_tree, b_tree, a_tree, d_tree = groups[(mp >> 8) & 0xFFFF]
        else:
            g_tree, r_tree, b_tree, a_tree, d_tree = groups[0]
        s = g_tree.read(br)
        if s < 256:  # literal
            g = s
            r = r_tree.read(br)
            b = b_tree.read(br)
            a = a_tree.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            pixels[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # LZ77 backward reference
            length = _prefix_value(s - 256, br)
            d_code = _prefix_value(d_tree.read(br), br)
            if d_code > 120:
                dist = d_code - 120
            else:
                dx, dy = _DIST_MAP[d_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            for _ in range(length):
                if pos >= n:
                    break
                px = pixels[pos - dist]
                pixels[pos] = px
                if cache is not None:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:  # color-cache hit
            pixels[pos] = cache[s - 256 - 24]
            pos += 1
    return pixels, transforms


def _add_pixels(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _select(t: int, l: int, tl: int) -> int:
    s = 0
    for sh in (24, 16, 8, 0):
        ac, bc, cc = (t >> sh) & 0xFF, (l >> sh) & 0xFF, (tl >> sh) & 0xFF
        s += abs(bc - cc) - abs(ac - cc)
    return t if s <= 0 else l


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= v << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)) >> 1
        b = (tl >> sh) & 0xFF
        d = a - b
        # C truncation toward zero, per libwebp AddSubtractComponentHalf
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(a + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"bad predictor mode {mode}")


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _apply_inverse_transforms(
    pixels: list[int], w: int, h: int, transforms: list
) -> tuple[list[int], int]:
    """Inverse transforms in reverse read order; returns (pixels, width)
    (color-indexing changes the effective stored width)."""
    for tr in reversed(transforms):
        tag = tr[0]
        if tag == _T_SUBTRACT_GREEN:
            for i, px in enumerate(pixels):
                g = (px >> 8) & 0xFF
                r = (((px >> 16) & 0xFF) + g) & 0xFF
                b = ((px & 0xFF) + g) & 0xFF
                pixels[i] = (px & 0xFF00FF00) | (r << 16) | b
        elif tag == _T_PREDICTOR:
            bits, sub = tr[1], tr[2]
            tw = _subsample_size(w, bits)
            for y in range(h):
                for x in range(w):
                    i = y * w + x
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = pixels[i - 1]  # mode L on first row
                    elif x == 0:
                        pred = pixels[i - w]  # mode T on first column
                    else:
                        mode = (sub[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                        l = pixels[i - 1]
                        t = pixels[i - w]
                        tl = pixels[i - w - 1]
                        tr_ = pixels[i - w + 1] if x + 1 < w else pixels[i - w]
                        pred = _predict(mode, l, t, tr_, tl)
                    pixels[i] = _add_pixels(pixels[i], pred)
        elif tag == _T_COLOR:
            bits, sub = tr[1], tr[2]
            tw = _subsample_size(w, bits)
            for y in range(h):
                for x in range(w):
                    i = y * w + x
                    cx = sub[(y >> bits) * tw + (x >> bits)]
                    g2r = cx & 0xFF
                    g2b = (cx >> 8) & 0xFF
                    r2b = (cx >> 16) & 0xFF
                    px = pixels[i]
                    a = px >> 24
                    r = (px >> 16) & 0xFF
                    g = (px >> 8) & 0xFF
                    b = px & 0xFF
                    r = (r + _ct_delta(g2r, g)) & 0xFF
                    b = (b + _ct_delta(g2b, g)) & 0xFF
                    b = (b + _ct_delta(r2b, r)) & 0xFF
                    pixels[i] = (a << 24) | (r << 16) | (g << 8) | b
        elif tag == _T_COLOR_INDEX:
            n_colors, pal = tr[1], tr[2]
            if n_colors <= 2:
                pb, per = 3, 8
            elif n_colors <= 4:
                pb, per = 2, 4
            elif n_colors <= 16:
                pb, per = 1, 2
            else:
                pb, per = 0, 1
            ibits = 8 // per
            packed_w = _subsample_size(w, pb)
            out = [0] * (w * h)
            for y in range(h):
                for x in range(w):
                    packed = pixels[y * packed_w + (x >> pb)]
                    idx = ((packed >> 8) & 0xFF) >> ((x % per) * ibits)
                    idx &= (1 << ibits) - 1
                    out[y * w + x] = pal[idx] if idx < n_colors else 0
            pixels = out
    return pixels, w


def decode_webp_pixels(payload: bytes):
    """Decode a lossless WebP to a (h, w, 4) uint8 RGBA numpy array.
    Walks the RIFF container (VP8X extended layouts included) to the
    VP8L chunk; lossy 'VP8 ' raises NotImplementedError."""
    import numpy as np

    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        raise ValueError("not a WebP payload")
    off = 12
    vp8l = None
    while off + 8 <= len(payload):
        tag = payload[off : off + 4]
        size = int.from_bytes(payload[off + 4 : off + 8], "little")
        body = payload[off + 8 : off + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8 intra codec) — only VP8L decodes here"
            )
        off += 8 + size + (size % 2)
    if vp8l is None:
        raise ValueError("WebP missing VP8L chunk")
    if vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(vp8l[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-used hint
    if br.bits(3) != 0:
        raise NotImplementedError("unknown VP8L version")
    pixels, transforms = _decode_image(br, w, h, True)
    pixels, _ = _apply_inverse_transforms(pixels, w, h, transforms)
    arr = np.zeros((h, w, 4), dtype=np.uint8)
    for i, px in enumerate(pixels):
        y, x = divmod(i, w)
        arr[y, x, 0] = (px >> 16) & 0xFF
        arr[y, x, 1] = (px >> 8) & 0xFF
        arr[y, x, 2] = px & 0xFF
        arr[y, x, 3] = px >> 24
    return arr


# --------------------------------------------------------------- encoder


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths from frequencies (heapq Huffman; alphabets here are
    small so the 15-bit limit never binds)."""
    import heapq

    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, [s]) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    lengths = {s: 0 for s in freqs}
    tick = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        tick += 1
        heapq.heappush(heap, (f1 + f2, tick, s1 + s2))
    if max(lengths.values()) > max_len:
        raise ValueError("code too deep for this toy builder")
    return lengths


def _write_code_lengths(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> None:
    """Emit one prefix code: simple form when ≤2 symbols, else the full
    code-length-coded form (no RLE except trailing-zero truncation via
    the max-symbol cap)."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(syms[0], 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)
    lens = [lengths.get(s, 0) for s in range(alphabet_size)]
    last_nz = max(i for i, l in enumerate(lens) if l)
    used = lens[: last_nz + 1]
    cl_freq: dict[int, int] = {}
    for l in used:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lens = _huffman_lengths(cl_freq, max_len=7)
    cl_codes = _canonical_codes(cl_lens)
    # num_codes must cover every used cl symbol's position in _CL_ORDER
    order_pos = {s: i for i, s in enumerate(_CL_ORDER)}
    num_codes = max(max(order_pos[s] for s in cl_lens) + 1, 4)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lens.get(_CL_ORDER[i], 0), 3)
    if len(used) < alphabet_size:
        # cap coded symbols so trailing zeros need no RLE
        bw.write(1, 1)
        length_nbits = 14  # 2 + 2*6
        bw.write(6, 3)
        bw.write(len(used) - 2, length_nbits)
    else:
        bw.write(0, 1)
    single = len(cl_lens) == 1
    for l in used:
        if not single:
            ln, code = cl_codes[l]
            bw.write_code(code, ln)
        # single cl symbol → zero bits per length


class _Enc:
    def __init__(self, lengths: dict[int, int]) -> None:
        self.lengths = lengths
        self.codes = _canonical_codes(lengths)
        self.single = len(lengths) == 1

    def emit(self, bw: _BitWriter, sym: int) -> None:
        if self.single:
            return
        ln, code = self.codes[sym]
        bw.write_code(code, ln)


def encode_webp_lossless(
    argb_rows: list[list[int]],
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    lz77_runs: bool = False,
    palette: bool = False,
    color_cache_bits: int = 0,
    cross_color: tuple[int, int, int] | None = None,
    meta_tile_bits: int | None = None,
) -> bytes:
    """Spec-conformant VP8L stream for a row-major ARGB image. The
    options exist to exercise every decoder path with deterministic
    content: SUBTRACT_GREEN / single-tile PREDICTOR / single-tile CROSS
    COLOR / COLOR_INDEXING transforms, LZ77 distance-1 run coding,
    color-cache symbols, and meta prefix groups (checkerboard group
    assignment over 2^meta_tile_bits tiles). ``palette`` is exclusive
    with the other transforms (real encoders layer them; the decoder
    handles each inverse independently)."""
    h = len(argb_rows)
    w = len(argb_rows[0])
    work = [px & 0xFFFFFFFF for row in argb_rows for px in row]

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    stored_w = w
    if palette:
        assert not (subtract_green or predictor_mode is not None or cross_color)
        colors: list[int] = []
        index_of: dict[int, int] = {}
        for px in work:
            if px not in index_of:
                index_of[px] = len(colors)
                colors.append(px)
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError("palette overflow")
        bw.write(1, 1)
        bw.write(_T_COLOR_INDEX, 2)
        bw.write(n_colors - 1, 8)
        # palette entries are DELTA-coded per channel
        deltas = [colors[0]] + [
            _sub_pixels(colors[i], colors[i - 1]) for i in range(1, n_colors)
        ]
        _encode_sub_image(bw, deltas, n_colors, 1)
        if n_colors <= 2:
            pb = 3
        elif n_colors <= 4:
            pb = 2
        elif n_colors <= 16:
            pb = 1
        else:
            pb = 0
        per = {3: 8, 2: 4, 1: 2, 0: 1}[pb]  # pixels per packed byte
        ibits = 8 // per
        stored_w = _subsample_size(w, pb)
        packed = [0] * (stored_w * h)
        for y in range(h):
            for x in range(w):
                idx = index_of[work[y * w + x]]
                pi = y * stored_w + (x >> pb)
                packed[pi] |= idx << ((x % per) * ibits)
        work = [(0xFF << 24) | (v << 8) for v in packed]
    if predictor_mode is not None:
        # residuals vs the fixed-mode prediction (row0/col0 use L/T per
        # spec; (0,0) predicts opaque black); one 512-px tile
        res = [0] * (w * h)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = work[i - 1]
                elif x == 0:
                    pred = work[i - w]
                else:
                    l, t, tl = work[i - 1], work[i - w], work[i - w - 1]
                    tr_ = work[i - w + 1] if x + 1 < w else work[i - w]
                    pred = _predict(predictor_mode, l, t, tr_, tl)
                res[i] = _sub_pixels(work[i], pred)
        work = res
        bw.write(1, 1)
        bw.write(_T_PREDICTOR, 2)
        bw.write(9 - 2, 3)
        _encode_sub_image(bw, [(0xFF << 24) | (predictor_mode << 8)], 1, 1)
    if cross_color is not None:
        g2r, g2b, r2b = (v & 0xFF for v in cross_color)
        out = []
        for px in work:
            a = px >> 24
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            # forward = exact mirror of the decoder inverse (which
            # restores r before using it for the r2b delta)
            b = (b - _ct_delta(r2b, r) - _ct_delta(g2b, g)) & 0xFF
            r = (r - _ct_delta(g2r, g)) & 0xFF
            out.append((a << 24) | (r << 16) | (g << 8) | b)
        work = out
        bw.write(1, 1)
        bw.write(_T_COLOR, 2)
        bw.write(9 - 2, 3)
        tile = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        _encode_sub_image(bw, [tile], 1, 1)
    if subtract_green:
        out = []
        for px in work:
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) - g) & 0xFF
            b = ((px & 0xFF) - g) & 0xFF
            out.append((px & 0xFF00FF00) | (r << 16) | b)
        work = out
        bw.write(1, 1)
        bw.write(_T_SUBTRACT_GREEN, 2)
    bw.write(0, 1)  # end of transforms
    _encode_literals(
        bw,
        work,
        stored_w,
        lz77_runs,
        level0=True,
        cache_bits=color_cache_bits,
        meta_tile_bits=meta_tile_bits,
        height=h,
    )
    vp8l = bw.flush()
    riff_body = b"WEBP" + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) % 2:
        riff_body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _sub_pixels(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def _encode_sub_image(bw: _BitWriter, pixels: list[int], w: int, h: int) -> None:
    """Sub-image stream (transform data): no transforms, no meta bit."""
    _encode_literals(bw, pixels, w, False, level0=False)


def _encode_literals(
    bw: _BitWriter,
    pixels: list[int],
    w: int,
    lz77_runs: bool,
    level0: bool = True,
    cache_bits: int = 0,
    meta_tile_bits: int | None = None,
    height: int | None = None,
) -> None:
    # ---- color cache header
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    # ---- meta prefix groups
    n_groups = 1
    group_of_pos = None
    if level0:
        if meta_tile_bits is not None:
            bw.write(1, 1)
            bw.write(meta_tile_bits - 2, 3)
            mb = meta_tile_bits
            mw = _subsample_size(w, mb)
            mh = _subsample_size(height or 1, mb)
            # checkerboard: group = (tx + ty) & 1
            meta_px = [
                (0xFF << 24) | ((((tx + ty) & 1)) << 8)
                for ty in range(mh)
                for tx in range(mw)
            ]
            _encode_sub_image(bw, meta_px, mw, mh)
            # the DECODER sizes its group list from the meta image's max
            # index — write exactly that many tree groups (a 1-tile image
            # only ever uses group 0)
            n_groups = max((p >> 8) & 0xFFFF for p in meta_px) + 1

            def group_of_pos(pos: int) -> int:
                x, y = pos % w, pos // w
                return ((x >> mb) + (y >> mb)) & 1

        else:
            bw.write(0, 1)

    # ---- tokenize with cache simulation (must mirror decoder exactly:
    # the cache updates on literals AND on every backref-copied pixel)
    cache = [None] * (1 << cache_bits) if cache_bits else None

    def cache_idx(px: int) -> int:
        return (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)

    tokens = []  # (group, "lit"|"run"|"cache", value)
    i, n = 0, len(pixels)
    while i < n:
        grp = group_of_pos(i) if group_of_pos else 0
        if lz77_runs and i > 0 and pixels[i] == pixels[i - 1]:
            j = i
            while j < n and pixels[j] == pixels[i - 1]:
                j += 1
            tokens.append((grp, "run", j - i))
            if cache is not None:
                for k in range(i, j):
                    cache[cache_idx(pixels[k])] = pixels[k]
            i = j
            continue
        px = pixels[i]
        if cache is not None and cache[cache_idx(px)] == px:
            tokens.append((grp, "cache", cache_idx(px)))
        else:
            tokens.append((grp, "lit", px))
            if cache is not None:
                cache[cache_idx(px)] = px
        i += 1

    # ---- per-group histograms
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gf = [dict() for _ in range(n_groups)]
    rf = [dict() for _ in range(n_groups)]
    bf = [dict() for _ in range(n_groups)]
    af = [dict() for _ in range(n_groups)]
    df = [dict() for _ in range(n_groups)]

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    for grp, kind, v in tokens:
        if kind == "lit":
            bump(gf[grp], (v >> 8) & 0xFF)
            bump(rf[grp], (v >> 16) & 0xFF)
            bump(bf[grp], v & 0xFF)
            bump(af[grp], v >> 24)
        elif kind == "cache":
            bump(gf[grp], 256 + 24 + v)
        else:
            code, _extra, _ebits = _to_prefix(v)
            bump(gf[grp], 256 + code)
            bump(df[grp], 1)  # value 2 → map entry (1,0) → dist 1
    encs = []
    for grp in range(n_groups):
        trees = []
        for freqs, size in (
            (gf[grp], green_size),
            (rf[grp], 256),
            (bf[grp], 256),
            (af[grp], 256),
            (df[grp], 40),
        ):
            if not freqs:
                freqs[0] = 1
            lens = _huffman_lengths(freqs)
            _write_code_lengths(bw, lens, size)
            trees.append(_Enc(lens))
        encs.append(trees)

    # ---- emit
    for grp, kind, v in tokens:
        g_e, r_e, b_e, a_e, d_e = encs[grp]
        if kind == "lit":
            g_e.emit(bw, (v >> 8) & 0xFF)
            r_e.emit(bw, (v >> 16) & 0xFF)
            b_e.emit(bw, v & 0xFF)
            a_e.emit(bw, v >> 24)
        elif kind == "cache":
            g_e.emit(bw, 256 + 24 + v)
        else:
            code, extra, ebits = _to_prefix(v)
            g_e.emit(bw, 256 + code)
            if ebits:
                bw.write(extra, ebits)
            d_e.emit(bw, 1)  # value 2 → map entry (1,0) → dist 1


def _to_prefix(v: int) -> tuple[int, int, int]:
    """Value → (prefix code, extra bits value, extra bit count);
    inverse of :func:`_prefix_value`."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    ebits = u.bit_length() - 2
    parity = (u >> ebits) - 2  # second-highest bit of u
    code = 2 * ebits + 2 + parity
    base = (2 + parity) << ebits
    return code, u - base, ebits
