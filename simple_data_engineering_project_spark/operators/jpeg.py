"""JPEG entropy codec in pure numpy/stdlib (SURVEY §2 C5).

A REAL decoder for DCT JPEGs: marker walk → DQT/DHT/SOF/SOS parse →
byte-unstuffed bitstream → canonical Huffman decode (tables come from
the file's own DHT segments, not hard-coded constants) → DC-diff EXTEND
→ run/size AC with EOB/ZRL → dequantize → de-zigzag → float64 IDCT →
level shift → clamp. Grayscale returns one plane; 3-component scans
convert YCbCr→RGB (BT.601). The supported envelope covers baseline
sequential (SOF0) including restart intervals (DRI/RSTn) and subsampled
chroma (e.g. 4:2:0, nearest-neighbor upsample), plus progressive (SOF2)
spectral-selection and DC successive-approximation scans and AC
successive-approximation refinement with EOB runs, and LOSSLESS
sequential (SOF3, T.81 Annex H — the DNG/DICOM layout): Huffman-coded
prediction differences with all seven predictor selections, mod-2^16
arithmetic, point transform, precisions 2-16 (P≤8 returns uint8, else
uint16), multi-component interleaved scans decoded as direct channel
planes (no color transform, per spec). Baseline images may also arrive
MULTI-SCAN (legal non-interleaved per-component scan sequences): each
scan decodes into the shared planes — single-component scans over the
component's own block grid, interleaved scans over the MCU grid — with
per-scan predictors and restart segmentation. Still OUTSIDE the
envelope — these raise ``NotImplementedError``, the same honest-stub
policy as the other media codecs (∅ in reference; Tier C extension):
hierarchical (SOF5-7/13-15), non-8-bit precision in DCT modes,
arithmetic coding (SOF9-11), and restart intervals or subsampling or
multi-scan layouts inside lossless scans.
Progressive covers restart intervals AND subsampled chroma
(interleaved DC scans over the padded MCU grid, per-component AC
scans over each component's own block grid).

The companion encoder synthesizes baseline JPEGs whose 8×8 blocks carry
a chosen DC (and optionally one AC) coefficient, so decoded pixels are
closed-form: with q[0]=8 the DC-only block decodes to exactly
``dc + 128`` in every pixel — an oracle can predict exact pixel sums
without any codec, proving the Huffman/IDCT path parses the actual
entropy-coded bytes end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: index i of the stream → (row, col) in the 8×8 block.
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# 8×8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1)uπ/16); IDCT is C.T@S@C.
_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Canonical DC-category Huffman table (the Annex K luminance DC layout:
# 12 categories, code lengths 2..9). Used by the ENCODER only — the
# decoder always builds tables from the payload's DHT segments.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Minimal AC table: EOB, (run0,size1), ZRL — three 2-bit codes.
AC_BITS = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
AC_VALS = [0x00, 0x01, 0xF0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (length, code) for a canonical JPEG Huffman table."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value, inverse of :func:`_canonical_codes`."""
    return {lc: v for v, lc in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict[tuple[int, int], int]) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in scan")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t raw bits back to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def encode_jpeg_blocks(
    width: int,
    height: int,
    blocks: list[tuple[int, int]],
    q_dc: int = 8,
    q_ac1: int = 16,
    restart_interval: int = 0,
) -> bytes:
    """Synthesize a baseline grayscale JPEG from per-block (dc, ac1)
    quantized coefficients (raster block order, ceil(w/8)*ceil(h/8)
    entries). With ``q_dc=8`` a DC-only block decodes to exactly
    ``dc + 128`` in all 64 pixels (IDCT of a lone DC is S00/8).
    ``restart_interval`` > 0 emits a DRI segment and byte-aligned RSTn
    markers with DC-predictor resets every that-many MCUs."""
    nbx = (width + 7) // 8
    nby = (height + 7) // 8
    assert len(blocks) == nbx * nby
    qtab = bytearray(64)
    qtab[0] = q_dc
    for i in range(1, 64):
        qtab[i] = q_ac1
    dqt = b"\x00" + bytes(qtab)
    sof = struct.pack(">BHHB", 8, height, width, 1) + struct.pack(
        ">BBB", 1, 0x11, 0
    )
    dht_dc = bytes([0x00] + DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10] + AC_BITS) + bytes(AC_VALS)
    sos = struct.pack(">BBBBBB", 1, 1, 0x00, 0, 63, 0)

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    scan = bytearray()
    w = _BitWriter()
    prev = 0
    rst = 0
    for i, (dc, ac1) in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            scan += w.flush()  # byte-align the segment
            scan += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            w = _BitWriter()
            prev = 0  # predictors reset at every restart
        diff = dc - prev
        prev = dc
        t = _category(diff)
        length, code = dc_codes[t]
        w.write(code, length)
        if t:
            w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        if ac1:
            t1 = _category(ac1)
            if t1 != 1:
                raise ValueError("minimal AC table carries size-1 only")
            length, code = ac_codes[0x01]
            w.write(code, length)
            w.write(ac1 if ac1 > 0 else ac1 + 1, 1)
        length, code = ac_codes[0x00]  # EOB
        w.write(code, length)
    scan += w.flush()

    out = b"\xff\xd8"
    segs = [(b"\xff\xdb", dqt), (b"\xff\xc0", sof)]
    if restart_interval:
        segs.append((b"\xff\xdd", struct.pack(">H", restart_interval)))
    segs += [(b"\xff\xc4", dht_dc), (b"\xff\xc4", dht_ac), (b"\xff\xda", sos)]
    for marker, seg in segs:
        out += marker + struct.pack(">H", len(seg) + 2) + seg
    return out + bytes(scan) + b"\xff\xd9"


def encode_jpeg_multiscan(
    width: int,
    height: int,
    comp_blocks: list[list[tuple[int, int]]],
    q_dc: int = 8,
    q_ac1: int = 16,
    restart_interval: int = 0,
) -> bytes:
    """Synthesize a MULTI-SCAN baseline JPEG: a 3-component 1x1-sampled
    SOF0 whose entropy data arrives as one NON-INTERLEAVED scan per
    component (the T.81-legal layout some encoders emit), each with its
    own DC predictor chain and optional restart segmentation.
    ``comp_blocks`` holds per-component (dc, ac1) quantized
    coefficients in raster block order; with ``q_dc=8`` a DC-only
    block decodes the component plane to exactly ``dc + 128``."""
    if len(comp_blocks) != 3:
        raise ValueError("expects 3 component block lists")
    nbx = (width + 7) // 8
    nby = (height + 7) // 8
    for blocks in comp_blocks:
        if len(blocks) != nbx * nby:
            raise ValueError(
                f"component carries {len(blocks)} blocks; needs {nbx * nby}"
            )
    qtab = bytearray(64)
    qtab[0] = q_dc
    for i in range(1, 64):
        qtab[i] = q_ac1
    dqt = b"\x00" + bytes(qtab)
    sof = struct.pack(">BHHB", 8, height, width, 3) + b"".join(
        struct.pack(">BBB", cid, 0x11, 0) for cid in (1, 2, 3)
    )
    dht_dc = bytes([0x00] + DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10] + AC_BITS) + bytes(AC_VALS)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)

    out = b"\xff\xd8"
    segs = [(b"\xff\xdb", dqt), (b"\xff\xc0", sof)]
    if restart_interval:
        segs.append((b"\xff\xdd", struct.pack(">H", restart_interval)))
    segs += [(b"\xff\xc4", dht_dc), (b"\xff\xc4", dht_ac)]
    for marker, seg in segs:
        out += marker + struct.pack(">H", len(seg) + 2) + seg
    for cid, blocks in zip((1, 2, 3), comp_blocks):
        sos = struct.pack(">BBBBBB", 1, cid, 0x00, 0, 63, 0)
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        scan = bytearray()
        w = _BitWriter()
        prev = 0
        rst = 0
        for i, (dc, ac1) in enumerate(blocks):
            if restart_interval and i and i % restart_interval == 0:
                scan += w.flush()
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                w = _BitWriter()
                prev = 0
            diff = dc - prev
            prev = dc
            t = _category(diff)
            length, code = dc_codes[t]
            w.write(code, length)
            if t:
                w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
            if ac1:
                t1 = _category(ac1)
                if t1 != 1:
                    raise ValueError("minimal AC table carries size-1 only")
                length, code = ac_codes[0x01]
                w.write(code, length)
                w.write(ac1 if ac1 > 0 else ac1 + 1, 1)
            length, code = ac_codes[0x00]  # EOB
            w.write(code, length)
        scan += w.flush()
        out += bytes(scan)
    return out + b"\xff\xd9"


# Lossless difference-category table: SSSS 0..16 (16 = the special
# "diff is exactly 32768, no extra bits" code), all length 5 — a legal
# (incomplete) canonical table big enough for 16-bit-precision diffs.
LL_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
LL_VALS = list(range(17))


def encode_jpeg_lossless(
    samples: "np.ndarray",
    predictor: int = 1,
    precision: int = 8,
    pt: int = 0,
) -> bytes:
    """Synthesize a lossless JPEG (SOF3) from exact sample values —
    (h, w) or (h, w, ncomp) ints below 2**precision. Lossless means the
    decoder must reproduce ``(samples >> pt) << pt`` bit-exactly, so any
    round-trip is closed-form. ``predictor`` is the scan's Ss selection
    (1..7); components are encoded interleaved, one sample each."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    vals = arr >> pt
    default = 1 << (precision - 1 - pt)
    codes = _canonical_codes(LL_BITS, LL_VALS)
    bw = _BitWriter()
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                if y == 0 and x == 0:
                    px = default
                elif y == 0:
                    px = vals[0, x - 1, c]
                elif x == 0:
                    px = vals[y - 1, 0, c]
                else:
                    a = vals[y, x - 1, c]
                    b = vals[y - 1, x, c]
                    cc = vals[y - 1, x - 1, c]
                    px = (
                        a, b, cc, a + b - cc,
                        a + ((b - cc) >> 1), b + ((a - cc) >> 1),
                        (a + b) >> 1,
                    )[predictor - 1]
                diff = int(vals[y, x, c] - px) & 0xFFFF
                if diff == 32768:
                    length, code = codes[16]
                    bw.write(code, length)
                    continue
                signed = diff if diff < 32768 else diff - 65536
                t = _category(signed)
                length, code = codes[t]
                bw.write(code, length)
                if t:
                    bw.write(
                        signed if signed > 0 else signed + (1 << t) - 1, t
                    )
    sof = struct.pack(">BHHB", precision, h, w, nc) + b"".join(
        struct.pack(">BBB", c + 1, 0x11, 0) for c in range(nc)
    )
    dht = bytes([0x00] + LL_BITS) + bytes(LL_VALS)
    sos = (
        bytes([nc])
        + b"".join(struct.pack(">BB", c + 1, 0x00) for c in range(nc))
        + struct.pack(">BBB", predictor, 0, pt)
    )
    out = b"\xff\xd8"
    for marker, seg in ((b"\xff\xc3", sof), (b"\xff\xc4", dht), (b"\xff\xda", sos)):
        out += marker + struct.pack(">H", len(seg) + 2) + seg
    return out + bw.flush() + b"\xff\xd9"


def _decode_lossless(
    w_: int, h: int, comps: list, precision: int, scans: list
) -> "np.ndarray":
    """Annex H lossless decode: Huffman difference categories + EXTEND,
    the seven predictors with the first-row/first-column/first-sample
    rules, mod-2^16 sample arithmetic, output shifted by the point
    transform. Components come back as direct planes — lossless JPEG
    has no color transform."""
    if len(scans) != 1:
        raise NotImplementedError("multi-scan lossless JPEG")
    sc, ss, _se, _ah, al, segs, htabs, restart_interval = scans[0]
    if restart_interval or len(segs) != 1:
        raise NotImplementedError("restart intervals in lossless scan")
    psel = ss
    if not 1 <= psel <= 7:
        raise NotImplementedError(f"lossless predictor selection {psel}")
    if [cid for cid, _, _ in sc] != [c[0] for c in comps]:
        raise NotImplementedError(
            "lossless scan does not cover all SOF components in order"
        )
    for _, hi, vi, _ in comps:
        if hi != 1 or vi != 1:
            raise NotImplementedError("subsampled lossless JPEG")
    tabs = {cid: htabs[(0, td)] for cid, td, _ in sc}
    order = [cid for cid, _, _ in sc]
    default = 1 << (precision - 1 - al)
    planes = {cid: np.zeros((h, w_), dtype=np.int64) for cid in order}
    reader = _BitReader(segs[0])
    for y in range(h):
        for x in range(w_):
            for cid in order:
                ssss = reader.read_huffman(tabs[cid])
                if ssss == 16:
                    diff = 32768
                else:
                    diff = _extend(reader.read_bits(ssss), ssss)
                p = planes[cid]
                if y == 0 and x == 0:
                    px = default
                elif y == 0:
                    px = p[0, x - 1]
                elif x == 0:
                    px = p[y - 1, 0]
                else:
                    a = p[y, x - 1]
                    b = p[y - 1, x]
                    c = p[y - 1, x - 1]
                    px = (
                        a, b, c, a + b - c,
                        a + ((b - c) >> 1), b + ((a - c) >> 1),
                        (a + b) >> 1,
                    )[psel - 1]
                p[y, x] = (int(px) + diff) & 0xFFFF
    dtype = np.uint8 if precision <= 8 else np.uint16
    out = [(planes[cid] << al).astype(dtype) for cid in order]
    return out[0] if len(out) == 1 else np.stack(out, axis=-1)


# Progressive AC table: EOB0..EOB3 (runs 1..15) + (run0, size1).
PROG_AC_BITS = [0, 0, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [0x00, 0x01, 0x10, 0x20, 0x30]


def encode_jpeg_progressive_gray(
    width: int,
    height: int,
    blocks: list[tuple[int, int]],
    dc_al: int = 0,
    q_dc: int = 8,
    q_ac1: int = 16,
    ac_al: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Synthesize a PROGRESSIVE (SOF2) grayscale JPEG from per-block
    (dc, ac1) coefficients: a DC-first scan at point transform
    ``dc_al``, one DC refinement scan per remaining bit, an AC
    spectral-selection scan (Ss=1..63, point transform ``ac_al``) with
    EOBRUN coding, then one AC successive-approximation REFINEMENT scan
    per remaining AC bit plane (correction bits + newly visible ±1
    insertions). With ``restart_interval`` > 0, every scan is split
    into RSTn-delimited entropy segments of that many blocks, with DC
    prediction / EOB-run state reset at each boundary. Decoded pixels
    equal the baseline encoding of the same coefficients."""
    nbx = (width + 7) // 8
    nby = (height + 7) // 8
    assert len(blocks) == nbx * nby
    qtab = bytearray([q_ac1] * 64)
    qtab[0] = q_dc
    dqt = b"\x00" + bytes(qtab)
    sof = struct.pack(">BHHB", 8, height, width, 1) + struct.pack(
        ">BBB", 1, 0x11, 0
    )
    dht_dc = bytes([0x00] + DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10] + PROG_AC_BITS) + bytes(PROG_AC_VALS)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + struct.pack(">H", len(body) + 2) + body

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return seg(
            b"\xff\xda",
            struct.pack(">BBBBBB", 1, 1, 0x00, ss, se, (ah << 4) | al),
        )

    def with_restarts(encode_seg) -> bytes:
        """Entropy data for one scan: encode_seg(chunk) must be
        self-contained (state resets per segment, byte-aligned flush)."""
        if not restart_interval:
            return encode_seg(blocks)
        parts = []
        for idx, i in enumerate(range(0, len(blocks), restart_interval)):
            if idx:
                parts.append(bytes([0xFF, 0xD0 + ((idx - 1) % 8)]))
            parts.append(encode_seg(blocks[i : i + restart_interval]))
        return b"".join(parts)

    out = b"\xff\xd8" + seg(b"\xff\xdb", dqt) + seg(b"\xff\xc2", sof)
    out += seg(b"\xff\xc4", dht_dc) + seg(b"\xff\xc4", dht_ac)
    if restart_interval:
        out += seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    # scan 1: DC first pass at point transform dc_al
    def dc_first_seg(chunk) -> bytes:
        w = _BitWriter()
        prev = 0  # DC prediction resets at every restart boundary
        for dc, _ac1 in chunk:
            v = dc >> dc_al  # arithmetic shift, per the DC point transform
            diff = v - prev
            prev = v
            t = _category(diff)
            length, code = dc_codes[t]
            w.write(code, length)
            if t:
                w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        return w.flush()

    out += sos(0, 0, 0, dc_al) + with_restarts(dc_first_seg)

    # DC refinement scans: one correction bit per block per bit plane
    for bit in range(dc_al - 1, -1, -1):

        def dc_refine_seg(chunk, _bit=bit) -> bytes:
            w = _BitWriter()
            for dc, _ac1 in chunk:
                w.write((dc >> _bit) & 1, 1)
            return w.flush()

        out += sos(0, 0, bit + 1, bit) + with_restarts(dc_refine_seg)

    # AC spectral-selection first scan (point transform ac_al, EOBRUN)
    def ac_first_seg(chunk) -> bytes:
        w = _BitWriter()
        pending = 0

        def flush_eob() -> None:
            nonlocal pending
            m = pending
            while m:
                chunk_ = min(m, 15)  # table carries EOB0..EOB3
                r = chunk_.bit_length() - 1
                length, code = ac_codes[r << 4]
                w.write(code, length)
                if r:
                    w.write(chunk_ - (1 << r), r)
                m -= chunk_
            pending = 0

        for _dc, ac1 in chunk:
            # AC point transform is sign-magnitude: sign · (|v| >> al)
            v = (1 if ac1 > 0 else -1) * (abs(ac1) >> ac_al) if ac1 else 0
            if v:
                flush_eob()
                t = _category(v)
                if t != 1:
                    raise ValueError("minimal AC table carries size-1 only")
                length, code = ac_codes[0x01]
                w.write(code, length)
                w.write(1 if v > 0 else 0, 1)
                pending = 1  # this block still needs its EOB terminator
            else:
                pending += 1
        flush_eob()
        return w.flush()

    out += sos(1, 63, 0, ac_al) + with_restarts(ac_first_seg)

    # AC successive-approximation refinement scans (Ah>0): per block,
    # either a newly visible ±(1<<bit) insertion (run/size 0/1 + sign),
    # or EOB0 followed by the correction bit of the already-visible
    # coefficient — the exact stream _refine_ac consumes.
    for bit in range(ac_al - 1, -1, -1):

        def ac_refine_seg(chunk, _bit=bit) -> bytes:
            w = _BitWriter()
            for _dc, ac1 in chunk:
                mag = abs(ac1)
                hist = mag >> (_bit + 1)
                cur = (mag >> _bit) & 1
                if hist == 0 and cur:  # newly visible at this bit plane
                    length, code = ac_codes[0x01]
                    w.write(code, length)
                    w.write(1 if ac1 > 0 else 0, 1)
                    length, code = ac_codes[0x00]  # EOB0 ends the block
                    w.write(code, length)
                elif hist:
                    length, code = ac_codes[0x00]
                    w.write(code, length)
                    w.write(cur, 1)  # correction bit after the EOB symbol
                else:
                    length, code = ac_codes[0x00]
                    w.write(code, length)
            return w.flush()

        out += sos(1, 63, bit + 1, bit) + with_restarts(ac_refine_seg)
    return out + b"\xff\xd9"


def encode_jpeg_ycbcr420(
    width: int,
    height: int,
    y_dc: int,
    cb_dc: int,
    cr_dc: int,
    q_dc: int = 8,
    restart_interval: int = 0,
) -> bytes:
    """Synthesize a constant-color 4:2:0 baseline JPEG (the standard
    camera layout: MCU = 2×2 luma blocks + 1 Cb + 1 Cr, all DC-only).
    With ``q_dc=8`` the planes decode to exactly (y_dc+128, cb_dc+128,
    cr_dc+128) before color conversion."""
    qtab = bytearray([16] * 64)
    qtab[0] = q_dc
    dqt = b"\x00" + bytes(qtab)
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid, hv in ((1, 0x22), (2, 0x11), (3, 0x11)):
        sof += struct.pack(">BBB", cid, hv, 0)
    dht_dc = bytes([0x00] + DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10] + AC_BITS) + bytes(AC_VALS)
    sos = struct.pack(">BB", 3, 1) + b"\x00" + struct.pack(">B", 2) + b"\x00"
    sos += struct.pack(">B", 3) + b"\x00" + struct.pack(">BBB", 0, 63, 0)

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    mcux = (width + 15) // 16
    mcuy = (height + 15) // 16
    scan = bytearray()
    w = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    rst = 0
    mcu = 0

    def _block(cid: int, dc: int) -> None:
        diff = dc - pred[cid]
        pred[cid] = dc
        t = _category(diff)
        length, code = dc_codes[t]
        w.write(code, length)
        if t:
            w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        length, code = ac_codes[0x00]
        w.write(code, length)

    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                scan.extend(w.flush())
                scan.extend(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                w = _BitWriter()
                pred = {1: 0, 2: 0, 3: 0}
            mcu += 1
            for _ in range(4):
                _block(1, y_dc)
            _block(2, cb_dc)
            _block(3, cr_dc)
    scan.extend(w.flush())

    out = b"\xff\xd8"
    segs = [(b"\xff\xdb", dqt), (b"\xff\xc0", sof)]
    if restart_interval:
        segs.append((b"\xff\xdd", struct.pack(">H", restart_interval)))
    segs += [(b"\xff\xc4", dht_dc), (b"\xff\xc4", dht_ac), (b"\xff\xda", sos)]
    for marker, seg in segs:
        out += marker + struct.pack(">H", len(seg) + 2) + seg
    return out + bytes(scan) + b"\xff\xd9"


def encode_jpeg_progressive_ycbcr420(
    width: int,
    height: int,
    y_dc: int,
    cb_dc: int,
    cr_dc: int,
    q_dc: int = 8,
    restart_interval: int = 0,
) -> bytes:
    """Synthesize a constant-color PROGRESSIVE (SOF2) 4:2:0 JPEG: one
    interleaved DC scan over 2×2-luma MCUs (optionally RSTn-split),
    then one all-EOB AC scan per component covering that component's
    OWN ceil(cw/8)×ceil(ch/8) block grid (not the padded MCU grid) —
    the layout combination real progressive camera files use. Decoded
    planes equal the baseline 4:2:0 encoding of the same DCs."""
    qtab = bytearray([16] * 64)
    qtab[0] = q_dc
    dqt = b"\x00" + bytes(qtab)
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid, hv in ((1, 0x22), (2, 0x11), (3, 0x11)):
        sof += struct.pack(">BBB", cid, hv, 0)
    dht_dc = bytes([0x00] + DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10] + PROG_AC_BITS) + bytes(PROG_AC_VALS)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)

    def seg(marker: bytes, body: bytes) -> bytes:
        return marker + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8" + seg(b"\xff\xdb", dqt) + seg(b"\xff\xc2", sof)
    out += seg(b"\xff\xc4", dht_dc) + seg(b"\xff\xc4", dht_ac)
    if restart_interval:
        out += seg(b"\xff\xdd", struct.pack(">H", restart_interval))

    # interleaved DC scan: 4 Y + 1 Cb + 1 Cr diffs per MCU
    mcux = (width + 15) // 16
    mcuy = (height + 15) // 16
    dcs = {1: y_dc, 2: cb_dc, 3: cr_dc}
    sos_dc = seg(
        b"\xff\xda",
        struct.pack(">B", 3)
        + b"".join(struct.pack(">BB", c, 0) for c in (1, 2, 3))
        + struct.pack(">BBB", 0, 0, 0),
    )
    scan = bytearray()
    w = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    rst = 0
    mcu = 0
    for _ in range(mcuy * mcux):
        if restart_interval and mcu and mcu % restart_interval == 0:
            scan.extend(w.flush())
            scan.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            w = _BitWriter()
            pred = {1: 0, 2: 0, 3: 0}
        mcu += 1
        for cid, nblocks in ((1, 4), (2, 1), (3, 1)):
            for _b in range(nblocks):
                diff = dcs[cid] - pred[cid]
                pred[cid] = dcs[cid]
                t = _category(diff)
                length, code = dc_codes[t]
                w.write(code, length)
                if t:
                    w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    scan.extend(w.flush())
    out += sos_dc + bytes(scan)

    # per-component AC scans: every block is zero → pure EOB runs over
    # the component's OWN block grid. DRI=0 first: the restart interval
    # applied to the DC scan above would otherwise make the decoder
    # expect RSTn segmentation here too (DRI legally changes per scan).
    if restart_interval:
        out += seg(b"\xff\xdd", struct.pack(">H", 0))
    for cid, hi, vi in ((1, 2, 2), (2, 1, 1), (3, 1, 1)):
        cw = (width * hi + 1) // 2
        ch = (height * vi + 1) // 2
        nblocks = ((cw + 7) // 8) * ((ch + 7) // 8)
        w = _BitWriter()
        m = nblocks
        while m:
            chunk = min(m, 15)  # table carries EOB0..EOB3
            r = chunk.bit_length() - 1
            length, code = ac_codes[r << 4]
            w.write(code, length)
            if r:
                w.write(chunk - (1 << r), r)
            m -= chunk
        out += seg(
            b"\xff\xda",
            struct.pack(">BBB", 1, cid, 0x00)
            + struct.pack(">BBB", 1, 63, 0),
        ) + w.flush()
    return out + b"\xff\xd9"


def _extract_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Byte-unstuffed entropy data from ``start``, split at RSTn markers.
    Returns (segments, next_pos) with next_pos at the terminating 0xFF."""
    n = len(payload)
    segments: list[bytes] = []
    raw = bytearray()
    i = start
    while i < n:
        b = payload[i]
        if b == 0xFF:
            nxt = payload[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                raw.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
                segments.append(bytes(raw))
                raw = bytearray()
                i += 2
                continue
            break
        raw.append(b)
        i += 1
    segments.append(bytes(raw))
    return segments, i


def _ycbcr_to_rgb(out_planes: list["np.ndarray"]) -> "np.ndarray":
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _refine_ac(coeffs_blk, reader, act, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement for ONE block (T.81
    G.1.2.3 / libjpeg decode_mcu_AC_refine): appends one correction bit
    to every already-nonzero coefficient in the band, inserts newly
    visible ±(1<<al) coefficients positioned by run lengths of
    ZERO-HISTORY coefficients, with EOB runs covering whole blocks whose
    remaining nonzero coefficients still receive correction bits.
    Returns the updated eobrun."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_huffman(act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:  # EOB run: this block ends after refinement
                    eobrun = (1 << r) + reader.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                newval = p1 if reader.read_bit() else -p1
            # advance over r zero-history coefficients, emitting a
            # correction bit for every nonzero-history one passed
            while k <= se:
                c = int(coeffs_blk[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        coeffs_blk[k] = c + (p1 if c >= 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coeffs_blk[k] = newval
            k += 1
    if eobrun > 0:
        # block inside an EOB run: only correction bits for the
        # remaining nonzero-history coefficients
        while k <= se:
            c = int(coeffs_blk[k])
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                coeffs_blk[k] = c + (p1 if c >= 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(sof, scans, qtabs) -> "np.ndarray":
    """Progressive JPEG (SOF2): coefficients accumulate across scans.

    Supported: spectral selection (separate DC and AC scans, EOBRUN
    coding), DC successive approximation (point transform + 1-bit
    refinement scans), AC successive-approximation refinement
    (correction-bit decoding, ``_refine_ac``), restart intervals (RSTn
    resets DC prediction / EOB run at each entropy-segment boundary),
    and SUBSAMPLED chroma (e.g. 4:2:0): interleaved DC scans walk
    hi×vi blocks per component per MCU over the PADDED block grid,
    non-interleaved AC scans walk only the component's own
    ceil(cw/8)×ceil(ch/8) blocks, planes upsample nearest-neighbor —
    the same layout rules as the baseline path."""
    w_, h, comps = sof
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    for _, hi, vi, _ in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError("non-integral chroma upsampling")
    mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    samp = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    # padded grid (interleaved scans cover it); own grid (AC scans)
    pad_dims = {cid: (mcuy * vi, mcux * hi) for cid, (hi, vi) in samp.items()}

    def own_dims(cid):
        hi, vi = samp[cid]
        cw = (w_ * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8, cw, ch

    coeffs = {
        cid: np.zeros((*pad_dims[cid], 64), dtype=np.int64)
        for cid, *_ in comps
    }
    for sc, ss, se, ah, al, segs, htabs, ri in scans:
        seg_iter = iter(segs)
        reader = _BitReader(next(seg_iter))
        mcu = 0

        def _maybe_restart(reset):
            nonlocal reader, mcu
            if ri and mcu and mcu % ri == 0:
                reader = _BitReader(next(seg_iter))
                reset()
            mcu += 1

        interleaved = len(sc) > 1
        if interleaved:
            # MCU walk: (my, mx) → per scan component, its vi×hi blocks
            def block_iter():
                for my in range(mcuy):
                    for mx in range(mcux):
                        yield [
                            (cid, dc_id, ac_id, my * samp[cid][1] + byy,
                             mx * samp[cid][0] + bxx)
                            for cid, dc_id, ac_id in sc
                            for byy in range(samp[cid][1])
                            for bxx in range(samp[cid][0])
                        ]
        else:
            cid0 = sc[0][0]
            nby_c, nbx_c, _, _ = own_dims(cid0)

            def block_iter():
                dc_id, ac_id = sc[0][1], sc[0][2]
                for by in range(nby_c):
                    for bx in range(nbx_c):
                        yield [(cid0, dc_id, ac_id, by, bx)]

        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            if ah == 0:
                pred = {cid: 0 for cid, _, _ in sc}

                def _reset_pred():
                    for c in pred:
                        pred[c] = 0

                for blocks in block_iter():
                    _maybe_restart(_reset_pred)
                    for cid, dc_id, _ac_id, by, bx in blocks:
                        t = reader.read_huffman(htabs[(0, dc_id)])
                        pred[cid] += _extend(reader.read_bits(t), t)
                        coeffs[cid][by, bx, 0] = pred[cid] << al
            else:  # DC refinement: one correction bit per block
                for blocks in block_iter():
                    _maybe_restart(lambda: None)
                    for cid, _dc_id, _ac_id, by, bx in blocks:
                        if reader.read_bit():
                            coeffs[cid][by, bx, 0] |= 1 << al
        else:  # AC scan: spec requires exactly one component
            if interleaved:
                raise ValueError("AC scan must be single-component")
            cid, _dc_id, ac_id = sc[0]
            act = htabs[(1, ac_id)]
            eobrun = 0

            def _reset_eobrun():
                nonlocal eobrun
                eobrun = 0

            if ah != 0:  # successive-approximation refinement scan
                for blocks in block_iter():
                    _maybe_restart(_reset_eobrun)
                    _cid, _d, _a, by, bx = blocks[0]
                    eobrun = _refine_ac(
                        coeffs[cid][by, bx], reader, act, ss, se, al,
                        eobrun,
                    )
                continue
            for blocks in block_iter():
                _maybe_restart(_reset_eobrun)
                _cid, _d, _a, by, bx = blocks[0]
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.read_huffman(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1 + reader.read_bits(r)
                        break
                    k += r
                    coeffs[cid][by, bx, k] = (
                        _extend(reader.read_bits(s), s) << al
                    )
                    k += 1

    qt_by_cid = {cid: tq for cid, _, _, tq in comps}
    out_planes = []
    for cid, hi, vi, _tq in comps:
        q = qtabs[qt_by_cid[cid]]
        nby_p, nbx_p = pad_dims[cid]
        _nby_c, _nbx_c, cw, ch = own_dims(cid)
        plane = np.zeros((nby_p * 8, nbx_p * 8), dtype=np.float64)
        for by in range(nby_p):
            for bx in range(nbx_p):
                dq = coeffs[cid][by, bx] * q
                block = np.zeros((8, 8), dtype=np.float64)
                for idx, (rr, cc) in enumerate(ZIGZAG):
                    block[rr, cc] = dq[idx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ block @ _C + 128.0
                )
        p = plane[:ch, :cw]
        if hi != hmax or vi != vmax:  # nearest-neighbor chroma upsample
            p = p.repeat(vmax // vi, axis=0).repeat(hmax // hi, axis=1)
        out_planes.append(np.clip(np.round(p[:h, :w_]), 0, 255))
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)
    if len(out_planes) == 3:
        return _ycbcr_to_rgb(out_planes)
    raise NotImplementedError("unsupported component count")


def decode_jpeg_pixels(payload: bytes) -> "np.ndarray":
    """Decode a baseline JPEG to uint8 pixels — (h, w) for grayscale,
    (h, w, 3) RGB for 3-component YCbCr. See module docstring for the
    supported envelope; outside it raises ``NotImplementedError``."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(payload)
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    progressive = False
    lossless = False
    lossless_precision = 8
    scans: list[tuple] = []
    restart_interval = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(body[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tab = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    )
                    i += 128
                qtabs[tq] = tab.astype(np.int64)
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                htabs[(tc, th)] = _decode_map(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2 DCT, SOF3 lossless
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            precision, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if lossless:
                if not 2 <= precision <= 16:
                    raise ValueError("invalid lossless precision")
                lossless_precision = precision
            elif precision != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack(
                    ">BBB", body[6 + 3 * c : 9 + 3 * c]
                )
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                if nc == 1 and hv != 0x11:
                    # non-interleaved single-component scans use MCU =
                    # one block regardless of declared factors
                    hi = vi = 1
                comps.append((cid, hi, vi, tq))
            sof = (w_, h, comps)
        elif 0xC5 <= marker <= 0xCF and marker not in (0xC8, 0xCC):
            raise NotImplementedError("hierarchical/arithmetic JPEG")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sc = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            segs, pos = _extract_entropy(payload, pos + 2 + seg_len)
            scans.append(
                (sc, ss, se, ah, al, segs, dict(htabs), restart_interval)
            )
            continue
        pos += 2 + seg_len
    if sof is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")

    if lossless:
        w_, h, comps = sof
        return _decode_lossless(w_, h, comps, lossless_precision, scans)

    if progressive:
        return _decode_progressive(sof, scans, qtabs)

    w_, h, comps = sof
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    for _, hi, vi, _ in comps:
        if hmax % hi or vmax % vi:
            raise NotImplementedError("non-integral chroma upsampling")
    mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
        for cid, hi, vi, _ in comps
    }
    samp_by_cid = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    qt_by_cid = {cid: tq for cid, _, _, tq in comps}

    def _read_block(reader, dct, act, q, cid, pred):
        coeff = np.zeros(64, dtype=np.int64)
        t = reader.read_huffman(dct)
        pred[cid] += _extend(reader.read_bits(t), t)
        coeff[0] = pred[cid]
        k = 1
        while k < 64:
            rs = reader.read_huffman(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                break  # EOB
            k += r
            coeff[k] = _extend(reader.read_bits(s), s)
            k += 1
        block = np.zeros((8, 8), dtype=np.float64)
        dq = coeff * q
        for idx, (rr, cc) in enumerate(ZIGZAG):
            block[rr, cc] = dq[idx]
        return _C.T @ block @ _C + 128.0

    # A baseline image is one interleaved scan OR a sequence of scans
    # (commonly one non-interleaved scan per component) — decode each
    # into the shared planes; every scan restarts its own predictors
    # and restart-marker segmentation.
    covered: set[int] = set()
    sof_ids = {c[0] for c in comps}
    for scan in scans:
        scan_comps, ss, se, ah, al, segments, htabs, restart_interval = scan
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError(
                "baseline scan carries progressive spectral/approximation "
                f"parameters (ss={ss}, se={se}, ah={ah}, al={al})"
            )
        unknown = {cid for cid, _, _ in scan_comps} - sof_ids
        if unknown:
            raise ValueError(
                f"baseline scan references component ids {sorted(unknown)} "
                "absent from the SOF"
            )
        covered.update(cid for cid, _, _ in scan_comps)
        seg_iter = iter(segments)
        reader = _BitReader(next(seg_iter))
        pred = {cid: 0 for cid, _, _ in scan_comps}
        if len(scan_comps) == 1:
            # non-interleaved: MCU = one block over the COMPONENT's own
            # block grid (its plane dims scaled by its sampling factors)
            cid, dc_id, ac_id = scan_comps[0]
            dct, act = htabs[(0, dc_id)], htabs[(1, ac_id)]
            q = qtabs[qt_by_cid[cid]]
            hi, vi = samp_by_cid[cid]
            cw = -(-w_ * hi // hmax)
            ch = -(-h * vi // vmax)
            nbx, nby = -(-cw // 8), -(-ch // 8)
            blk = 0
            for by in range(nby):
                for bx in range(nbx):
                    if restart_interval and blk and blk % restart_interval == 0:
                        reader = _BitReader(next(seg_iter))
                        pred = {cid: 0}
                    blk += 1
                    spatial = _read_block(reader, dct, act, q, cid, pred)
                    planes[cid][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        spatial
                    )
        else:
            tables_by_cid = {cid: (dc, ac) for cid, dc, ac in scan_comps}
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        reader = _BitReader(next(seg_iter))
                        pred = {cid: 0 for cid, _, _ in scan_comps}
                    mcu += 1
                    for cid, _dc_id, _ac_id in scan_comps:
                        dc_id, ac_id = tables_by_cid[cid]
                        dct = htabs[(0, dc_id)]
                        act = htabs[(1, ac_id)]
                        q = qtabs[qt_by_cid[cid]]
                        hi, vi = samp_by_cid[cid]
                        for byy in range(vi):
                            for bxx in range(hi):
                                spatial = _read_block(
                                    reader, dct, act, q, cid, pred
                                )
                                r0 = my * 8 * vi + byy * 8
                                c0 = mx * 8 * hi + bxx * 8
                                planes[cid][r0 : r0 + 8, c0 : c0 + 8] = (
                                    spatial
                                )
    if covered != {c[0] for c in comps}:
        raise NotImplementedError(
            "baseline scans do not cover all SOF components"
        )

    out_planes = []
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        if hi != hmax or vi != vmax:  # nearest-neighbor chroma upsample
            p = p.repeat(vmax // vi, axis=0).repeat(hmax // hi, axis=1)
        out_planes.append(np.clip(np.round(p[:h, :w_]), 0, 255))
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)
    if len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.clip(
            np.round(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)
    raise NotImplementedError("unsupported component count")
