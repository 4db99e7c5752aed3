"""Compressed-audio codecs for WAV containers, pure stdlib (SURVEY §2 C5).

Real decoders for the three compressed encodings that actually ship
inside RIFF/WAVE files (Python's ``wave`` module is PCM-only, so the
container is parsed by hand here):

- **G.711 μ-law** (format tag 0x0007): 8-bit logarithmic companding,
  the telephony/voice-corpus staple. Decode is pure integer arithmetic
  — ``((mant·8 + 132) << exp) − 132`` with the complemented code — so a
  SQL oracle can predict decoded sample sums without any codec.
- **G.711 A-law** (format tag 0x0006): the E1-world sibling, codes
  XORed with 0x55, piecewise-linear segment expansion.
- **IMA/DVI ADPCM** (format tag 0x0011): 4-bit differential coding with
  the 89-entry step table and per-block (predictor, step-index)
  headers; nibbles decode low-first. Lossy and stateful, so it is
  unit-pinned (exact decode of hand-built nibble streams + SNR bound on
  encode→decode round trips) rather than SQL-oracled.

Compressed *psychoacoustic* codecs (MP3/AAC/Opus/Vorbis) remain honest
``NotImplementedError`` stubs — they need real DSP libraries.
(∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------- G.711

_BIAS = 0x84
_CLIP = 32635


def mulaw_decode_byte(code: int) -> int:
    """One μ-law code byte → linear int16 sample (ITU-T G.711)."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + _BIAS) << ((u >> 4) & 0x07)
    return (_BIAS - t) if (u & 0x80) else (t - _BIAS)


def mulaw_encode_sample(sample: int) -> int:
    s = sample
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    if s > _CLIP:
        s = _CLIP
    s += _BIAS
    exp = s.bit_length() - 8  # highest set bit above the 7-bit mantissa
    if exp < 0:
        exp = 0
    mant = (s >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def alaw_decode_byte(code: int) -> int:
    """One A-law code byte → linear int16 sample (ITU-T G.711; the sign
    bit — SET after the 0x55 XOR — marks POSITIVE, inverted vs μ-law)."""
    a = code ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    if seg == 0:
        t += 8
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def alaw_encode_sample(sample: int) -> int:
    """int16 sample → A-law code (classic 13-bit segment search)."""
    s = sample >> 3  # 16-bit → 13-bit magnitude domain
    if s >= 0:
        mask = 0xD5  # sign bit set (positive)
    else:
        mask = 0x55
        s = -s - 1
    seg = 0
    for bound in (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF):
        if s <= bound:
            break
        seg += 1
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (s >> 1) & 0x0F if seg < 2 else (s >> seg) & 0x0F
    return aval ^ mask


# ----------------------------------------------------------- IMA ADPCM

_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    step = _STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + _INDEX_TABLE[nibble & 7]))
    return pred, index


def ima_adpcm_decode(data: bytes, block_align: int) -> list[int]:
    """Decode mono IMA-ADPCM WAV data blocks to int16 samples.

    Each block: 4-byte header (int16 predictor = the block's first
    OUTPUT sample, uint8 step index, reserved), then 4-bit nibbles, low
    nibble of each byte first."""
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            break
        pred = struct.unpack("<h", block[0:2])[0]
        index = min(88, block[2])
        out.append(pred)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                pred, index = _ima_step(pred, index, nibble)
                out.append(pred)
    return out


def ima_adpcm_encode(samples: list[int], block_align: int = 256) -> bytes:
    """Greedy IMA-ADPCM encoder (standard nibble quantization)."""
    out = bytearray()
    spb = (block_align - 4) * 2 + 1  # samples per mono block
    i = 0
    index = 0
    while i < len(samples):
        chunk = samples[i : i + spb]
        i += spb
        pred = chunk[0]
        out += struct.pack("<hBB", pred, index, 0)
        nibbles: list[int] = []
        for s in chunk[1:]:
            step = _STEP_TABLE[index]
            diff = s - pred
            nibble = 0
            if diff < 0:
                nibble = 8
                diff = -diff
            if diff >= step:
                nibble |= 4
                diff -= step
            if diff >= step >> 1:
                nibble |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nibble |= 1
            pred, index = _ima_step(pred, index, nibble)
            nibbles.append(nibble)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        # a short final block is legal — no padding to block_align
    return bytes(out)


# ------------------------------------------------------- WAV container

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011


def encode_wav_compressed(
    codes: bytes, fmt: int, framerate: int = 8000, block_align: int | None = None
) -> bytes:
    """RIFF/WAVE wrapper for pre-encoded mono audio bytes: G.711 laws
    (one byte per sample) or IMA-ADPCM blocks (block_align required)."""
    if fmt in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        ba, bits, n_samples = 1, 8, len(codes)
        avg = framerate
    elif fmt == WAVE_FORMAT_IMA_ADPCM:
        if block_align is None:
            raise ValueError("IMA ADPCM needs block_align")
        ba, bits = block_align, 4
        n_blocks = (len(codes) + ba - 1) // ba
        n_samples = n_blocks * ((ba - 4) * 2 + 1)
        avg = framerate * ba // ((ba - 4) * 2 + 1)
    else:
        raise ValueError("use the wave module for PCM")
    fmt_body = struct.pack("<HHIIHH", fmt, 1, framerate, avg, ba, bits)
    if fmt == WAVE_FORMAT_IMA_ADPCM:
        fmt_body += struct.pack("<HH", 2, (ba - 4) * 2 + 1)  # cbSize+spb
    fact = b"fact" + struct.pack("<II", 4, n_samples)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + fact
        + b"data" + struct.pack("<I", len(codes)) + codes
        + (b"\x00" if len(codes) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_compressed(payload: bytes) -> dict:
    """Parse a RIFF/WAVE file and decode its samples: PCM16 passthrough,
    G.711 μ-law/A-law, IMA ADPCM. Returns {format, framerate, n_samples,
    samples}. Unknown compressed formats (MP3-in-WAV etc.) raise
    NotImplementedError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    off = 12
    fmt = None
    data = None
    framerate = block_align = 0
    while off + 8 <= len(payload):
        tag = payload[off : off + 4]
        size = int.from_bytes(payload[off + 4 : off + 8], "little")
        body = payload[off + 8 : off + 8 + size]
        if tag == b"fmt ":
            fmt, _ch, framerate, _avg, block_align, _bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif tag == b"data":
            data = body
        off += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data")
    if _ch != 1:
        # interleaved multi-channel G.711 would silently merge L/R into
        # one stream and stereo IMA-ADPCM's per-channel word layout
        # would decode as garbage — honest envelope instead
        raise NotImplementedError("multi-channel compressed WAVE")
    if fmt == WAVE_FORMAT_PCM:
        samples = [
            struct.unpack("<h", data[i : i + 2])[0]
            for i in range(0, len(data) - 1, 2)
        ]
    elif fmt == WAVE_FORMAT_MULAW:
        samples = [mulaw_decode_byte(b) for b in data]
    elif fmt == WAVE_FORMAT_ALAW:
        samples = [alaw_decode_byte(b) for b in data]
    elif fmt == WAVE_FORMAT_IMA_ADPCM:
        samples = ima_adpcm_decode(data, block_align)
    else:
        raise NotImplementedError(
            f"WAVE format 0x{fmt:04x} needs a codec library "
            "(G.711/IMA-ADPCM/PCM decode here)"
        )
    return {
        "format": fmt,
        "framerate": framerate,
        "n_samples": len(samples),
        "samples": samples,
    }
