"""VP8L codec: decoder-path edge cases beyond the oracle entry.

The catalog entry (multimodal_webp) hash-verifies every encoding
variant end-to-end at corpus scale; these pin the codec-level details —
each predictor mode, palette packing widths, cache/meta/cross-color
paths, container walking, and envelope rejections.
"""

from __future__ import annotations

import struct

import pytest

from simple_data_engineering_project_spark.operators.webp import (
    decode_webp_pixels,
    encode_webp_lossless,
)


def _img(w, h, f):
    return [[f(x, y) for x in range(w)] for y in range(h)]


def _roundtrip(rows, **kw):
    arr = decode_webp_pixels(encode_webp_lossless(rows, **kw))
    h, w = len(rows), len(rows[0])
    assert arr.shape == (h, w, 4)
    for y in range(h):
        for x in range(w):
            px = rows[y][x]
            want = ((px >> 16) & 255, (px >> 8) & 255, px & 255, px >> 24)
            assert tuple(int(v) for v in arr[y, x]) == want, (x, y, kw)


GRADIENT = _img(
    11,
    8,
    lambda x, y: 0xFF000000
    | ((x * 29 + y * 13) % 256) << 16
    | ((x * 7) % 256) << 8
    | ((y * 41) % 256),
)


def test_literals_and_simple_codes():
    _roundtrip(GRADIENT)
    _roundtrip(_img(10, 4, lambda x, y: 0xFF112233 if (x + y) % 2 else 0xFF445566))
    _roundtrip([[0xFF123456]])  # 1×1
    _roundtrip(_img(300, 2, lambda x, y: 0xFF000000 | (x % 256) << 8))  # wide


def test_lz77_runs_through_distance_map():
    # "previous pixel" is distance VALUE 2 — codes ≤120 go through the
    # 2D neighborhood map whose entry (1,0)=dist 1 sits at index 2; a
    # raw value 1 would mean "pixel above" (entry (0,1))
    _roundtrip(
        _img(16, 6, lambda x, y: 0xFF000000 | (0x101010 * ((x // 5 + y // 3) % 4))),
        lz77_runs=True,
    )
    _roundtrip(
        _img(64, 9, lambda x, y: 0xFF000000 | (0x123456 if y < 5 else 0x654321)),
        lz77_runs=True,
    )


def test_every_predictor_mode():
    for mode in range(14):
        _roundtrip(GRADIENT, predictor_mode=mode)


def test_subtract_green_and_cross_color():
    _roundtrip(GRADIENT, subtract_green=True)
    _roundtrip(GRADIENT, cross_color=(23, -45, 101))
    _roundtrip(GRADIENT, cross_color=(-3, 17, -77), subtract_green=True)


def test_palette_all_packing_widths():
    # ≤2 colors → 8 px/byte, ≤4 → 4, ≤16 → 2, >16 → 1 (no packing)
    _roundtrip(_img(10, 5, lambda x, y: 0xFF111111 if (x + y) % 2 else 0xFF222222),
               palette=True)
    _roundtrip(
        _img(11, 6, lambda x, y: [0xFF111111, 0xFF223344, 0xFF556677,
                                  0xFF000000][(x + 2 * y) % 4]),
        palette=True,
    )
    _roundtrip(_img(9, 9, lambda x, y: 0xFF000000 | ((x * y) % 13) * 0x050301),
               palette=True)
    _roundtrip(
        _img(20, 15, lambda x, y: 0xFF000000 | ((x * 16 + y * 7) % 200) * 0x010203),
        palette=True,
    )


def test_color_cache_and_meta_groups():
    _roundtrip(
        _img(14, 8, lambda x, y: 0xFF000000 | (0x111111 * ((x * x + y) % 5))),
        color_cache_bits=6,
    )
    _roundtrip(
        _img(24, 12, lambda x, y: 0xFF000000 | ((x * 29 + y * 13) % 256) << 16),
        meta_tile_bits=3,
    )
    # combined, incl. the single-meta-tile case (decoder sizes its group
    # list from the meta image's max index)
    _roundtrip(
        _img(3, 2, lambda x, y: 0xFF000000 | (0x111111 * (x % 3))),
        color_cache_bits=5, meta_tile_bits=2, lz77_runs=True,
    )
    _roundtrip(
        _img(24, 12, lambda x, y: 0xFF000000 | (0x111111 * ((x // 3 + y // 2) % 6))),
        color_cache_bits=5, meta_tile_bits=2, lz77_runs=True,
    )


def test_vp8x_container_walk():
    # extended WebP layout: VP8X header chunk before VP8L — the RIFF
    # walk must skip to the lossless chunk
    plain = encode_webp_lossless([[0xFF010203, 0xFF040506]])
    vp8l = plain[20 : 20 + int.from_bytes(plain[16:20], "little")]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) % 2:
        body += b"\x00"
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    arr = decode_webp_pixels(payload)
    assert tuple(int(v) for v in arr[0, 0]) == (1, 2, 3, 255)
    assert tuple(int(v) for v in arr[0, 1]) == (4, 5, 6, 255)


def test_lossy_vp8_raises():
    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp_pixels(payload)
    with pytest.raises(ValueError):
        decode_webp_pixels(b"BM not a webp")
