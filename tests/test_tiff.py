"""TIFF codec pins beyond the oracle entry: LZW width boundaries,
PackBits edge runs, strip layouts, and envelope rejections."""

from __future__ import annotations

import numpy as np
import pytest

from simple_data_engineering_project_spark.operators.tiff import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_tiff_pixels,
    encode_tiff,
)


def _gray(w, h, f):
    return np.array(
        [[f(x, y) % 256 for x in range(w)] for y in range(h)], dtype=np.uint8
    )


@pytest.mark.parametrize("comp", [1, 32773, 5])
@pytest.mark.parametrize("be", [False, True])
def test_roundtrip_gray_and_rgb(comp, be):
    g = _gray(33, 21, lambda x, y: x * 3 + y)
    assert (decode_tiff_pixels(encode_tiff(g, compression=comp, big_endian=be)) == g).all()
    rgb = np.stack([g, (g * 2) % 256, (g + 7) % 256], axis=-1).astype(np.uint8)
    back = decode_tiff_pixels(encode_tiff(rgb, compression=comp, big_endian=be))
    assert back.shape == rgb.shape and (back == rgb).all()


def test_strip_heights_including_single_row():
    g = _gray(10, 10, lambda x, y: x * y)
    for rps in (1, 3, 8, 64):
        assert (decode_tiff_pixels(encode_tiff(g, rows_per_strip=rps)) == g).all()


def test_lzw_width_boundaries_and_table_reset():
    # noisy content crosses 9→10→11→12-bit widths and the 4094 reset —
    # the exact libtiff EarlyChange boundaries an off-by-one would break
    g = _gray(250, 200, lambda x, y: x * 131 + y * 241 + x * y * 17)
    assert (decode_tiff_pixels(encode_tiff(g, compression=5)) == g).all()
    # raw stream round-trip at arbitrary byte content
    blob = bytes((i * 97 + (i >> 3) * 31) % 256 for i in range(20000))
    assert _tiff_lzw_decode(_tiff_lzw_encode(blob)) == blob


def test_packbits_edge_runs():
    for blob in (
        b"",
        b"\x00",
        b"a" * 200,  # long run splits at 128
        bytes(range(200)),  # pure literals split at 128
        b"ab" * 100 + b"c" * 5 + b"de",
    ):
        assert _packbits_decode(_packbits_encode(blob)) == blob


def test_envelope_rejections():
    g = _gray(8, 8, lambda x, y: x + y)
    p = bytearray(encode_tiff(g))
    # flip the compression SHORT (tag 259) to CCITT G4 (4)
    import struct

    (ifd_off,) = struct.unpack("<I", p[4:8])
    (n,) = struct.unpack("<H", p[ifd_off : ifd_off + 2])
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if struct.unpack("<H", p[off : off + 2])[0] == 259:
            struct.pack_into("<H", p, off + 8, 4)
    with pytest.raises(NotImplementedError, match="compression 4"):
        decode_tiff_pixels(bytes(p))
    with pytest.raises(ValueError):
        decode_tiff_pixels(b"GIF89a not a tiff")
