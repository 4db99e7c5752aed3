"""EXIF pins beyond the oracle entry: exact APP1 byte anchors in both
byte orders (encoder and decoder are not merely self-consistent),
offset-vs-inline value handling, and carrier-JPEG integrity."""

from __future__ import annotations

import struct

import pytest

from simple_data_engineering_project_spark.operators.exif import (
    build_exif_app1,
    encode_exif_jpeg,
    parse_exif,
)
from simple_data_engineering_project_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_blocks,
)


def test_app1_byte_anchor_little_endian():
    # one inline SHORT: the 12-byte entry layout is pinned bytewise
    app1 = build_exif_app1(ifd0=[(0x0112, 3, 6)], byte_order="II")
    assert app1[:2] == b"\xff\xe1"
    (seg_len,) = struct.unpack(">H", app1[2:4])
    assert seg_len + 2 == len(app1)
    assert app1[4:10] == b"Exif\x00\x00"
    tiff = app1[10:]
    # header: II, magic 42, IFD0 at 8
    assert tiff[:8] == b"II\x2a\x00\x08\x00\x00\x00"
    # IFD0: count=1, entry(tag=0x0112, type=3, cnt=1, value=6 inline,
    # padded), next-IFD=0
    assert tiff[8:10] == b"\x01\x00"
    assert tiff[10:22] == (
        b"\x12\x01" + b"\x03\x00" + b"\x01\x00\x00\x00"
        + b"\x06\x00" + b"\x00\x00"
    )
    assert tiff[22:26] == b"\x00\x00\x00\x00"


def test_app1_byte_anchor_big_endian():
    app1 = build_exif_app1(ifd0=[(0x0112, 3, 6)], byte_order="MM")
    tiff = app1[10:]
    assert tiff[:8] == b"MM\x00\x2a\x00\x00\x00\x08"
    assert tiff[8:10] == b"\x00\x01"
    # NOTE the inline-value rule: a SHORT occupies the FIRST two bytes
    # of the 4-byte value slot in either byte order
    assert tiff[10:22] == (
        b"\x01\x12" + b"\x00\x03" + b"\x00\x00\x00\x01"
        + b"\x00\x06" + b"\x00\x00"
    )


@pytest.mark.parametrize("order", ["II", "MM"])
def test_roundtrip_with_indirect_values(order):
    base = encode_jpeg_blocks(8, 8, [(10, 0)])
    app1 = build_exif_app1(
        ifd0=[(0x0112, 3, 5), (0x010F, 2, "CamCo"), (0x0110, 2, "M-17")],
        exif_ifd=[
            (0x8827, 3, 400), (0x829A, 5, (1, 250)),
            (0xA002, 4, 640), (0xA003, 4, 480),
        ],
        byte_order=order,
    )
    tags = parse_exif(encode_exif_jpeg(base, app1))
    assert tags[0x0112] == 5
    assert tags[0x010F] == "CamCo"  # 6 bytes with NUL -> indirect
    assert tags[0x0110] == "M-17"  # 5 bytes with NUL -> indirect
    assert tags[0x8827] == 400
    assert tags[0x829A] == (1, 250)  # RATIONAL: always indirect
    assert (tags[0xA002], tags[0xA003]) == (640, 480)
    # APP1 insertion must not disturb the entropy stream
    assert int(decode_jpeg_pixels(encode_exif_jpeg(base, app1)).sum()) == (
        64 * 138
    )


def test_no_exif_raises():
    with pytest.raises(ValueError, match="no EXIF"):
        parse_exif(encode_jpeg_blocks(8, 8, [(0, 0)]))
    with pytest.raises(ValueError, match="JPEG"):
        parse_exif(b"II not a jpeg")
