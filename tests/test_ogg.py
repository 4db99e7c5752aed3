"""Ogg container pins beyond the oracle entry: the published CRC
anchor, lacing/continuation round-trips, tamper and truncation
detection, and the granule-bucket sampling rule."""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.operators.ogg import (
    encode_ogg,
    ogg_crc,
    parse_ogg,
    sample_ogg_packets,
)


def test_crc_published_anchor():
    # CRC-32/POSIX (cksum) check value for b"123456789" is 0x765E7680
    # AFTER its final complement; the Ogg variant omits the complement.
    assert ogg_crc(b"123456789") == 0x765E7680 ^ 0xFFFFFFFF


def test_roundtrip_one_packet_per_page():
    pk = [(bytes([i]) * 50, (i + 1) * 24000) for i in range(6)]
    assert parse_ogg(encode_ogg(pk)) == [(g, d) for d, g in pk]


def test_roundtrip_multi_packet_pages_and_long_lacing():
    # >255-byte packets need multiple lacing values; an exact
    # 255-multiple needs a trailing 0 lacing value
    pk = [(b"A" * 300, 10), (b"B" * 510, 20), (b"C" * 10, 30), (b"", 40)]
    for per_page in (1, 2, 4):
        got = parse_ogg(encode_ogg(pk, packets_per_page=per_page))
        assert [d for _g, d in got] == [d for d, _ in pk], per_page


def test_packet_continued_across_pages():
    pk = [(b"Z" * 700, 99)]
    blob = encode_ogg(pk, split_at=510)
    assert parse_ogg(blob) == [(99, b"Z" * 700)]
    # the first page of a split packet completes nothing: granule -1
    assert blob[6:14] == (-1).to_bytes(8, "little", signed=True)


def test_tamper_and_truncation_detected():
    pk = [(bytes([i]) * 40, i * 100) for i in range(4)]
    good = encode_ogg(pk)
    bad = bytearray(good)
    bad[-3] ^= 1  # body byte flip -> page CRC
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(bad))
    # drop a middle page -> sequence gap
    pages = []
    pos = 0
    while pos < len(good):
        nsegs = good[pos + 26]
        body = sum(good[pos + 27 : pos + 27 + nsegs])
        end = pos + 27 + nsegs + body
        pages.append(good[pos:end])
        pos = end
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg(pages[0] + pages[2] + pages[3])
    # stream ending inside a continued packet
    split = encode_ogg([(b"Q" * 700, 5)], split_at=510)
    first_page_end = 27 + split[26] + sum(split[27 : 27 + split[26]])
    with pytest.raises(ValueError, match="mid-packet"):
        parse_ogg(split[:first_page_end])
    with pytest.raises(ValueError):
        parse_ogg(b"RIFF not ogg")


def test_granule_bucket_sampling():
    # granule i*24000 at 48 kHz = 500 ms steps; first per 1000 ms
    # bucket keeps the even packets
    pk = [(bytes([65 + i]) * 8, i * 24000) for i in range(8)]
    sam = sample_ogg_packets(encode_ogg(pk), every_ms=1000, rate=48000)
    assert sam == [bytes([65 + i]) * 8 for i in (0, 2, 4, 6)]
