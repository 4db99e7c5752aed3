"""TFRecord pins: published CRC-32C vector, tamper detection, proto
round trips."""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.operators.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    read_tfrecords,
    write_tfrecords,
)


def test_crc32c_published_vectors():
    # the canonical Castagnoli check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 appendix vector


def test_framing_roundtrip_and_tamper_detection():
    recs = [b"hello", b"", b"x" * 1000, bytes(range(256))]
    p = write_tfrecords(recs)
    assert read_tfrecords(p) == recs
    data_flip = bytearray(p)
    data_flip[20] ^= 1  # inside the first payload
    with pytest.raises(ValueError, match="CRC"):
        read_tfrecords(bytes(data_flip))
    len_flip = bytearray(p)
    len_flip[0] ^= 1  # inside the first length field
    with pytest.raises(ValueError, match="CRC"):
        read_tfrecords(bytes(len_flip))


def test_example_proto_roundtrip():
    ex = {"text": b"some document \x00\xff", "label": 300, "emb": [0.5, -1.25]}
    dec = decode_example(encode_example(ex))
    assert dec["text"] == ex["text"]
    assert dec["label"] == 300  # multi-byte varint
    assert dec["emb"] == [0.5, -1.25]


def test_gzipped_tfrecord_file():
    # TFDS commonly ships .tfrecord.gz (whole-file gzip); detected by
    # magic and inflated before the CRC-framed walk
    from simple_data_engineering_project_spark.operators.tfrecord import (
        read_tfrecords,
        write_tfrecords,
    )

    recs = [b"alpha", b"b" * 300, b""]
    blob = write_tfrecords(recs, gzipped=True)
    assert blob[:2] == b"\x1f\x8b"
    assert read_tfrecords(blob) == recs


def test_multi_member_gzip_and_length_collision():
    from simple_data_engineering_project_spark.operators.tfrecord import (
        read_tfrecords,
        write_tfrecords,
    )

    # concatenated gzip members (appending writers) must ALL decode
    blob = write_tfrecords([b"first"], gzipped=True) + write_tfrecords(
        [b"second", b"third"], gzipped=True
    )
    assert read_tfrecords(blob) == [b"first", b"second", b"third"]
    # a plain file whose first record length is 0x8B1F starts with the
    # gzip magic bytes — must fall back to the CRC walk, not crash
    big = b"x" * 0x8B1F
    assert read_tfrecords(write_tfrecords([big])) == [big]


def test_truncated_gzip_raises_gzip_error_not_crc(tmp_path=None):
    """ADVICE r8 #1 regression: a truncated/corrupt .tfrecord.gz must
    surface as a gzip decode error, NOT be silently retried as an
    uncompressed file and fail later with a misleading CRC message."""
    from simple_data_engineering_project_spark.operators.tfrecord import (
        read_tfrecords,
        write_tfrecords,
    )

    blob = write_tfrecords([b"payload-one", b"payload-two"], gzipped=True)
    truncated = blob[: len(blob) // 2]
    with pytest.raises(ValueError, match="corrupt gzipped TFRecord"):
        read_tfrecords(truncated)
    # bit-flip in the deflate stream: same contract
    corrupt = bytearray(blob)
    corrupt[len(corrupt) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt gzipped TFRecord"):
        read_tfrecords(bytes(corrupt))


def test_full_three_byte_magic_collision_falls_back():
    """A legal UNCOMPRESSED file whose first record length spells the
    full 3-byte gzip magic (length & 0xFFFFFF == 0x088B1F) triggers the
    sniff, fails inflate, and must fall back to the raw CRC walk —
    proven by its valid masked length-CRC header."""
    from simple_data_engineering_project_spark.operators.tfrecord import (
        read_tfrecords,
        write_tfrecords,
    )

    big = b"z" * 0x088B1F  # 559,903 bytes => header starts 1f 8b 08
    blob = write_tfrecords([big, b"tail"])
    assert blob[:3] == b"\x1f\x8b\x08"
    assert read_tfrecords(blob) == [big, b"tail"]
