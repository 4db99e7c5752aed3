"""TFRecord shard reading in pure stdlib (SURVEY §2 C4/C5).

TensorFlow-lineage corpora (TFDS, C4's original release, many vision
sets) ship as TFRecord: length-delimited records framed as

    uint64le length | uint32le masked_crc32c(length) |
    payload          | uint32le masked_crc32c(payload)

with CRC-32C (Castagnoli polynomial, reflected) masked by the rotation
``((crc >> 15) | (crc << 17)) + 0xa282ead8``. Both CRCs verify on read
— a corrupt shard must fail loudly, not yield truncated corpora.

Payloads are opaque bytes (normally serialized ``tf.train.Example``
protos); this module also speaks the tiny proto subset those use —
field 1 of ``Example`` is a ``Features`` message whose map entries hold
(name, bytes_list/int64_list/float_list) — enough to round-trip the
text + label features an LLM data pipeline stores, without any
TensorFlow dependency. (∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import struct


def _make_crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    t = _CRC32C_TABLE
    for b in data:
        crc = (crc >> 8) ^ t[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def read_tfrecords(payload: bytes) -> list[bytes]:
    """All record payloads, with both CRC-32Cs verified per record.
    Whole-file gzip (TFRecordOptions compression_type='GZIP', the
    common TFDS shipping form) is detected by magic and inflated —
    including MULTI-MEMBER .gz files (appending writers concatenate
    gzip members; a one-shot decompress would silently drop every
    record after the first member). The sniff checks the CM byte too
    and falls back to the plain walk on inflate failure: a legal
    uncompressed file whose first record length is 0x8B1F + k*2^16
    starts with the same two magic bytes."""
    if payload[:3] == b"\x1f\x8b\x08":
        from .shards import gunzip_members

        try:
            payload = gunzip_members(payload)
        except Exception as exc:
            # Fall back to the raw walk ONLY for the documented
            # collision (a legal uncompressed file whose first length
            # field spells the gzip magic): its header must pass the
            # masked length-CRC. A genuinely corrupt/truncated .gz has
            # no valid raw header, so the gzip error propagates instead
            # of surfacing later as a misleading CRC error on
            # compressed bytes.
            hdr = payload[:12]
            if len(hdr) < 12 or _masked(crc32c(hdr[:8])) != struct.unpack(
                "<I", hdr[8:12]
            )[0]:
                raise ValueError(f"corrupt gzipped TFRecord: {exc}") from exc
    out = []
    pos = 0
    n = len(payload)
    while pos < n:
        header = payload[pos : pos + 12]
        if len(header) < 12:
            raise ValueError("truncated TFRecord header")
        (length,) = struct.unpack("<Q", header[:8])
        (len_crc,) = struct.unpack("<I", header[8:12])
        if _masked(crc32c(header[:8])) != len_crc:
            raise ValueError("TFRecord length CRC mismatch")
        data = payload[pos + 12 : pos + 12 + length]
        (data_crc,) = struct.unpack(
            "<I", payload[pos + 12 + length : pos + 16 + length]
        )
        if _masked(crc32c(data)) != data_crc:
            raise ValueError("TFRecord data CRC mismatch")
        out.append(data)
        pos += 16 + length
    return out


def write_tfrecords(records: list[bytes], gzipped: bool = False) -> bytes:
    out = bytearray()
    for data in records:
        length = struct.pack("<Q", len(data))
        out += length
        out += struct.pack("<I", _masked(crc32c(length)))
        out += data
        out += struct.pack("<I", _masked(crc32c(data)))
    if gzipped:
        import zlib

        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(bytes(out)) + co.flush()
    return bytes(out)


# ------------------------------------------- tf.train.Example (subset)


def _varint(v: int) -> bytes:
    # proto encodes negative int64 as the 10-byte two's-complement
    # varint; Python's arithmetic >> would loop forever on a negative v
    v &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[pos]
        v |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return v, pos
        shift += 7


def _len_delim(field: int, body: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(body)) + body


def encode_example(features: dict[str, object]) -> bytes:
    """Serialize {name: bytes | int | float-list} as a tf.train.Example
    proto (Example.features.feature map entries with
    bytes_list/int64_list/float_list)."""
    entries = b""
    for name, value in sorted(features.items()):
        if isinstance(value, bytes):
            flist = _len_delim(1, _len_delim(1, value))  # bytes_list.value
        elif isinstance(value, int):
            flist = _len_delim(2, _varint(value))  # int64_list.value packed
        elif isinstance(value, list):
            packed = b"".join(struct.pack("<f", v) for v in value)
            flist = _len_delim(3, packed)  # float_list.value packed
        else:
            raise TypeError(f"unsupported feature type for {name!r}")
        entry = _len_delim(1, name.encode()) + _len_delim(2, flist)
        entries += _len_delim(1, entry)  # Features.feature map entry
    return _len_delim(1, entries)  # Example.features


def decode_example(data: bytes) -> dict[str, object]:
    """Inverse of :func:`encode_example` for the same subset."""
    def fields(buf: bytes):
        pos = 0
        while pos < len(buf):
            key, pos = _read_varint(buf, pos)
            field, wire = key >> 3, key & 7
            if wire == 2:
                ln, pos = _read_varint(buf, pos)
                yield field, buf[pos : pos + ln]
                pos += ln
            elif wire == 0:
                v, pos = _read_varint(buf, pos)
                yield field, v
            else:
                raise NotImplementedError(f"proto wire type {wire}")

    out: dict[str, object] = {}
    for f1, features in fields(data):
        if f1 != 1:
            continue
        for f2, entry in fields(features):
            if f2 != 1:
                continue
            name = None
            value: object = None
            for f3, part in fields(entry):
                if f3 == 1:
                    name = part.decode()
                elif f3 == 2:
                    for f4, flist in fields(part):
                        if f4 == 1:  # bytes_list
                            for f5, raw in fields(flist):
                                if f5 == 1:
                                    value = raw
                        elif f4 == 2:  # int64_list (packed varints)
                            v, _ = _read_varint(flist, 0)
                            # undo the two's-complement varint encoding
                            value = v - (1 << 64) if v >= (1 << 63) else v
                        elif f4 == 3:  # float_list (packed floats)
                            value = [
                                struct.unpack("<f", flist[i : i + 4])[0]
                                for i in range(0, len(flist), 4)
                            ]
            if name is not None:
                out[name] = value
    return out
