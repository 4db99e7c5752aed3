"""Avro Object Container File reading in pure stdlib (SURVEY §2 A10/C4).

Avro is the data-engineering interchange staple (Kafka archive dumps,
Sqoop exports, many lakehouse landing zones), and this PySpark build
ships no spark-avro datasource — so the engine reads the container
format itself: ``Obj\\x01`` magic → file-metadata map (``avro.schema``
JSON, ``avro.codec``) → 16-byte sync marker → data blocks of
(record count, byte size, payload, sync) with the sync marker VERIFIED
per block, codecs ``null``, ``deflate`` (raw zlib), ``snappy``
(:mod:`.snappy` + the spec's 4-byte big-endian CRC32 of the
uncompressed block), ``bzip2`` and ``xz`` (both stdlib), and
``zstandard`` (the pure-Python RFC 8878 decoder in :mod:`.zstd`; one
raw frame per block, no trailing CRC per the spec). Record decoding
covers the flat-record schema subset corpus tables use: string, bytes,
int, long (zigzag varints), float, double, boolean, and the common
``["null", T]`` nullable union.

Out of envelope (honest ``NotImplementedError``): nested
records/arrays/maps/enums/fixed, and schema resolution against a
different reader schema. The companion :func:`encode_avro` writes
conformant files so the oracle entry verifies decoding byte-for-byte.
(∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _varint(v: int) -> bytes:
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


def _write_long(v: int) -> bytes:
    return _varint(_zigzag_encode(v))


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def long(self) -> int:
        v = 0
        shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (v >> 1) ^ -(v & 1)  # zigzag

    def raw(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())


def _decode_value(r: _Reader, ftype) -> object:
    if isinstance(ftype, list):  # union — ["null", T] only
        idx = r.long()
        branch = ftype[idx]
        return None if branch == "null" else _decode_value(r, branch)
    if ftype in ("long", "int"):
        return r.long()
    if ftype == "string":
        return r.bytes_().decode("utf-8")
    if ftype == "bytes":
        return r.bytes_()
    if ftype == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if ftype == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if ftype == "boolean":
        return r.raw(1) == b"\x01"
    if ftype == "null":
        return None
    raise NotImplementedError(f"avro type {ftype!r}")


def parse_avro(payload: bytes) -> tuple[dict, list[dict]]:
    """(schema, rows) of an OCF; sync markers verified per block."""
    if payload[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    r = _Reader(payload, 4)
    meta: dict[str, bytes] = {}
    while True:
        count = r.long()
        if count == 0:
            break
        if count < 0:  # negative count prefixes a block byte size
            r.long()
            count = -count
        for _ in range(count):
            key = r.bytes_().decode("utf-8")
            meta[key] = r.bytes_()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate", "snappy", "bzip2", "xz", "zstandard"):
        raise NotImplementedError(f"avro codec {codec!r}")
    if schema.get("type") != "record":
        raise NotImplementedError("non-record top-level avro schema")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    sync = r.raw(16)
    rows: list[dict] = []
    while r.pos < len(payload):
        n_rec = r.long()
        size = r.long()
        block = r.raw(size)
        if r.raw(16) != sync:
            raise ValueError("avro block sync-marker mismatch")
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec == "bzip2":
            import bz2

            block = bz2.decompress(block)
        elif codec == "xz":
            import lzma

            block = lzma.decompress(block, format=lzma.FORMAT_XZ)
        elif codec == "snappy":
            from .snappy import snappy_decompress

            crc = int.from_bytes(block[-4:], "big")
            block = snappy_decompress(block[:-4])
            if zlib.crc32(block) & 0xFFFFFFFF != crc:
                raise ValueError("avro snappy block CRC mismatch")
        elif codec == "zstandard":
            # one raw zstd frame per block, no trailing CRC (only the
            # snappy codec carries one, per the spec)
            from .zstd import zstd_decompress

            block = zstd_decompress(block)
        br = _Reader(block)
        for _ in range(n_rec):
            rows.append({n: _decode_value(br, t) for n, t in fields})
    return schema, rows


def encode_avro(
    fields: list[tuple[str, object]],
    rows: list[dict],
    codec: str = "null",
    sync: bytes = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f",
    records_per_block: int = 2,
) -> bytes:
    """Write an OCF for flat records; multiple blocks exercise the sync
    walk."""
    schema = {
        "type": "record",
        "name": "Row",
        "fields": [{"name": n, "type": t} for n, t in fields],
    }

    def enc_value(ftype, v) -> bytes:
        if isinstance(ftype, list):
            if v is None:
                return _write_long(ftype.index("null"))
            branch = next(t for t in ftype if t != "null")
            return _write_long(ftype.index(branch)) + enc_value(branch, v)
        if ftype in ("long", "int"):
            return _write_long(v)
        if ftype == "string":
            b = v.encode("utf-8")
            return _write_long(len(b)) + b
        if ftype == "bytes":
            return _write_long(len(v)) + v
        if ftype == "double":
            return struct.pack("<d", v)
        if ftype == "float":
            return struct.pack("<f", v)
        if ftype == "boolean":
            return b"\x01" if v else b"\x00"
        raise NotImplementedError(f"avro type {ftype!r}")

    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(_MAGIC)
    out += _write_long(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _write_long(len(kb)) + kb
        out += _write_long(len(v)) + v
    out += _write_long(0)
    out += sync
    for b0 in range(0, len(rows), records_per_block):
        chunk = rows[b0 : b0 + records_per_block]
        body = b"".join(
            b"".join(enc_value(t, row[n]) for n, t in fields) for row in chunk
        )
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        elif codec == "bzip2":
            import bz2

            body = bz2.compress(body)
        elif codec == "xz":
            import lzma

            body = lzma.compress(body, format=lzma.FORMAT_XZ)
        elif codec == "snappy":
            from .snappy import snappy_compress

            crc = zlib.crc32(body) & 0xFFFFFFFF
            body = snappy_compress(body) + crc.to_bytes(4, "big")
        elif codec == "zstandard":
            # pyarrow's bundled encoder — a reference implementation,
            # so decoding through operators/zstd.py stays a
            # cross-implementation check
            import pyarrow as _pa

            body = _pa.Codec("zstd").compress(body, asbytes=True)
        out += _write_long(len(chunk)) + _write_long(len(body)) + body + sync
    return bytes(out)
