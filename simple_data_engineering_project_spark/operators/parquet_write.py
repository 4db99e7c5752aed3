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

Scope: BOOLEAN/INT32/INT64/DOUBLE/BYTE_ARRAY(utf8) physical types
plus the TIMESTAMP_MICROS and DATE converted types over integer
physicals (round 10 — epoch micros / epoch days in, real
timestamp[us]/date32 logical types back out of pyarrow and DuckDB),
OPTIONAL fields with null def-levels, codecs UNCOMPRESSED and SNAPPY,
PLAIN_DICTIONARY pages when a column's distinct count earns them
(round 10), per-chunk column STATISTICS (null_count + min_value/
max_value in the modern signed/byte-wise column order, the IEEE
-0.0/+0.0 zero convention, omitted entirely when a double chunk
contains NaN — round 10), and multi-row-group layouts via
``row_group_size`` so the statistics actually enable row-group
SKIPPING in downstream readers (proven in tests: pyarrow dataset
fragments prune on our stats, and the repo's own
:mod:`parquet_meta` + DuckDB ``parquet_metadata()`` read them back).

Scale shape: file-per-task — each executor task writes whole files
independently (the sink_webdataset/sink_arrow_ipc posture), so the
writer parallelizes embarrassingly and never shuffles.
"""

from __future__ import annotations

import struct

_MAGIC = b"PAR1"

# thrift compact wire types
_T_I32, _T_I64, _T_BINARY, _T_LIST, _T_STRUCT = 5, 6, 8, 9, 12

_PT_BOOLEAN = 0
_PT_INT32, _PT_INT64, _PT_DOUBLE, _PT_BYTE_ARRAY = 1, 2, 5, 6
_SPARK_TO_PHYSICAL = {
    "boolean": _PT_BOOLEAN,
    "int": _PT_INT32,
    "bigint": _PT_INT64,
    "double": _PT_DOUBLE,
    "string": _PT_BYTE_ARRAY,
    # round 10: temporal logical types over integer physicals —
    # values are epoch MICROSECONDS (timestamp) / epoch DAYS (date)
    "timestamp": _PT_INT64,
    "date": _PT_INT32,
}
# SchemaElement.converted_type (field 6) per parquet.thrift
_CONVERTED = {"string": 0, "date": 6, "timestamp": 10}  # UTF8/DATE/TIMESTAMP_MICROS
# columns whose distinct count stays at or below half the present
# values (and within the 16-bit index budget) get a dictionary page
_DICT_MAX_CARD = 65536


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
    if ptype == _PT_BOOLEAN:
        out = bytearray((len(present) + 7) // 8)
        for i, v in enumerate(present):
            if v:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)
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


def _bitpacked_indices(idxs: list[int], bit_width: int) -> bytes:
    """Dictionary indices as bit-packed RLE/bit-packed-hybrid runs
    (groups of 8, LSB-first; trailing pad indices are ignored by
    readers, which track the value count from the page header). Runs
    are capped at 512 values so the accumulator integer stays small —
    one giant run would make the shift-or loop quadratic in the chunk
    size."""
    out = bytearray()
    for start in range(0, len(idxs), 512):
        chunk = idxs[start : start + 512]
        groups = (len(chunk) + 7) // 8
        padded = chunk + [0] * (groups * 8 - len(chunk))
        acc = 0
        for i, v in enumerate(padded):
            acc |= v << (i * bit_width)
        out += _varint((groups << 1) | 1)
        out += acc.to_bytes(groups * bit_width, "little")
    return bytes(out)


def _stat_bytes(v, ptype: int) -> bytes:
    """PLAIN encoding of one statistics value (no length prefix for
    BYTE_ARRAY, per parquet.thrift Statistics)."""
    if ptype == _PT_BOOLEAN:
        return b"\x01" if v else b"\x00"
    if ptype == _PT_INT32:
        return struct.pack("<i", v)
    if ptype == _PT_INT64:
        return struct.pack("<q", v)
    if ptype == _PT_DOUBLE:
        return struct.pack("<d", v)
    return v.encode("utf-8") if isinstance(v, str) else bytes(v)


def _statistics(present: list, null_count: int, ptype: int) -> bytes:
    """Thrift Statistics struct: 3=null_count, 5=max_value, 6=min_value
    (the modern fields with well-defined column order — signed for
    ints, byte-wise unsigned for UTF8, IEEE for doubles; the legacy
    1/2 min/max with undefined BYTE_ARRAY order are deliberately not
    written). min/max are omitted when the chunk has no present values
    or a double chunk contains NaN (the spec's only safe choice)."""
    st = bytearray()
    last = 0
    last = _i64_field(st, last, 3, null_count)
    write_minmax = bool(present)
    if write_minmax and ptype == _PT_DOUBLE:
        write_minmax = not any(v != v for v in present)  # NaN check
    if write_minmax:
        if ptype == _PT_BYTE_ARRAY:
            # unsigned byte-wise order == Python bytes comparison
            enc = [
                v.encode("utf-8") if isinstance(v, str) else bytes(v)
                for v in present
            ]
            mn, mx = min(enc), max(enc)
        else:
            mn, mx = min(present), max(present)
            if ptype == _PT_DOUBLE:
                # IEEE zero convention: -0.0 as min, +0.0 as max
                if mn == 0.0:
                    mn = -0.0
                if mx == 0.0:
                    mx = 0.0
        last = _bin_field(st, last, 5, _stat_bytes(mx, ptype))
        last = _bin_field(st, last, 6, _stat_bytes(mn, ptype))
    st.append(0)
    return bytes(st)


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


def _page_header(page_type: int, raw_len: int, comp_len: int, inner_fid: int, inner: bytes) -> bytes:
    hdr = bytearray()
    last = 0
    last = _i32_field(hdr, last, 1, page_type)
    last = _i32_field(hdr, last, 2, raw_len)
    last = _i32_field(hdr, last, 3, comp_len)
    last = _struct_field(hdr, last, inner_fid, inner)
    hdr.append(0)
    return bytes(hdr)


def _write_column_chunk(body: bytearray, vals: list, ptype: int, codec_id: int):
    """Append the pages of one column chunk; returns the thrift fields
    the ColumnMetaData needs: (encodings, dict_offset, data_offset,
    comp_size, uncomp_size, stats_bytes)."""
    from .snappy import snappy_compress

    def pack(raw: bytes) -> bytes:
        return snappy_compress(raw) if codec_id else raw

    n = len(vals)
    levels = [0 if v is None else 1 for v in vals]
    present = [v for v in vals if v is not None]
    stats = _statistics(present, n - len(present), ptype)

    # Doubles dedup by their IEEE BIT PATTERN, not Python equality:
    # -0.0 == 0.0 would merge the two zeros and rewrite later-seen
    # values with the first-seen sign bit (round-10 review finding);
    # bit keys also collapse identical NaNs instead of giving every
    # NaN its own slot.
    if ptype == _PT_DOUBLE:
        def _key(v):
            return struct.pack("<d", v)
    else:
        def _key(v):
            return v

    uniq: dict = {}
    dict_vals: list = []
    for v in present:
        k = _key(v)
        if k not in uniq:
            uniq[k] = len(uniq)
            dict_vals.append(v)
    use_dict = (
        ptype != _PT_BOOLEAN  # booleans bit-pack tighter PLAIN
        and 0 < len(uniq) <= _DICT_MAX_CARD
        and 2 * len(uniq) <= len(present)
    )

    dict_offset = None
    comp_size = uncomp_size = 0
    if use_dict:
        draw = _plain(dict_vals, ptype)
        dcomp = pack(draw)
        dph = bytearray()
        last = 0
        last = _i32_field(dph, last, 1, len(uniq))
        last = _i32_field(dph, last, 2, 2)  # PLAIN_DICTIONARY
        dph.append(0)
        hdr = _page_header(2, len(draw), len(dcomp), 7, bytes(dph))
        dict_offset = len(body)
        body += hdr
        body += dcomp
        comp_size += len(hdr) + len(dcomp)
        uncomp_size += len(hdr) + len(draw)
        bw = max(1, (len(uniq) - 1).bit_length())
        values_region = bytes([bw]) + _bitpacked_indices(
            [uniq[_key(v)] for v in present], bw
        )
        enc = 2  # PLAIN_DICTIONARY data page (v1 convention)
    else:
        values_region = _plain(vals, ptype)
        enc = 0  # PLAIN

    raw = _rle_levels(levels) + values_region
    comp = pack(raw)
    dph = bytearray()
    last = 0
    last = _i32_field(dph, last, 1, n)
    last = _i32_field(dph, last, 2, enc)
    last = _i32_field(dph, last, 3, 3)  # RLE def levels
    last = _i32_field(dph, last, 4, 3)  # RLE rep levels (absent)
    dph.append(0)
    hdr = _page_header(0, len(raw), len(comp), 5, bytes(dph))
    data_offset = len(body)
    body += hdr
    body += comp
    comp_size += len(hdr) + len(comp)
    uncomp_size += len(hdr) + len(raw)
    encodings = [2, 3] if use_dict else [0, 3]
    return encodings, dict_offset, data_offset, comp_size, uncomp_size, stats


def build_parquet_bytes(
    columns: dict[str, list],
    ddl_types: dict[str, str],
    compression: str = "snappy",
    row_group_size: int | None = None,
) -> bytes:
    """One parquet FILE as bytes.

    ``ddl_types`` maps column name → Spark DDL scalar type (boolean /
    int / bigint / double / string). All columns are written OPTIONAL
    with real definition levels, so None round-trips as null. Columns
    whose distinct count earns it get PLAIN_DICTIONARY pages; every
    chunk carries null_count + min_value/max_value statistics; and
    ``row_group_size`` splits rows into multiple row groups so those
    statistics drive row-group skipping in readers.
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
    rg_size = row_group_size or max(num_rows, 1)

    body = bytearray(_MAGIC)
    row_groups = []
    for start in range(0, max(num_rows, 1), rg_size):
        n_rg = min(rg_size, num_rows - start) if num_rows else 0
        col_chunks = []
        total_uncomp = 0
        for c in names:
            ptype = _SPARK_TO_PHYSICAL[ddl_types[c]]
            vals = columns[c][start : start + n_rg]
            (
                encodings, dict_off, data_off, comp_size, uncomp_size,
                stats,
            ) = _write_column_chunk(body, vals, ptype, codec_id)
            md = bytearray()
            last = 0
            last = _i32_field(md, last, 1, ptype)
            last = _list_field(
                md, last, 2, _T_I32,
                [_zigzag(e) for e in encodings],
            )
            last = _list_field(
                md, last, 3, _T_BINARY,
                [_varint(len(c.encode())) + c.encode()],
            )
            last = _i32_field(md, last, 4, codec_id)
            last = _i64_field(md, last, 5, n_rg)
            last = _i64_field(md, last, 6, uncomp_size)
            last = _i64_field(md, last, 7, comp_size)
            last = _i64_field(md, last, 9, data_off)
            if dict_off is not None:
                last = _i64_field(md, last, 11, dict_off)
            last = _struct_field(md, last, 12, stats)
            md.append(0)
            cc = bytearray()
            last = 0
            last = _i64_field(cc, last, 2, dict_off if dict_off is not None else data_off)
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
        last = _i64_field(rg, last, 3, n_rg)
        rg.append(0)
        row_groups.append(bytes(rg))
        if num_rows == 0:
            break

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
        if ddl_types[c] in _CONVERTED:
            last = _i32_field(el, last, 6, _CONVERTED[ddl_types[c]])
        el.append(0)
        schema_elems.append(bytes(el))

    fmd = bytearray()
    last = 0
    last = _i32_field(fmd, last, 1, 1)  # version
    last = _list_field(fmd, last, 2, _T_STRUCT, schema_elems)
    last = _i64_field(fmd, last, 3, num_rows)
    last = _list_field(fmd, last, 4, _T_STRUCT, row_groups)
    # column_orders (FileMetaData field 7): one TYPE_ORDER per leaf.
    # Without this list the spec tells readers to IGNORE
    # min_value/max_value — pyarrow does exactly that, so the stats
    # only enable row-group skipping once these are present.
    # ColumnOrder is a thrift union whose field 1 (TYPE_ORDER) is the
    # empty TypeDefinedOrder struct: 0x1C (field 1, struct) 0x00
    # (empty struct stop) 0x00 (union stop).
    last = _list_field(
        fmd, last, 7, _T_STRUCT, [b"\x1c\x00\x00"] * len(names)
    )
    fmd.append(0)

    body += fmd
    body += struct.pack("<I", len(fmd))
    body += _MAGIC
    return bytes(body)
