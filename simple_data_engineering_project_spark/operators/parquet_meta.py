"""Parquet footer (FileMetaData) parsing in pure stdlib (SURVEY §2 C12).

The footer is what a scan planner actually reads: row-group boundaries,
per-column-chunk value counts, null counts, sizes, and codecs — the
zone-map layer behind partition pruning, row-group skipping, and size
estimation. This parses it for real, the way the format is defined:

- the file tail is ``<footer thrift bytes><footer_len:4 LE>"PAR1"`` —
  only the footer bytes are read (seek from the end), never the data
  pages, which is the point of footer-driven planning at 100 TB;
- the footer is THRIFT COMPACT PROTOCOL: struct field headers with
  4-bit field-id deltas (long form for deltas > 15), zigzag varints
  for i16/i32/i64, length-prefixed binaries, size|type list headers —
  a generic reader walks the whole structure, and the interesting
  fields (RowGroup.columns[].meta_data: path_in_schema, num_values,
  codec, sizes, Statistics.null_count) are pulled out by field id per
  parquet.thrift.

The oracle entry writes a real Spark parquet file and compares this
parser's output against DuckDB's ``parquet_metadata()`` over the SAME
bytes — two independent footer decoders agreeing, not a round-trip.
(∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import struct

_CODECS = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
    4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}


class _Compact:
    """Minimal thrift compact-protocol reader: structs become
    {field_id: value}, lists become Python lists, binaries bytes."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _varint(self) -> int:
        v = 0
        shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    def _zigzag(self) -> int:
        u = self._varint()
        return (u >> 1) ^ -(u & 1)

    def _value(self, vtype: int):
        if vtype == 1:
            return True
        if vtype == 2:
            return False
        if vtype == 3:  # i8
            b = self.data[self.pos]
            self.pos += 1
            return b - 256 if b >= 128 else b
        if vtype in (4, 5, 6):  # i16/i32/i64
            return self._zigzag()
        if vtype == 7:  # double
            v = struct.unpack("<d", self.data[self.pos : self.pos + 8])[0]
            self.pos += 8
            return v
        if vtype == 8:  # binary/string
            n = self._varint()
            out = self.data[self.pos : self.pos + n]
            self.pos += n
            return out
        if vtype in (9, 10):  # list/set
            head = self.data[self.pos]
            self.pos += 1
            size = head >> 4
            etype = head & 0x0F
            if size == 15:
                size = self._varint()
            if etype in (1, 2):  # bools are full bytes inside lists
                out = []
                for _ in range(size):
                    out.append(self.data[self.pos] == 1)
                    self.pos += 1
                return out
            return [self._value(etype) for _ in range(size)]
        if vtype == 11:  # map: varint size, then key|value type byte
            size = self._varint()
            if size == 0:
                return {}
            ktype, vtype2 = self.data[self.pos] >> 4, self.data[self.pos] & 0xF
            self.pos += 1
            return {
                self._freeze(self._value(ktype)): self._value(vtype2)
                for _ in range(size)
            }
        if vtype == 12:
            return self.struct()
        raise ValueError(f"unknown thrift compact type {vtype}")

    @staticmethod
    def _freeze(v):
        return bytes(v) if isinstance(v, bytearray) else v

    def struct(self) -> dict:
        out: dict = {}
        fid = 0
        while True:
            head = self.data[self.pos]
            self.pos += 1
            if head == 0:  # STOP
                return out
            delta = head >> 4
            vtype = head & 0x0F
            if delta:
                fid += delta
            else:
                fid = self._zigzag()
            out[fid] = self._value(vtype)


def parse_parquet_footer(tail: bytes) -> dict:
    """Parse FileMetaData from the file TAIL (any suffix that contains
    the whole footer). Returns {num_rows, row_groups: [{num_rows,
    columns: [{column, num_values, null_count, codec,
    compressed_bytes, uncompressed_bytes}]}]}."""
    if tail[-4:] != b"PAR1":
        raise ValueError("not a parquet file tail")
    flen = struct.unpack("<I", tail[-8:-4])[0]
    if flen + 8 > len(tail):
        raise ValueError("tail shorter than the footer")
    meta = _Compact(tail[len(tail) - 8 - flen : len(tail) - 8]).struct()
    # FileMetaData: 3=num_rows, 4=row_groups
    groups = []
    for rg in meta.get(4, []):
        # RowGroup: 1=columns, 3=num_rows
        cols = []
        for cc in rg.get(1, []):
            md = cc.get(3)  # ColumnChunk.meta_data
            if md is None:
                continue
            stats = md.get(12, {})  # Statistics
            cols.append(
                {
                    # ColumnMetaData: 1=type, 3=path_in_schema,
                    # 4=codec, 5=num_values, 6/7=sizes; Statistics:
                    # 3=null_count, 5=max_value, 6=min_value (raw
                    # PLAIN bytes — decode_stat_value turns them into
                    # comparable Python values for row-group pruning).
                    # Nested paths join with ", " — DuckDB's
                    # parquet_metadata rendering, which the oracle
                    # compares against verbatim.
                    "column": b", ".join(md.get(3, [])).decode("utf-8"),
                    "type": md.get(1),
                    "num_values": md.get(5),
                    "null_count": stats.get(3),
                    "min_value": stats.get(6),
                    "max_value": stats.get(5),
                    "codec": _CODECS.get(md.get(4), str(md.get(4))),
                    "compressed_bytes": md.get(7),
                    "uncompressed_bytes": md.get(6),
                }
            )
        groups.append({"num_rows": rg.get(3), "columns": cols})
    return {"num_rows": meta.get(3), "row_groups": groups}


def read_footer_stats(path: str, probe_bytes: int = 1 << 20) -> list[dict]:
    """Footer-only read of one parquet file: seek to the tail, parse,
    flatten to one dict per (row_group, column chunk)."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(max(0, size - probe_bytes))
        tail = f.read()
    if len(tail) >= 8:
        flen = struct.unpack("<I", tail[-8:-4])[0]
        if flen + 8 > len(tail):  # enormous footer: reread exactly
            with open(path, "rb") as f:
                f.seek(max(0, size - flen - 8))
                tail = f.read()
    meta = parse_parquet_footer(tail)
    out = []
    for rg_id, rg in enumerate(meta["row_groups"]):
        for col in rg["columns"]:
            out.append({"row_group": rg_id, **col})
    return out


def decode_stat_value(raw: bytes | None, ptype: int):
    """Decode one Statistics min_value/max_value blob (PLAIN encoding,
    no length prefix) into a comparable Python value by physical type.
    BYTE_ARRAY stays bytes (unsigned lexicographic order — the column
    order the modern fields are defined in)."""
    if raw is None:
        return None
    if ptype == 0:  # BOOLEAN
        return raw[:1] != b"\x00"
    if ptype == 1:  # INT32
        return struct.unpack("<i", raw[:4])[0]
    if ptype == 2:  # INT64
        return struct.unpack("<q", raw[:8])[0]
    if ptype == 4:  # FLOAT
        return struct.unpack("<f", raw[:4])[0]
    if ptype == 5:  # DOUBLE
        return struct.unpack("<d", raw[:8])[0]
    return bytes(raw)  # BYTE_ARRAY / FLBA
