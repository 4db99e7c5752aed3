"""Arrow IPC (stream/Feather-v2) reading in pure stdlib (SURVEY §2 C4).

Arrow IPC is the interchange format of the Python data stack (Feather
v2 files, Flight payloads, dataframe spills), and nothing in this
engine's JVM path reads it natively — so the engine parses the wire
format itself, the way the spec defines it:

- the stream is a sequence of ENCAPSULATED MESSAGES: 0xFFFFFFFF
  continuation + int32 metadata length + a FLATBUFFERS ``Message`` +
  an 8-byte-aligned body; a zero length terminates the stream. Feather
  v2 is the same stream after an ``ARROW1`` magic prefix (the trailing
  footer is redundant for a sequential read and skipped);
- the flatbuffers layer is parsed BY HAND — root offset, vtables
  (u16 sizes + per-field offsets), tables, vectors, strings, unions,
  structs — no flatbuffers library;
- ``Schema`` messages yield a FIELD TREE per column (ints of any
  width/sign, float16/32/64, bool, utf8/binary and their Large 64-bit-
  offset forms, date32/64, naive s/ms/us timestamps, s/ms/us times and
  durations, decimal128/256 (one width-parameterized
  two's-complement path, both cross-validated against pyarrow),
  fixed-size binary/list, and NESTED
  list/struct/map of those, to any depth — map surfaces as
  (key, value) tuple lists matching pyarrow's to_pylist); ``RecordBatch`` messages carry FieldNode
  (length, null_count) and Buffer (offset, length) structs in
  depth-first pre-order, and columns decode recursively from validity
  bitmaps + offsets + data buffers;
- DICTIONARY-encoded columns decode for real: the field stores its
  index width + dictionary id, ``DictionaryBatch`` messages (including
  isDelta appends) materialize the id's value column, and batch
  indices map through it;
- LZ4_FRAME-compressed bodies decode through a pure-stdlib LZ4
  frame/block decompressor (each buffer is an int64 uncompressed
  length followed by an LZ4 frame; -1 marks a raw buffer). Frame
  checksums are skipped, not verified.
- ZSTD-compressed bodies decode through the pure-Python RFC 8878
  decoder in :mod:`.zstd` (FSE + Huffman + sequence execution),
  cross-validated against the zstd CLI and pyarrow's codec.

Also decoded for real: SPARSE and DENSE UNIONS (types buffer +
dense offsets, typeIds remapping, no validity bitmap per the V5
layout), RUN-END-ENCODED columns (bufferless parent expanded from the
run_ends/values children), all three INTERVAL units (year-month int,
day-time (days, ms) pairs, month-day-nano (m, d, ns) triples —
tuple-comparable with pyarrow's MonthDayNano), TIMEZONE-AWARE
timestamps (decoded as UTC instants — the tz string is display
metadata; aware datetimes compare by instant with pyarrow's
local-rendered values), and NANOSECOND temporals (ts/duration via
pandas Timestamp/Timedelta, exactly pyarrow's to_pylist; time64[ns]
truncates to µs like pyarrow), and the VIEW types — Utf8View/
BinaryView (16-byte view structs, <= 12-byte values inlined, longer
ones resolved through the RecordBatch's variadicBufferCounts-counted
data buffers with the 4-byte prefix cross-checked) and ListView/
LargeListView (offsets + sizes buffers, unordered ranges).

Out of envelope (honest ``NotImplementedError``/``ValueError``):
big-endian streams; decimal32/64 (structurally trivial but NO
in-container reference can write or read them — pyarrow 16 lacks the
types — so accepting them would be self-consistent-only, the exact
trap this repo declines); zstd bodies that reference an external
dictionary (no IPC writer emits them — pyarrow's zstd IPC path has no
dictionary transport — so there is nothing to plumb the
``zstd_decompress(dictionary=...)`` parameter from).
Tests cross-validate against pyarrow (the
writer side) including dictionary, nested, lz4, and zstd payloads,
plus tamper/envelope pins. (∅ in reference; Tier C extension.)
"""

from __future__ import annotations

import struct


def _i32(buf: bytes, pos: int) -> int:
    return struct.unpack_from("<i", buf, pos)[0]


def _u16(buf: bytes, pos: int) -> int:
    return struct.unpack_from("<H", buf, pos)[0]


def _i64(buf: bytes, pos: int) -> int:
    return struct.unpack_from("<q", buf, pos)[0]


class _Table:
    """A flatbuffers table: field(i) -> absolute data position or None."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.vt = pos - _i32(buf, pos)  # soffset_t points BACK to vtable
        self.vt_size = _u16(buf, self.vt)

    def _off(self, idx: int) -> int:
        slot = 4 + idx * 2
        if slot + 2 > self.vt_size:
            return 0
        return _u16(self.buf, self.vt + slot)

    def scalar(self, idx: int, fmt: str, default):
        off = self._off(idx)
        if not off:
            return default
        return struct.unpack_from(fmt, self.buf, self.pos + off)[0]

    def table(self, idx: int) -> "_Table | None":
        off = self._off(idx)
        if not off:
            return None
        at = self.pos + off
        return _Table(self.buf, at + _i32(self.buf, at))

    def vector(self, idx: int) -> tuple[int, int]:
        """(element-0 position, length) of a vector field, or (0, 0)."""
        off = self._off(idx)
        if not off:
            return 0, 0
        at = self.pos + off
        vec = at + _i32(self.buf, at)
        return vec + 4, _i32(self.buf, vec)

    def string(self, idx: int) -> str | None:
        at, n = self.vector(idx)
        if not at and not n:
            return None
        return self.buf[at : at + n].decode("utf-8")

    def vtable_elem(self, idx: int, i: int) -> "_Table":
        at, _n = self.vector(idx)
        elem = at + i * 4
        return _Table(self.buf, elem + _i32(self.buf, elem))


# Schema.fbs Type union discriminants (order of declaration, 1-based)
_T_INT, _T_FLOAT, _T_BINARY, _T_UTF8, _T_BOOL = 2, 3, 4, 5, 6
_T_DECIMAL, _T_DATE, _T_TIME, _T_TIMESTAMP = 7, 8, 9, 10
_T_INTERVAL = 11
_T_LIST, _T_STRUCT = 12, 13
_T_UNION = 14
_T_FIXEDBINARY, _T_FIXEDLIST = 15, 16
_T_MAP = 17
_T_DURATION = 18
_T_LARGEBINARY, _T_LARGEUTF8, _T_LARGELIST = 19, 20, 21
_T_RUNEND = 22
_T_BINARYVIEW, _T_UTF8VIEW, _T_LISTVIEW, _T_LARGELISTVIEW = 23, 24, 25, 26

import decimal as _decimal

# decimal256 carries up to 76 significant digits; give the scaling
# step comfortable headroom (the default context would round at 28)
_DEC128_CTX = _decimal.Context(prec=90)

_FMT = {
    "int8": "b", "uint8": "B", "int16": "h", "uint16": "H",
    "int32": "i", "uint32": "I", "int64": "q", "uint64": "Q",
    "float16": "e", "float32": "f", "float64": "d",
}


def _type_tag(ttype: int, tval: _Table | None) -> str:
    if ttype == _T_INT:
        bits = tval.scalar(0, "<i", 0) if tval else 0
        signed = bool(tval.scalar(1, "<B", 0)) if tval else False
        return f"{'int' if signed else 'uint'}{bits}"
    if ttype == _T_FLOAT:  # precision: 0 HALF, 1 SINGLE, 2 DOUBLE
        prec = tval.scalar(0, "<h", 0) if tval else 0
        if prec not in (0, 1, 2):
            raise ValueError(f"corrupt arrow FloatingPoint precision {prec}")
        return ("float16", "float32", "float64")[prec]
    if ttype == _T_BOOL:
        return "bool"
    if ttype == _T_UTF8:
        return "utf8"
    if ttype == _T_BINARY:
        return "binary"
    if ttype == _T_LIST:
        return "list"
    if ttype == _T_STRUCT:
        return "struct"
    if ttype == _T_LARGEUTF8:
        return "largeutf8"
    if ttype == _T_LARGEBINARY:
        return "largebinary"
    if ttype == _T_LARGELIST:
        return "largelist"
    if ttype == _T_DATE:  # DateUnit: 0 DAY (int32), 1 MILLISECOND (int64)
        # flatbuffers omits default-valued fields, and Date's declared
        # DEFAULT is MILLISECOND — an absent unit means date64
        unit = tval.scalar(0, "<h", 1) if tval else 1
        return "date32" if unit == 0 else "date64"
    if ttype == _T_TIME:
        # Time: unit(0, default MILLISECOND=1), bitWidth(1, default 32)
        unit = tval.scalar(0, "<h", 1) if tval else 1
        if unit not in (0, 1, 2, 3):
            raise ValueError(f"corrupt arrow TimeUnit {unit}")
        # time_ns truncates to microseconds — datetime.time cannot hold
        # ns, and pyarrow's own to_pylist truncates identically
        return ("time_s", "time_ms", "time_us", "time_ns")[unit]
    if ttype == _T_DURATION:
        # Duration: unit(0, default MILLISECOND); int64 storage
        unit = tval.scalar(0, "<h", 1) if tval else 1
        if unit not in (0, 1, 2, 3):
            raise ValueError(f"corrupt arrow TimeUnit {unit}")
        return ("dur_s", "dur_ms", "dur_us", "dur_ns")[unit]
    if ttype == _T_INTERVAL:
        # Interval: unit(0, default YEAR_MONTH=0); DAY_TIME=1,
        # MONTH_DAY_NANO=2
        unit = tval.scalar(0, "<h", 0) if tval else 0
        if unit not in (0, 1, 2):
            raise ValueError(f"corrupt arrow IntervalUnit {unit}")
        return ("interval_ym", "interval_dt", "interval_mdn")[unit]
    if ttype == _T_DECIMAL:
        # Decimal: precision(0), scale(1), bitWidth(2, default 128).
        # 128 and 256 share one width-parameterized two's-complement
        # path, both cross-validated against pyarrow. 32/64 stay
        # DECLINED: structurally trivial, but no in-container reference
        # can write or read them (pyarrow 16 lacks the types), so
        # accepting them would be verified by nothing but this module
        # itself — the self-consistency trap the verify protocol
        # forbids.
        bits = tval.scalar(2, "<i", 128) if tval else 128
        if bits not in (128, 256):
            raise NotImplementedError(f"decimal{bits} arrow column")
        scale = tval.scalar(1, "<i", 0) if tval else 0
        return f"decimal{bits}:{scale}"
    if ttype == _T_FIXEDBINARY:
        width = tval.scalar(0, "<i", 0) if tval else 0
        return f"fixedbinary:{width}"
    if ttype == _T_FIXEDLIST:
        size = tval.scalar(0, "<i", 0) if tval else 0
        return f"fixedlist:{size}"
    if ttype == _T_MAP:
        return "map"
    if ttype == _T_UNION:
        # Union: mode(0, default Sparse=0), typeIds(1) — ids read by
        # _parse_field, which holds the type table
        mode = tval.scalar(0, "<h", 0) if tval else 0
        if mode not in (0, 1):
            raise ValueError(f"corrupt arrow UnionMode {mode}")
        return "union_sparse" if mode == 0 else "union_dense"
    if ttype == _T_RUNEND:
        # RunEndEncoded carries no fields of its own; run_ends and
        # values arrive as the two children
        return "runend"
    if ttype == _T_BINARYVIEW:
        return "binaryview"
    if ttype == _T_UTF8VIEW:
        return "utf8view"
    if ttype == _T_LISTVIEW:
        return "listview"
    if ttype == _T_LARGELISTVIEW:
        return "largelistview"
    if ttype == _T_TIMESTAMP:
        # Timestamp: unit(0: 0 s, 1 ms, 2 us, 3 ns), timezone(1).
        # tz-aware columns decode as UTC INSTANTS (aware datetimes with
        # tzinfo=UTC): Arrow stores the epoch offset — the tz string is
        # display metadata — and aware datetimes compare by instant, so
        # values equal pyarrow's local-time-rendered to_pylist without
        # shipping a tz database.
        tz = tval.string(1) if tval else None
        unit = tval.scalar(0, "<h", 0) if tval else 0
        if unit not in (0, 1, 2, 3):
            raise ValueError(f"corrupt arrow TimeUnit {unit}")
        tag = ("ts_s", "ts_ms", "ts_us", "ts_ns")[unit]
        return f"{tag}@{tz}" if tz else tag
    raise NotImplementedError(f"arrow type discriminant {ttype}")


def _parse_field(f: _Table) -> dict:
    """Field -> spec tree {name, type, children, dict_id, index_type}."""
    # Field: name(0), nullable(1), type_type(2), type(3),
    # dictionary(4), children(5), custom_metadata(6)
    ttype = f.scalar(2, "<B", 0)
    typ = _type_tag(ttype, f.table(3))
    _cat, nch = f.vector(5)
    children = [_parse_field(f.vtable_elem(5, i)) for i in range(nch)]
    is_listy = (
        typ in ("list", "largelist", "map", "listview", "largelistview")
        or typ.startswith("fixedlist:")
    )
    if is_listy and len(children) != 1:
        raise ValueError(f"list field carries {len(children)} children")
    if typ == "runend" and len(children) != 2:
        raise ValueError(
            f"run-end field carries {len(children)} children (need 2)"
        )
    nested = is_listy or typ in ("struct", "runend") or typ.startswith("union_")
    if not nested and children:
        raise NotImplementedError("children on a non-nested arrow type")
    spec = {
        "name": f.string(0),
        "type": typ,
        "children": children,
        "dict_id": None,
        "index_type": None,
    }
    if typ.startswith("union_"):
        # Union.typeIds: slot type-id -> child index mapping; absent
        # means type id i IS child i
        tv = f.table(3)
        tat, tn = (tv.vector(1) if tv is not None else (0, 0))
        if tn:
            ids = struct.unpack_from(f"<{tn}i", tv.buf, tat)
        else:
            ids = tuple(range(len(children)))
        if len(ids) != len(children):
            raise ValueError(
                f"union declares {len(ids)} type ids for "
                f"{len(children)} children"
            )
        spec["type_ids"] = {tid: i for i, tid in enumerate(ids)}
    enc = f.table(4)
    if enc is not None:
        # DictionaryEncoding: id(0), indexType(1: Int), isOrdered(2)
        spec["dict_id"] = enc.scalar(0, "<q", 0)
        it = enc.table(1)
        if it is None:
            spec["index_type"] = "int32"  # spec default
        else:
            bits = it.scalar(0, "<i", 0)
            signed = bool(it.scalar(1, "<B", 0))
            spec["index_type"] = f"{'int' if signed else 'uint'}{bits}"
    return spec


def _type_str(spec: dict) -> str:
    t = spec["type"]
    if t in ("list", "largelist"):
        return f"{t}<{_type_str(spec['children'][0])}>"
    if t == "map":
        kv = spec["children"][0]["children"]
        return f"map<{_type_str(kv[0])}, {_type_str(kv[1])}>"
    if t.startswith("fixedlist:"):
        n = t.split(":")[1]
        return f"fixedlist<{_type_str(spec['children'][0])}, {n}>"
    if t == "struct":
        inner = ", ".join(
            f"{c['name']}: {_type_str(c)}" for c in spec["children"]
        )
        return f"struct<{inner}>"
    if t.startswith("union_"):
        inner = ", ".join(_type_str(c) for c in spec["children"])
        return f"{t}<{inner}>"
    if t == "runend":
        return f"runend<{_type_str(spec['children'][1])}>"
    if t in ("listview", "largelistview"):
        return f"{t}<{_type_str(spec['children'][0])}>"
    return t


# ------------------------------------------------------------ lz4

_LZ4_MAGIC = b"\x04\x22\x4d\x18"


def lz4_block_decompress(src: bytes, out: bytearray) -> None:
    """LZ4 *block* format, appending into ``out`` (the shared history
    window, so linked-block frames decode correctly for free)."""
    pos, n = 0, len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated lz4 literal length")
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("lz4 literal run past block end")
        out += src[pos : pos + lit]
        pos += lit
        if pos >= n:
            break  # final literals-only sequence
        if pos + 2 > n:
            raise ValueError("truncated lz4 match offset")
        off = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if off == 0:
            raise ValueError("lz4 zero match offset")
        mlen = (token & 15) + 4
        if (token & 15) == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated lz4 match length")
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        if start < 0:
            raise ValueError("lz4 match offset before window start")
        if off >= mlen:
            # no self-overlap: one slice copy instead of a Python loop
            # per byte (measured ~60x on match-heavy columns)
            out += out[start : start + mlen]
        else:
            # self-overlapping match repeats a period of ``off`` bytes:
            # tile the period instead of a per-byte loop
            period = bytes(out[start:])
            reps = -(-mlen // len(period))
            out += (period * reps)[:mlen]


def lz4_frame_decompress(data: bytes) -> bytes:
    """LZ4 *frame* format (magic, descriptor, data blocks). Block and
    content checksums are skipped, not verified."""
    if data[:4] != _LZ4_MAGIC:
        raise ValueError("not an lz4 frame")
    if len(data) < 7:  # magic + FLG + BD + header checksum
        raise ValueError("lz4 frame truncated in header")
    flg, _bd = data[4], data[5]
    if (flg >> 6) != 0b01:
        raise ValueError("unsupported lz4 frame version")
    pos = 6
    if flg & 0x08:  # content size present
        pos += 8
    if flg & 0x01:  # dict id present
        pos += 4
    pos += 1  # header checksum byte
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4 frame truncated before end mark")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:  # EndMark
            break
        raw = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if pos + bsize > len(data):
            raise ValueError("lz4 block truncated")
        block = data[pos : pos + bsize]
        pos += bsize
        if flg & 0x10:  # block checksum
            pos += 4
        if raw:
            out += block
        else:
            lz4_block_decompress(block, out)
    return bytes(out)


# ------------------------------------------------------------ decode


class _BatchBody:
    """Buffer access for one RecordBatch body, decompressing per-buffer
    when the batch declares BodyCompression."""

    def __init__(self, payload, body_at, bufs, codec, variadic=()):
        self.payload = payload
        self.body_at = body_at
        self.bufs = bufs
        self.codec = codec
        self.bi = 0
        # RecordBatch.variadicBufferCounts: one entry per view-typed
        # field in depth-first field order — how many data buffers that
        # field appended after its views buffer
        self.variadic = iter(variadic)

    def next_variadic_count(self) -> int:
        try:
            return next(self.variadic)
        except StopIteration:
            raise ValueError(
                "view column but no variadicBufferCounts entry left"
            ) from None

    def next_buffer(self) -> bytes:
        if self.bi >= len(self.bufs):
            raise ValueError("record batch buffer list exhausted")
        off, ln = self.bufs[self.bi]
        self.bi += 1
        raw = self.payload[self.body_at + off : self.body_at + off + ln]
        if self.codec is None or ln == 0:
            return raw
        # compressed buffer: int64 uncompressed length, then frame;
        # -1 means the buffer is stored uncompressed
        ulen = _i64(raw, 0)
        if ulen == -1:
            return raw[8:]
        if self.codec == "zstd":
            from .zstd import zstd_decompress

            if ulen < 0:
                raise ValueError(f"negative declared buffer length {ulen}")
            # the declared length doubles as the decompression-bomb cap
            plain = zstd_decompress(raw[8:], max_output=ulen)
        else:
            plain = lz4_frame_decompress(raw[8:])
        if len(plain) != ulen:
            raise ValueError(
                f"{self.codec} buffer decompressed to {len(plain)} bytes, "
                f"declared {ulen}"
            )
        return plain


def _decode_column(spec, nodes, body, dictionaries):
    """Decode one column (and its subtree) from the node iterator and
    body buffers; returns a Python list of values."""
    try:
        length, null_count = next(nodes)
    except StopIteration:
        raise ValueError(
            "record batch carries fewer field nodes than schema columns"
        ) from None

    typ = spec["type"]
    if typ.startswith("union_"):
        # V5 unions carry NO validity bitmap — nulls live in the
        # children. Buffers: types (int8 per slot), plus offsets
        # (int32 per slot) for dense mode; children follow as their own
        # FieldNode/buffer runs.
        tids = struct.unpack_from(f"<{length}b", body.next_buffer(), 0)
        dense = typ == "union_dense"
        offs = (
            struct.unpack_from(f"<{length}i", body.next_buffer(), 0)
            if dense
            else None
        )
        kids = [
            _decode_column(c, nodes, body, dictionaries)
            for c in spec["children"]
        ]
        id_map = spec["type_ids"]
        out = []
        for i in range(length):
            ci = id_map.get(tids[i])
            if ci is None:
                raise ValueError(
                    f"union slot carries undeclared type id {tids[i]}"
                )
            at = offs[i] if dense else i
            # range-check: a negative offset would silently alias the
            # child's tail via Python indexing
            if at < 0 or at >= len(kids[ci]):
                raise ValueError(
                    f"union offset {at} outside child {ci} "
                    f"(length {len(kids[ci])})"
                )
            out.append(kids[ci][at])
        return out
    if typ == "runend":
        # the REE array itself owns NO buffers (not even validity);
        # run_ends (non-null ints, logical end indices) and values are
        # ordinary child arrays
        run_ends = _decode_column(
            spec["children"][0], nodes, body, dictionaries
        )
        values = _decode_column(
            spec["children"][1], nodes, body, dictionaries
        )
        out = []
        prev = 0
        for end, v in zip(run_ends, values):
            if end is None or end < prev:
                raise ValueError("corrupt run-end array (non-monotonic)")
            out.extend([v] * (end - prev))
            prev = end
        if len(out) != length:
            raise ValueError(
                f"run ends cover {len(out)} rows, node declares {length}"
            )
        return out

    validity = body.next_buffer()

    def is_null(i):
        if null_count == 0 or not validity:
            return False
        return not (validity[i >> 3] >> (i & 7)) & 1

    if spec["dict_id"] is not None:
        # storage is the index array; values come from the dictionary
        fmt = _FMT[spec["index_type"]]
        data = body.next_buffer()
        idxs = struct.unpack_from(f"<{length}{fmt}", data, 0)
        if spec["dict_id"] not in dictionaries:
            raise ValueError(
                f"record batch references dictionary {spec['dict_id']} "
                "before its DictionaryBatch"
            )
        values = dictionaries[spec["dict_id"]]
        return [None if is_null(i) else values[idxs[i]] for i in range(length)]

    if typ == "map":
        # physically list<struct<key, value>>: int32 offsets, one
        # entries child; surfaced as (key, value) tuple lists, matching
        # pyarrow's to_pylist
        offs_buf = body.next_buffer()
        offs = struct.unpack_from(f"<{length + 1}i", offs_buf, 0)
        entries = _decode_column(
            spec["children"][0], nodes, body, dictionaries
        )
        kv_names = [c["name"] for c in spec["children"][0]["children"]]
        pairs = [
            (e[kv_names[0]], e[kv_names[1]]) if e is not None else None
            for e in entries
        ]
        return [
            None if is_null(i) else pairs[offs[i] : offs[i + 1]]
            for i in range(length)
        ]
    if typ in ("list", "largelist"):
        off_fmt = "i" if typ == "list" else "q"
        offs_buf = body.next_buffer()
        offs = struct.unpack_from(f"<{length + 1}{off_fmt}", offs_buf, 0)
        child = _decode_column(spec["children"][0], nodes, body, dictionaries)
        return [
            None if is_null(i) else child[offs[i] : offs[i + 1]]
            for i in range(length)
        ]
    if typ.startswith("fixedlist:"):
        n_elem = int(typ.split(":")[1])
        child = _decode_column(spec["children"][0], nodes, body, dictionaries)
        return [
            None
            if is_null(i)
            else child[i * n_elem : (i + 1) * n_elem]
            for i in range(length)
        ]
    if typ.startswith("fixedbinary:"):
        width = int(typ.split(":")[1])
        data = body.next_buffer()
        return [
            None
            if is_null(i)
            else bytes(data[i * width : (i + 1) * width])
            for i in range(length)
        ]
    if typ.startswith("decimal"):
        import decimal as _dec

        head, scale_s = typ.split(":")
        width = int(head[len("decimal"):]) // 8
        scale = int(scale_s)
        data = body.next_buffer()
        out = []
        for i in range(length):
            if is_null(i):
                out.append(None)
                continue
            raw = int.from_bytes(
                data[i * width : (i + 1) * width], "little", signed=True
            )
            # scale under an explicit wide context: decimal256 holds
            # up to 76 significant digits, and the DEFAULT context
            # (prec=28) silently ROUNDS the scaleb result
            out.append(
                _dec.Decimal(raw).scaleb(-scale, _DEC128_CTX)
            )
        return out
    if typ in (
        "time_s", "time_ms", "time_us", "time_ns",
        "dur_s", "dur_ms", "dur_us", "dur_ns",
    ):
        import datetime as _dt

        fmt = "i" if typ in ("time_s", "time_ms") else "q"
        data = body.next_buffer()
        vals = struct.unpack_from(f"<{length}{fmt}", data, 0)
        unit = typ.split("_")[1]
        if typ == "dur_ns":
            # timedelta cannot hold ns; pandas Timedelta can, and is
            # what pyarrow's own to_pylist returns for duration[ns]
            import pandas as _pd

            conv = lambda v: _pd.Timedelta(v, unit="ns")  # noqa: E731
        else:
            # time_ns TRUNCATES to microseconds (datetime.time cannot
            # hold ns) — exactly pyarrow's to_pylist behavior
            mult = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[unit]

            def conv(v, _m=mult, _t=typ):
                us = (v // 1_000 if _t == "time_ns" else v) * _m
                if _t.startswith("dur_"):
                    return _dt.timedelta(microseconds=us)
                return (
                    _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)
                ).time()

        return [None if is_null(i) else conv(vals[i]) for i in range(length)]
    if typ in ("interval_ym", "interval_dt", "interval_mdn"):
        data = body.next_buffer()
        if typ == "interval_ym":  # int32 months
            vals = struct.unpack_from(f"<{length}i", data, 0)
        elif typ == "interval_dt":  # (int32 days, int32 ms) per element
            flat = struct.unpack_from(f"<{length * 2}i", data, 0)
            vals = [tuple(flat[2 * i : 2 * i + 2]) for i in range(length)]
        else:  # MONTH_DAY_NANO: (int32 months, int32 days, int64 ns)
            vals = [
                struct.unpack_from("<iiq", data, 16 * i)
                for i in range(length)
            ]
        return [None if is_null(i) else vals[i] for i in range(length)]
    if typ == "struct":
        kids = [
            (c["name"], _decode_column(c, nodes, body, dictionaries))
            for c in spec["children"]
        ]
        return [
            None
            if is_null(i)
            else {name: col[i] for name, col in kids}
            for i in range(length)
        ]
    if typ in ("utf8", "binary", "largeutf8", "largebinary"):
        off_fmt = "i" if typ in ("utf8", "binary") else "q"
        offs_buf = body.next_buffer()
        data = body.next_buffer()
        offs = struct.unpack_from(f"<{length + 1}{off_fmt}", offs_buf, 0)
        if typ in ("utf8", "largeutf8"):
            return [
                None
                if is_null(i)
                else data[offs[i] : offs[i + 1]].decode("utf-8")
                for i in range(length)
            ]
        return [
            None if is_null(i) else bytes(data[offs[i] : offs[i + 1]])
            for i in range(length)
        ]
    if typ in ("utf8view", "binaryview"):
        # view layout: one buffer of 16-byte view structs, then a
        # VARIADIC run of data buffers whose count comes from the
        # RecordBatch's variadicBufferCounts. Each view: int32 length;
        # length <= 12 inlines the bytes, else int32 prefix + int32
        # buffer index + int32 offset into that data buffer.
        views = body.next_buffer()
        data_bufs = [body.next_buffer() for _ in range(body.next_variadic_count())]
        out = []
        for i in range(length):
            if is_null(i):
                out.append(None)
                continue
            at = 16 * i
            ln = _i32(views, at)
            if ln < 0:
                raise ValueError("negative view length")
            if ln <= 12:
                raw = views[at + 4 : at + 4 + ln]
            else:
                bidx = _i32(views, at + 8)
                off = _i32(views, at + 12)
                if bidx >= len(data_bufs):
                    raise ValueError(
                        f"view references data buffer {bidx} of "
                        f"{len(data_bufs)}"
                    )
                raw = data_bufs[bidx][off : off + ln]
                if len(raw) != ln:
                    raise ValueError("view exceeds its data buffer")
                if raw[:4] != views[at + 4 : at + 8]:
                    raise ValueError("view prefix mismatch")
            out.append(
                raw.decode("utf-8") if typ == "utf8view" else bytes(raw)
            )
        return out
    if typ in ("listview", "largelistview"):
        # offsets AND sizes buffers (unordered, possibly overlapping
        # ranges into the child — the out-of-order-write layout)
        fmt = "i" if typ == "listview" else "q"
        offs = struct.unpack_from(f"<{length}{fmt}", body.next_buffer(), 0)
        sizes = struct.unpack_from(f"<{length}{fmt}", body.next_buffer(), 0)
        child = _decode_column(spec["children"][0], nodes, body, dictionaries)
        out = []
        for i in range(length):
            if is_null(i):
                out.append(None)
                continue
            if offs[i] < 0 or sizes[i] < 0 or offs[i] + sizes[i] > len(child):
                raise ValueError("list view range outside child array")
            out.append(child[offs[i] : offs[i] + sizes[i]])
        return out
    if typ in ("date32", "date64") or typ.startswith("ts_"):
        import datetime as _dt

        base = typ.split("@")[0]  # tz-aware tags are "ts_<unit>@<tz>"
        aware = "@" in typ
        tzinfo = _dt.timezone.utc if aware else None
        fmt = "i" if typ == "date32" else "q"
        data = body.next_buffer()
        vals = struct.unpack_from(f"<{length}{fmt}", data, 0)
        epoch_d = _dt.date(1970, 1, 1)
        epoch_t = _dt.datetime(1970, 1, 1, tzinfo=tzinfo)
        if typ == "date32":
            conv = lambda v: epoch_d + _dt.timedelta(days=v)  # noqa: E731
        elif typ == "date64":
            conv = lambda v: (  # noqa: E731
                epoch_d + _dt.timedelta(milliseconds=v)
            )
        elif base == "ts_s":
            conv = lambda v: epoch_t + _dt.timedelta(seconds=v)  # noqa: E731
        elif base == "ts_ms":
            conv = lambda v: (  # noqa: E731
                epoch_t + _dt.timedelta(milliseconds=v)
            )
        elif base == "ts_us":
            conv = lambda v: (  # noqa: E731
                epoch_t + _dt.timedelta(microseconds=v)
            )
        else:  # ts_ns: datetime cannot hold ns; pandas Timestamp can,
            # and matches pyarrow's to_pylist. tz-aware stays a UTC
            # instant (aware values compare by instant).
            import pandas as _pd

            _tz = "UTC" if aware else None
            conv = lambda v: _pd.Timestamp(v, unit="ns", tz=_tz)  # noqa: E731
        return [None if is_null(i) else conv(vals[i]) for i in range(length)]
    if typ == "bool":
        d = body.next_buffer()
        return [
            None if is_null(i) else bool((d[i >> 3] >> (i & 7)) & 1)
            for i in range(length)
        ]
    fmt = _FMT[typ]
    data = body.next_buffer()
    vals = struct.unpack_from(f"<{length}{fmt}", data, 0)
    return [None if is_null(i) else vals[i] for i in range(length)]


def _batch_parts(payload, header, body_at):
    """(nodes iterator, _BatchBody, n_rows) for a RecordBatch table."""
    # RecordBatch: length(0), nodes(1), buffers(2), compression(3),
    # variadicBufferCounts(4)
    n_rows = header.scalar(0, "<q", 0)
    nat, nn = header.vector(1)
    nodes = iter(
        [
            (_i64(payload, nat + 16 * i), _i64(payload, nat + 16 * i + 8))
            for i in range(nn)
        ]
    )
    bat, nb = header.vector(2)
    bufs = [
        (_i64(payload, bat + 16 * i), _i64(payload, bat + 16 * i + 8))
        for i in range(nb)
    ]
    codec = None
    comp = header.table(3)
    if comp is not None:
        c = comp.scalar(0, "<b", 0)  # 0 LZ4_FRAME, 1 ZSTD
        if c == 0:
            codec = "lz4"
        elif c == 1:
            codec = "zstd"  # pure-Python RFC 8878 decoder (zstd.py)
        else:
            raise ValueError(f"unknown arrow body compression codec {c}")
    vat, vn = header.vector(4)
    variadic = [_i64(payload, vat + 8 * i) for i in range(vn)]
    return nodes, _BatchBody(payload, body_at, bufs, codec, variadic), n_rows


def parse_arrow_ipc(payload: bytes) -> tuple[list[tuple[str, str]], list[dict]]:
    """(schema [(name, type-string)], rows) of an Arrow IPC stream or
    Feather v2 file; nulls come back as None, lists as Python lists,
    structs as dicts, dictionary columns as their decoded values."""
    pos = 0
    if payload[:6] == b"ARROW1":  # file format: magic + padding, then stream
        pos = 8
    fields: list[dict] = []
    rows: list[dict] = []
    dictionaries: dict[int, list] = {}
    n = len(payload)
    while pos + 8 <= n:
        cont = struct.unpack_from("<I", payload, pos)[0]
        if cont != 0xFFFFFFFF:
            if cont == 0:  # pre-1.0 end-of-stream
                break
            raise ValueError("bad arrow IPC continuation marker")
        meta_len = _i32(payload, pos + 4)
        if meta_len == 0:  # end-of-stream
            break
        meta_at = pos + 8
        root = _Table(payload, meta_at + _i32(payload, meta_at))
        # Message: version(0), header_type(1, union), header(2),
        # bodyLength(3)
        htype = root.scalar(1, "<B", 0)
        header = root.table(2)
        body_len = root.scalar(3, "<q", 0)
        body_at = meta_at + meta_len
        if htype == 1:  # Schema
            _vat, nf = header.vector(1)
            fields = [
                _parse_field(header.vtable_elem(1, i)) for i in range(nf)
            ]
        elif htype == 2:  # DictionaryBatch: id(0), data(1), isDelta(2)
            if not fields:
                raise ValueError("dictionary batch before schema")
            did = header.scalar(0, "<q", 0)
            is_delta = bool(header.scalar(2, "<B", 0))
            spec = _dict_value_spec(fields, did)
            nodes, body, _nr = _batch_parts(
                payload, header.table(1), body_at
            )
            values = _decode_column(spec, nodes, body, dictionaries)
            if is_delta and did in dictionaries:
                dictionaries[did] = dictionaries[did] + values
            else:
                dictionaries[did] = values
        elif htype == 3:  # RecordBatch
            if not fields:
                raise ValueError("record batch before schema")
            nodes, body, n_rows = _batch_parts(payload, header, body_at)
            cols = [
                (f["name"], _decode_column(f, nodes, body, dictionaries))
                for f in fields
            ]
            leftover = sum(1 for _ in nodes)
            if leftover:
                raise ValueError(
                    f"record batch carries {leftover} extra field nodes"
                )
            for i in range(n_rows):
                rows.append({name: col[i] for name, col in cols})
        # 4 (Tensor) / 5 (SparseTensor) cannot appear in table streams
        pos = body_at + body_len
    if not fields:
        raise ValueError("not an arrow IPC payload (no schema message)")
    schema = [(f["name"], _type_str(f)) for f in fields]
    return schema, rows


def _dict_value_spec(fields: list[dict], did: int) -> dict:
    """The VALUE-type spec for dictionary id ``did``: the encoded
    field's own type tree with the encoding stripped (a DictionaryBatch
    body is a single-column RecordBatch of the value type)."""
    stack = list(fields)
    while stack:
        f = stack.pop()
        if f["dict_id"] == did:
            return {**f, "dict_id": None, "index_type": None}
        stack.extend(f["children"])
    raise ValueError(f"dictionary batch for unknown id {did}")
