"""Arrow IPC stream WRITING in pure stdlib (SURVEY §2 C5).

The write-side complement to :mod:`.arrow_ipc`: the engine emits the
interchange format of the Python data stack itself — encapsulated
messages (continuation marker + flatbuffers ``Message`` + 8-aligned
body), a ``Schema`` message, one ``RecordBatch`` per batch, and the
end-of-stream marker — with the flatbuffers layer BUILT BY HAND
(vtables, tables, strings, offset vectors, struct vectors; no
flatbuffers library), exactly the structures the sibling reader
parses.

Envelope: int8..int64/uint8..uint64, float32/64, bool, utf8, binary
columns with validity bitmaps; round 12 adds ``list<...>`` /
``struct<...>`` / ``map<k,v>`` in ARBITRARY composition over that
scalar envelope — list<struct>, struct<list>, list<list>,
map-with-list/struct-values and list<map> all round-trip (the field
and column builders recurse; pyarrow confirms values AND exact
types; map entries structs are non-nullable with REQUIRED keys per
the spec) — plus ``dict:utf8`` (a DictionaryEncoding'd field
with int32 indexes whose values ship in one DictionaryBatch message
per id, emitted between the schema and the first record batch; the
Feather footer lists those frames in its dictionaries block vector) —
closing the read/write asymmetry the sibling reader left (it decodes
these shapes since round 9). Optional per-buffer body compression
through this repo's own RFC 8878 zstd ENCODER (:mod:`.zstd`
``zstd_compress`` — each buffer becomes an int64 uncompressed length +
frame, or ``-1`` + raw bytes when compression does not pay, the
convention both pyarrow and the sibling reader use).

Honesty: the test battery has PYARROW (the reference implementation)
read every stream this module writes — plain and zstd-compressed — and
compares ``to_pylist`` against the source rows, so the hand-built
flatbuffers AND the zstd encoder are cross-validated through an
independent reader, not just round-tripped through the sibling module.

(∅ in reference; Tier C extension. Consumed by the sink_arrow_ipc
catalog entry.)
"""

from __future__ import annotations

import struct

# Schema.fbs Type union discriminants (shared with the reader)
_T_INT, _T_FLOAT, _T_BINARY, _T_UTF8, _T_BOOL = 2, 3, 4, 5, 6
_T_LIST, _T_STRUCT = 12, 13
_T_MAP = 17

_SCALAR_FMT = {"i8": "b", "u8": "B", "i16": "h", "i32": "i", "i64": "q"}
_SCALAR_SIZE = {"i8": 1, "u8": 1, "i16": 2, "i32": 4, "i64": 8}


def _split_top(s: str) -> list[str]:
    """Split on commas at angle-bracket depth 0."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


class _Block:
    """One allocation unit: bytes plus u32 fixups to other blocks.
    Blocks are laid out in creation order, so CREATE PARENTS FIRST —
    flatbuffers uoffsets are unsigned and must point forward."""

    __slots__ = ("align", "data", "fixups", "table_at")

    def __init__(self, align: int) -> None:
        self.align = align
        self.data = bytearray()
        # (position inside this block, target block, offset inside it;
        #  inner None = target.table_at, resolved late)
        self.fixups: list[tuple[int, "_Block", int | None]] = []
        self.table_at = 0


class _Builder:
    def __init__(self) -> None:
        self.blocks: list[_Block] = []

    def block(self, align: int = 8) -> _Block:
        b = _Block(align)
        self.blocks.append(b)
        return b

    def assemble(self) -> bytes:
        pos = 0
        places: dict[int, int] = {}
        for b in self.blocks:
            pos += (-pos) % b.align
            places[id(b)] = pos
            pos += len(b.data)
        out = bytearray(pos)
        for b in self.blocks:
            at = places[id(b)]
            out[at : at + len(b.data)] = b.data
            for fp, target, inner in b.fixups:
                if inner is None:
                    inner = target.table_at
                rel = places[id(target)] + inner - (at + fp)
                if rel <= 0:
                    raise AssertionError("flatbuffers offset not forward")
                struct.pack_into("<I", out, at + fp, rel)
        return bytes(out)


def _fill_table(b: _Block, slots: dict[int, tuple]) -> None:
    """Write a vtable+table into ``b``. ``slots[idx]`` is
    ``(kind, value)``: a scalar kind from ``_SCALAR_FMT`` with an int
    value, or ``"ref"`` with a ``(block, inner)`` / ``block`` value.
    Fields at their flatbuffers DEFAULTS must be omitted by the caller.
    Sets ``b.table_at`` (where parents point)."""
    nslots = (max(slots) + 1) if slots else 0
    vt_size = 4 + 2 * nslots
    table_at = vt_size + (-vt_size) % 8  # keep i64 slots 8-aligned
    offs: dict[int, int] = {}
    cur = 4  # the table starts with its 4-byte soffset back to the vtable
    for idx in sorted(
        slots, key=lambda i: -_SCALAR_SIZE.get(slots[i][0], 4)
    ):
        size = _SCALAR_SIZE.get(slots[idx][0], 4)
        cur += (-cur) % size
        offs[idx] = cur
        cur += size
    b.data += struct.pack("<HH", vt_size, cur)
    for idx in range(nslots):
        b.data += struct.pack("<H", offs.get(idx, 0))
    b.data += b"\x00" * (table_at - vt_size)
    tbl = bytearray(cur)
    struct.pack_into("<i", tbl, 0, table_at)
    for idx, (kind, value) in slots.items():
        at = offs[idx]
        if kind == "ref":
            target, inner = (
                value if isinstance(value, tuple) else (value, None)
            )
            b.fixups.append((table_at + at, target, inner))
        else:
            struct.pack_into(f"<{_SCALAR_FMT[kind]}", tbl, at, value)
    b.data += tbl
    b.table_at = table_at


def _string(bld: _Builder, s: str) -> _Block:
    raw = s.encode("utf-8")
    b = bld.block(4)
    b.data += struct.pack("<I", len(raw)) + raw + b"\x00"
    return b


def _fill_ref_vector(b: _Block, items: list[_Block]) -> None:
    b.data += struct.pack("<I", len(items))
    for i, target in enumerate(items):
        b.fixups.append((4 + 4 * i, target, None))
        b.data += b"\x00\x00\x00\x00"


def _struct_vector(bld: _Builder, pairs: list[tuple[int, int]]) -> _Block:
    """Vector of 16-byte (i64, i64) structs (FieldNode / Buffer);
    4 bytes of leading pad put the elements on an 8-byte boundary."""
    b = bld.block(8)
    b.data += b"\x00" * 4
    b.data += struct.pack("<I", len(pairs))
    for x, y in pairs:
        b.data += struct.pack("<qq", x, y)
    b.table_at = 4  # parents point at the length word
    return b


def _type_table(bld: _Builder, tag: str) -> tuple[int, _Block]:
    b = bld.block(8)
    if tag.startswith(("int", "uint")):
        bits = int(tag.lstrip("uint"))
        slots = {0: ("i32", bits)}
        if tag.startswith("int"):
            slots[1] = ("u8", 1)  # is_signed (default false)
        _fill_table(b, slots)
        return _T_INT, b
    if tag in ("float32", "float64"):
        _fill_table(b, {0: ("i16", 1 if tag == "float32" else 2)})
        return _T_FLOAT, b
    if tag in ("bool", "utf8", "binary"):
        _fill_table(b, {})
        return {"bool": _T_BOOL, "utf8": _T_UTF8, "binary": _T_BINARY}[tag], b
    raise ValueError(f"unsupported arrow write type {tag!r}")


def _encapsulate(meta: bytes, body: bytes = b"") -> bytes:
    pad = (-len(meta)) % 8
    meta_p = meta + b"\x00" * pad
    return (
        b"\xff\xff\xff\xff" + struct.pack("<i", len(meta_p)) + meta_p + body
    )


def _bitmap(flags: list[bool]) -> bytes:
    out = bytearray((len(flags) + 7) // 8)
    for i, f in enumerate(flags):
        if f:
            out[i >> 3] |= 1 << (i & 7)
    return bytes(out)


def _dict_ids(schema: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic dictionary-id assignment: top-level ``dict:``
    columns in schema order get ids 0, 1, ... — recomputed identically
    by the schema builder and the batch encoder."""
    ids: dict[str, int] = {}
    for name, tag in schema:
        if tag.startswith("dict:"):
            ids[name] = len(ids)
    return ids


def _field_block(bld: _Builder, name: str, tag: str, dict_id: int | None,
                 nullable: bool = True):
    """One Field table (recursively, for nested tags). Round 12 adds
    ``list<inner>`` (Type List disc 12, one "item" child),
    ``struct<n:tag,...>`` (Type Struct disc 13, per-field children),
    ``map<k,v>`` (Type Map disc 17 with the spec's non-nullable
    entries struct and REQUIRED key child) and ``dict:utf8`` (utf8
    value type + DictionaryEncoding table with int32 indexes) to the
    scalar envelope — all composable. Blocks are created strictly
    parent-first (flatbuffers uoffsets point forward)."""
    f = bld.block(8)
    name_b = _string(bld, name)
    slots: dict[int, tuple] = {0: ("ref", name_b)}
    if nullable:
        slots[1] = ("u8", 1)
    children: list[tuple[str, str]] = []
    if tag.startswith("dict:"):
        if dict_id is None:
            # a nested dict field would collide on id 0 AND never get
            # its values collected (dictionaries are built from
            # top-level columns only) — decline loudly
            raise ValueError(
                "dictionary-encoded columns are supported at the top "
                "level only"
            )
        inner = tag[5:]
        if inner != "utf8":
            raise ValueError(
                f"dictionary-encoded arrow write supports utf8 values "
                f"only, got {inner!r}"
            )
        ttag, type_b = _type_table(bld, inner)
        enc = bld.block(8)
        idx_t = bld.block(8)
        slots[2] = ("u8", ttag)
        slots[3] = ("ref", type_b)
        slots[4] = ("ref", enc)
        _fill_table(f, slots)
        # DictionaryEncoding: id(0 i64), indexType(1: Int), isOrdered(2)
        _fill_table(enc, {0: ("i64", dict_id or 0), 1: ("ref", idx_t)})
        _fill_table(idx_t, {0: ("i32", 32), 1: ("u8", 1)})  # int32 signed
        return f
    if tag.startswith("map<") and tag.endswith(">"):
        kv = _split_top(tag[4:-1])
        if len(kv) != 2:
            raise ValueError(f"bad map spec {tag!r}")
        type_b = bld.block(8)
        slots[2] = ("u8", _T_MAP)
        slots[3] = ("ref", type_b)
        ch_vec = bld.block(4)
        slots[5] = ("ref", ch_vec)
        _fill_table(f, slots)
        _fill_table(type_b, {})  # keysSorted stays default false
        entries = bld.block(8)
        ename = _string(bld, "entries")
        e_type = bld.block(8)
        e_vec = bld.block(4)
        # entries struct: non-nullable per the spec
        _fill_table(entries, {
            0: ("ref", ename), 2: ("u8", _T_STRUCT),
            3: ("ref", e_type), 5: ("ref", e_vec),
        })
        _fill_table(e_type, {})
        kb = _field_block(bld, "key", kv[0], None, nullable=False)
        vb = _field_block(bld, "value", kv[1], None)
        _fill_ref_vector(e_vec, [kb, vb])
        _fill_ref_vector(ch_vec, [entries])
        return f
    if tag.startswith("list<") and tag.endswith(">"):
        type_b = bld.block(8)
        slots[2] = ("u8", _T_LIST)
        slots[3] = ("ref", type_b)
        children = [("item", tag[5:-1].strip())]
    elif tag.startswith("struct<") and tag.endswith(">"):
        type_b = bld.block(8)
        slots[2] = ("u8", _T_STRUCT)
        slots[3] = ("ref", type_b)
        for part in _split_top(tag[7:-1]):
            fn, _, ft = part.partition(":")
            if not ft:
                raise ValueError(f"bad struct field spec {part!r}")
            children.append((fn.strip(), ft.strip()))
    else:
        ttag, type_b0 = _type_table(bld, tag)
        slots[2] = ("u8", ttag)
        slots[3] = ("ref", type_b0)
        _fill_table(f, slots)
        return f
    ch_vec = bld.block(4)
    slots[5] = ("ref", ch_vec)
    _fill_table(f, slots)
    _fill_table(type_b, {})  # List / Struct_ carry no fields
    ch_blocks = [
        _field_block(bld, cn, ct, None) for cn, ct in children
    ]
    _fill_ref_vector(ch_vec, ch_blocks)
    return f


def _build_schema_table(bld: _Builder, schema: list[tuple[str, str]]) -> _Block:
    """Emit the Schema table tree (fields vector, Field tables with
    name/type children) into ``bld``; blocks are created strictly
    parent-first. Shared by the stream schema message and the Feather
    file footer."""
    sch = bld.block(8)
    fields_vec = bld.block(4)
    ids = _dict_ids(schema)
    field_blocks = [
        _field_block(bld, name, tag, ids.get(name))
        for name, tag in schema
    ]
    _fill_ref_vector(fields_vec, field_blocks)
    _fill_table(sch, {1: ("ref", fields_vec)})  # endianness 0 = default
    return sch


def _schema_message(schema: list[tuple[str, str]]) -> bytes:
    bld = _Builder()
    root = bld.block(4)
    root.data += b"\x00\x00\x00\x00"
    msg = bld.block(8)
    sch = _build_schema_table(bld, schema)
    _fill_table(msg, {0: ("i16", 4), 1: ("u8", 1), 2: ("ref", sch)})
    root.fixups.append((0, msg, None))
    return _encapsulate(bld.assemble())


def _encode_column(tag: str, values: list, dict_index=None):
    """(FieldNode pairs, [buffer bytes...]) for one column — a flat
    pre-order list of nodes/buffers covering the column's whole
    subtree (round 12: ``list<...>`` / ``struct<...>`` recurse;
    ``dict:utf8`` emits the int32 index array against ``dict_index``,
    the value→slot mapping of the column's DictionaryBatch)."""
    n = len(values)
    nulls = [v is None for v in values]
    null_count = sum(nulls)
    validity = _bitmap([not x for x in nulls]) if null_count else b""
    bufs = [validity]
    if tag.startswith("dict:"):
        idxs = [0 if v is None else dict_index[v] for v in values]
        bufs.append(struct.pack(f"<{n}i", *idxs))
        return [(n, null_count)], bufs
    if tag.startswith("map<") and tag.endswith(">"):
        kv = _split_top(tag[4:-1])
        offs = [0]
        keys: list = []
        vals: list = []
        for v in values:
            if v is not None:
                items = v.items() if hasattr(v, "items") else v
                for k, x in items:
                    if k is None:
                        raise ValueError(
                            "map key is None but arrow map keys are "
                            "non-nullable"
                        )
                    keys.append(k)
                    vals.append(x)
            offs.append(len(keys))
        if offs[-1] > 0x7FFFFFFF:
            raise ValueError("batch too large for int32 map offsets")
        bufs.append(struct.pack(f"<{n + 1}i", *offs))
        # entries struct: non-nullable, no null entries -> empty bitmap
        nodes = [(n, null_count), (len(keys), 0)]
        bufs.append(b"")
        knodes, kbufs = _encode_column(kv[0], keys)
        vnodes, vbufs = _encode_column(kv[1], vals)
        return nodes + knodes + vnodes, bufs + kbufs + vbufs
    if tag.startswith("list<") and tag.endswith(">"):
        inner = tag[5:-1].strip()
        offs = [0]
        flat: list = []
        for v in values:
            if v is not None:
                flat.extend(v)
            offs.append(len(flat))
        if offs[-1] > 0x7FFFFFFF:
            raise ValueError("batch too large for int32 list offsets")
        bufs.append(struct.pack(f"<{n + 1}i", *offs))
        child_nodes, child_bufs = _encode_column(inner, flat)
        return [(n, null_count)] + child_nodes, bufs + child_bufs
    if tag.startswith("struct<") and tag.endswith(">"):
        nodes = [(n, null_count)]
        for part in _split_top(tag[7:-1]):
            fn, _, ft = part.partition(":")
            fvals = [
                None if v is None else v.get(fn.strip()) for v in values
            ]
            cn, cb = _encode_column(ft.strip(), fvals)
            nodes.extend(cn)
            bufs.extend(cb)
        return nodes, bufs
    if tag in ("utf8", "binary"):
        offs = [0]
        data = bytearray()
        for v in values:
            if v is not None:
                data += v.encode("utf-8") if tag == "utf8" else v
            offs.append(len(data))
        if offs[-1] > 0x7FFFFFFF:
            raise ValueError("batch too large for int32 offsets")
        bufs.append(struct.pack(f"<{n + 1}i", *offs))
        bufs.append(bytes(data))
    elif tag == "bool":
        bufs.append(_bitmap([bool(v) for v in values]))
    else:
        fmt = {
            "int8": "b", "uint8": "B", "int16": "h", "uint16": "H",
            "int32": "i", "uint32": "I", "int64": "q", "uint64": "Q",
            "float32": "f", "float64": "d",
        }[tag]
        zero = 0.0 if tag.startswith("float") else 0
        bufs.append(
            struct.pack(
                f"<{n}{fmt}", *(zero if v is None else v for v in values)
            )
        )
    return [(n, null_count)], bufs


def _pack_body(
    raw_bufs: list[bytes], compression: str | None
) -> tuple[bytes, list[tuple[int, int]]]:
    """8-aligned body bytes + Buffer (offset, length) metadata,
    compressing per-buffer when requested."""
    if compression is not None:
        if compression != "zstd":
            raise ValueError(f"unsupported write compression {compression}")
        from .zstd import zstd_compress

        packed = []
        for raw in raw_bufs:
            if not raw:
                packed.append(b"")
                continue
            comp = zstd_compress(raw, checksum=False)
            if len(comp) < len(raw):
                packed.append(struct.pack("<q", len(raw)) + comp)
            else:  # -1: stored uncompressed
                packed.append(struct.pack("<q", -1) + raw)
        raw_bufs = packed
    body = bytearray()
    buf_meta: list[tuple[int, int]] = []
    for raw in raw_bufs:
        body += b"\x00" * ((-len(body)) % 8)
        buf_meta.append((len(body), len(raw)))
        body += raw
    body += b"\x00" * ((-len(body)) % 8)
    return bytes(body), buf_meta


def _emit_batch(
    n_rows: int,
    nodes: list[tuple[int, int]],
    raw_bufs: list[bytes],
    compression: str | None,
    dict_id: int | None = None,
) -> tuple[bytes, int, int]:
    """Encapsulated RecordBatch message — or, when ``dict_id`` is not
    None, a DictionaryBatch message wrapping the RecordBatch table."""
    body, buf_meta = _pack_body(raw_bufs, compression)
    bld = _Builder()
    root = bld.block(4)
    root.data += b"\x00\x00\x00\x00"
    msg = bld.block(8)
    if dict_id is not None:
        db = bld.block(8)
    rb = bld.block(8)
    nodes_vec = _struct_vector(bld, nodes)
    bufs_vec = _struct_vector(bld, buf_meta)
    rb_slots = {
        0: ("i64", n_rows),
        1: ("ref", nodes_vec),
        2: ("ref", bufs_vec),
    }
    if compression is not None:
        comp_tbl = bld.block(8)
        _fill_table(comp_tbl, {0: ("i8", 1)})  # codec ZSTD (default LZ4)
        rb_slots[3] = ("ref", comp_tbl)
    _fill_table(rb, rb_slots)
    if dict_id is not None:
        # DictionaryBatch: id(0), data(1: RecordBatch), isDelta(2)
        _fill_table(db, {0: ("i64", dict_id), 1: ("ref", rb)})
    _fill_table(
        msg,
        {
            0: ("i16", 4),  # version V5
            1: ("u8", 2 if dict_id is not None else 3),
            2: ("ref", db if dict_id is not None else rb),
            3: ("i64", len(body)),
        },
    )
    root.fixups.append((0, msg, None))
    meta = bld.assemble()
    pad = (-len(meta)) % 8
    return (
        _encapsulate(meta, body),
        8 + len(meta) + pad,  # metaDataLength incl. the 8-byte prefix
        len(body),
    )


def _batch_message(
    schema: list[tuple[str, str]],
    batch: dict[str, list],
    compression: str | None,
    dict_indexes: dict[str, dict] | None = None,
) -> tuple[bytes, int, int]:
    nodes: list[tuple[int, int]] = []
    raw_bufs: list[bytes] = []
    n_rows = len(batch[schema[0][0]]) if schema else 0
    for name, tag in schema:
        values = batch[name]
        if len(values) != n_rows:
            raise ValueError("ragged record batch")
        col_nodes, bufs = _encode_column(
            tag, values, (dict_indexes or {}).get(name)
        )
        nodes.extend(col_nodes)
        raw_bufs.extend(bufs)
    return _emit_batch(n_rows, nodes, raw_bufs, compression)


def _build_dictionaries(
    schema: list[tuple[str, str]],
    batches: list[dict[str, list]],
) -> tuple[dict[str, dict], list[tuple[int, list]]]:
    """(per-column value→index mappings, [(dict_id, values)]) for the
    ``dict:`` columns — values in first-appearance order across ALL
    batches, so one DictionaryBatch per id precedes every record
    batch (no delta batches needed)."""
    ids = _dict_ids(schema)
    indexes: dict[str, dict] = {}
    payloads: list[tuple[int, list]] = []
    for name, tag in schema:
        if name not in ids:
            continue
        idx: dict = {}
        for batch in batches:
            for v in batch[name]:
                if v is not None and v not in idx:
                    idx[v] = len(idx)
        indexes[name] = idx
        payloads.append((ids[name], list(idx)))
    return indexes, payloads


def _dict_batch_frames(
    payloads: list[tuple[int, list]], compression: str | None
) -> list[tuple[bytes, int, int]]:
    """One encapsulated DictionaryBatch frame per dictionary id; the
    wrapped RecordBatch is a single non-null utf8 column."""
    frames = []
    for did, values in payloads:
        nodes, bufs = _encode_column("utf8", values)
        frames.append(
            _emit_batch(len(values), nodes, bufs, compression, dict_id=did)
        )
    return frames


def encode_arrow_stream(
    schema: list[tuple[str, str]],
    batches: list[dict[str, list]],
    compression: str | None = None,
) -> bytes:
    """Encode an Arrow IPC STREAM: schema message, one RecordBatch per
    batch, end-of-stream marker. ``schema`` is ``[(name, tag)]`` with
    tags from the envelope above; each batch maps name -> values
    (``None`` = null). ``compression="zstd"`` compresses every buffer
    with this repo's own encoder."""
    out = bytearray(_schema_message(schema))
    dict_indexes, dict_payloads = _build_dictionaries(schema, batches)
    for frame, _m, _b in _dict_batch_frames(dict_payloads, compression):
        out += frame
    for batch in batches:
        frame, _meta_len, _body_len = _batch_message(
            schema, batch, compression, dict_indexes
        )
        out += frame
    out += b"\xff\xff\xff\xff\x00\x00\x00\x00"
    return bytes(out)


def encode_feather_file(
    schema: list[tuple[str, str]],
    batches: list[dict[str, list]],
    compression: str | None = None,
) -> bytes:
    """Encode the Arrow IPC FILE format (Feather v2): ``ARROW1`` magic,
    the stream messages, the EOS marker, then a Footer flatbuffer
    (schema + Block structs locating every RecordBatch for seekable
    readers), the int32 footer length, and the trailing magic —
    readable by ``pyarrow.ipc.open_file`` / ``pyarrow.feather``."""
    out = bytearray(b"ARROW1\x00\x00")
    out += _schema_message(schema)
    dict_indexes, dict_payloads = _build_dictionaries(schema, batches)
    dict_blocks: list[tuple[int, int, int]] = []
    for frame, meta_len, body_len in _dict_batch_frames(
        dict_payloads, compression
    ):
        dict_blocks.append((len(out), meta_len, body_len))
        out += frame
    blocks: list[tuple[int, int, int]] = []
    for batch in batches:
        frame, meta_len, body_len = _batch_message(
            schema, batch, compression, dict_indexes
        )
        blocks.append((len(out), meta_len, body_len))
        out += frame
    out += b"\xff\xff\xff\xff\x00\x00\x00\x00"

    def _block_vec(entries):
        bv = bld.block(8)
        bv.data += b"\x00" * 4  # elements (24-byte structs) 8-aligned
        bv.data += struct.pack("<I", len(entries))
        for off, mlen, blen in entries:
            bv.data += struct.pack("<qi4xq", off, mlen, blen)
        bv.table_at = 4
        return bv

    bld = _Builder()
    root = bld.block(4)
    root.data += b"\x00\x00\x00\x00"
    footer = bld.block(8)
    sch = _build_schema_table(bld, schema)
    # Footer: version(0), schema(1), dictionaries(2), recordBatches(3)
    slots = {0: ("i16", 4), 1: ("ref", sch), 3: ("ref", _block_vec(blocks))}
    if dict_blocks:
        slots[2] = ("ref", _block_vec(dict_blocks))
    _fill_table(footer, slots)
    root.fixups.append((0, footer, None))
    fbytes = bld.assemble()
    out += fbytes
    out += struct.pack("<i", len(fbytes))
    out += b"ARROW1"
    return bytes(out)
