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
- ``Schema`` messages yield (name, type) per field (ints of any
  width/sign, float32/64, bool, utf8); ``RecordBatch`` messages carry
  FieldNode (length, null_count) and Buffer (offset, length) structs,
  and columns decode from validity bitmaps + offsets + data buffers.

Out of envelope (honest ``NotImplementedError``): dictionary-encoded
columns, nested/list/struct types, body compression (LZ4_FRAME/ZSTD),
and big-endian streams. Tests cross-validate BOTH directions against
pyarrow — our reader on ``pyarrow.ipc`` output and pyarrow on nothing
(we only read; pyarrow is the writer side), plus tamper/envelope pins.
(∅ in reference; Tier C extension.)
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


def _field_type(field: _Table) -> str:
    """Map a Schema.Field to a type tag; union discriminant is field 2,
    union value table field 3 (per Schema.fbs field ids + 1 skip for
    the union type slot)."""
    ttype = field.scalar(2, "<B", 0)
    tval = field.table(3)
    if ttype == 2:  # Int
        bits = tval.scalar(0, "<i", 0) if tval else 0
        signed = bool(tval.scalar(1, "<B", 0)) if tval else False
        return f"{'int' if signed else 'uint'}{bits}"
    if ttype == 3:  # FloatingPoint: 0 HALF, 1 SINGLE, 2 DOUBLE
        prec = tval.scalar(0, "<h", 0) if tval else 0
        if prec == 1:
            return "float32"
        if prec == 2:
            return "float64"
        raise NotImplementedError("float16 arrow column")
    if ttype == 6:
        return "bool"
    if ttype == 5:
        return "utf8"
    raise NotImplementedError(f"arrow type discriminant {ttype}")


_FMT = {
    "int8": "b", "uint8": "B", "int16": "h", "uint16": "H",
    "int32": "i", "uint32": "I", "int64": "q", "uint64": "Q",
    "float32": "f", "float64": "d",
}


def parse_arrow_ipc(payload: bytes) -> tuple[list[tuple[str, str]], list[dict]]:
    """(schema [(name, type)], rows) of an Arrow IPC stream or Feather
    v2 file; nulls come back as None."""
    pos = 0
    if payload[:6] == b"ARROW1":  # file format: magic + padding, then stream
        pos = 8
    schema: list[tuple[str, str]] = []
    rows: list[dict] = []
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
            for i in range(nf):
                f = header.vtable_elem(1, i)
                if f.table(4) is not None:  # dictionary encoding
                    raise NotImplementedError("dictionary-encoded column")
                _cat, nch = f.vector(5)
                if nch:
                    raise NotImplementedError("nested arrow column")
                schema.append((f.string(0), _field_type(f)))
        elif htype == 3:  # RecordBatch
            if not schema:
                raise ValueError("record batch before schema")
            if header.table(3) is not None:
                raise NotImplementedError("compressed arrow body")
            # nodes: FieldNode structs {length:i64, null_count:i64}
            nat, nn = header.vector(1)
            nodes = [
                (_i64(payload, nat + 16 * i), _i64(payload, nat + 16 * i + 8))
                for i in range(nn)
            ]
            bat, nb = header.vector(2)
            bufs = [
                (_i64(payload, bat + 16 * i), _i64(payload, bat + 16 * i + 8))
                for i in range(nb)
            ]
            # A malformed batch with fewer FieldNodes than schema columns
            # must fail loudly like every other malformed-input path —
            # zip() would silently truncate and emit rows missing keys.
            if len(nodes) != len(schema):
                raise ValueError(
                    f"record batch carries {len(nodes)} field nodes for "
                    f"{len(schema)} schema columns"
                )
            need = sum(
                3 if typ == "utf8" else 2 for _n, typ in schema
            )
            if len(bufs) < need:
                raise ValueError(
                    f"record batch carries {len(bufs)} buffers; schema "
                    f"needs {need}"
                )
            cols = []
            bi = 0
            for (name, typ), (length, null_count) in zip(schema, nodes):
                voff, vlen = bufs[bi]
                bi += 1
                validity = payload[body_at + voff : body_at + voff + vlen]

                def is_null(i, _v=validity, _nc=null_count):
                    if _nc == 0 or not _v:
                        return False
                    return not (_v[i >> 3] >> (i & 7)) & 1

                if typ == "utf8":
                    ooff, _olen = bufs[bi]
                    doff, _dlen = bufs[bi + 1]
                    bi += 2
                    offs = struct.unpack_from(
                        f"<{length + 1}i", payload, body_at + ooff
                    )
                    data = payload[body_at + doff :]
                    col = [
                        None
                        if is_null(i)
                        else data[offs[i] : offs[i + 1]].decode("utf-8")
                        for i in range(length)
                    ]
                elif typ == "bool":
                    doff, _dlen = bufs[bi]
                    bi += 1
                    d = payload[body_at + doff :]
                    col = [
                        None
                        if is_null(i)
                        else bool((d[i >> 3] >> (i & 7)) & 1)
                        for i in range(length)
                    ]
                else:
                    fmt = _FMT[typ]
                    doff, _dlen = bufs[bi]
                    bi += 1
                    vals = struct.unpack_from(
                        f"<{length}{fmt}", payload, body_at + doff
                    )
                    col = [
                        None if is_null(i) else vals[i] for i in range(length)
                    ]
                cols.append((name, col))
            for i in range(nodes[0][0] if nodes else 0):
                rows.append({name: col[i] for name, col in cols})
        elif htype == 2:  # DictionaryBatch
            raise NotImplementedError("dictionary batch")
        # 4 (Tensor) / 5 (SparseTensor) cannot appear in table streams
        pos = body_at + body_len
    if not schema:
        raise ValueError("not an arrow IPC payload (no schema message)")
    return schema, rows
