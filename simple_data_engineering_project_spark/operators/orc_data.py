"""ORC file reading in pure Python (SURVEY §2 C12, round 9).

The third columnar format the repo authors a reader for (parquet:
parquet_data.py, Arrow IPC: arrow_ipc.py). Implements the ORC v1
specification (orc.apache.org/specification/ORCv1) the way the format
is defined:

- tail walk: 1-byte postscript length → PostScript protobuf
  (uncompressed by definition) → Footer protobuf (stream-compressed);
- protobuf parsing is a hand-rolled wire-format walker (varint /
  64-bit / length-delimited / 32-bit), the same approach as the
  repo's TFRecord Example codec — no protobuf dependency;
- stream compression framing: 3-byte little-endian chunk headers
  ``(length << 1) | is_original`` over NONE / ZLIB (raw deflate) /
  SNAPPY (own decoder) / ZSTD (own decoder) / LZ4 (own block decoder);
- Boolean/byte RLE for PRESENT bitmaps, full integer RLEv2 — all four
  sub-encodings: SHORT_REPEAT, DIRECT, PATCHED_BASE, DELTA — with the
  spec's closed 5-bit width-code table and MSB-first bit unpacking;
- columns: BOOLEAN, BYTE (sign-extended), SHORT/INT/LONG (zigzag
  RLEv2), FLOAT/DOUBLE (LE streams), DATE (epoch-day RLEv2),
  TIMESTAMP (2015-epoch seconds + trailing-zero-compressed nanos,
  incl. the C++ writer's negative-nanos pre-1970 convention),
  STRING/BINARY in both DIRECT_V2 (LENGTH + DATA) and DICTIONARY_V2
  (indices + dict) column encodings, with PRESENT re-seating nulls.

Honesty: cross-validated against the in-container reference
implementations — pyarrow.orc (ORC C++) writes the unit-battery files
across codecs/encodings/multi-stripe layouts, and the graded catalog
entry decodes files written by SPARK's JVM ORC writer and hash-matches
DuckDB reading the same source rows.

DECIMAL decodes too (unbounded zigzag-varint unscaled values + a
signed-RLEv2 per-value scale stream → Python Decimal).

ONE level of nesting decodes too (round 10,
:func:`read_orc_nested_columns`): array<scalar> via the parent's
PRESENT + LENGTH streams slicing a child scalar column sized by the
summed lengths, and struct<scalar,...> via the parent's PRESENT with
one child entry per present row — cross-validated against pyarrow.orc
across 4 codecs, multi-stripe layouts, and Spark-written files.

Round 11 adds list<struct<scalars>> (element STRUCT with its own
PRESENT over all elements), map<scalar,scalar> (LIST layout with
key/value children), struct fields mixing scalars with
list<scalar> (struct<list>), and list<list<scalar>> (chained
LENGTH levels). Round 12 adds integer RLEv1 (Hive-0.11-era files,
column encodings DIRECT=0/DICTIONARY=1): every integer-stream decode
dispatches on the column encoding via :func:`_int_rle`,
cross-validated against pyarrow-written ``file_version="0.11"``
fixtures, plus map values that are themselves structs or lists
(map<k,struct<scalars>>, map<k,list<scalar>>). Round 13 adds the
GENERIC recursive node reader: any LIST/MAP/STRUCT composition —
three-deep lists, map-of-map, struct<map> — decodes through one
recursion over the PRESENT/LENGTH chains. Declined loudly: UNION.

Scale shape: file-per-task, same as parquet_data.pure_parquet_scan —
each executor decodes whole files independently, no shuffle.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"ORC"

# Type.kind enum
_K_BOOLEAN, _K_BYTE, _K_SHORT, _K_INT, _K_LONG = 0, 1, 2, 3, 4
_K_FLOAT, _K_DOUBLE, _K_STRING, _K_BINARY = 5, 6, 7, 8
_K_TIMESTAMP, _K_LIST, _K_MAP, _K_STRUCT = 9, 10, 11, 12
_K_UNION, _K_DECIMAL, _K_DATE, _K_VARCHAR, _K_CHAR = 13, 14, 15, 16, 17

# Stream.kind enum
_S_PRESENT, _S_DATA, _S_LENGTH, _S_DICT = 0, 1, 2, 3
_S_SECONDARY = 5

# TIMESTAMP seconds are relative to 2015-01-01 00:00:00 UTC
_TS_EPOCH_SECONDS = 1420070400

# RLEv2 5-bit width-code table (spec "Bit packing" closed set)
_WIDTHS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64,
]


def _pb_fields(buf: bytes, pos: int = 0, end: int | None = None):
    """Yield (field_id, wire_type, value) over a protobuf message."""
    end = len(buf) if end is None else end
    while pos < end:
        key = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            key |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fid, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fid, wire, v
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fid, wire, buf[pos : pos + ln]
            pos += ln
        elif wire == 1:
            yield fid, wire, buf[pos : pos + 8]
            pos += 8
        elif wire == 5:
            yield fid, wire, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"protobuf wire type {wire}")


def _pb_map(buf: bytes) -> dict:
    """{field_id: last value or list of repeated values}."""
    out: dict = {}
    for fid, _w, v in _pb_fields(buf):
        if fid in out:
            prev = out[fid]
            if isinstance(prev, list):
                prev.append(v)
            else:
                out[fid] = [prev, v]
        else:
            out[fid] = v
    return out


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _decompress_stream(codec: int, data: bytes) -> bytes:
    """Undo ORC's chunked stream framing for the given codec."""
    if codec == 0:  # NONE: no framing at all
        return data
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 3 > n:
            raise ValueError("truncated ORC compression chunk header")
        h = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        length = h >> 1
        chunk = data[pos : pos + length]
        if len(chunk) < length:
            raise ValueError("truncated ORC compression chunk")
        pos += length
        if h & 1:  # isOriginal
            out += chunk
        elif codec == 1:  # ZLIB = raw deflate
            out += zlib.decompress(chunk, wbits=-15)
        elif codec == 2:  # SNAPPY
            from .snappy import snappy_decompress

            out += snappy_decompress(chunk)
        elif codec == 4:  # LZ4 block
            from .arrow_ipc import lz4_block_decompress

            tmp = bytearray()
            lz4_block_decompress(chunk, tmp)
            out += tmp
        elif codec == 5:  # ZSTD
            from .zstd import zstd_decompress

            out += zstd_decompress(chunk)
        else:
            raise NotImplementedError(f"ORC codec {codec}")
    return bytes(out)


def _bool_rle(data: bytes, count: int) -> list[bool]:
    """Boolean RLE: byte-RLE over bit-packed bytes, bits MSB-first.
    Unpacked via numpy (one unpackbits call instead of 8·count Python
    appends — round-16, guide §4.2)."""
    import numpy as np

    packed = np.asarray(
        _byte_rle(data, (count + 7) // 8), dtype=np.uint8
    )
    return np.unpackbits(packed)[:count].astype(bool).tolist()


def _byte_rle(data: bytes, count: int) -> list[int]:
    out: list[int] = []
    pos = 0
    n = len(data)
    while len(out) < count and pos < n:
        h = data[pos]
        pos += 1
        if h < 128:  # run of h+3 copies of the next byte
            out.extend([data[pos]] * (h + 3))
            pos += 1
        else:  # 256-h literal bytes
            lit = 256 - h
            out.extend(data[pos : pos + lit])
            pos += lit
    if len(out) < count:
        # silently-short output would mis-seat values against the
        # PRESENT bitmap or drop tail rows — fail loudly instead
        raise ValueError("truncated ORC byte-RLE stream")
    return out[:count]


class _BitReader:
    """MSB-first bit unpacking (RLEv2 packs big-endian)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def take(self, width: int) -> int:
        v = 0
        need = width
        while need:
            byte = self.data[self.pos]
            avail = 8 - self.bit
            grab = min(avail, need)
            shift = avail - grab
            v = (v << grab) | ((byte >> shift) & ((1 << grab) - 1))
            self.bit += grab
            need -= grab
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def align(self) -> int:
        if self.bit:
            self.bit = 0
            self.pos += 1
        return self.pos


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _take_many(data: bytes, pos: int, width: int, n: int) -> tuple[list, int]:
    """``n`` MSB-first ``width``-bit values starting at byte ``pos`` —
    the vectorized twin of ``_BitReader.take`` in a loop (round-16,
    guide §4.2: one numpy unpack instead of a Python call per value).
    Returns (values, next byte pos — the post-run ``align()``).
    Widths above 56 fall back to the bit reader so the power-of-two
    dot stays exact in int64."""
    nbits = width * n
    nbytes = (nbits + 7) >> 3
    if n >= 16 and 0 < width <= 56:
        import numpy as np

        bits = np.unpackbits(
            np.frombuffer(data[pos : pos + nbytes], np.uint8),
            count=nbits,
        )
        vals = bits.reshape(n, width) @ (
            np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64)
        )
        return vals.tolist(), pos + nbytes
    br = _BitReader(data, pos)
    vals = [br.take(width) for _ in range(n)]
    return vals, br.align()


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def rlev2_decode(data: bytes, count: int, signed: bool) -> list[int]:
    """Integer RLEv2 — all four sub-encodings per the ORC v1 spec."""
    out: list[int] = []
    pos = 0
    while len(out) < count and pos < len(data):
        first = data[pos]
        sub = first >> 6
        if sub == 0:  # SHORT_REPEAT
            width = ((first >> 3) & 0x7) + 1
            rep = (first & 0x7) + 3
            v = int.from_bytes(data[pos + 1 : pos + 1 + width], "big")
            pos += 1 + width
            if signed:
                v = _unzigzag(v)
            out.extend([v] * rep)
        elif sub == 1:  # DIRECT
            width = _WIDTHS[(first >> 1) & 0x1F]
            length = ((first & 1) << 8 | data[pos + 1]) + 1
            vals, pos = _take_many(data, pos + 2, width, length)
            if signed:
                vals = [(v >> 1) ^ -(v & 1) for v in vals]
            out.extend(vals)
        elif sub == 2:  # PATCHED_BASE
            width = _WIDTHS[(first >> 1) & 0x1F]
            length = ((first & 1) << 8 | data[pos + 1]) + 1
            third, fourth = data[pos + 2], data[pos + 3]
            bw = (third >> 5) + 1  # base value width in bytes
            pw = _WIDTHS[third & 0x1F]  # patch value width
            pgw = (fourth >> 5) + 1  # patch gap width in bits
            pll = fourth & 0x1F  # patch list length
            pos += 4
            base = int.from_bytes(data[pos : pos + bw], "big")
            # base is sign-MAGNITUDE: MSB of the base bytes is the sign
            sign_bit = 1 << (bw * 8 - 1)
            if base & sign_bit:
                base = -(base & (sign_bit - 1))
            pos += bw
            # the packed-literal and patch-list sections are written by
            # SEPARATE bit-packing calls in the reference writers, so
            # the patch list starts at the next BYTE boundary
            vals, pos = _take_many(data, pos, width, length)
            # (gap, patch) pairs are packed at the CLOSEST SUPPORTED
            # width >= pgw+pw from the fixed-width table (the reference
            # readers' getClosestFixedBits) — packing at exactly
            # pgw+pw desyncs whenever the sum is not in the closed set
            need = pgw + pw
            # clamp like the reference getClosestFixedBits: a corrupt
            # header can spell pgw+pw up to 72, which must not escape
            # as a bare StopIteration
            patch_width = next((w for w in _WIDTHS if w >= need), 64)
            patches, pos = _take_many(data, pos, patch_width, pll)
            idx = 0
            for gap, patch in (
                ((p >> pw), p & ((1 << pw) - 1)) for p in patches
            ):
                idx += gap
                vals[idx] |= patch << width
            out.extend(base + v for v in vals)
        else:  # DELTA
            wcode = (first >> 1) & 0x1F
            width = 0 if wcode == 0 else _WIDTHS[wcode]
            length = ((first & 1) << 8 | data[pos + 1]) + 1  # = count
            pos += 2
            u, pos = _varint(data, pos)
            base = _unzigzag(u) if signed else u
            du, pos = _varint(data, pos)
            delta0 = _unzigzag(du)  # delta base is ALWAYS signed
            seq = [base, base + delta0]
            if width and length > 2:
                deltas, pos = _take_many(data, pos, width, length - 2)
                sign = 1 if delta0 >= 0 else -1
                if length - 2 >= 16:
                    import numpy as np

                    # prefix-sum the deltas in one vector op; int64 is
                    # exact (ORC values fit int64 by contract)
                    steps = np.asarray(deltas, dtype=np.int64)
                    seq.extend(
                        (
                            (base + delta0)
                            + sign * np.cumsum(steps, dtype=np.int64)
                        ).tolist()
                    )
                else:
                    for d in deltas:
                        seq.append(seq[-1] + sign * d)
            elif length > 2:
                last = base + delta0
                seq.extend(
                    last + delta0 * i for i in range(1, length - 1)
                )
            out.extend(seq[:length])
    if len(out) < count:
        raise ValueError("truncated ORC RLEv2 stream")
    return out[:count]


def rlev1_decode(data: bytes, count: int, signed: bool) -> list[int]:
    """Integer RLEv1 — the Hive-0.11-era encoding (column encodings
    DIRECT=0 / DICTIONARY=1). Two sub-blocks per the ORC spec:

    * header byte 0..127: a RUN of ``header+3`` values — one signed
      delta byte (-128..127) then the base value as a varint (zigzag
      when the column is signed); values are base, base+delta, ...
    * header byte 128..255: ``256-header`` LITERAL varints.

    Cross-validated against pyarrow-written ``file_version="0.11"``
    fixtures (tests/test_orc_data.py) across int/string-length/
    dictionary-index/timestamp/decimal-scale/LIST-length streams."""
    out: list[int] = []
    pos = 0
    n = len(data)
    while len(out) < count and pos < n:
        h = data[pos]
        pos += 1
        if h < 128:  # run
            run = h + 3
            delta = data[pos]
            if delta >= 128:
                delta -= 256
            pos += 1
            u, pos = _varint(data, pos)
            base = _unzigzag(u) if signed else u
            out.extend(base + i * delta for i in range(run))
        else:  # 256-h literal varints
            for _ in range(256 - h):
                u, pos = _varint(data, pos)
                out.append(_unzigzag(u) if signed else u)
    if len(out) < count:
        raise ValueError("truncated ORC RLEv1 stream")
    return out[:count]


def _int_rle(data: bytes, count: int, signed: bool, enc: int) -> list[int]:
    """Dispatch integer RLE by column encoding: DIRECT/DICTIONARY
    (0/1, Hive-0.11 files) carry RLEv1 streams; DIRECT_V2/
    DICTIONARY_V2 (2/3) carry RLEv2. Feeding one format to the other
    decoder silently mis-decodes, so every integer-stream call site
    routes through this dispatch (round-12; formerly a loud decline)."""
    if enc in (0, 1):
        return rlev1_decode(data, count, signed)
    return rlev2_decode(data, count, signed)


def _parse_tail(buf: bytes) -> tuple[int, dict, list[dict], list[dict]]:
    """(codec, footer map, types, stripes) from the file tail."""
    if buf[:3] != _MAGIC:
        raise ValueError("not an ORC file")
    ps_len = buf[-1]
    ps = _pb_map(buf[len(buf) - 1 - ps_len : len(buf) - 1])
    footer_len = ps.get(1, 0)
    codec = ps.get(2, 0)
    footer_raw = buf[len(buf) - 1 - ps_len - footer_len : len(buf) - 1 - ps_len]
    footer = _pb_map(_decompress_stream(codec, footer_raw))
    types = [_pb_map(t) for t in _as_list(footer.get(4))]
    stripes = [_pb_map(s) for s in _as_list(footer.get(3))]
    return codec, footer, types, stripes


def _leaf_columns(types: list[dict]) -> dict[str, dict]:
    """{name: {col_id, kind}} for the root struct's scalar children."""
    if not types or types[0].get(1, _K_STRUCT) != _K_STRUCT:
        raise ValueError("ORC root is not a struct")
    root = types[0]
    # subtypes is `repeated uint32` — PACKED or unpacked; shared walk
    subtypes = _subtype_ids(root)
    names = [n.decode("utf-8") for n in _as_list(root.get(3))]
    out = {}
    for name, cid in zip(names, subtypes):
        out[name] = {"col_id": cid, "kind": types[cid].get(1, 0)}
    return out


def read_orc_columns(path_or_bytes, columns: list[str]) -> dict[str, list]:
    """Decode the requested scalar columns of one ORC file into Python
    lists (None for nulls), stripes concatenated in file order."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    codec, _footer, types, stripes = _parse_tail(buf)
    leaves = _leaf_columns(types)
    for c in columns:
        if c not in leaves:
            raise ValueError(f"column {c!r} not in file")
        kind = leaves[c]["kind"]
        if kind in (_K_LIST, _K_MAP, _K_STRUCT):
            raise NotImplementedError(f"ORC column kind {kind} not supported")
    out: dict[str, list] = {c: [] for c in columns}
    for st in stripes:
        offset = st.get(1, 0)
        index_len = st.get(2, 0)
        data_len = st.get(3, 0)
        footer_len = st.get(4, 0)
        n_rows = st.get(5, 0)
        sf_raw = buf[offset + index_len + data_len :][:footer_len]
        sf = _pb_map(_decompress_stream(codec, sf_raw))
        streams = [_pb_map(s) for s in _as_list(sf.get(1))]
        encodings = [_pb_map(e) for e in _as_list(sf.get(2))]
        # stream bodies lie sequentially from the stripe start; record
        # OFFSETS only and slice lazily per requested column — copying
        # every stream (row indexes, unrequested columns) would re-copy
        # the whole stripe per file (review-pass finding)
        wanted = {leaves[c]["col_id"] for c in columns}
        pos = offset
        located: dict[tuple[int, int], bytes] = {}
        for s in streams:
            kind, col, ln = s.get(1, 0), s.get(2, 0), s.get(3, 0)
            if col in wanted and kind in (
                _S_PRESENT, _S_DATA, _S_LENGTH, _S_DICT, _S_SECONDARY
            ):
                located[(col, kind)] = buf[pos : pos + ln]
            pos += ln
        for c in columns:
            cid = leaves[c]["col_id"]
            kind = leaves[c]["kind"]
            enc_pb = encodings[cid] if cid < len(encodings) else {}
            out[c].extend(
                _decode_column(
                    located, codec, cid, kind,
                    enc_pb.get(1, 0), enc_pb.get(2, 0), n_rows,
                )
            )
    return out


def _subtype_ids(t: dict) -> list[int]:
    """Type.subtypes — packed or unpacked repeated uint32."""
    out: list[int] = []
    for v in _as_list(t.get(2)):
        if isinstance(v, int):
            out.append(v)
        else:
            p = 0
            while p < len(v):
                u, p = _varint(v, p)
                out.append(u)
    return out


def _all_subtree_ids(types: list[dict], cid: int) -> list[int]:
    """All type ids in the subtree rooted at ``cid`` (pre-order)."""
    out = [cid]
    for k in _subtype_ids(types[cid]):
        out.extend(_all_subtree_ids(types, k))
    return out


def _read_generic_node(
    cid, count, types, located, encodings, codec
) -> list:
    """Recursive ORC composite decode for ARBITRARY nesting depth
    (round 13): every node owns a PRESENT stream sized by its parent's
    present count; LIST/MAP add a LENGTH stream over the present
    instances and size their children by the summed lengths; STRUCT
    fields weave by the present flags. Scalars delegate to
    :func:`_decode_column` (which handles its own PRESENT +
    dictionary). UNION declines loudly. ORC spec: each compound
    type's streams nest by the parent's present cardinality —
    composition needs no per-shape cases."""
    kind = types[cid].get(1, 0)
    if kind == _K_UNION:
        # round 15 (formerly the last pure-format loud decline): a
        # UNION node carries a DATA stream of variant TAGS (byte RLE
        # over the present rows); child i holds values only for rows
        # tagged i, sized by that tag's count. Decodes to the PLAIN
        # VALUE per row — exactly what pyarrow's to_pylist() yields
        # for the same files (dense-union scalars collapse to their
        # value; the tag is representation metadata). In-container
        # honesty basis: the Java ORC writer stages uniontype
        # fixtures through py4j and BOTH reference readers (pyarrow's
        # ORC C++ and Java's RecordReader) cross-validate the decode
        # in the unit battery.
        praw = located.get((cid, _S_PRESENT))
        present = (
            _bool_rle(_decompress_stream(codec, praw), count)
            if praw is not None
            else [True] * count
        )
        n_present = sum(present)
        draw = located.get((cid, _S_DATA))
        tags = _byte_rle(
            _decompress_stream(codec, draw) if draw else b"", n_present
        )
        kids = _subtype_ids(types[cid])
        queues = []
        for t, k in enumerate(kids):
            n_t = tags.count(t)
            vals_t = _read_generic_node(
                k, n_t, types, located, encodings, codec
            )
            queues.append(iter(vals_t))
        rows: list = []
        ti = 0
        for pr in present:
            if not pr:
                rows.append(None)
                continue
            tg = tags[ti]
            ti += 1
            if tg >= len(queues):
                raise ValueError(
                    f"ORC union tag {tg} exceeds {len(queues)} variants"
                )
            rows.append(next(queues[tg]))
        return rows
    if kind not in (_K_STRUCT, _K_LIST, _K_MAP):
        e = encodings[cid] if cid < len(encodings) else {}
        return _decode_column(
            located, codec, cid, kind, e.get(1, 0), e.get(2, 0), count
        )
    praw = located.get((cid, _S_PRESENT))
    present = (
        _bool_rle(_decompress_stream(codec, praw), count)
        if praw is not None
        else [True] * count
    )
    n_present = sum(present)
    if kind == _K_STRUCT:
        kids = _subtype_ids(types[cid])
        fnames = [
            n.decode("utf-8") for n in _as_list(types[cid].get(3))
        ]
        fields = [
            _read_generic_node(
                k, n_present, types, located, encodings, codec
            )
            for k in kids
        ]
        rows: list = []
        j = 0
        for pr in present:
            if not pr:
                rows.append(None)
                continue
            rows.append({f: col[j] for f, col in zip(fnames, fields)})
            j += 1
        return rows
    enc_parent = (encodings[cid] if cid < len(encodings) else {}).get(1, 0)
    lraw = located.get((cid, _S_LENGTH))
    lengths = _int_rle(
        _decompress_stream(codec, lraw) if lraw else b"",
        n_present, signed=False, enc=enc_parent,
    )
    total = sum(lengths)
    if kind == _K_LIST:
        (eid,) = _subtype_ids(types[cid])
        elems = _read_generic_node(
            eid, total, types, located, encodings, codec
        )
        rows = []
        li = ei = 0
        for pr in present:
            if not pr:
                rows.append(None)
                continue
            ln = lengths[li]
            li += 1
            rows.append(elems[ei: ei + ln])
            ei += ln
        return rows
    kid, vid = _subtype_ids(types[cid])
    # composite map keys (legal ORC) cannot seat as Python dict keys:
    # such maps decode as a LIST of {"key","value"} structs —
    # value-equal to the pair list pyarrow's to_pylist() gives the
    # same files (pyarrow yields (key, value) TUPLES; here each pair
    # is a {"key","value"} struct — round 14, formerly a loud
    # decline). UNION keys (round 15) take the same pair-list route:
    # a union value may be an unhashable composite depending on the
    # row's tag, so the dict form is not generally seatable.
    composite_keys = types[kid].get(1, 0) in (
        _K_LIST, _K_MAP, _K_STRUCT, _K_UNION,
    )
    keys = _read_generic_node(kid, total, types, located, encodings, codec)
    vals = _read_generic_node(vid, total, types, located, encodings, codec)
    rows = []
    li = ei = 0
    for pr in present:
        if not pr:
            rows.append(None)
            continue
        ln = lengths[li]
        li += 1
        pairs = zip(keys[ei: ei + ln], vals[ei: ei + ln])
        if composite_keys:
            rows.append([{"key": k, "value": v} for k, v in pairs])
        else:
            rows.append(dict(pairs))
        ei += ln
    return rows


def read_stripe_stats(path_or_bytes) -> list[list[dict]]:
    """Per-stripe, per-column statistics from the ORC METADATA section
    (between the stripes and the footer; PostScript field 5 gives its
    length): one dict ``{n, min, max, has_null}`` per column id (root
    included at index 0), min/max None when the writer recorded no
    typed stats. IntegerStatistics min/max/sum are ``sint64`` —
    ZIGZAG varints (verified against a Spark-written file whose key
    sum 11,249,925,000 round-trips exactly); DoubleStatistics are
    fixed64 IEEE, StringStatistics utf-8 bytes. This is the zone-map
    layer stripe PRUNING reads — footer-only I/O, never a data byte."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    if buf[:3] != _MAGIC:
        raise ValueError("not an ORC file")
    ps_len = buf[-1]
    ps = _pb_map(buf[len(buf) - 1 - ps_len : len(buf) - 1])
    codec = ps.get(2, 0)
    flen = ps.get(1, 0)
    metalen = ps.get(5, 0)
    end = len(buf) - 1 - ps_len
    if metalen == 0:
        return []
    meta = _pb_map(
        _decompress_stream(codec, buf[end - flen - metalen : end - flen])
    )
    out: list[list[dict]] = []
    for ss_raw in _as_list(meta.get(1)):
        ss = _pb_map(ss_raw)
        cols: list[dict] = []
        for cs_raw in _as_list(ss.get(1)):
            cs = _pb_map(cs_raw)
            rec: dict = {
                "n": cs.get(1),
                "min": None,
                "max": None,
                "has_null": bool(cs.get(10, 0)),
            }
            if 2 in cs:  # IntegerStatistics: sint64 zigzag varints
                ints = _pb_map(cs[2])
                if 1 in ints:
                    rec["min"] = _unzigzag(ints[1])
                if 2 in ints:
                    rec["max"] = _unzigzag(ints[2])
            elif 3 in cs:  # DoubleStatistics: fixed64 IEEE
                dbl = _pb_map(cs[3])
                if 1 in dbl:
                    rec["min"] = struct.unpack("<d", dbl[1])[0]
                if 2 in dbl:
                    rec["max"] = struct.unpack("<d", dbl[2])[0]
            elif 4 in cs:  # StringStatistics: utf-8
                st = _pb_map(cs[4])
                if 1 in st:
                    rec["min"] = st[1].decode("utf-8")
                if 2 in st:
                    rec["max"] = st[2].decode("utf-8")
            cols.append(rec)
        out.append(cols)
    return out


def read_orc_pruned_columns(
    path_or_bytes,
    columns: list[str],
    prune_col: str,
    lo=None,
    hi=None,
) -> tuple[dict[str, list], int, int]:
    """Stripe-SKIPPING scan: decode only the stripes whose
    ``prune_col`` statistics interval [min, max] intersects [lo, hi]
    (either bound may be None = unbounded); stripes without recorded
    stats are read conservatively, and surviving rows still need the
    exact row-level filter downstream. Returns ``(columns dict,
    stripes_decoded, stripes_total)`` — the ORC twin of
    parquet_data.read_parquet_pruned_bytes."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    _codec, _footer, types, stripes = _parse_tail(buf)
    leaves = _leaf_columns(types)
    if prune_col not in leaves:
        raise ValueError(f"column {prune_col!r} not in file")
    cid = leaves[prune_col]["col_id"]
    stats = read_stripe_stats(buf)
    keep = []
    for i in range(len(stripes)):
        mn = mx = None
        if i < len(stats) and cid < len(stats[i]):
            mn = stats[i][cid]["min"]
            mx = stats[i][cid]["max"]
        if mn is None or mx is None:
            keep.append(True)  # no stats: conservative read
        elif (hi is not None and mn > hi) or (lo is not None and mx < lo):
            keep.append(False)
        else:
            keep.append(True)
    data = read_orc_nested_columns(buf, columns, _keep=keep)
    return data, sum(keep), len(keep)


def read_orc_nested_columns(
    path_or_bytes, columns: list[str], _keep: list[bool] | None = None
) -> dict[str, list]:
    """Decode top-level columns with ONE level of nesting (round 10):
    ``array<scalar>`` (LIST type: parent LENGTH stream + child scalar
    column sized by the summed lengths) and ``struct<scalar,...>``
    (parent PRESENT only; child columns carry one entry per present
    parent row). Round 11 adds ``list<struct<scalars>>`` (the element
    STRUCT carries its own PRESENT over all elements; its field
    columns are sized by the present elements) and ``map<k,v>``
    (the LIST layout with two children: key and value columns each
    sized by the summed lengths; rows come back as Python dicts).
    Round 12 adds ``map<k, struct<scalars>>`` (the value STRUCT
    carries its own PRESENT over all entries) and ``map<k,
    list<scalar>>`` (the value LIST carries its own PRESENT + LENGTH
    over entries). Scalar columns pass through unchanged. Round 13:
    any composition the enumerated plans above decline falls through
    to :func:`_read_generic_node` — only UNION declines loudly,
    mirroring the parquet reader's contract."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    codec, _footer, types, stripes = _parse_tail(buf)
    leaves = _leaf_columns(types)
    plan: dict[str, dict] = {}
    for c in columns:
        if c not in leaves:
            raise ValueError(f"column {c!r} not in file")
        cid = leaves[c]["col_id"]
        kind = leaves[c]["kind"]
        try:
            if kind == _K_LIST:
                (elem_id,) = _subtype_ids(types[cid])
                ek = types[elem_id].get(1, 0)
                if ek == _K_STRUCT:
                    # list<struct<scalars>> (round 11): the element struct's
                    # fields are grandchild columns sized by the PRESENT
                    # elements
                    gkids = _subtype_ids(types[elem_id])
                    gnames = [
                        n.decode("utf-8")
                        for n in _as_list(types[elem_id].get(3))
                    ]
                    for g in gkids:
                        if types[g].get(1, 0) in (
                            _K_LIST, _K_MAP, _K_STRUCT, _K_UNION
                        ):
                            raise NotImplementedError(
                                f"ORC column {c!r}: list<struct> fields "
                                "must be scalar"
                            )
                    plan[c] = {
                        "kind": kind, "cid": cid, "children": [elem_id],
                        "elem_struct": (elem_id, gnames, gkids),
                    }
                elif ek == _K_LIST:
                    # list<list<scalar>> (round 11): the inner LIST node
                    # carries its own PRESENT/LENGTH over the outer
                    # elements; its element column is a grandchild
                    (g,) = _subtype_ids(types[elem_id])
                    if types[g].get(1, 0) in (
                        _K_LIST, _K_MAP, _K_STRUCT, _K_UNION
                    ):
                        raise NotImplementedError(
                            f"ORC column {c!r}: list<list> elements must "
                            "be scalar"
                        )
                    plan[c] = {
                        "kind": kind, "cid": cid, "children": [elem_id, g],
                        "elem_list": (elem_id, g),
                    }
                elif ek in (_K_MAP, _K_UNION):
                    raise NotImplementedError(
                        f"ORC column {c!r}: unsupported element nesting"
                    )
                else:
                    plan[c] = {"kind": kind, "cid": cid, "children": [elem_id]}
            elif kind == _K_STRUCT:
                kids = _subtype_ids(types[cid])
                fnames = [n.decode("utf-8") for n in _as_list(types[cid].get(3))]
                list_kids: dict[int, int] = {}
                extra: list[int] = []
                for k in kids:
                    kk = types[k].get(1, 0)
                    if kk == _K_LIST:
                        # struct<list<scalar>> field (round 11): the kid's
                        # PRESENT/LENGTH cover the present struct rows; its
                        # element column is a grandchild
                        (g,) = _subtype_ids(types[k])
                        if types[g].get(1, 0) in (
                            _K_LIST, _K_MAP, _K_STRUCT, _K_UNION
                        ):
                            raise NotImplementedError(
                                f"ORC column {c!r}: struct list fields "
                                "must have scalar elements"
                            )
                        list_kids[k] = g
                        extra.append(g)
                    elif kk in (_K_MAP, _K_STRUCT, _K_UNION):
                        raise NotImplementedError(
                            f"ORC column {c!r}: only one level of nesting"
                        )
                plan[c] = {
                    "kind": kind, "cid": cid, "children": kids + extra,
                    "fields": fnames, "field_kids": kids,
                    "list_kids": list_kids,
                }
            elif kind == _K_MAP:
                # map<scalar,scalar> (round 11): parent LENGTH stream, two
                # child columns (keys, values) each sized by the summed
                # lengths — the LIST layout with two children. Round 12
                # adds map<k, struct<scalars>> (the value STRUCT carries
                # its own PRESENT over all entries; field leaves sized by
                # the present entries) and map<k, list<scalar>> (the value
                # LIST carries its own PRESENT + LENGTH over entries).
                kid, vid = _subtype_ids(types[cid])
                if types[kid].get(1, 0) in (
                    _K_LIST, _K_MAP, _K_STRUCT, _K_UNION
                ):
                    raise NotImplementedError(
                        f"ORC column {c!r}: map keys must be scalar"
                    )
                vk = types[vid].get(1, 0)
                plan[c] = {"kind": kind, "cid": cid, "children": [kid, vid]}
                if vk == _K_STRUCT:
                    gkids = _subtype_ids(types[vid])
                    gnames = [
                        n.decode("utf-8")
                        for n in _as_list(types[vid].get(3))
                    ]
                    for g in gkids:
                        if types[g].get(1, 0) in (
                            _K_LIST, _K_MAP, _K_STRUCT, _K_UNION
                        ):
                            raise NotImplementedError(
                                f"ORC column {c!r}: map<struct> fields "
                                "must be scalar"
                            )
                    plan[c]["children"] = [kid, vid] + gkids
                    plan[c]["val_struct"] = (vid, gnames, gkids)
                elif vk == _K_LIST:
                    (g,) = _subtype_ids(types[vid])
                    if types[g].get(1, 0) in (
                        _K_LIST, _K_MAP, _K_STRUCT, _K_UNION
                    ):
                        raise NotImplementedError(
                            f"ORC column {c!r}: map<list> elements must "
                            "be scalar"
                        )
                    plan[c]["children"] = [kid, vid, g]
                    plan[c]["val_list"] = (vid, g)
                elif vk in (_K_MAP, _K_UNION):
                    raise NotImplementedError(
                        f"ORC column {c!r}: unsupported map value nesting"
                    )
            elif kind == _K_UNION:
                raise NotImplementedError(
                    f"ORC column kind {kind} not supported (union)"
                )
            else:
                plan[c] = {"kind": kind, "cid": cid, "children": []}
        except NotImplementedError:
            # generic fallback (round 13): any composition the
            # enumerated plans decline assembles through the
            # recursive node reader — composite map keys since round
            # 14 (lists of {"key","value"} structs) and UNION columns
            # since round 15 (plain values per row, pyarrow-equal;
            # fixtures staged by the in-container Java ORC writer).
            plan[c] = {
                "kind": "generic", "cid": cid,
                "children": _all_subtree_ids(types, cid)[1:],
            }

    out: dict[str, list] = {c: [] for c in columns}
    for si, st in enumerate(stripes):
        if _keep is not None and not _keep[si]:
            continue  # stripe eliminated by zone-map stats
        offset = st.get(1, 0)
        index_len = st.get(2, 0)
        data_len = st.get(3, 0)
        footer_len = st.get(4, 0)
        n_rows = st.get(5, 0)
        sf_raw = buf[offset + index_len + data_len :][:footer_len]
        sf = _pb_map(_decompress_stream(codec, sf_raw))
        streams = [_pb_map(s) for s in _as_list(sf.get(1))]
        encodings = [_pb_map(e) for e in _as_list(sf.get(2))]
        wanted: set[int] = set()
        for p in plan.values():
            wanted.add(p["cid"])
            wanted.update(p["children"])
            if "elem_struct" in p:
                wanted.update(p["elem_struct"][2])
        pos = offset
        located: dict[tuple[int, int], bytes] = {}
        for s in streams:
            skind, col, ln = s.get(1, 0), s.get(2, 0), s.get(3, 0)
            if col in wanted and skind in (
                _S_PRESENT, _S_DATA, _S_LENGTH, _S_DICT, _S_SECONDARY
            ):
                located[(col, skind)] = buf[pos : pos + ln]
            pos += ln

        def dec(cid2, count):
            e = encodings[cid2] if cid2 < len(encodings) else {}
            return _decode_column(
                located, codec, cid2, types[cid2].get(1, 0),
                e.get(1, 0), e.get(2, 0), count,
            )

        for c in columns:
            p = plan[c]
            cid = p["cid"]
            if p["kind"] == _K_LIST:
                # the parent's LENGTH stream is integer RLE too: an
                # 0.11-era DIRECT/DICTIONARY encoding carries RLEv1
                # (round-12: decoded via _int_rle, formerly declined)
                enc_parent = (
                    encodings[cid] if cid < len(encodings) else {}
                ).get(1, 0)
                praw = located.get((cid, _S_PRESENT))
                present = (
                    _bool_rle(_decompress_stream(codec, praw), n_rows)
                    if praw is not None
                    else [True] * n_rows
                )
                n_present = sum(present)
                lraw = located.get((cid, _S_LENGTH))
                lengths = _int_rle(
                    _decompress_stream(codec, lraw) if lraw else b"",
                    n_present,
                    signed=False,
                    enc=enc_parent,
                )
                n_elems = sum(lengths)
                if "elem_list" in p:
                    # list<list>: the inner LIST node's PRESENT covers
                    # all outer elements; its LENGTH covers the present
                    # inner lists; the grandchild leaf is sized by the
                    # summed inner lengths. 0.11 RLEv1 declines like
                    # every other integer-RLE stream.
                    inner_id, g = p["elem_list"]
                    ienc = (
                        encodings[inner_id]
                        if inner_id < len(encodings)
                        else {}
                    ).get(1, 0)
                    ipraw = located.get((inner_id, _S_PRESENT))
                    ipresent = (
                        _bool_rle(
                            _decompress_stream(codec, ipraw), n_elems
                        )
                        if ipraw is not None
                        else [True] * n_elems
                    )
                    ilraw = located.get((inner_id, _S_LENGTH))
                    ilengths = _int_rle(
                        _decompress_stream(codec, ilraw) if ilraw else b"",
                        sum(ipresent),
                        signed=False,
                        enc=ienc,
                    )
                    grand = dec(g, sum(ilengths))
                    elems = []
                    li = ei = 0
                    for ipr in ipresent:
                        if not ipr:
                            elems.append(None)
                            continue
                        ln = ilengths[li]
                        li += 1
                        elems.append(grand[ei : ei + ln])
                        ei += ln
                elif "elem_struct" in p:
                    # list<struct>: assemble the element dicts first —
                    # the element STRUCT column carries its own PRESENT
                    # over all n_elems positions; its field columns are
                    # sized by the PRESENT elements
                    elem_id, gnames, gkids = p["elem_struct"]
                    eraw = located.get((elem_id, _S_PRESENT))
                    epresent = (
                        _bool_rle(
                            _decompress_stream(codec, eraw), n_elems
                        )
                        if eraw is not None
                        else [True] * n_elems
                    )
                    n_ep = sum(epresent)
                    fields = {
                        f: dec(g, n_ep) for f, g in zip(gnames, gkids)
                    }
                    elems = []
                    j = 0
                    for epr in epresent:
                        if not epr:
                            elems.append(None)
                            continue
                        elems.append({f: fields[f][j] for f in gnames})
                        j += 1
                else:
                    elems = dec(p["children"][0], n_elems)
                rows: list = []
                li = 0
                ei = 0
                for pr in present:
                    if not pr:
                        rows.append(None)
                        continue
                    ln = lengths[li]
                    li += 1
                    rows.append(elems[ei : ei + ln])
                    ei += ln
                out[c].extend(rows)
            elif p["kind"] == _K_MAP:
                enc_parent = (
                    encodings[cid] if cid < len(encodings) else {}
                ).get(1, 0)
                praw = located.get((cid, _S_PRESENT))
                present = (
                    _bool_rle(_decompress_stream(codec, praw), n_rows)
                    if praw is not None
                    else [True] * n_rows
                )
                n_present = sum(present)
                lraw = located.get((cid, _S_LENGTH))
                lengths = _int_rle(
                    _decompress_stream(codec, lraw) if lraw else b"",
                    n_present,
                    signed=False,
                    enc=enc_parent,
                )
                total = sum(lengths)
                kid = p["children"][0]
                keys = dec(kid, total)
                if "val_struct" in p:
                    # map<k, struct>: the value STRUCT's PRESENT covers
                    # all entries; field leaves sized by present entries
                    vid, gnames, gkids = p["val_struct"]
                    vraw = located.get((vid, _S_PRESENT))
                    vpresent = (
                        _bool_rle(_decompress_stream(codec, vraw), total)
                        if vraw is not None
                        else [True] * total
                    )
                    n_vp = sum(vpresent)
                    fields = {
                        f: dec(g, n_vp) for f, g in zip(gnames, gkids)
                    }
                    vals = []
                    j = 0
                    for vp in vpresent:
                        if not vp:
                            vals.append(None)
                            continue
                        vals.append({f: fields[f][j] for f in gnames})
                        j += 1
                elif "val_list" in p:
                    # map<k, list>: the value LIST's PRESENT + LENGTH
                    # cover the entries; element leaf by summed lengths
                    vid, g = p["val_list"]
                    venc = (
                        encodings[vid] if vid < len(encodings) else {}
                    ).get(1, 0)
                    vraw = located.get((vid, _S_PRESENT))
                    vpresent = (
                        _bool_rle(_decompress_stream(codec, vraw), total)
                        if vraw is not None
                        else [True] * total
                    )
                    vlraw = located.get((vid, _S_LENGTH))
                    vlengths = _int_rle(
                        _decompress_stream(codec, vlraw) if vlraw else b"",
                        sum(vpresent),
                        signed=False,
                        enc=venc,
                    )
                    elems = dec(g, sum(vlengths))
                    vals = []
                    li2 = ei2 = 0
                    for vp in vpresent:
                        if not vp:
                            vals.append(None)
                            continue
                        ln2 = vlengths[li2]
                        li2 += 1
                        vals.append(elems[ei2 : ei2 + ln2])
                        ei2 += ln2
                else:
                    vals = dec(p["children"][1], total)
                rows = []
                li = 0
                ei = 0
                for pr in present:
                    if not pr:
                        rows.append(None)
                        continue
                    ln = lengths[li]
                    li += 1
                    rows.append(
                        dict(zip(keys[ei : ei + ln], vals[ei : ei + ln]))
                    )
                    ei += ln
                out[c].extend(rows)
            elif p["kind"] == _K_STRUCT:
                praw = located.get((cid, _S_PRESENT))
                present = (
                    _bool_rle(_decompress_stream(codec, praw), n_rows)
                    if praw is not None
                    else [True] * n_rows
                )
                n_present = sum(present)
                list_kids = p.get("list_kids", {})

                def _dec_field(k, count):
                    if k not in list_kids:
                        return dec(k, count)
                    # struct<list> field: kid PRESENT over the present
                    # struct rows, LENGTH over its present count, the
                    # element column sized by the summed lengths. The
                    # kid's LENGTH stream is integer RLE — dispatched
                    # by encoding version like every other site
                    # (round-12: RLEv1 decoded, formerly declined)
                    kenc = (
                        encodings[k] if k < len(encodings) else {}
                    ).get(1, 0)
                    kpraw = located.get((k, _S_PRESENT))
                    kpresent = (
                        _bool_rle(_decompress_stream(codec, kpraw), count)
                        if kpraw is not None
                        else [True] * count
                    )
                    klraw = located.get((k, _S_LENGTH))
                    klengths = _int_rle(
                        _decompress_stream(codec, klraw) if klraw else b"",
                        sum(kpresent),
                        signed=False,
                        enc=kenc,
                    )
                    elems = dec(list_kids[k], sum(klengths))
                    vals = []
                    li = ei = 0
                    for kpr in kpresent:
                        if not kpr:
                            vals.append(None)
                            continue
                        ln = klengths[li]
                        li += 1
                        vals.append(elems[ei : ei + ln])
                        ei += ln
                    return vals

                fields = {
                    f: _dec_field(k, n_present)
                    for f, k in zip(
                        p["fields"], p.get("field_kids", p["children"])
                    )
                }
                rows = []
                j = 0
                for pr in present:
                    if not pr:
                        rows.append(None)
                        continue
                    rows.append({f: fields[f][j] for f in p["fields"]})
                    j += 1
                out[c].extend(rows)
            elif p["kind"] == "generic":
                out[c].extend(
                    _read_generic_node(
                        cid, n_rows, types, located, encodings, codec
                    )
                )
            else:
                e = encodings[cid] if cid < len(encodings) else {}
                out[c].extend(
                    _decode_column(
                        located, codec, cid, p["kind"],
                        e.get(1, 0), e.get(2, 0), n_rows,
                    )
                )
    return out


def _decode_column(located, codec, cid, kind, enc, dict_size, n_rows) -> list:
    def stream(skind):
        raw = located.get((cid, skind))
        return None if raw is None else _decompress_stream(codec, raw)

    # DIRECT/DICTIONARY (0/1) column encodings are Hive-0.11-era
    # RLEv1 integer streams; DIRECT_V2/DICTIONARY_V2 are RLEv2.
    # Every integer-stream decode below dispatches on `enc` via
    # _int_rle (round-12: RLEv1 promoted from a loud decline to a
    # real decode, cross-validated against pyarrow 0.11 fixtures).
    present_raw = stream(_S_PRESENT)
    present = (
        _bool_rle(present_raw, n_rows) if present_raw is not None else None
    )
    n_vals = sum(present) if present is not None else n_rows
    data = stream(_S_DATA)
    if kind in (_K_SHORT, _K_INT, _K_LONG, _K_DATE):
        vals = _int_rle(data or b"", n_vals, signed=True, enc=enc)
    elif kind == _K_TIMESTAMP:
        # DATA = seconds since 2015-01-01 UTC (signed RLEv2);
        # SECONDARY = nanos with the trailing-zero compression: low 3
        # bits z (when nonzero) mean "multiply the remaining bits by
        # 10^(z+1)". The ORC C++ writer stores pre-1970 fractions as
        # NEGATIVE nanos, so the raw value is interpreted as two's-
        # complement int64 with an ARITHMETIC shift — cross-validated
        # against pyarrow for both eras (the Java writer's non-negative
        # convention decodes identically for epoch >= 0, which is what
        # Spark-written testdata contains). Returns epoch NANOSECONDS.
        secs = _int_rle(data or b"", n_vals, signed=True, enc=enc)
        nanos_raw = _int_rle(
            stream(_S_SECONDARY) or b"", n_vals, signed=False, enc=enc
        )
        vals = []
        for s, nr in zip(secs, nanos_raw):
            if nr >= 1 << 63:  # two's-complement negative
                nr -= 1 << 64
            z = nr & 7
            n = nr >> 3  # arithmetic shift (Python >> floors)
            if z:
                n *= 10 ** (z + 1)
            s += _TS_EPOCH_SECONDS
            # The Java writer stores trunc-toward-zero seconds with
            # ALWAYS-POSITIVE nanos; readers (verified against
            # pyarrow's C++ on hand-built fixtures, round 10) subtract
            # one second when the seconds are negative and a fraction
            # is present. The C++ writer's negative-nanos convention
            # never hits this branch (its seconds and nanos share a
            # sign), so both writer families decode identically.
            if s < 0 and n > 0:
                s -= 1
            vals.append(s * 1_000_000_000 + n)
    elif kind == _K_DECIMAL:
        # DATA = unbounded zigzag varints (unscaled values);
        # SECONDARY = per-value scale, signed RLEv2
        import decimal as _dec

        scales = _int_rle(
            stream(_S_SECONDARY) or b"", n_vals, signed=True, enc=enc
        )
        vals = []
        p = 0
        # full-precision context: the DEFAULT context (prec=28) would
        # silently round >28-digit unscaled values during the scale
        # shift (round-11 twin of the writer-side fix)
        with _dec.localcontext() as _ctx:
            _ctx.prec = _dec.MAX_PREC
            for sc in scales:
                u, p = _varint(data or b"", p)
                vals.append(
                    _dec.Decimal(_unzigzag(u)).scaleb(-sc)
                )
    elif kind == _K_BYTE:
        # byte-RLE carries raw bytes; tinyint is SIGNED
        vals = [v - 256 if v >= 128 else v for v in _byte_rle(data or b"", n_vals)]
    elif kind == _K_BOOLEAN:
        vals = _bool_rle(data or b"", n_vals)
    elif kind == _K_DOUBLE:
        vals = list(struct.unpack(f"<{n_vals}d", (data or b"")[: 8 * n_vals]))
    elif kind == _K_FLOAT:
        vals = list(struct.unpack(f"<{n_vals}f", (data or b"")[: 4 * n_vals]))
    elif kind in (_K_STRING, _K_BINARY, _K_VARCHAR, _K_CHAR):
        lengths_raw = stream(_S_LENGTH)
        if enc in (1, 3):  # DICTIONARY / DICTIONARY_V2
            dict_data = stream(_S_DICT) or b""
            dict_lens = _int_rle(
                lengths_raw or b"", dict_size, signed=False, enc=enc
            )
            entries = []
            p = 0
            for ln in dict_lens:
                entries.append(dict_data[p : p + ln])
                p += ln
            idxs = _int_rle(data or b"", n_vals, signed=False, enc=enc)
            vals = [entries[i] for i in idxs]
        else:  # DIRECT / DIRECT_V2: LENGTH + concatenated DATA
            lens = _int_rle(
                lengths_raw or b"", n_vals, signed=False, enc=enc
            )
            vals = []
            p = 0
            for ln in lens:
                vals.append((data or b"")[p : p + ln])
                p += ln
        if kind in (_K_STRING, _K_VARCHAR, _K_CHAR):
            vals = [v.decode("utf-8") for v in vals]
    else:
        raise NotImplementedError(f"ORC column kind {kind}")
    if present is None:
        return vals
    it = iter(vals)
    return [next(it) if p else None for p in present]


