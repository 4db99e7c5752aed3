"""Arrow IPC pins: pyarrow cross-validation over both wire formats,
null handling across all supported types, envelope raises."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from simple_data_engineering_project_spark.operators.arrow_ipc import (
    parse_arrow_ipc,
)


def _table():
    return pa.table(
        {
            "id": pa.array([1, 2, None, 4], type=pa.int64()),
            "name": pa.array(["alpha", None, "", "delta"]),
            "score": pa.array([1.5, -2.25, 0.0, None], type=pa.float64()),
            "ok": pa.array([True, False, None, True]),
            "small": pa.array([1, -2, 3, 4], type=pa.int16()),
            "f32": pa.array([0.5, 1.5, 2.5, 3.5], type=pa.float32()),
            "u8": pa.array([0, 255, 7, 9], type=pa.uint8()),
        }
    )


@pytest.mark.parametrize("form", ["stream", "file"])
def test_pyarrow_cross_validation(form):
    t = _table()
    buf = io.BytesIO()
    opener = ipc.new_stream if form == "stream" else ipc.new_file
    with opener(buf, t.schema) as w:
        w.write_table(t, max_chunksize=3)  # multiple record batches
    schema, rows = parse_arrow_ipc(buf.getvalue())
    assert [n for n, _ in schema] == t.column_names
    assert rows == t.to_pylist()


def test_zstd_bodies_decode_and_non_arrow_raises():
    # round-8: zstd bodies moved IN-envelope (pure-Python RFC 8878
    # decoder, operators/zstd.py) — the full type battery must survive
    # a zstd-compressed round trip
    t = _table()
    buf = io.BytesIO()
    with ipc.new_stream(
        buf, t.schema, options=ipc.IpcWriteOptions(compression="zstd")
    ) as w:
        w.write_table(t, max_chunksize=3)
    _schema, rows = parse_arrow_ipc(buf.getvalue())
    assert rows == t.to_pylist()
    with pytest.raises(ValueError):
        parse_arrow_ipc(b"PAR1 not arrow at all")


def test_empty_and_all_null_batches():
    t = pa.table({"x": pa.array([None, None], type=pa.int32())})
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    _s, rows = parse_arrow_ipc(buf.getvalue())
    assert rows == [{"x": None}, {"x": None}]
    t0 = pa.table({"x": pa.array([], type=pa.int32())})
    buf0 = io.BytesIO()
    with ipc.new_stream(buf0, t0.schema) as w:
        w.write_table(t0)
    s0, rows0 = parse_arrow_ipc(buf0.getvalue())
    assert rows0 == [] and s0 == [("x", "int32")]


def _stream_messages(payload: bytes):
    """Split an Arrow IPC stream into framed (message_bytes) chunks
    (continuation + metalen + flatbuffer + body), using the same
    framing walk as the parser."""
    import struct

    msgs, pos, n = [], 0, len(payload)
    while pos + 8 <= n:
        cont = struct.unpack_from("<I", payload, pos)[0]
        if cont != 0xFFFFFFFF:
            break
        meta_len = struct.unpack_from("<i", payload, pos + 4)[0]
        if meta_len == 0:
            break
        meta_at = pos + 8
        root_at = meta_at + struct.unpack_from("<i", payload, meta_at)[0]
        # body length lives in the Message table; re-derive via parse:
        # walk vtable manually is overkill — instead locate next message
        # by scanning: framing guarantees 8-byte-aligned sections, so
        # find the next 0xFFFFFFFF continuation after the metadata.
        # Simpler: reconstruct by streaming through pyarrow per-batch.
        msgs.append((pos, meta_at, meta_len))
        # advance: need body size — take it from arrow_ipc's own _Table
        from simple_data_engineering_project_spark.operators.arrow_ipc import (
            _Table,
        )

        body_len = _Table(payload, root_at).scalar(3, "<q", 0)
        pos = meta_at + meta_len + body_len
    return msgs, pos


def test_node_count_mismatch_fails_loudly():
    """A RecordBatch carrying fewer FieldNodes than schema columns must
    raise, not silently zip-truncate into rows missing keys. Forged by
    splicing a 1-column batch message after a 2-column schema message."""
    import io

    import pytest

    def stream_bytes(table):
        buf = io.BytesIO()
        with ipc.new_stream(buf, table.schema) as w:
            w.write_table(table)
        return buf.getvalue()

    two = stream_bytes(pa.table({"a": [1, 2], "b": [3, 4]}))
    one = stream_bytes(pa.table({"a": [1, 2]}))
    m2, _ = _stream_messages(two)
    m1, end1 = _stream_messages(one)
    assert len(m2) == 2 and len(m1) == 2
    schema2 = two[m2[0][0] : m2[1][0]]          # 2-col schema message
    batch1 = one[m1[1][0] : end1]                # 1-col batch message
    spliced = schema2 + batch1
    with pytest.raises(ValueError, match="field nodes"):
        parse_arrow_ipc(spliced)


def test_eocd_lookalike_in_zip_comment():
    """An archive comment containing the EOCD signature bytes must not
    derail the locator: the real EOCD is the candidate whose comment
    length accounts for the file tail."""
    import io
    import zipfile

    from simple_data_engineering_project_spark.operators.zipshard import (
        parse_zip,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("m.txt", b"member data")
        # comment embeds a full fake EOCD signature + plausible-ish tail
        z.comment = b"note " + b"PK\x05\x06" + bytes(18)
    assert parse_zip(buf.getvalue()) == [("m.txt", b"member data")]


def _stream(t, compression=None, max_chunksize=None):
    buf = io.BytesIO()
    opts = (
        ipc.IpcWriteOptions(compression=compression) if compression else None
    )
    with ipc.new_stream(buf, t.schema, options=opts) as w:
        w.write_table(t, max_chunksize=max_chunksize)
    return buf.getvalue()


def test_dictionary_columns_decode():
    t = pa.table(
        {
            "d": pa.array(["a", "b", "a", None, "c"]).dictionary_encode(),
            "x": [1, 2, 3, 4, 5],
        }
    )
    schema, rows = parse_arrow_ipc(_stream(t))
    assert schema == [("d", "utf8"), ("x", "int64")]
    assert rows == t.to_pylist()


def test_dictionary_delta_batches_decode():
    # chunks with growing dictionaries force pyarrow to emit delta
    # (or replacement) DictionaryBatches mid-stream
    c1 = pa.array(["a", "b", "a"]).dictionary_encode()
    c2 = pa.array(["a", "c", "d"]).dictionary_encode()
    buf = io.BytesIO()
    schema = pa.schema([("d", c1.type)])
    opts = ipc.IpcWriteOptions(emit_dictionary_deltas=True)
    with ipc.new_stream(buf, schema, options=opts) as w:
        w.write_batch(pa.record_batch([c1], schema=schema))
        w.write_batch(pa.record_batch([c2], schema=schema))
    _s, rows = parse_arrow_ipc(buf.getvalue())
    assert [r["d"] for r in rows] == ["a", "b", "a", "a", "c", "d"]


def test_nested_list_struct_decode():
    t = pa.table(
        {
            "l": pa.array([[1, 2], [], None, [5, None]]),
            "s": pa.array(
                [
                    {"a": 1, "b": "x"},
                    None,
                    {"a": 3, "b": None},
                    {"a": 4, "b": "z"},
                ]
            ),
            "deep": pa.array(
                [[{"q": [1, 2]}], [{"q": []}], None, [{"q": None}]],
                type=pa.list_(
                    pa.struct([("q", pa.list_(pa.int64()))])
                ),
            ),
        }
    )
    schema, rows = parse_arrow_ipc(_stream(t, max_chunksize=2))
    assert schema == [
        ("l", "list<int64>"),
        ("s", "struct<a: int64, b: utf8>"),
        ("deep", "list<struct<q: list<int64>>>"),
    ]
    assert rows == t.to_pylist()


def test_binary_columns_decode():
    t = pa.table(
        {"b": pa.array([b"\x00\xff", None, b"", b"ok"], type=pa.binary())}
    )
    schema, rows = parse_arrow_ipc(_stream(t))
    assert schema == [("b", "binary")]
    assert rows == t.to_pylist()


def test_lz4_compressed_bodies_decode():
    # long runs exercise LZ4 match copies (incl. overlapping), the
    # mixed column exercises literals; values cross-checked vs pyarrow
    t = pa.table(
        {
            "x": list(range(5000)),
            "t": [("ab" * 40 if i % 3 else f"unique-{i}") for i in range(5000)],
            "n": [None if i % 7 == 0 else i * 0.5 for i in range(5000)],
        }
    )
    blob = _stream(t, compression="lz4", max_chunksize=1024)
    assert len(blob) < len(_stream(t))  # compression actually happened
    _s, rows = parse_arrow_ipc(blob)
    assert rows == t.to_pylist()


def test_lz4_frame_vectors_from_pyarrow_codec():
    # pure-stdlib frame decoder vs pyarrow's real lz4 frame compressor
    from simple_data_engineering_project_spark.operators.arrow_ipc import (
        lz4_frame_decompress,
    )

    for payload in [
        b"",
        b"a",
        b"hello " * 1000,
        bytes(range(256)) * 37,
        b"\x00" * 65536,
        ("the quick brown fox " * 93).encode(),
    ]:
        comp = bytes(pa.Codec("lz4").compress(payload, asbytes=True))
        assert lz4_frame_decompress(comp) == payload


def test_lz4_raw_block_vectors_from_pyarrow_codec():
    from simple_data_engineering_project_spark.operators.arrow_ipc import (
        lz4_block_decompress,
    )

    for payload in [b"abcabcabcabcabcabcabc", bytes(range(64)) * 100, b"x"]:
        comp = bytes(pa.Codec("lz4_raw").compress(payload, asbytes=True))
        out = bytearray()
        lz4_block_decompress(comp, out)
        assert bytes(out) == payload


def test_corrupt_inputs_raise_module_convention_not_indexerror():
    """ADVICE r8 #4 regression: corrupt FloatingPoint precision and
    truncated LZ4 frames/blocks must raise the module's ValueError
    convention, never a bare IndexError."""
    from simple_data_engineering_project_spark.operators.arrow_ipc import (
        _T_FLOAT,
        _type_tag,
        lz4_block_decompress,
        lz4_frame_decompress,
    )

    class _FakeFloat:
        def scalar(self, idx, fmt, default):
            return 3  # not HALF/SINGLE/DOUBLE

    with pytest.raises(ValueError, match="FloatingPoint precision"):
        _type_tag(_T_FLOAT, _FakeFloat())

    # magic-only / header-truncated frames
    for frame in [b"\x04\x22\x4d\x18", b"\x04\x22\x4d\x18\x60", b"\x04\x22\x4d\x18\x60\x40"]:
        with pytest.raises(ValueError, match="lz4 frame truncated"):
            lz4_frame_decompress(frame)
    # frame cut before the EndMark
    good = bytes(pa.Codec("lz4").compress(b"hello " * 500, asbytes=True))
    with pytest.raises(ValueError, match="lz4"):
        lz4_frame_decompress(good[:-6])
    # block truncated mid-sequence
    comp = bytes(pa.Codec("lz4_raw").compress(bytes(range(64)) * 100, asbytes=True))
    for cut in (1, 2, len(comp) // 2):
        try:
            lz4_block_decompress(comp[:cut], bytearray())
        except ValueError:
            pass  # the required convention
        # silent success is also legal for a cut that lands on a
        # sequence boundary; IndexError would fail the test loudly


def test_large_offset_and_temporal_types():
    """64-bit-offset large types and date/timestamp columns decode,
    cross-validated against pyarrow; flatbuffers default-omission trap
    pinned: Date's DECLARED default unit is MILLISECOND, so a date64
    field arrives with NO unit field (regression: default 0 mis-tagged
    it date32 and decoded garbage)."""
    import datetime as dt

    t = pa.table(
        {
            "lu": pa.array(["hello", None, "x" * 300], type=pa.large_string()),
            "lb": pa.array([b"\x00\x01", b"", None], type=pa.large_binary()),
            "ll": pa.array([[1, 2], [7], None], type=pa.large_list(pa.int64())),
            "d32": pa.array(
                [dt.date(2020, 1, 1), None, dt.date(1969, 12, 31)],
                type=pa.date32(),
            ),
            "d64": pa.array(
                [dt.date(2020, 6, 15), None, dt.date(1970, 1, 2)],
                type=pa.date64(),
            ),
            "ts_s": pa.array(
                [dt.datetime(2024, 1, 1, 0, 0, 1), None,
                 dt.datetime(1960, 1, 1)],
                type=pa.timestamp("s"),
            ),
            "ts_us": pa.array(
                [dt.datetime(2024, 2, 29, 12, 34, 56, 789123), None,
                 dt.datetime(1960, 1, 1)],
                type=pa.timestamp("us"),
            ),
        }
    )
    schema, rows = parse_arrow_ipc(_stream(t, max_chunksize=2))
    assert [tp for _n, tp in schema] == [
        "largeutf8", "largebinary", "largelist<int64>", "date32", "date64",
        "ts_s", "ts_us",
    ]
    assert rows == t.to_pylist()


def test_tz_aware_and_ns_timestamps_decode():
    """tz-aware columns decode as UTC INSTANTS: Arrow stores epoch
    offsets (the tz string is display metadata), and aware datetimes
    compare by instant, so values equal pyarrow's local-time-rendered
    to_pylist while the decoder ships no tz database. ns precision
    survives via pandas Timestamp — pyarrow's own to_pylist type."""
    import datetime as dt

    t = pa.table(
        {
            "nyc": pa.array(
                [dt.datetime(2024, 7, 1, 12, 0, 0), None],
                type=pa.timestamp("us", tz="America/New_York"),
            ),
            "utc_s": pa.array([1_700_000_000, None], type=pa.int64()).cast(
                pa.timestamp("s", tz="UTC")
            ),
            "ns": pa.array(
                [1_700_000_000_123_456_789, None], type=pa.timestamp("ns")
            ),
            "ns_tz": pa.array(
                [1_700_000_000_123_456_789, None],
                type=pa.timestamp("ns", tz="Asia/Tokyo"),
            ),
        }
    )
    schema, rows = parse_arrow_ipc(_stream(t, max_chunksize=1))
    assert [tp for _n, tp in schema] == [
        "ts_us@America/New_York", "ts_s@UTC", "ts_ns", "ts_ns@Asia/Tokyo",
    ]
    assert rows == t.to_pylist()  # aware == aware compares instants
    assert rows[0]["nyc"].tzinfo == dt.timezone.utc  # decoded AS UTC
    # full ns fidelity, no truncation
    assert rows[0]["ns"].nanosecond == 789


def test_extended_scalar_types_decode():
    """float16 (struct 'e'), time32/64, duration, fixed-size binary and
    list, and decimal128 decode, cross-validated against pyarrow. Trap
    pinned: Time/Duration DECLARE default unit MILLISECOND in the
    flatbuffers schema, so an absent unit field means ms, not s."""
    import datetime as dt
    import decimal

    import numpy as np

    t = pa.table(
        {
            "f16": pa.array(np.array([1.5, -0.25, 65504.0], dtype=np.float16)),
            "tm_s": pa.array(
                [dt.time(1, 2, 3), None, dt.time(23, 59, 59)],
                type=pa.time32("s"),
            ),
            "tm_ms": pa.array(
                [dt.time(1, 2, 3, 500000), None, dt.time(0, 0)],
                type=pa.time32("ms"),
            ),
            "tm_us": pa.array(
                [dt.time(12, 0, 0, 123456), None, dt.time(6, 30)],
                type=pa.time64("us"),
            ),
            "dur_us": pa.array(
                [dt.timedelta(seconds=90), None, dt.timedelta(days=-1)],
                type=pa.duration("us"),
            ),
            "fb": pa.array(
                [b"abcd", None, b"\x00\x01\x02\x03"], type=pa.binary(4)
            ),
            "fl": pa.array(
                [[1.0, 2.0], [3.0, 4.0], None],
                type=pa.list_(pa.float64(), 2),
            ),
            "dec": pa.array(
                [decimal.Decimal("123.45"), None, decimal.Decimal("-0.01")],
                type=pa.decimal128(10, 2),
            ),
        }
    )
    schema, rows = parse_arrow_ipc(_stream(t, max_chunksize=2))
    assert [tp for _n, tp in schema] == [
        "float16", "time_s", "time_ms", "time_us", "dur_us",
        "fixedbinary:4", "fixedlist<float64, 2>", "decimal128:2",
    ]
    assert rows == t.to_pylist()


def test_ns_time_and_duration_decode():
    """duration[ns] keeps full ns via pandas Timedelta (pyarrow's own
    to_pylist type); time64[ns] TRUNCATES to µs exactly as pyarrow's
    to_pylist does (datetime.time cannot hold ns)."""
    t = pa.table(
        {
            "d": pa.array([1_123_456_789, -5, None], type=pa.duration("ns")),
            "tm": pa.array(
                [3_600_000_000_123, 59_999_999_999_999, None],
                type=pa.time64("ns"),
            ),
        }
    )
    schema, rows = parse_arrow_ipc(_stream(t))
    assert [tp for _n, tp in schema] == ["dur_ns", "time_ns"]
    assert rows == t.to_pylist()
    assert rows[0]["d"].nanoseconds == 789  # ns survive


def test_union_columns_decode():
    """Sparse and dense unions, V5 layout: types int8 buffer (+ dense
    int32 offsets), NO validity bitmap on the union itself — nulls live
    in the children; non-contiguous custom type codes remap through the
    declared typeIds vector."""
    dense = pa.UnionArray.from_dense(
        pa.array([5, 8, 5, 5, 8], type=pa.int8()),
        pa.array([0, 0, 1, 2, 1], type=pa.int32()),
        [pa.array([10, None, 30], type=pa.int64()), pa.array(["x", "y"])],
        ["num", "txt"],
        [5, 8],
    )
    sparse = pa.UnionArray.from_sparse(
        pa.array([0, 1, 0, 1], type=pa.int8()),
        [
            pa.array([1, None, 3, None], type=pa.int64()),
            pa.array(["a", None, "c", "d"]),
        ],
    )
    t = pa.table({"du": dense})
    schema, rows = parse_arrow_ipc(_stream(t, max_chunksize=2))
    assert schema == [("du", "union_dense<int64, utf8>")]
    assert rows == t.to_pylist()
    t2 = pa.table({"su": sparse})
    schema2, rows2 = parse_arrow_ipc(_stream(t2, max_chunksize=3))
    assert schema2 == [("su", "union_sparse<int64, utf8>")]
    assert rows2 == t2.to_pylist()


def test_union_offset_tamper_raises():
    """Round-8 review finding: a tampered dense-union offsets buffer
    must raise ValueError — a negative offset previously aliased the
    child's LAST element via Python indexing (silently wrong data)."""
    u = pa.UnionArray.from_dense(
        pa.array([0, 0, 0], type=pa.int8()),
        pa.array([7, 1, 6], type=pa.int32()),  # distinctive byte pattern
        [pa.array([10, 11, 12, 13, 14, 15, 16, 17], type=pa.int64())],
        ["n"],
        [0],
    )
    blob = _stream(pa.table({"u": u}))
    pat = (7).to_bytes(4, "little") + (1).to_bytes(4, "little") + (
        6
    ).to_bytes(4, "little")
    at = blob.index(pat)
    for bad in ((-1), 99):
        tampered = bytearray(blob)
        tampered[at : at + 4] = (bad % 2**32).to_bytes(4, "little")
        with pytest.raises(ValueError, match="union offset"):
            parse_arrow_ipc(bytes(tampered))
    # untampered still decodes
    _s, rows = parse_arrow_ipc(blob)
    assert [r["u"] for r in rows] == [17, 11, 16]


def test_run_end_encoded_decode():
    """REE parent owns NO buffers (not even validity); run_ends/values
    arrive as ordinary children and expand to the logical length —
    including across sliced record batches and lz4 bodies."""
    import pyarrow.compute as pc

    logical = ["x"] * 5 + ["y"] * 3 + [None] * 2 + ["z"]
    t = pa.table({"r": pc.run_end_encode(pa.array(logical))})
    schema, rows = parse_arrow_ipc(_stream(t, max_chunksize=4))
    assert schema == [("r", "runend<utf8>")]
    assert [r["r"] for r in rows] == logical
    buf = io.BytesIO()
    with ipc.new_stream(
        buf, t.schema, options=ipc.IpcWriteOptions(compression="lz4")
    ) as w:
        w.write_table(t)
    _s, rows_lz4 = parse_arrow_ipc(buf.getvalue())
    assert [r["r"] for r in rows_lz4] == logical
    # int-valued REE with a numeric run-end width variant
    t3 = pa.table(
        {
            "n": pc.run_end_encode(
                pa.array([7, 7, 7, None, 9], type=pa.int64())
            )
        }
    )
    _s3, rows3 = parse_arrow_ipc(_stream(t3))
    assert [r["n"] for r in rows3] == [7, 7, 7, None, 9]


def test_view_types_decode():
    """Utf8View/BinaryView (16-byte view structs + variadic data
    buffers counted by RecordBatch.variadicBufferCounts; <= 12-byte
    values inline, longer ones carry a 4-byte prefix that must match
    the referenced bytes) and ListView/LargeListView (offsets + sizes
    buffers, ranges may be unordered) — all cross-validated against
    pyarrow, including multi-batch and lz4-compressed forms."""
    long = "a much longer string exceeding twelve bytes"
    t = pa.table(
        {
            "sv": pa.array(
                ["short", long, None, "", "exactly12byt"],
                type=pa.string_view(),
            ),
            "bv": pa.array(
                [b"x" * 3, b"y" * 40, None, b"", b"z" * 12],
                type=pa.binary_view(),
            ),
            "lv": pa.array(
                [[1, 2], [3], None, [], [4, 5, 6]],
                type=pa.list_view(pa.int64()),
            ),
            "llv": pa.array(
                [["a"], None, ["b", "c"], [], ["d"]],
                type=pa.large_list_view(pa.string()),
            ),
        }
    )
    schema, rows = parse_arrow_ipc(_stream(t, max_chunksize=2))
    assert [tp for _n, tp in schema] == [
        "utf8view", "binaryview", "listview<int64>", "largelistview<utf8>",
    ]
    assert rows == t.to_pylist()
    buf = io.BytesIO()
    with ipc.new_stream(
        buf, t.schema, options=ipc.IpcWriteOptions(compression="lz4")
    ) as w:
        w.write_table(t)
    _s, rows_lz4 = parse_arrow_ipc(buf.getvalue())
    assert rows_lz4 == t.to_pylist()


def test_interval_units_decode():
    """month-day-nano cross-validates against pyarrow (MonthDayNano is
    tuple-comparable). pyarrow cannot CONSTRUCT year-month / day-time
    columns, so those exercise the same wire bytes with the schema's
    IntervalUnit field byte-patched in place (located through the
    decoder's own flatbuffers tables, not offsets-by-guess): the
    16-byte MDN element (3, 4, 5) reads back as months=3 under
    YEAR_MONTH int32 and as (days=3, ms=4) under DAY_TIME."""
    from simple_data_engineering_project_spark.operators.arrow_ipc import (
        _Table,
        _i32,
    )

    t = pa.table(
        {"iv": pa.array([pa.MonthDayNano([3, 4, 5]), None])}
    )
    schema, rows = parse_arrow_ipc(_stream(t))
    assert schema == [("iv", "interval_mdn")]
    assert rows == t.to_pylist()
    assert rows[0]["iv"] == (3, 4, 5)

    payload = bytearray(_stream(t))
    blob = bytes(payload)
    meta_at = 8
    root = _Table(blob, meta_at + _i32(blob, meta_at))
    field0 = root.table(2).vtable_elem(1, 0)  # Schema.fields[0]
    itab = field0.table(3)  # the Interval type table
    upos = itab.pos + itab._off(0)  # unit scalar (int16)
    assert payload[upos] == 2  # MONTH_DAY_NANO as written
    payload[upos] = 0  # YEAR_MONTH: int32 months
    s_ym, r_ym = parse_arrow_ipc(bytes(payload))
    assert s_ym == [("iv", "interval_ym")]
    assert r_ym[0]["iv"] == 3 and r_ym[1]["iv"] is None
    payload[upos] = 1  # DAY_TIME: (int32 days, int32 ms)
    s_dt, r_dt = parse_arrow_ipc(bytes(payload))
    assert s_dt == [("iv", "interval_dt")]
    assert r_dt[0]["iv"] == (3, 4) and r_dt[1]["iv"] is None


def test_map_columns_decode():
    t = pa.table(
        {
            "m": pa.array(
                [[("k1", 1), ("k2", 2)], [], None, [("z", None)]],
                type=pa.map_(pa.string(), pa.int64()),
            ),
            "mm": pa.array(
                [[("a", [1, 2])], [], [("b", [])], None],
                type=pa.map_(pa.string(), pa.list_(pa.int64())),
            ),
        }
    )
    schema, rows = parse_arrow_ipc(_stream(t, max_chunksize=2))
    assert schema == [
        ("m", "map<utf8, int64>"),
        ("mm", "map<utf8, list<int64>>"),
    ]
    assert rows == t.to_pylist()


def test_decimal128_full_38_digit_precision():
    """scaleb under the DEFAULT decimal context (prec=28) silently
    rounds >28-significant-digit values; decimal128 carries up to 38
    (regression: 10**28+1 lost its trailing digit)."""
    import decimal

    big = decimal.Decimal(10**28 + 1)
    t = pa.table(
        {
            "d0": pa.array([big], type=pa.decimal128(38, 0)),
            "d2": pa.array(
                [decimal.Decimal(10**30 + 7).scaleb(-2)],
                type=pa.decimal128(38, 2),
            ),
        }
    )
    _s, rows = parse_arrow_ipc(_stream(t))
    assert rows == t.to_pylist()
    assert rows[0]["d0"] == big  # exact, not 1.0000000000000000000000000E+28


def test_lz4_overlap_and_long_match_fast_paths():
    # the slice-copy fast path (off >= mlen) and the period-tiling
    # overlap path (off < mlen) must both reproduce pyarrow exactly
    from simple_data_engineering_project_spark.operators.arrow_ipc import (
        lz4_frame_decompress,
    )

    for payload in [
        b"\x00" * 1_000_000,            # long self-overlapping matches
        b"abcdefgh" * 100_000,          # period-8 overlap tiling
        bytes(range(256)) * 4000,       # long non-overlapping matches
    ]:
        comp = bytes(pa.Codec("lz4").compress(payload, asbytes=True))
        assert lz4_frame_decompress(comp) == payload


def test_decimal256_cross_validated():
    """decimal256 (76 significant digits) decodes via the same
    width-parameterized two's-complement path as decimal128,
    cross-validated against pyarrow including full-precision and
    negative values plus nulls."""
    import decimal

    big = decimal.Decimal(10**75 + 3)
    t = pa.table(
        {
            "d0": pa.array(
                [big, None, decimal.Decimal(-(10**60 + 1))],
                type=pa.decimal256(76, 0),
            ),
            "d9": pa.array(
                [decimal.Decimal(10**40 + 7).scaleb(-9), None, None],
                type=pa.decimal256(76, 9),
            ),
        }
    )
    _s, rows = parse_arrow_ipc(_stream(t))
    assert rows == t.to_pylist()
    assert rows[0]["d0"] == big  # exact at 76 digits


def test_decimal32_64_declined():
    """decimal32/64 raise: structurally trivial, but pyarrow 16 can
    neither write nor read them, so nothing in-container could verify
    a decode — the module declines instead of self-certifying. The
    crafted schema reuses the repo's own writer framing with the
    Decimal type table built by hand (bitWidth 64, scale 2)."""
    from simple_data_engineering_project_spark.operators import (
        arrow_ipc_write as w,
    )

    bld = w._Builder()
    root = bld.block(4)
    root.data += b"\x00\x00\x00\x00"
    msg = bld.block(8)
    sch = bld.block(8)
    fields_vec = bld.block(4)
    f = bld.block(8)
    name_b = w._string(bld, "d")
    type_b = bld.block(8)
    # Decimal table: precision(0)=10, scale(1)=2, bitWidth(2)=64
    w._fill_table(
        type_b, {0: ("i32", 10), 1: ("i32", 2), 2: ("i32", 64)}
    )
    w._fill_table(
        f,
        {0: ("ref", name_b), 1: ("u8", 1), 2: ("u8", 7), 3: ("ref", type_b)},
    )
    w._fill_ref_vector(fields_vec, [f])
    w._fill_table(sch, {1: ("ref", fields_vec)})
    w._fill_table(msg, {0: ("i16", 4), 1: ("u8", 1), 2: ("ref", sch)})
    root.fixups.append((0, msg, None))
    stream = w._encapsulate(bld.assemble()) + b"\xff\xff\xff\xff\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="decimal64"):
        parse_arrow_ipc(stream)
