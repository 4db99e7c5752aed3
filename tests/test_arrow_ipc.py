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


def test_envelope_raises():
    cases = [
        (pa.table({"d": pa.array(["a", "b", "a"]).dictionary_encode()}),
         "dictionary"),
        (pa.table({"l": pa.array([[1, 2], [3], [4]])}), "nested"),
    ]
    for t, match in cases:
        buf = io.BytesIO()
        with ipc.new_stream(buf, t.schema) as w:
            w.write_table(t)
        with pytest.raises(NotImplementedError, match=match):
            parse_arrow_ipc(buf.getvalue())
    t = _table()
    buf = io.BytesIO()
    with ipc.new_stream(
        buf, t.schema, options=ipc.IpcWriteOptions(compression="zstd")
    ) as w:
        w.write_table(t)
    with pytest.raises(NotImplementedError, match="compressed"):
        parse_arrow_ipc(buf.getvalue())
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
