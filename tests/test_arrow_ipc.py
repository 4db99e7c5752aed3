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
