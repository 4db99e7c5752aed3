"""Arrow IPC writer pins: PYARROW is the reference READER for every
stream the hand-built flatbuffers writer emits — plain and
zstd-compressed (the latter also cross-validates the repo's RFC 8878
encoder through pyarrow's independent zstd decoder)."""

from __future__ import annotations

import io
import random

import pyarrow as pa
import pytest

from simple_data_engineering_project_spark.operators.arrow_ipc import (
    parse_arrow_ipc,
)
from simple_data_engineering_project_spark.operators.arrow_ipc_write import (
    encode_arrow_stream,
)

_SCHEMA = [
    ("id", "int64"),
    ("name", "utf8"),
    ("score", "float64"),
    ("flag", "bool"),
    ("blob", "binary"),
    ("small", "int16"),
    ("u", "uint32"),
]


def _expect(schema, batches):
    rows = []
    for b in batches:
        for i in range(len(b[schema[0][0]])):
            rows.append({k: b[k][i] for k, _ in schema})
    return rows


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_pyarrow_reads_our_streams(comp):
    batches = [
        {
            "id": [1, 2, None],
            "name": ["alpha", None, "gämma ☃"],
            "score": [1.5, None, -2.25],
            "flag": [True, False, None],
            "blob": [b"\x00\x01", b"", None],
            "small": [-5, None, 300],
            "u": [0, 4_000_000_000, None],
        },
        {
            "id": [10],
            "name": ["solo"],
            "score": [0.0],
            "flag": [True],
            "blob": [b"xyz"],
            "small": [7],
            "u": [1],
        },
    ]
    stream = encode_arrow_stream(_SCHEMA, batches, compression=comp)
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    assert t.to_pylist() == _expect(_SCHEMA, batches)
    # the sibling reader agrees
    _s, rows = parse_arrow_ipc(stream)
    assert rows == _expect(_SCHEMA, batches)


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_fuzz_random_batches(comp):
    rnd = random.Random(99)
    schema = [
        ("a", "int64"),
        ("b", "utf8"),
        ("c", "float32"),
        ("d", "uint8"),
        ("e", "bool"),
    ]
    batches = []
    for _ in range(rnd.randrange(1, 5)):
        n = rnd.randrange(0, 400)
        batches.append(
            {
                "a": [
                    None if rnd.random() < 0.2 else rnd.randrange(-(2**62), 2**62)
                    for _ in range(n)
                ],
                "b": [
                    None
                    if rnd.random() < 0.2
                    else "w" * rnd.randrange(0, 50) + "é"
                    for _ in range(n)
                ],
                "c": [
                    None if rnd.random() < 0.2 else float(rnd.randrange(1000))
                    for _ in range(n)
                ],
                "d": [
                    None if rnd.random() < 0.2 else rnd.randrange(256)
                    for _ in range(n)
                ],
                "e": [
                    None if rnd.random() < 0.2 else bool(rnd.randrange(2))
                    for _ in range(n)
                ],
            }
        )
    stream = encode_arrow_stream(schema, batches, compression=comp)
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    assert t.to_pylist() == _expect(schema, batches)
    _s, rows = parse_arrow_ipc(stream)
    assert rows == _expect(schema, batches)


def test_zstd_buffers_cross_128kb_blocks():
    """A data buffer > 128 KB forces the encoder's multi-block frame
    path; pyarrow must still reassemble it exactly."""
    text = "repeated boilerplate sentence %d. "
    batch = {"doc": [text % (i % 7) * 40 for i in range(300)]}
    stream = encode_arrow_stream(
        [("doc", "utf8")], [batch], compression="zstd"
    )
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    assert t.to_pylist() == _expect([("doc", "utf8")], [batch])
    # genuinely compressed: the body beats the raw utf8 payload
    raw = sum(len(s.encode()) for s in batch["doc"])
    assert len(stream) < raw // 2


def test_empty_stream_and_zero_row_batch():
    stream = encode_arrow_stream(_SCHEMA, [])
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    assert t.num_rows == 0
    assert t.schema.names == [n for n, _ in _SCHEMA]

    empty = {k: [] for k, _ in _SCHEMA}
    stream = encode_arrow_stream(_SCHEMA, [empty])
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    assert t.num_rows == 0


def test_schema_round_trip_types():
    """pyarrow must reconstruct the exact column types, not just
    values — pins the hand-written Type union tables."""
    stream = encode_arrow_stream(_SCHEMA, [])
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    want = {
        "id": pa.int64(),
        "name": pa.utf8(),
        "score": pa.float64(),
        "flag": pa.bool_(),
        "blob": pa.binary(),
        "small": pa.int16(),
        "u": pa.uint32(),
    }
    for name, typ in want.items():
        assert t.schema.field(name).type == typ, name


def test_errors():
    with pytest.raises(ValueError, match="unsupported arrow write type"):
        encode_arrow_stream([("x", "decimal128")], [])
    with pytest.raises(ValueError, match="ragged"):
        encode_arrow_stream(
            [("a", "int64"), ("b", "int64")], [{"a": [1], "b": [1, 2]}]
        )
    with pytest.raises(ValueError, match="unsupported write compression"):
        encode_arrow_stream([("a", "int64")], [{"a": [1]}], compression="lz4")


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_feather_file_format(comp):
    """encode_feather_file's footer (Schema + Block structs) must
    satisfy pyarrow's SEEKABLE readers — open_file walks the footer
    blocks, not the stream — and the sibling reader's stream-after-
    magic path still decodes the same file."""
    import pyarrow.feather as feather

    from simple_data_engineering_project_spark.operators.arrow_ipc_write import (
        encode_feather_file,
    )

    schema = [("id", "int64"), ("name", "utf8"), ("score", "float64")]
    batches = [
        {
            "id": [1, 2, None],
            "name": ["a", None, "c"],
            "score": [1.5, None, -2.0],
        },
        {"id": [9], "name": ["z"], "score": [0.5]},
    ]
    f = encode_feather_file(schema, batches, compression=comp)
    t = pa.ipc.open_file(io.BytesIO(f)).read_all()
    assert t.to_pylist() == _expect(schema, batches)
    assert feather.read_table(io.BytesIO(f)).to_pylist() == _expect(
        schema, batches
    )
    _s, rows = parse_arrow_ipc(f)
    assert rows == _expect(schema, batches)
    # per-batch random access through the footer blocks
    rd = pa.ipc.open_file(io.BytesIO(f))
    assert rd.num_record_batches == 2
    assert rd.get_batch(1).to_pylist() == [
        {"id": 9, "name": "z", "score": 0.5}
    ]


_NESTED_SCHEMA = [
    ("k", "int64"),
    ("lst", "list<int64>"),
    ("st", "struct<a:int64,b:utf8>"),
    ("d", "dict:utf8"),
    ("ls", "list<utf8>"),
]
_NESTED_BATCHES = [
    {
        "k": [1, 2, None, 4],
        "lst": [[1, 2], [], None, [5, None, 7]],
        "st": [
            {"a": 1, "b": "x"}, None,
            {"a": None, "b": "y"}, {"a": 4, "b": None},
        ],
        "d": ["red", "green", None, "red"],
        "ls": [["a", "bb"], None, [], ["c", None]],
    },
    {
        "k": [5, 6],
        "lst": [[9], None],
        "st": [None, {"a": 6, "b": "z"}],
        "d": ["blue", "green"],
        "ls": [[None], ["dd"]],
    },
]


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_nested_and_dictionary_columns(comp):
    """Round-12: list<scalar>, struct<scalars> and dict:utf8 columns —
    pyarrow (reference) reads values AND types; the sibling reader
    agrees; dictionary values ship in DictionaryBatch messages that
    precede the record batches (two batches share one dictionary)."""
    stream = encode_arrow_stream(_NESTED_SCHEMA, _NESTED_BATCHES,
                                 compression=comp)
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    assert str(t.schema.field("d").type) == \
        "dictionary<values=string, indices=int32, ordered=0>"
    assert str(t.schema.field("lst").type) == "list<item: int64>"
    assert str(t.schema.field("st").type) == "struct<a: int64, b: string>"
    for name, _tag in _NESTED_SCHEMA:
        want = _NESTED_BATCHES[0][name] + _NESTED_BATCHES[1][name]
        assert t.column(name).to_pylist() == want, name
    _s, rows = parse_arrow_ipc(stream)
    for name, _tag in _NESTED_SCHEMA:
        want = _NESTED_BATCHES[0][name] + _NESTED_BATCHES[1][name]
        assert [r[name] for r in rows] == want, name


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_nested_feather_file_with_dictionary_footer(comp):
    """The Feather footer must list DictionaryBatch frames in its
    dictionaries block vector — pyarrow's open_file seeks through the
    footer, so a missing entry breaks random access specifically."""
    from simple_data_engineering_project_spark.operators.arrow_ipc_write import (
        encode_feather_file,
    )

    blob = encode_feather_file(_NESTED_SCHEMA, _NESTED_BATCHES,
                               compression=comp)
    f = pa.ipc.open_file(io.BytesIO(blob))
    assert f.num_record_batches == 2
    t = f.read_all()
    for name, _tag in _NESTED_SCHEMA:
        want = _NESTED_BATCHES[0][name] + _NESTED_BATCHES[1][name]
        assert t.column(name).to_pylist() == want, name
    _s, rows = parse_arrow_ipc(blob)
    assert [r["d"] for r in rows] == \
        _NESTED_BATCHES[0]["d"] + _NESTED_BATCHES[1]["d"]


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_nested_fuzz_random_batches(comp):
    rnd = random.Random(1212)
    schema = [
        ("k", "int64"),
        ("lst", "list<float64>"),
        ("st", "struct<x:int32,s:utf8,f:float64>"),
        ("d", "dict:utf8"),
    ]
    vocab = [f"w{i}" for i in range(7)]
    batches = []
    for _ in range(5):
        n = rnd.randint(0, 40)
        batches.append({
            "k": [rnd.randint(-2**40, 2**40) if rnd.random() > 0.1
                  else None for _ in range(n)],
            "lst": [
                None if rnd.random() < 0.15 else [
                    None if rnd.random() < 0.2 else rnd.uniform(-1e6, 1e6)
                    for _ in range(rnd.randint(0, 6))
                ] for _ in range(n)
            ],
            "st": [
                None if rnd.random() < 0.15 else {
                    "x": rnd.randint(-1000, 1000)
                    if rnd.random() > 0.2 else None,
                    "s": rnd.choice(vocab) if rnd.random() > 0.2 else None,
                    "f": rnd.uniform(-10, 10)
                    if rnd.random() > 0.2 else None,
                } for _ in range(n)
            ],
            "d": [rnd.choice(vocab) if rnd.random() > 0.2 else None
                  for _ in range(n)],
        })
    stream = encode_arrow_stream(schema, batches, compression=comp)
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    _s, rows = parse_arrow_ipc(stream)
    for name, _tag in schema:
        want = [v for b in batches for v in b[name]]
        assert t.column(name).to_pylist() == want, name
        assert [r[name] for r in rows] == want, name


def test_dictionary_value_type_decline():
    with pytest.raises(ValueError, match="utf8"):
        encode_arrow_stream([("d", "dict:int64")], [{"d": [1]}])


def test_nested_dictionary_columns_decline():
    """Round-12 review regression: a dict: tag nested inside a list or
    struct would collide on dictionary id 0 and never get its values
    collected — it must decline loudly."""
    with pytest.raises(ValueError, match="top level"):
        encode_arrow_stream([("l", "list<dict:utf8>")], [{"l": [["a"]]}])
    with pytest.raises(ValueError, match="top level"):
        encode_arrow_stream(
            [("s", "struct<d:dict:utf8>")], [{"s": [{"d": "a"}]}]
        )


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_deeper_nesting_composes(comp):
    """The recursive field/column builders compose: list<struct>,
    struct<list> and list<list> round-trip through pyarrow (values AND
    exact types) and the sibling reader with no extra code paths."""
    schema = [
        ("ls", "list<struct<a:int64,b:utf8>>"),
        ("sl", "struct<x:int64,v:list<float64>>"),
        ("ll", "list<list<int64>>"),
    ]
    batch = {
        "ls": [[{"a": 1, "b": "x"}, None], None, [],
               [{"a": None, "b": None}]],
        "sl": [{"x": 1, "v": [1.5, None]}, None,
               {"x": None, "v": None}, {"x": 4, "v": []}],
        "ll": [[[1, 2], None, []], None, [], [[None, 5]]],
    }
    blob = encode_arrow_stream(schema, [batch], compression=comp)
    t = pa.ipc.open_stream(io.BytesIO(blob)).read_all()
    assert [str(f.type) for f in t.schema] == [
        "list<item: struct<a: int64, b: string>>",
        "struct<x: int64, v: list<item: double>>",
        "list<item: list<item: int64>>",
    ]
    for name, _tag in schema:
        assert t.column(name).to_pylist() == batch[name], name
    _s, rows = parse_arrow_ipc(blob)
    for name, _tag in schema:
        assert [r[name] for r in rows] == batch[name], name


@pytest.mark.parametrize("comp", [None, "zstd"])
def test_map_columns_compose(comp):
    """Round-12 late wave: map<k,v> (Type Map with the spec's
    non-nullable entries struct and REQUIRED key) composes with the
    nested envelope — scalar values, list values, struct values, and
    maps inside lists — pyarrow confirms values AND exact types."""
    from simple_data_engineering_project_spark.operators.arrow_ipc_write import (
        encode_feather_file,
    )

    schema = [
        ("m", "map<utf8,int64>"),
        ("ml", "map<utf8,list<int64>>"),
        ("ms", "map<utf8,struct<a:int64,b:utf8>>"),
        ("lm", "list<map<utf8,int64>>"),
    ]
    batch = {
        "m": [{"a": 1, "b": None}, None, {}, {"c": 3}],
        "ml": [{"x": [1, None]}, None, {}, {"y": None, "z": []}],
        "ms": [{"k": {"a": 1, "b": "v"}}, None, {}, {"q": None}],
        "lm": [[{"a": 1}, None], None, [], [{}]],
    }

    def expect(name):
        return [
            None if v is None else (
                [None if e is None else list(e.items()) for e in v]
                if name == "lm" else list(v.items())
            )
            for v in batch[name]
        ]

    stream = encode_arrow_stream(schema, [batch], compression=comp)
    t = pa.ipc.open_stream(io.BytesIO(stream)).read_all()
    assert [str(f.type) for f in t.schema] == [
        "map<string, int64>",
        "map<string, list<item: int64>>",
        "map<string, struct<a: int64, b: string>>",
        "list<item: map<string, int64>>",
    ]
    for name, _tag in schema:
        assert t.column(name).to_pylist() == expect(name), name
    _s, rows = parse_arrow_ipc(stream)
    for name, _tag in schema:
        assert [r[name] for r in rows] == expect(name), name
    # feather form too (footer round trip)
    fblob = encode_feather_file(schema, [batch], compression=comp)
    tf = pa.ipc.open_file(io.BytesIO(fblob)).read_all()
    for name, _tag in schema:
        assert tf.column(name).to_pylist() == expect(name), name


def test_map_none_key_declines():
    with pytest.raises(ValueError, match="non-nullable"):
        encode_arrow_stream(
            [("m", "map<utf8,int64>")], [{"m": [{None: 1}]}]
        )
