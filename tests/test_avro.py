"""Avro OCF pins: JVM cross-validation both directions, sync tamper
detection, envelope raises."""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.operators.avro import (
    encode_avro,
    parse_avro,
)

FIELDS = [
    ("id", "long"),
    ("name", "string"),
    ("score", "double"),
    ("ok", "boolean"),
    ("opt", ["null", "long"]),
]
ROWS = [
    {"id": 1, "name": "alpha", "score": 1.25, "ok": True, "opt": 7},
    {"id": -42, "name": "beta", "score": -0.5, "ok": False, "opt": None},
    {"id": 2**40, "name": "", "score": 0.0, "ok": True, "opt": -9},
]


@pytest.mark.parametrize("codec", ["null", "deflate", "bzip2", "xz", "zstandard"])
def test_roundtrip(codec):
    schema, back = parse_avro(encode_avro(FIELDS, ROWS, codec=codec))
    assert back == ROWS
    assert [f["name"] for f in schema["fields"]] == [n for n, _ in FIELDS]


def test_java_avro_cross_validation(spark):
    # our files must read with the bundled Java Avro DataFileReader, and
    # DataFileWriter's files must parse with our reader — the pair is
    # NOT merely self-consistent
    jvm = spark.sparkContext._jvm
    for codec in ("null", "deflate", "bzip2", "xz"):
        payload = encode_avro(FIELDS, ROWS, codec=codec)
        sin = jvm.org.apache.avro.file.SeekableByteArrayInput(
            bytearray(payload)
        )
        reader = jvm.org.apache.avro.file.DataFileReader(
            sin, jvm.org.apache.avro.generic.GenericDatumReader()
        )
        out = []
        while reader.hasNext():
            rec = reader.next()
            out.append(
                (rec.get("id"), str(rec.get("name")), rec.get("score"),
                 rec.get("ok"), rec.get("opt"))
            )
        assert out == [
            (r["id"], r["name"], r["score"], r["ok"], r["opt"]) for r in ROWS
        ]
    schema_json = (
        '{"type":"record","name":"Row","fields":'
        '[{"name":"id","type":"long"},{"name":"name","type":"string"}]}'
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    cf = jvm.org.apache.avro.file.CodecFactory
    for java_codec in (
        cf.deflateCodec(6),
        cf.bzip2Codec(),
        cf.xzCodec(6),
    ):
        baos = jvm.java.io.ByteArrayOutputStream()
        writer = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter()
        )
        writer.setCodec(java_codec)
        writer.create(schema, baos)
        for i in range(5):
            rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
            rec.put("id", i * 1000)
            rec.put("name", f"row-{i}")
            writer.append(rec)
        writer.close()
        _s, back = parse_avro(bytes(baos.toByteArray()))
        assert back == [
            {"id": i * 1000, "name": f"row-{i}"} for i in range(5)
        ]


def test_sync_tamper_and_envelope():
    p = bytearray(encode_avro(FIELDS, ROWS))
    p[-1] ^= 0xFF  # corrupt the final block's sync marker
    with pytest.raises(ValueError, match="sync"):
        parse_avro(bytes(p))
    # claim an unsupported codec (the metadata value 'null' → 'wild')
    bad = encode_avro(FIELDS, ROWS, codec="null").replace(
        b"\x08null", b"\x08wild"
    )
    with pytest.raises(NotImplementedError, match="codec"):
        parse_avro(bad)
    with pytest.raises(ValueError):
        parse_avro(b"PAR1 not avro")


def test_snappy_codec_and_java_snappy_cross_validation(spark):
    # our snappy-coded files must read with Java Avro's snappy codec
    # path, and CodecFactory.snappyCodec()-written files with our reader
    schema, back = parse_avro(encode_avro(FIELDS, ROWS, codec="snappy"))
    assert back == ROWS
    jvm = spark.sparkContext._jvm
    payload = encode_avro(FIELDS, ROWS, codec="snappy")
    sin = jvm.org.apache.avro.file.SeekableByteArrayInput(bytearray(payload))
    reader = jvm.org.apache.avro.file.DataFileReader(
        sin, jvm.org.apache.avro.generic.GenericDatumReader()
    )
    ids = []
    while reader.hasNext():
        ids.append(reader.next().get("id"))
    assert ids == [r["id"] for r in ROWS]
    schema_json = (
        '{"type":"record","name":"Row","fields":'
        '[{"name":"id","type":"long"}]}'
    )
    jschema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    baos = jvm.java.io.ByteArrayOutputStream()
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter()
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.snappyCodec())
    writer.create(jschema, baos)
    for i in range(4):
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("id", i * 7)
        writer.append(rec)
    writer.close()
    _s, got = parse_avro(bytes(baos.toByteArray()))
    assert got == [{"id": i * 7} for i in range(4)]


def test_snappy_raw_roundtrips(spark):
    from simple_data_engineering_project_spark.operators.snappy import (
        snappy_compress_literal,
        snappy_decompress,
    )

    jvm = spark.sparkContext._jvm
    import random

    rng = random.Random(7)
    cases = [
        b"",
        b"a",
        b"hello world " * 100,  # heavy matching when java compresses
        bytes(range(256)) * 10,
        b"abcabcabc" * 500,  # overlapping forward copies (RLE-style)
        bytes(rng.randrange(256) for _ in range(10000)),  # incompressible
    ]
    for raw in cases:
        comp = bytes(jvm.org.xerial.snappy.Snappy.compress(bytearray(raw)))
        assert snappy_decompress(comp) == raw
        assert snappy_decompress(snappy_compress_literal(raw)) == raw


def test_snappy_compress_cross_validated(spark):
    """The REAL snappy encoder (greedy LZ) against the bundled
    snappy-java, both directions, plus genuine-compression and
    round-trip pins across content shapes."""
    import random

    from simple_data_engineering_project_spark.operators.snappy import (
        snappy_compress,
        snappy_decompress,
    )

    rnd = random.Random(7)
    cases = {
        "empty": b"",
        "one": b"A",
        "rle": b"\x07" * 100000,
        "rep": b"the quick brown fox. " * 5000,
        "rand": rnd.randbytes(100000),
        "mixed": b"".join(
            (b"h%06d" % i) + bytes([i % 251]) * (i % 37) for i in range(5000)
        ),
        "edge_65_67": b"Q" * 8 + b"." * 100 + b"Q" * 8 + b"x",
    }
    jvm = spark.sparkContext._jvm
    for name, d in cases.items():
        enc = snappy_compress(d)
        assert snappy_decompress(enc) == d, name
        back = bytes(jvm.org.xerial.snappy.Snappy.uncompress(bytearray(enc)))
        assert back == d, name
    assert len(snappy_compress(b"z" * 100000)) < 5000  # real compression
    # fuzz: random repetitive structures round-trip both engines
    for trial in range(20):
        parts = []
        for _ in range(rnd.randrange(1, 6)):
            w = rnd.randbytes(rnd.randrange(1, 20))
            parts.append(w * rnd.randrange(1, 200))
            parts.append(rnd.randbytes(rnd.randrange(0, 500)))
        d = b"".join(parts)
        enc = snappy_compress(d)
        assert snappy_decompress(enc) == d, trial
        assert bytes(
            jvm.org.xerial.snappy.Snappy.uncompress(bytearray(enc))
        ) == d, trial
