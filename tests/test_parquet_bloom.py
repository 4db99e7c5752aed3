"""Parquet split-block bloom filter read path (round 14).

Honesty basis: pyarrow 16.1 and DuckDB 1.0 can neither write nor read
parquet bloom filters, but Spark's JVM writer (parquet-mr) emits them —
so every filter probed here comes from the in-container reference
writer, the XXH64 core is pinned bit-exactly against Spark's own
``F.xxhash64`` (same algorithm, seed 42), and the scan is graded on
no-false-negative exactness plus pinned skip counts, then swept with
the truncation/bit-flip battery every walk loop in this repo gets.
"""
from __future__ import annotations

import glob
import struct

import pytest
from pyspark.sql import functions as F

from simple_data_engineering_project_spark.operators.parquet_bloom import (
    plain_encode,
    read_bloom_filter,
    read_parquet_bloom_pruned_bytes,
    sbbf_contains,
    xxhash64,
)
from simple_data_engineering_project_spark.operators.parquet_data import (
    _parse_file,
    read_column_chunk,
)


def _key_chunk_md(buf: bytes, col: str, rg_idx: int = 0) -> dict:
    meta, _schema = _parse_file(buf)
    for cc in meta.get(4, [])[rg_idx].get(1, []):
        md = cc.get(3)
        if md and ".".join(p.decode() for p in md.get(3, [])) == col:
            return md
    raise AssertionError(f"no chunk for {col}")


def test_xxhash64_matches_spark_bit_exactly(spark):
    """The SBBF spec mandates XXH64 of the plain encoding. Spark ships
    the same core as ``F.xxhash64`` (seed 42): pin our pure-Python
    implementation against it across ints (sign/extreme classes) and
    strings of every length class — 0, <4, <8, 8..31, and >=32 bytes
    exercise each tail branch of the algorithm."""
    longs = [0, 1, -1, -5, 123456789, 2**62, -(2**62), 42, -99999999999]
    rows = spark.createDataFrame(
        [(v,) for v in longs], "x bigint"
    ).select("x", F.xxhash64("x").alias("h")).collect()
    for r in rows:
        mine = xxhash64(struct.pack("<q", r["x"]), 42)
        signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert signed == r["h"], f"long {r['x']}"

    strs = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh",
            "hello world bloom", "x" * 31, "y" * 32, "z" * 40,
            "the quick brown fox jumps over the lazy dog " * 3]
    rows = spark.createDataFrame(
        [(s,) for s in strs], "s string"
    ).select("s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        mine = xxhash64(r["s"].encode("utf-8"), 42)
        signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert signed == r["h"], f"string len {len(r['s'])}"


@pytest.fixture(scope="module")
def bloom_files(spark, tmp_path_factory):
    """Spark-written fixture: keys hash-spread across files (every
    file's [min, max] spans the full range — zone maps can never
    prune), bloom filters on the int64 key AND a string key, a column
    WITHOUT a filter, small parquet blocks so single files carry
    multiple row groups."""
    out = str(tmp_path_factory.mktemp("bloom") / "t")
    n = 24000
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("key-"), F.format_string("%06d", F.col("id"))).alias("s"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    (
        df.repartition(6, F.col("k") % 6)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", str(n))
        .option("parquet.bloom.filter.enabled#s", "true")
        .option("parquet.bloom.filter.expected.ndv#s", str(n))
        .option("parquet.block.size", str(128 * 1024))
        .parquet(out)
    )
    paths = sorted(glob.glob(out + "/part-*.parquet"))
    assert paths
    return [open(p, "rb").read() for p in paths]


def test_bloom_no_false_negatives_over_all_present_keys(bloom_files):
    """THE correctness property: a key present in a row group must
    always pass its filter — over every present key of every group of
    every file (a single wrong bit in our hash or probe order would
    fail hundreds of these). Absent keys must be overwhelmingly
    rejected (FPP sized for ndv=n is << 1%)."""
    checked = 0
    for buf in bloom_files:
        meta, schema = _parse_file(buf)
        for rg_idx in range(len(meta.get(4, []))):
            md = _key_chunk_md(buf, "k", rg_idx)
            bitset = read_bloom_filter(buf, md)
            assert bitset is not None and len(bitset) % 32 == 0
            keys = [
                v
                for v in read_column_chunk(buf, md, schema["k"])
                if v is not None
            ]
            for v in keys:
                assert sbbf_contains(bitset, xxhash64(plain_encode(v, 2))), v
            checked += len(keys)
            absent = range(50_000, 52_000)
            fp = sum(
                1
                for v in absent
                if sbbf_contains(bitset, xxhash64(plain_encode(v, 2)))
            )
            assert fp / len(absent) < 0.02
    assert checked == 24000


def test_bloom_scan_skips_groups_and_matches_exact_filter(bloom_files):
    """Needles all ≡ 3 (mod 6) live in one residue class's files; the
    other files' zone maps span the full key range (unprunable) but
    their filters prove the needles absent — whole row groups skip
    BEFORE any page decode. Results equal the exact filter."""
    needles = [3, 63, 1203, 18003, 23997]
    got_k, got_v = [], []
    read = tot = 0
    for buf in bloom_files:
        d, r, t, flt = read_parquet_bloom_pruned_bytes(
            buf, ["k", "v"], "k", needles
        )
        assert flt == t  # every Spark-written group carries a filter
        got_k += d["k"]
        got_v += d["v"]
        read += r
        tot += t
    assert sorted(got_k) == needles
    assert sorted(got_v) == sorted(float(k % 997) for k in needles)
    # the headline: most groups are eliminated by the filter alone
    assert read < tot / 2, (read, tot)
    # needles absent from the table entirely: empty result, ~all skipped
    for buf in bloom_files:
        d, r, t, _ = read_parquet_bloom_pruned_bytes(
            buf, ["k"], "k", [777_777, 999_999_999]
        )
        assert d["k"] == []


def test_bloom_scan_string_keys(bloom_files):
    """BYTE_ARRAY keys hash their raw utf-8 bytes (no length prefix);
    the scan accepts str needles and returns the exact rows."""
    needles = ["key-000009", "key-012345", "key-023999", "key-nothere"]
    got = []
    read = tot = 0
    for buf in bloom_files:
        d, r, t, flt = read_parquet_bloom_pruned_bytes(
            buf, ["s", "k"], "s", needles
        )
        assert flt == t
        got += d["k"]
        read += r
        tot += t
    assert sorted(got) == [9, 12345, 23999]
    assert read < tot


def test_bloom_scan_conservative_without_filters(spark, tmp_path):
    """Files written WITHOUT bloom filters read conservatively: every
    group within the zone-map range decodes, results still exact."""
    out = str(tmp_path / "nofilter")
    spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    ).coalesce(1).write.mode("overwrite").parquet(out)
    buf = open(sorted(glob.glob(out + "/part-*.parquet"))[0], "rb").read()
    d, r, t, flt = read_parquet_bloom_pruned_bytes(
        buf, ["k", "w"], "k", [7, 4999]
    )
    assert flt == 0
    assert r == t  # nothing to prove absence with: read it all
    assert d["k"] == [7, 4999] and d["w"] == [14, 9998]
    # but zone maps still prune out-of-range needles with no filter
    d2, r2, _t2, _ = read_parquet_bloom_pruned_bytes(
        buf, ["k"], "k", [999_999]
    )
    assert d2["k"] == [] and r2 == 0


def test_bloom_degenerate_probes():
    assert sbbf_contains(b"", 12345) is True  # degenerate: conservative
    assert read_bloom_filter(b"\x00" * 64, {}) is None  # no offset field


def test_bloom_writer_parquet_mr_reference_read(spark, tmp_path):
    """Round-14 WRITE side: build_parquet_bytes(bloom_cols=...) emits
    the thrift BloomFilterHeader + SBBF bitset with ColumnMetaData
    fields 14/15 — and parquet-mr ITSELF (via the Spark JVM's
    ParquetFileReader/BloomFilterReader) is the reference reader:
    it parses our header, and its findHash must admit every present
    key's hash (our XXH64 is pinned bit-exact against Spark's) and
    reject almost every absent key's — which proves the bitset
    layout, block selection, and salt math byte-for-byte. A Spark
    end-to-end filtered read then exercises the engine's own bloom
    consumption path on our structure."""
    from simple_data_engineering_project_spark.operators.parquet_bloom import (
        plain_encode,
        xxhash64,
    )
    from simple_data_engineering_project_spark.operators.parquet_write import (
        build_parquet_bytes,
    )

    n = 4000
    cols = {
        "k": [None if i % 41 == 0 else i * 7 for i in range(n)],
        "s": [f"key-{i % 997:04d}" for i in range(n)],
    }
    data = build_parquet_bytes(
        cols, {"k": "bigint", "s": "string"},
        compression="snappy", row_group_size=1500, bloom_cols=["k", "s"],
    )
    path = str(tmp_path / "own_bloom.parquet")
    with open(path, "wb") as f:
        f.write(data)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    ifile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(path), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(ifile)
    try:
        blocks = reader.getFooter().getBlocks()
        assert blocks.size() == 3  # 1500-row groups over 4000 rows

        def _signed(h):
            return h - (1 << 64) if h >= (1 << 63) else h

        row0 = 0
        for bi in range(blocks.size()):
            block = blocks.get(bi)
            bfr = reader.getBloomFilterDataReader(block)
            n_rows = block.getRowCount()
            for ci in range(block.getColumns().size()):
                col = block.getColumns().get(ci)
                name = col.getPath().toDotString()
                bf = bfr.readBloomFilter(col)
                assert bf is not None, name  # parquet-mr parsed OUR header
                lo, hi = row0, row0 + n_rows
                if name == "k":
                    present = [v for v in cols["k"][lo:hi] if v is not None]
                    hashes = [
                        _signed(xxhash64(plain_encode(v, 2))) for v in present
                    ]
                    absent = [
                        _signed(xxhash64(plain_encode(v, 2)))
                        for v in range(50_000, 51_000)
                    ]
                else:
                    present = list(set(cols["s"][lo:hi]))
                    hashes = [
                        _signed(xxhash64(plain_encode(v, 6))) for v in present
                    ]
                    absent = [
                        _signed(xxhash64(plain_encode(f"zz-{v}", 6)))
                        for v in range(1000)
                    ]
                misses = [h for h in hashes if not bf.findHash(h)]
                assert not misses, (name, bi, len(misses))
                fp = sum(1 for h in absent if bf.findHash(h))
                assert fp / len(absent) < 0.05, (name, bi, fp)
            row0 += n_rows
    finally:
        reader.close()

    # Spark end-to-end: the engine's reader consumes our structure with
    # the filter pushed (a malformed header/bitset would throw or drop
    # rows here) and returns the exact rows
    got = (
        spark.read.parquet(path)
        .filter("k = 77 OR k = 27993")
        .orderBy("k")
        .collect()
    )
    assert [r["k"] for r in got] == [77, 27993]


def test_bloom_writer_signed_zero_variants(tmp_path):
    """Round-14 review regression: 0.0 and -0.0 compare equal in
    Python but PLAIN-encode (and hash) differently — the writer must
    insert BOTH encodings' hashes, or a probe for the set-dropped
    variant proves a physically-present value absent and the scan
    silently loses rows."""
    from simple_data_engineering_project_spark.operators.parquet_bloom import (
        plain_encode,
        read_bloom_filter,
        read_parquet_bloom_pruned_bytes,
        sbbf_contains,
        xxhash64,
    )
    from simple_data_engineering_project_spark.operators.parquet_write import (
        build_parquet_bytes,
    )

    vals = [0.0, -0.0, 1.5, 2.5] * 50
    data = build_parquet_bytes(
        {"x": vals, "k": list(range(len(vals)))},
        {"x": "double", "k": "bigint"},
        compression="none", bloom_cols=["x"],
    )
    from simple_data_engineering_project_spark.operators.parquet_data import (
        _parse_file,
    )

    meta, _schema = _parse_file(data)
    md = next(
        cc.get(3)
        for cc in meta.get(4, [])[0].get(1, [])
        if ".".join(p.decode() for p in cc.get(3).get(3, [])) == "x"
    )
    bitset = read_bloom_filter(data, md)
    for v in (0.0, -0.0):
        assert sbbf_contains(bitset, xxhash64(plain_encode(v, 5))), v
    # and the scan finds every matching row for either needle spelling
    for needle in (0.0, -0.0):
        d, _r, _t, _f = read_parquet_bloom_pruned_bytes(
            data, ["k"], "x", [needle]
        )
        assert len(d["k"]) == 100, needle  # 0.0 == -0.0 rows both match


def test_bloom_probe_signed_zero_both_directions():
    """Round-15 ADVICE regression (probe-side twin of the writer
    fix): a file whose key column physically stores ONLY one zero
    sign has only that sign's encoding hash in its filter — the
    PROBE must then try both encodings for a zero needle, because
    0.0 == -0.0 means the downstream exact filter would keep the
    row the bloom skip just threw away. Covers FLOAT and DOUBLE,
    both needle spellings, against both stored spellings."""
    from simple_data_engineering_project_spark.operators.parquet_bloom import (
        read_parquet_bloom_pruned_bytes,
    )
    from simple_data_engineering_project_spark.operators.parquet_write import (
        build_parquet_bytes,
    )

    for sql_type in ("float", "double"):
        for stored in (0.0, -0.0):
            vals = [stored, 7.5, 9.25, 11.0] * 25
            data = build_parquet_bytes(
                {"x": vals, "k": list(range(len(vals)))},
                {"x": sql_type, "k": "bigint"},
                compression="none", bloom_cols=["x"],
            )
            for needle in (0.0, -0.0):
                d, nread, ntot, nflt = read_parquet_bloom_pruned_bytes(
                    data, ["k"], "x", [needle]
                )
                assert nflt == ntot
                assert len(d["k"]) == 25, (sql_type, stored, needle)
            # absent-key pruning still works (no over-conservatism):
            # a non-zero absent needle must skip the group outright
            d, nread, _t, _f = read_parquet_bloom_pruned_bytes(
                data, ["k"], "x", [123.5]
            )
            assert d["k"] == [] and nread == 0, (sql_type, stored)


def test_sink_parquet_bloom_decode_tolerates_empty_shard(
    spark, monkeypatch
):
    """Round-15 ADVICE regression: an empty shard (zero-row parquet
    payload) must decode to zero rows like the other sink roundtrips,
    not IndexError on keys[0] while building the bloom self-check
    needles. The live write path skips empty Arrow batches, so this
    pins robustness against foreign zero-row files. (The ``spark``
    fixture is load-bearing even though unused directly: the catalog
    entry builds ``F.col`` expressions at call time, which needs an
    active SparkContext — without it this test is order-dependent.)"""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    import importlib

    catalog = importlib.import_module(
        "simple_data_engineering_project_spark.plans.catalog"
    )

    captured = {}

    def fake_scaffold(spark, sf_dir, leaf, suffix, encode_batch,
                      decode_shard, *a, **k):
        captured["decode"] = decode_shard
        return None

    monkeypatch.setattr(catalog, "tune_for_queries", lambda s: None)
    monkeypatch.setattr(catalog, "_shard_sink_roundtrip", fake_scaffold)
    catalog._REGISTRY["sink_parquet_bloom"].fn(None, None)

    empty = pa.table(
        {
            "o_orderkey": pa.array([], type=pa.int64()),
            "prio": pa.array([], type=pa.string()),
            "price": pa.array([], type=pa.float64()),
        }
    )
    buf = io.BytesIO()
    pq.write_table(empty, buf)
    assert captured["decode"](buf.getvalue()) == []


def test_bloom_truncation_and_bitflips_never_hang(bloom_files):
    """The repo-standard hardening battery, with the bloom trust
    contract: (a) nothing hangs (alarm-guarded); (b) flips at or after
    the first bloom offset never touch data pages, so survivors may
    at worst DROP rows (a corrupted filter legally proves less) but
    can never fabricate them; (c) flips in the data region are
    raise-or-return; truncations may raise anything."""
    import random
    import signal

    def _has_bloom(blob):
        m, _ = _parse_file(blob)
        return any(
            cc.get(3) and cc.get(3).get(14) is not None
            for rg in m.get(4, [])
            for cc in rg.get(1, [])
        )

    # hash partitioning may leave an empty part file: battery the
    # first file that actually carries data + filters
    data = next(b for b in bloom_files if _has_bloom(b))
    meta, _schema = _parse_file(data)
    d0, _r, t0, _f = read_parquet_bloom_pruned_bytes(
        data, ["k", "v"], "k", [0, 6, 600, 23994]
    )
    full = set(zip(d0["k"], d0["v"]))
    bloom_start = min(
        cc.get(3).get(14)
        for rg in meta.get(4, [])
        for cc in rg.get(1, [])
        if cc.get(3) and cc.get(3).get(14) is not None
    )

    def guarded(blob):
        signal.alarm(30)
        try:
            return read_parquet_bloom_pruned_bytes(
                blob, ["k", "v"], "k", [0, 6, 600, 23994]
            )
        finally:
            signal.alarm(0)

    for cut in (60, len(data) // 3, bloom_start + 5, len(data) - 9):
        try:
            guarded(data[:cut])
        except Exception:
            pass
    rnd = random.Random(14)
    flips = [rnd.randrange(len(data)) for _ in range(40)] + [
        bloom_start + rnd.randrange(len(data) - bloom_start)
        for _ in range(40)
    ]
    for i in flips:
        mut = bytearray(data)
        mut[i] ^= 1 << rnd.randrange(8)
        try:
            g2, _r2, _t2, _f2 = guarded(bytes(mut))
        except Exception:
            continue
        if i >= bloom_start:
            assert set(zip(g2["k"], g2["v"])) <= full, i
