"""ORC bloom-filter WRITE path (round 15) — the write twin of
tests/test_orc_bloom.py, closing the asymmetry the parquet side closed
in round 14.

Honesty basis (the symmetric write-path rule): reference READERS ship
in-container — Spark's JVM ORC reader (org.apache.orc) consumes our
index region end-to-end, and a SearchArgument read observes GENUINE
row-group skips driven by our ROW_INDEX + BLOOM_FILTER_UTF8 streams
(a wrong hash constant, bitset layout, position count, or protobuf
field id either throws or stops the skips); pyarrow's ORC C++ reader
re-reads every value; the repo's own prober cross-checks pruning.
Sizing parity (k, bitset bytes) and row-index position layouts are
pinned against a Spark-written uncompressed file probed in-session:
stride 10000 / fpp 0.01 → k=7 / 11984-byte bitsets; positions long=2,
string-direct=3 (data + length,run), double=1, root=none, nullable
prepends 3.
"""
from __future__ import annotations

import io
import struct

import pytest

from simple_data_engineering_project_spark.operators.orc_bloom import (
    bloom_test,
    murmur3_hash64,
    read_orc_bloom_pruned_bytes,
    read_stripe_bloom_filters,
    wang_long_hash,
)
from simple_data_engineering_project_spark.operators.orc_data import (
    _as_list,
    _decompress_stream,
    _leaf_columns,
    _parse_tail,
    _pb_map,
    read_orc_columns,
)
from simple_data_engineering_project_spark.operators.orc_write import (
    build_orc_bytes,
)


def _mixed_file(n=7500, stripe_rows=2500, stride=1000):
    cols = {
        "k": list(range(0, 2 * n, 2)),  # evens: absent odds stay in-range
        "s": [f"clé-{i:06d}" + "ß" * (i % 7) for i in range(n)],
        "v": [float(i % 997) + 0.5 for i in range(n)],
        "nul": [None if i % 5 == 0 else i for i in range(n)],
    }
    ddl = {"k": "bigint", "s": "string", "v": "double", "nul": "int"}
    buf = build_orc_bytes(
        cols, ddl, compression="none", stripe_rows=stripe_rows,
        bloom_cols=["k", "s"], bloom_fpp=0.01, row_index_stride=stride,
    )
    return buf, cols


def _index_streams(buf):
    """{(col, kind): decoded protobuf maps list} for kinds 6/8 of the
    first stripe, plus the stripe dict."""
    codec, _f, _t, stripes = _parse_tail(buf)
    st = stripes[0]
    offset = st.get(1, 0)
    sf_raw = buf[offset + st.get(2, 0) + st.get(3, 0):][: st.get(4, 0)]
    sf = _pb_map(_decompress_stream(codec, sf_raw))
    out = {}
    pos = offset
    for s_raw in _as_list(sf.get(1)):
        s = _pb_map(s_raw)
        kind, col, ln = s.get(1, 0), s.get(2, 0), s.get(3, 0)
        if kind in (6, 8):
            idx = _pb_map(_decompress_stream(codec, buf[pos:pos + ln]))
            out[(col, kind)] = [_pb_map(e) for e in _as_list(idx.get(1))]
        pos += ln
    return out, st


def _varints(b):
    out, v, sh = [], 0, 0
    for byte in b or b"":
        v |= (byte & 0x7F) << sh
        if byte & 0x80:
            sh += 7
        else:
            out.append(v)
            v = 0
            sh = 0
    return out


def test_all_reference_readers_accept_indexed_files(spark, tmp_path):
    buf, cols = _mixed_file()
    # pyarrow (ORC C++)
    import pyarrow.orc as po

    t = po.ORCFile(io.BytesIO(buf)).read()
    for c in cols:
        assert t.column(c).to_pylist() == cols[c], c
    # own reader
    d = read_orc_columns(buf, list(cols))
    for c in cols:
        assert d[c] == cols[c], c
    # Spark JVM (filter + full scan)
    p = str(tmp_path / "idx.orc")
    open(p, "wb").write(buf)
    df = spark.read.orc(p)
    assert df.count() == len(cols["k"])
    got = df.filter("k = 4998").collect()
    assert [(r.k, r.s) for r in got] == [(4998, cols["s"][2499])]


def test_java_reader_skips_row_groups_on_our_bloom(spark, tmp_path):
    """The strongest proof: org.apache.orc's RecordReader under a
    SearchArgument surfaces ONLY the row group containing the needle
    (1000 of 6000 rows), and ZERO rows for an absent needle inside
    every row group's [min, max] — skips only our bloom can drive.
    Keys sit above 2^31 so py4j boxes the literal as java.lang.Long."""
    from py4j.java_gateway import get_field

    B = 1 << 33
    n = 6000
    keys = [B + i * 2 + (1 if i >= n // 2 else 0) for i in range(n)]
    buf = build_orc_bytes(
        {"k": keys, "v": [float(i) for i in range(n)]},
        {"k": "bigint", "v": "double"},
        stripe_rows=3000, bloom_cols=["k"], bloom_fpp=0.01,
        row_index_stride=1000,
    )
    p = str(tmp_path / "sarg.orc")
    open(p, "wb").write(buf)

    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    reader = jvm.org.apache.orc.OrcFile.createReader(
        jvm.org.apache.hadoop.fs.Path(p),
        jvm.org.apache.orc.OrcFile.readerOptions(
            spark._jsc.hadoopConfiguration()
        ),
    )
    assert reader.getWriterVersion().toString() == "ORC_135"
    assert reader.getRowIndexStride() == 1000
    PLT = jvm.org.apache.hadoop.hive.ql.io.sarg.PredicateLeaf.Type
    SF = jvm.org.apache.hadoop.hive.ql.io.sarg.SearchArgumentFactory

    def rows_under(needle):
        sarg = (
            SF.newBuilder()
            .startAnd()
            .equals("k", PLT.LONG, needle)
            .end()
            .build()
        )
        names = gw.new_array(jvm.java.lang.String, 2)
        names[1] = "k"
        rr = reader.rows(reader.options().searchArgument(sarg, names))
        batch = reader.getSchema().createRowBatch()
        total = 0
        while rr.nextBatch(batch):
            total += get_field(batch, "size")
        rr.close()
        return total

    # present: exactly its 1000-row group survives (5 of 6 rgs skipped)
    assert rows_under(B + 4444) == 1000
    # absent but inside rg [min, max] everywhere it lands: bloom-only
    assert rows_under(B + 4443) == 0
    assert rows_under(B + 9999 * 2 + 12345679) == 0  # out of range too


def test_bloom_sizing_and_positions_match_java(spark, tmp_path):
    """Parity pins against the Java writer: write the SAME shape
    through Spark's ORC writer (uncompressed, bloom on long + string)
    and through ours, then compare k, bitset bytes, entry counts, and
    per-kind position COUNTS (entry-0 values are all zeros in both)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "java")
    n = 24000
    (
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("s-"), F.format_string("%06d", F.col("id"))).alias("s"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("orc.compress", "NONE")
        .option("orc.bloom.filter.columns", "k,s")
        .option("orc.bloom.filter.fpp", "0.01")
        .orc(out)
    )
    import glob

    jbuf = open(sorted(glob.glob(out + "/part-*.orc"))[0], "rb").read()
    obuf = build_orc_bytes(
        {
            "k": list(range(n)),
            "s": [f"s-{i:06d}" for i in range(n)],
            "v": [float(i % 997) for i in range(n)],
        },
        {"k": "bigint", "s": "string", "v": "double"},
        bloom_cols=["k", "s"], bloom_fpp=0.01, row_index_stride=10000,
    )
    jidx, _ = _index_streams(jbuf)
    oidx, ost = _index_streams(obuf)
    for col in (1, 2):  # k, s
        jb, ob = jidx[(col, 8)], oidx[(col, 8)]
        assert len(jb) == len(ob) == 3  # one filter per row group
        for j, o in zip(jb, ob):
            assert o.get(1) == j.get(1) == 7  # numHashFunctions
            assert len(o.get(3)) == len(j.get(3)) == 11984  # bitset
    for col, npos in ((0, 0), (1, 2), (2, 3), (3, 1)):
        jes, oes = jidx[(col, 6)], oidx[(col, 6)]
        assert len(jes) == len(oes) == 3
        jp = _varints(jes[0].get(1))
        op = _varints(oes[0].get(1))
        assert len(jp) == len(op) == npos, (col, jp, op)
        assert op == [0] * npos
    # our multi-rg entries carry real chunk offsets (monotone, 2nd rg > 0)
    if oidx[(3, 6)]:
        p1 = _varints(oidx[(3, 6)][1].get(1))
        assert p1 and p1[0] == 10000 * 8  # double chunk offset


def test_write_no_false_negatives_every_present_key(spark):
    """Every present key of every row group must probe PRESENT in its
    row group's filter — int and string columns, all tail-length
    classes, nulls interleaved. A single wrong constant anywhere in
    hash/bitset/probe math fails hundreds of these."""
    buf, cols = _mixed_file(n=4000, stripe_rows=1600, stride=800)
    codec, _f, types, stripes = _parse_tail(buf)
    leaves = _leaf_columns(types)
    n = len(cols["k"])
    for colname, hasher in (
        ("k", lambda v: wang_long_hash(v)),
        ("s", lambda v: murmur3_hash64(v.encode("utf-8"))),
    ):
        cid = leaves[colname]["col_id"]
        row = 0
        for st in stripes:
            declared, filters = read_stripe_bloom_filters(
                buf, st, codec, cid
            )
            assert declared and filters
            n_rows = st.get(5)
            stride = 800
            n_rg = -(-n_rows // stride)
            assert len(filters) == n_rg
            for rg in range(n_rg):
                k_, bits = filters[rg]
                for i in range(
                    row + rg * stride,
                    min(row + (rg + 1) * stride, row + n_rows),
                ):
                    assert bloom_test(bits, k_, hasher(cols[colname][i]))
            row += n_rows
    assert row == n


def test_write_bloom_scan_prunes_and_matches_exact(spark):
    buf, cols = _mixed_file()
    # present needles: exact rows back, some stripes skipped
    needles = [cols["k"][10], cols["k"][5000]]
    out, nread, ntot, nflt = read_orc_bloom_pruned_bytes(
        buf, ["s"], "k", needles
    )
    assert nflt == ntot == 3
    assert sorted(out["s"]) == sorted(
        [cols["s"][10], cols["s"][5000]]
    )
    assert nread == 2  # two distinct stripes
    # absent odd needle inside stripe-0 range: bloom proves it out
    out, nread, _t, _f = read_orc_bloom_pruned_bytes(
        buf, ["s"], "k", [1001]
    )
    assert out["s"] == [] and nread == 0
    # string needle
    i = 123
    out, nread, _t, _f = read_orc_bloom_pruned_bytes(
        buf, ["k"], "s", [cols["s"][i]]
    )
    assert out["k"] == [cols["k"][i]] and nread == 1


def test_write_empty_and_allnull_shards(spark):
    buf = build_orc_bytes(
        {"k": [], "s": []}, {"k": "bigint", "s": "string"},
        bloom_cols=["k"],
    )
    import pyarrow.orc as po

    assert po.ORCFile(io.BytesIO(buf)).read().num_rows == 0
    out, nread, ntot, nflt = read_orc_bloom_pruned_bytes(
        buf, ["s"], "k", [1]
    )
    assert out["s"] == []
    buf2 = build_orc_bytes(
        {"k": [None, None], "v": [1.5, None]},
        {"k": "bigint", "v": "double"}, bloom_cols=["k"],
    )
    d = read_orc_columns(buf2, ["k", "v"])
    assert d["k"] == [None, None] and d["v"] == [1.5, None]
    t2 = po.ORCFile(io.BytesIO(buf2)).read()
    assert t2.column("k").to_pylist() == [None, None]


def test_index_mode_gates_decline_loudly():
    cols = {"k": [1], "t": [5]}
    with pytest.raises(NotImplementedError, match="uncompressed"):
        build_orc_bytes(
            cols, {"k": "bigint", "t": "bigint"},
            compression="zlib", bloom_cols=["k"],
        )
    with pytest.raises(ValueError, match="multiple of 8"):
        build_orc_bytes(
            cols, {"k": "bigint", "t": "bigint"},
            bloom_cols=["k"], row_index_stride=1001,
        )
    with pytest.raises(NotImplementedError, match="flat"):
        build_orc_bytes(
            {"k": [1], "a": [[1]]},
            {"k": "bigint", "a": "array<bigint>"}, bloom_cols=["k"],
        )
    with pytest.raises(NotImplementedError, match="int-family"):
        build_orc_bytes(
            {"k": [1.5]}, {"k": "double"}, bloom_cols=["k"],
        )
    with pytest.raises(ValueError, match="not in columns"):
        build_orc_bytes({"k": [1]}, {"k": "bigint"}, bloom_cols=["zz"])


def test_indexed_truncation_and_bitflips_never_hang():
    """Repo-standard hardening battery over an index-mode file: any
    exception is fine; hangs and fabricated rows are not (a corrupted
    filter may legally DROP rows — the trust contract)."""
    import signal

    buf, cols = _mixed_file(n=600, stripe_rows=300, stride=104)

    def guarded(blob):
        signal.alarm(10)
        try:
            out, _r, _t, _f = read_orc_bloom_pruned_bytes(
                blob, ["s"], "k", [cols["k"][7]]
            )
            # fabricating is forbidden; dropping is legal
            assert set(out["s"]) <= {cols["s"][7]}
        except Exception:
            pass
        finally:
            signal.alarm(0)

    for cut in range(0, len(buf), max(1, len(buf) // 37)):
        guarded(buf[:cut])
    for pos in range(0, len(buf), max(1, len(buf) // 53)):
        flipped = bytearray(buf)
        flipped[pos] ^= 0x40
        guarded(bytes(flipped))


def test_bloom_filter_pb_wire_shape():
    """The emitted BloomFilter message decodes to (k, 64-bit-aligned
    bitset) and a value inserted is found while a distinct absent one
    (different hash) is rejected at fpp 0.01 over a tiny set."""
    from simple_data_engineering_project_spark.operators.orc_write import (
        _bloom_filter_pb,
    )

    msg = _bloom_filter_pb(list(range(100)), 4, 1000, 0.01)
    bf = _pb_map(msg)
    k, bits = bf.get(1), bf.get(3)
    assert k >= 1 and len(bits) % 8 == 0
    for v in range(100):
        assert bloom_test(bits, k, wang_long_hash(v))
    misses = sum(
        1 for v in range(10_000, 11_000)
        if bloom_test(bits, k, wang_long_hash(v))
    )
    assert misses < 30  # ~fpp on absent keys, generous bound
