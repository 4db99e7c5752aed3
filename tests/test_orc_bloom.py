"""ORC bloom filter read path (round 14) — the ORC twin of
tests/test_parquet_bloom.py.

Honesty basis: pyarrow's ORC reader exposes no bloom surface and
DuckDB does not read ORC, but Spark's JVM writer emits the filters
(``orc.bloom.filter.columns``), so every filter probed here comes
from the in-container reference writer and the hashes (Thomas Wang
64-bit for longs, the Apache ORC Murmur3 64-bit variant for strings)
are pinned empirically: a no-false-negative sweep over EVERY present
key of every written row group — thousands of probes where a single
wrong constant, rotation, or tail-signedness choice fails immediately.
String fixtures deliberately include non-ASCII (high-bit) bytes and
every length-mod-8 class so the Murmur3 tail path is fully pinned.
"""
from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from simple_data_engineering_project_spark.operators.orc_bloom import (
    bloom_test,
    murmur3_hash64,
    read_orc_bloom_pruned_bytes,
    read_stripe_bloom_filters,
    wang_long_hash,
)
from simple_data_engineering_project_spark.operators.orc_data import (
    _leaf_columns,
    _parse_tail,
    read_orc_columns,
)


@pytest.fixture(scope="module")
def orc_bloom_files(spark, tmp_path_factory):
    """Spark-written fixture: keys hash-spread across files (every
    file's stripe statistics span the full key range — zone maps can
    never prune), bloom filters on the int64 key AND a string key
    whose values cover non-ASCII bytes and all tail-length classes,
    plus a column without a filter."""
    out = str(tmp_path_factory.mktemp("orcbloom") / "t")
    n = 24000
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        # varied length (mod-8 classes) + non-ASCII: 'é' and 'ß' have
        # multi-byte utf-8 encodings with high bits set, exercising the
        # Murmur3 tail signedness on every row
        F.concat(
            F.lit("clé-"),
            F.format_string("%06d", F.col("id")),
            F.expr("repeat('ß', CAST(id % 7 AS INT))"),
        ).alias("s"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    (
        df.repartition(6, F.col("k") % 6)
        .write.mode("overwrite")
        .option("orc.bloom.filter.columns", "k,s")
        .option("orc.bloom.filter.fpp", "0.01")
        .orc(out)
    )
    paths = sorted(glob.glob(out + "/part-*.orc"))
    assert paths
    return [open(p, "rb").read() for p in paths]


def _key_filters(buf, col):
    codec, _f, types, stripes = _parse_tail(buf)
    cid = _leaf_columns(types)[col]["col_id"]
    return [
        read_stripe_bloom_filters(buf, st, codec, cid)[1]
        for st in stripes
    ], stripes


def test_orc_bloom_no_false_negatives_over_all_present_keys(orc_bloom_files):
    """THE correctness property, for both hash paths: every present
    key must pass its row group's filter. 24k longs pin the Wang mix;
    24k non-ASCII varied-length strings pin the Murmur3 block, tail,
    and finalization. Absent keys must be overwhelmingly rejected."""
    checked = 0
    for buf in orc_bloom_files:
        filters_k, stripes = _key_filters(buf, "k")
        filters_s, _ = _key_filters(buf, "s")
        if not stripes:
            continue
        d = read_orc_columns(buf, ["k", "s"])
        # row-group size: Spark default orc.row.index.stride = 10000
        stride = 10000
        row0 = 0
        for si, st in enumerate(stripes):
            n_rows = st.get(5, 0)
            assert filters_k[si] and filters_s[si]
            for rg, (kf, kbits) in enumerate(filters_k[si]):
                sf_, sbits = filters_s[si][rg]
                lo = row0 + rg * stride
                hi = min(row0 + (rg + 1) * stride, row0 + n_rows)
                for r in range(lo, hi):
                    kv, sv = d["k"][r], d["s"][r]
                    assert bloom_test(kbits, kf, wang_long_hash(kv)), kv
                    assert bloom_test(
                        sbits, sf_, murmur3_hash64(sv.encode("utf-8"))
                    ), sv
                    checked += 1
            row0 += n_rows
        # absent keys: fpp sized at 0.01
        kbits0 = filters_k[0][0]
        fp = sum(
            1
            for v in range(50_000, 52_000)
            if bloom_test(kbits0[1], kbits0[0], wang_long_hash(v))
        )
        assert fp / 2000 < 0.05
    assert checked == 24000


def test_orc_bloom_scan_skips_stripes_and_matches_exact_filter(
    orc_bloom_files,
):
    """Needles all ≡ 3 (mod 6) live in one residue class's files; the
    other files' stripe stats span the full key range (unprunable) but
    their filters prove the needles absent — whole stripes skip
    without touching a data byte. Results equal the exact filter."""
    needles = [3, 63, 1203, 18003, 23997]
    got_k, got_v = [], []
    read = tot = 0
    for buf in orc_bloom_files:
        d, r, t, flt = read_orc_bloom_pruned_bytes(
            buf, ["k", "v"], "k", needles
        )
        assert flt == t  # every Spark-written stripe carries a filter
        got_k += d["k"]
        got_v += d["v"]
        read += r
        tot += t
    assert sorted(got_k) == needles
    assert sorted(got_v) == sorted(float(k % 997) for k in needles)
    assert read < tot / 2, (read, tot)
    for buf in orc_bloom_files:
        d, _r, _t, _ = read_orc_bloom_pruned_bytes(
            buf, ["k"], "k", [777_777, 999_999_999]
        )
        assert d["k"] == []


def test_orc_bloom_scan_string_keys(orc_bloom_files):
    """String needles hash through the Murmur3 path; the scan accepts
    str needles (including non-ASCII) and returns the exact rows."""
    needles = [
        "clé-000009ßß",       # 9 % 7 = 2 trailing ß
        "clé-012345ßßßß",     # 12345 % 7 = 4
        "clé-023999ßßß",      # 23999 % 7 = 3
        "clé-nothere",
    ]
    got = []
    read = tot = 0
    for buf in orc_bloom_files:
        d, r, t, flt = read_orc_bloom_pruned_bytes(
            buf, ["s", "k"], "s", needles
        )
        assert flt == t
        got += d["k"]
        read += r
        tot += t
    assert sorted(got) == [9, 12345, 23999]
    assert read < tot


def test_orc_bloom_conservative_without_filters(spark, tmp_path):
    out = str(tmp_path / "nofilter")
    spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    ).coalesce(1).write.mode("overwrite").orc(out)
    buf = open(sorted(glob.glob(out + "/part-*.orc"))[0], "rb").read()
    d, r, t, flt = read_orc_bloom_pruned_bytes(
        buf, ["k", "w"], "k", [7, 4999]
    )
    assert flt == 0
    assert r == t  # nothing to prove absence with: read it all
    assert d["k"] == [7, 4999] and d["w"] == [14, 9998]
    # but stripe stats still prune out-of-range needles
    d2, r2, _t2, _ = read_orc_bloom_pruned_bytes(buf, ["k"], "k", [999_999])
    assert d2["k"] == [] and r2 == 0


def test_orc_bloom_degenerate_probes():
    assert bloom_test(b"", 3, 12345) is True
    assert bloom_test(b"\x00" * 64, 0, 12345) is True


def test_orc_bloom_declared_survives_corrupt_index_blob(orc_bloom_files):
    """Round-14 review regression: a stripe footer that PARSES and
    declares a bloom stream must keep declared=True even when the
    index blob itself is corrupt — the honesty counter counts
    declarations (parquet field-14 parity), and the read falls back
    to conservative. Corrupting the blob's compression-chunk header
    makes _decompress_stream raise inside the index decode only."""
    from simple_data_engineering_project_spark.operators.orc_data import (
        _decompress_stream,
        _pb_map,
        _as_list,
    )

    def _first_data_stripe(blob):
        _c, _f, _t, stripes = _parse_tail(blob)
        return stripes[0] if stripes else None

    data = next(b for b in orc_bloom_files if _first_data_stripe(b))
    codec, _f, types, stripes = _parse_tail(data)
    cid = _leaf_columns(types)["k"]["col_id"]
    st = stripes[0]
    declared, filters = read_stripe_bloom_filters(data, st, codec, cid)
    assert declared and filters
    # locate the bloom stream's bytes and wreck its chunk framing
    sf = _pb_map(
        _decompress_stream(
            codec,
            data[st.get(1, 0) + st.get(2, 0) + st.get(3, 0):][: st.get(4, 0)],
        )
    )
    pos = st.get(1, 0)
    for s_raw in _as_list(sf.get(1)):
        s = _pb_map(s_raw)
        if s.get(2, 0) == cid and s.get(1, 0) == 8:
            break
        pos += s.get(3, 0)
    mut = bytearray(data)
    mut[pos] ^= 0xFF  # chunk-framing header byte of the index blob
    mut[pos + 1] ^= 0xFF
    mut[pos + 2] ^= 0xFF
    d2, f2 = read_stripe_bloom_filters(bytes(mut), st, codec, cid)
    assert d2 is True  # declaration survives
    assert f2 is None  # decode declines: conservative
    # and the scan still counts it while reading conservatively
    got, r, t, flt = read_orc_bloom_pruned_bytes(
        bytes(mut), ["k"], "k", [999_999_999]
    )
    assert flt >= 1 and got["k"] == []


def test_orc_bloom_truncation_and_bitflips_never_hang(orc_bloom_files):
    """The repo-standard hardening battery under the bloom trust
    contract: nothing hangs; flips in the INDEX region (where the
    filters live, before any data stream) may at worst DROP rows but
    can never fabricate them; flips elsewhere are raise-or-return;
    truncations may raise anything."""
    import random
    import signal

    def _nonempty(blob):
        _c, _f, _t, stripes = _parse_tail(blob)
        return bool(stripes)

    data = next(b for b in orc_bloom_files if _nonempty(b))
    needles = [0, 6, 600, 23994]
    d0, _r, _t0, _f = read_orc_bloom_pruned_bytes(
        data, ["k", "v"], "k", needles
    )
    full = set(zip(d0["k"], d0["v"]))
    _c, _f2, _t2, stripes = _parse_tail(data)
    # index region of the first stripe = [offset, offset+index_len)
    idx_lo = stripes[0].get(1, 0)
    idx_hi = idx_lo + stripes[0].get(2, 0)

    def guarded(blob):
        signal.alarm(30)
        try:
            return read_orc_bloom_pruned_bytes(
                blob, ["k", "v"], "k", needles
            )
        finally:
            signal.alarm(0)

    for cut in (16, len(data) // 3, len(data) - 9):
        try:
            guarded(data[:cut])
        except Exception:
            pass
    rnd = random.Random(14)
    flips = [rnd.randrange(len(data)) for _ in range(30)] + [
        idx_lo + rnd.randrange(max(idx_hi - idx_lo, 1)) for _ in range(50)
    ]
    for i in flips:
        mut = bytearray(data)
        mut[i] ^= 1 << rnd.randrange(8)
        try:
            g2, _r2, _tt, _ff = guarded(bytes(mut))
        except Exception:
            continue
        if idx_lo <= i < idx_hi:
            assert set(zip(g2["k"], g2["v"])) <= full, i


def test_orc_bloom_multi_rowgroup_stride_edges(spark, tmp_path):
    """Round-15 review target (r14 verdict ask #5): Spark-written
    stripes at rowIndexStride EDGE sizes — a partial last row group
    (2500 rows @ stride 1000) and rows = stride + 1 (10001 @ 10000) —
    must yield one filter per row group with zero false negatives
    over every present key, including the short tail group, and an
    in-range absent needle must still prune every stripe."""
    import glob as _glob

    from simple_data_engineering_project_spark.operators.orc_data import (
        _leaf_columns as _leaves,
        _parse_tail as _tail,
    )

    for n, stride in ((2500, 1000), (10001, 10000)):
        out = str(tmp_path / f"stride_{n}_{stride}")
        (
            spark.range(0, n).select((F.col("id") * 3).alias("k"))
            .coalesce(1).write.mode("overwrite")
            .option("orc.bloom.filter.columns", "k")
            .option("orc.row.index.stride", str(stride))
            .orc(out)
        )
        buf = open(sorted(_glob.glob(out + "/part-*.orc"))[0], "rb").read()
        codec, _f, types, stripes = _tail(buf)
        cid = _leaves(types)["k"]["col_id"]
        base = 0
        for si, st in enumerate(stripes):
            declared, filters = read_stripe_bloom_filters(
                buf, st, codec, cid
            )
            n_rows = st.get(5)
            nrg = -(-n_rows // stride)
            assert declared and filters is not None
            assert len(filters) == nrg, (n, stride, si)
            for rg in range(nrg):
                k_, bits = filters[rg]
                for i in range(
                    base + rg * stride,
                    base + min((rg + 1) * stride, n_rows),
                ):
                    assert bloom_test(bits, k_, wang_long_hash(i * 3))
            base += n_rows
        d, nread, ntot, _flt = read_orc_bloom_pruned_bytes(
            buf, ["k"], "k", [4]  # in-range, key space is multiples of 3
        )
        assert d["k"] == [] and nread == 0
