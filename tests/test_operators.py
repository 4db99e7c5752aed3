"""Operator unit tests on tiny literal DataFrames — semantics pinned
independently of the testdata (SURVEY §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_data_engineering_project_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from simple_data_engineering_project_spark.operators.joins import (
    join_asof,
    join_range,
    join_range_banded,
)
from simple_data_engineering_project_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from simple_data_engineering_project_spark.operators.upsert import (
    upsert_last_write_wins,
)


def test_upsert_new_wins_and_inserts(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k int, name string, v double"
    )
    new = spark.createDataFrame(
        [(2, "B", 99.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    out = {r["k"]: (r["name"], r["v"]) for r in
           upsert_last_write_wins(old, new, keys=["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0)}


def test_upsert_tiebreak_within_new(spark):
    old = spark.createDataFrame([(1, 0)], "k int, v int")
    new = spark.createDataFrame([(1, 5), (1, 9)], "k int, v int")
    out = upsert_last_write_wins(old, new, keys=["k"], tiebreak=["v"]).collect()
    assert len(out) == 1 and out[0]["v"] == 9  # highest tiebreak wins


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 100)],
        "id int, k int, t long",
    ).select("id", "k", F.timestamp_seconds("t").alias("t"))
    right = spark.createDataFrame(
        [(101, 10, 100, 1.0), (102, 10, 205, 2.0), (103, 10, 250, 3.0)],
        "rid int, k int, t long, val double",
    ).select("rid", "k", F.timestamp_seconds("t").alias("t"), "val")
    out = {
        r["id"]: r["asof_val"]
        for r in join_asof(
            left, right, key="k", left_ts="t", right_ts="t",
            right_values=["val"], tiebreak="rid",
        ).collect()
    }
    # id=1: right@100 ties left@100 → included (<=); id=2: right@205 exact;
    # id=3: latest right ≤300 is @250; id=4: no right rows for k=20 → null
    assert out == {1: 1.0, 2: 2.0, 3: 3.0, 4: None}


def test_range_banded_matches_broadcast_range(spark):
    fact = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 97 * 1.0).alias("v")
    )
    buckets = spark.createDataFrame(
        [("a", 0.0, 30.0), ("b", 30.0, 60.0), ("c", 60.0, 100.0)],
        "name string, lo double, hi double",
    )
    bcast = (
        join_range(fact, buckets, F.col("v"), F.col("lo"), F.col("hi"))
        .groupBy("name").count().orderBy("name").collect()
    )
    banded = (
        join_range_banded(fact, buckets, "v", "lo", "hi", band_width=25.0)
        .groupBy("name").count().orderBy("name").collect()
    )
    assert [tuple(r) for r in bcast] == [tuple(r) for r in banded]


def _doc_corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "under the warm sun near the old stone bridge by the river bank"
    )
    near = base.replace("lazy", "sleepy")  # 1-word change → high jaccard
    far = (
        "completely different content about spark query engines and "
        "columnar execution with vectorized readers and shuffle services"
    )
    return spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], "doc_id long, text string"
    )


def test_minhash_lsh_finds_near_dups(spark):
    docs = _doc_corpus(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in minhash_lsh_candidates(docs, k=3, num_hashes=64, bands=16).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5  # near dup collides
    assert (1, 3) not in pairs and (2, 3) not in pairs  # unrelated: no bucket


def test_ngram_jaccard_exact_verification(spark):
    docs = _doc_corpus(spark)
    cands = minhash_lsh_candidates(docs, k=3, num_hashes=64, bands=16)
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, cands, k=3).collect()
    }
    assert verified[(1, 4)] == 1.0
    est_vs_exact = abs(verified[(1, 2)] - 0.78)
    assert est_vs_exact < 0.15  # exact jaccard of the 1-word edit ≈ 0.78


def test_simhash_near_dups(spark):
    docs = _doc_corpus(spark)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_dups(docs, max_hamming=10).collect()}
    assert pairs.get((1, 4)) == 0  # identical text → identical fingerprint
    assert (1, 2) in pairs  # near dup within hamming 10
    assert (1, 3) not in pairs


def _emb_tables(spark):
    import math

    rows = []
    for i in range(200):
        # deterministic pseudo-random unit-ish vectors
        vec = [math.sin(i * 37.1 + d * 1.7) for d in range(16)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_topk_recall_vs_brute_force(spark):
    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {r["item_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {r["item_id"] for r in
              lsh_topk(emb, q, dim=16, k=10, bands=12, bits=4).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_brute_force_topk_self_is_rank1(spark):
    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 7).select(
        F.lit(7).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = brute_force_topk(emb, q, k=3).orderBy("rank").collect()
    assert top[0]["item_id"] == 7
    assert abs(top[0]["cosine"] - 1.0) < 1e-12


def test_approx_stats_accuracy(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_ivf_topk_recall_vs_brute_force(spark):
    from simple_data_engineering_project_spark.operators.similarity import ivf_topk

    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {r["item_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {
        r["item_id"]
        for r in ivf_topk(emb, q, k=10, n_cells=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_ivf_full_probe_matches_brute_force(spark):
    from simple_data_engineering_project_spark.operators.similarity import ivf_topk

    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 3).select(
        F.lit(3).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = [(r["item_id"], r["rank"]) for r in
             brute_force_topk(emb, q, k=10).orderBy("rank").collect()]
    # probing every cell must recover the exact answer (recall == 1)
    full = [(r["item_id"], r["rank"]) for r in
            ivf_topk(emb, q, k=10, n_cells=8, n_probe=8).orderBy("rank").collect()]
    assert full == exact


def test_ivf_det_full_probe_matches_brute_force(spark):
    from simple_data_engineering_project_spark.operators.similarity import (
        ivf_topk_det,
    )

    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 3).select(
        F.lit(3).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = [(r["item_id"], r["rank"]) for r in
             brute_force_topk(emb, q, k=10).orderBy("rank").collect()]
    full = [(r["item_id"], r["rank"]) for r in
            ivf_topk_det(emb, q, k=10, n_cells=8, n_probe=8)
            .orderBy("rank").collect()]
    assert full == exact


def test_ivf_det_recall_vs_brute_force(spark):
    from simple_data_engineering_project_spark.operators.similarity import (
        ivf_topk_det,
    )

    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {r["item_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {
        r["item_id"]
        for r in ivf_topk_det(emb, q, k=10, n_cells=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"det-IVF recall too low: {recall}"


def test_pq_det_oversample_everything_matches_brute_force(spark):
    from simple_data_engineering_project_spark.operators.similarity import (
        pq_topk_det,
    )

    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 3).select(
        F.lit(3).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = [(r["item_id"], r["rank"]) for r in
             brute_force_topk(emb, q, k=10).orderBy("rank").collect()]
    # oversample covering the whole 200-row corpus -> the exact re-rank
    # IS brute force, whatever the codes said
    full = [(r["item_id"], r["rank"]) for r in
            pq_topk_det(emb, q, k=10, m=4, ksub=16, oversample=20)
            .orderBy("rank").collect()]
    assert full == exact


def test_pq_det_recall_vs_brute_force(spark):
    from simple_data_engineering_project_spark.operators.similarity import (
        pq_topk_det,
    )

    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {r["item_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {
        r["item_id"]
        for r in pq_topk_det(emb, q, k=10, m=4, ksub=16, oversample=5)
        .collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"det-PQ recall too low: {recall}"


def test_embedding_near_dups_finds_exact_copies(spark):
    from simple_data_engineering_project_spark.operators.dedup import (
        embedding_near_dups,
    )

    base = _emb_tables(spark)
    copies = base.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000)
    )
    corpus = base.unionByName(copies)
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups(corpus, threshold=0.95, dim=16).collect()
    }
    for i in range(5):  # every injected copy pairs with its original at cosine 1
        assert (i, i + 1000) in pairs
        assert abs(pairs[(i, i + 1000)] - 1.0) < 1e-6


def test_embedding_near_dups_no_false_positives_below_threshold(spark):
    from simple_data_engineering_project_spark.operators.dedup import (
        embedding_near_dups,
    )

    corpus = _emb_tables(spark)  # sin-wave vectors, no high-cosine pairs
    for r in embedding_near_dups(corpus, threshold=0.95, dim=16).collect():
        assert r["cosine"] >= 0.95  # verify step filters every candidate


def test_winnow_shared_substring_shares_fingerprint(spark):
    from simple_data_engineering_project_spark.operators.text import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "yesterday the quick brown fox jumps over a sleepy cat"),
            (3, "cocoa shipment quality scores trend upward in ashanti"),
        ],
        "doc_id long, text string",
    )
    fps: dict[int, set] = {}
    for r in winnow_fingerprints(docs, k=8, window=4).collect():
        fps.setdefault(r["id"], set()).add(r["fingerprint"])
    # docs 1 and 2 share "the quick brown fox jumps over" (len >= k+window-1)
    assert fps[1] & fps[2]
    assert not fps[1] & fps[3]
    assert not fps[2] & fps[3]


def test_winnow_deterministic_and_contained(spark):
    from simple_data_engineering_project_spark.operators.text import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(1, "some reasonably long document text for fingerprinting runs")],
        "doc_id long, text string",
    )
    a = {r["fingerprint"] for r in winnow_fingerprints(docs).collect()}
    b = {r["fingerprint"] for r in winnow_fingerprints(docs.repartition(5)).collect()}
    assert a == b  # layout-invariant


def test_connected_components_labels(spark):
    from simple_data_engineering_project_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (10, 11)], "id_a long, id_b long"
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8, 11: 8}


def test_connected_components_chain_converges(spark):
    from simple_data_engineering_project_spark.operators.dedup import (
        connected_components,
    )

    # a path graph is the worst case for label propagation (diameter = n)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    cc = connected_components(edges, max_iter=15).collect()
    assert {r["component"] for r in cc} == {0}


def test_dedup_fuzzy_keep_one(spark):
    from simple_data_engineering_project_spark.operators.dedup import (
        dedup_fuzzy_keep_one,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
            (3, "the quick brown fox jumps over the lazy dog again and once more today"),
            (10, "cocoa shipment quality scores trend upward across every ashanti farm"),
            (11, "completely distinct text about structured streaming watermarks"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup_fuzzy_keep_one(docs, threshold=0.5, k=3).collect()
    )
    assert kept == [1, 10, 11]  # near-dup cluster {1,2,3} keeps min id


def test_dedup_fuzzy_keep_one_empty_token_arrays(spark):
    """Round-14 ADVICE regression: pre-tokenized rows with EMPTY token
    arrays (reachable through the public toks_col contract, though
    tokens() itself never yields []) must not crash the Arrow
    row-local signature path with a zero-size numpy reduction. The
    empty-token doc gets a null signature — same semantics as the
    explode→groupBy path, which emits no signature row — so it never
    pairs and survives dedup untouched."""
    from simple_data_engineering_project_spark.operators.dedup import (
        dedup_fuzzy_keep_one,
        minhash_signatures_df,
    )

    base = "the quick brown fox jumps over the lazy dog again and again".split()
    docs = spark.createDataFrame(
        [
            (1, base + ["today"]),
            (2, base + ["tonight"]),  # near-dup of 1
            (3, []),                  # EMPTY pre-tokenized doc
            (4, ["completely", "distinct", "text", "about", "watermarks",
                 "and", "stateful", "streaming", "checkpoints"]),
        ],
        "doc_id long, toks array<string>",
    ).withColumn("text", F.array_join("toks", " "))
    kept = sorted(
        r["doc_id"]
        for r in dedup_fuzzy_keep_one(
            docs, threshold=0.5, k=3, toks_col="toks"
        ).collect()
    )
    assert kept == [1, 3, 4]  # cluster {1,2} keeps 1; empty doc survives
    # and the explode→groupBy twin indeed emits no row for the empty doc
    sig_ids = {
        r["id"]
        for r in minhash_signatures_df(docs, k=3, toks_col="toks").collect()
    }
    assert sig_ids == {1, 2, 4}


def test_curate_corpus_stages(spark):
    from simple_data_engineering_project_spark.operators.text import curate_corpus

    en = "the quick brown fox jumps over the lazy dog and it was fine for it"
    docs = spark.createDataFrame(
        [
            (1, en + " today"),
            (2, en + " tonight"),  # near-dup of 1
            (3, en + " today"),    # exact dup of 1
            (4, "el rapido zorro que salta y corre por la casa de los gatos"),  # es
            (5, "x! y? z."),       # fails the quality gate
            (6, "structured streaming keeps state in the checkpointed store and it is fine that it was so"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in curate_corpus(docs, lang="en", min_quality=0.4, jaccard_threshold=0.5,).collect()
    )
    assert kept == [1, 6]


def test_minhash_bucket_cap_guards_degenerate_buckets(spark):
    # 30 identical docs → every band bucket has 30 members → 435 pairs
    # uncapped; a cap of 10 drops the degenerate buckets entirely
    docs = spark.createDataFrame(
        [(i, "exactly the same boilerplate text repeated in every document") for i in range(30)],
        "doc_id long, text string",
    )
    uncapped = minhash_lsh_candidates(docs, k=3).count()
    capped = minhash_lsh_candidates(docs, k=3, max_bucket_size=10).count()
    assert uncapped == 30 * 29 // 2
    assert capped == 0


def test_pack_sequences_offset_binning(spark):
    from simple_data_engineering_project_spark.operators.text import pack_sequences

    # shard "a": docs of 3, 4, 2 tokens; budget 5 → start offsets 0, 3, 7
    # → bins 0, 0, 1. shard "b" packs independently from offset 0.
    docs = spark.createDataFrame(
        [
            (1, "one two three", "a"),
            (2, "a b c d", "a"),
            (3, "x y", "a"),
            (4, "p q r s t u", "b"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"])
        for r in pack_sequences(docs, budget_tokens=5).collect()
    }
    assert rows == {1: (3, 0), 2: (4, 0), 3: (2, 1), 4: (6, 0)}


def test_sample_frames_explodes_and_dispatches(spark):
    from simple_data_engineering_project_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "a" * 600), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    frames = mm.sample_frames_df(mm.media_from_documents(docs), frame_bytes=256)
    got = {
        (r["media_id"], r["frame_no"]): r["n_bytes"] for r in frames.collect()
    }
    # 600 bytes → 256+256+88; 2 bytes → one frame; empty → zero frames
    assert got == {(1, 0): 256, (1, 1): 256, (1, 2): 88, (2, 0): 2}

    import pytest as _pytest

    video = mm.media_from_documents(docs).withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("modality"),
            F.lit("video/mp4").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )
    with _pytest.raises(Exception, match="NotImplementedError|stubbed"):
        mm.sample_frames_df(video).collect()


def test_bmp_wav_codecs_roundtrip():
    from simple_data_engineering_project_spark.operators import multimodal as mm

    # BMP: non-multiple-of-4 row stride forces padding; the decoder must
    # exclude pad bytes from the pixel sum
    payload = mm.encode_bmp(3, 2, (10, 20, 30))
    d = mm.decode_bmp(payload)
    assert (d["width"], d["height"]) == (3, 2)
    assert d["pixel_sum"] == 3 * 2 * (10 + 20 + 30)
    stride = ((3 * 3 + 3) // 4) * 4  # 12, includes 3 pad bytes per row
    assert len(payload) == 54 + stride * 2

    # WAV: constant negative sample, exact int sum + duration
    wav = mm.encode_wav(250, -123, framerate=8000)
    w = mm.decode_wav(wav)
    assert (w["channels"], w["framerate"], w["n_frames"]) == (1, 8000, 250)
    assert w["duration_ms"] == 250 * 1000 // 8000
    assert w["sample_sum"] == 250 * -123


def test_png_codec_roundtrip_and_filters():
    import struct
    import zlib

    import numpy as np

    from simple_data_engineering_project_spark.operators import multimodal as mm

    # round-trip: encoder alternates None/Sub/Up filters across rows
    payload = mm.encode_png(5, 4, (7, 8, 9))
    d = mm.decode_png(payload)
    assert (d["width"], d["height"], d["channels"]) == (5, 4, 3)
    assert d["pixel_sum"] == 5 * 4 * (7 + 8 + 9)

    # decoder-only filters (Average=3, Paeth=4) pinned by a hand-built
    # grayscale fixture: pixels [[10,20],[30,60]]
    # row0 Average: x - (left+above)//2 -> 10-(0+0)//2=10, 20-(10+0)//2=15
    # row1 Paeth: pred(30)=above=10 -> 20; pred(60): left=30,above=20,
    #   ul=10 -> p=40, pa=10,pb=20,pc=30 -> left -> 60-30=30
    raw = bytes([3, 10, 15, 4, 20, 30])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    fixture = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )
    d2 = mm.decode_png(fixture)
    assert (d2["width"], d2["height"], d2["channels"]) == (2, 2, 1)
    assert d2["pixel_sum"] == 10 + 20 + 30 + 60

    # multi-byte pixels: Sub filter must reference bpp bytes left, and
    # Paeth/Average the same — verify against numpy reference for RGB
    rng = np.random.RandomState(7)
    w, h = 3, 3
    px = rng.randint(0, 256, size=(h, 3 * w), dtype=np.uint8)
    lines = bytearray()
    for y in range(h):
        lines.append(4)  # Paeth everywhere
        for i in range(3 * w):
            left = int(px[y, i - 3]) if i >= 3 else 0
            above = int(px[y - 1, i]) if y else 0
            ul = int(px[y - 1, i - 3]) if (y and i >= 3) else 0
            p = left + above - ul
            pa, pb, pc = abs(p - left), abs(p - above), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (above if pb <= pc else ul)
            lines.append((int(px[y, i]) - pred) & 0xFF)
    ihdr_rgb = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    fixture_rgb = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr_rgb)
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + mm._png_chunk(b"IEND", b"")
    )
    d3 = mm.decode_png(fixture_rgb)
    assert d3["pixel_sum"] == int(px.sum(dtype=np.int64))

    # unsupported shapes must raise, not mis-decode
    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit
    bad = (
        mm._PNG_SIG
        + mm._png_chunk(b"IHDR", bad_ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + mm._png_chunk(b"IEND", b"")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.decode_png(bad)


def test_extract_features_decodes_mixed_media(spark):
    from simple_data_engineering_project_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "img"), (1, "aud"), (2, "plain text"), (3, "img2")],
        "doc_id long, text string",
    )
    feats = {
        r["media_id"]: r.asDict()
        for r in mm.extract_features(mm.media_mixed_from_documents(docs)).collect()
    }
    assert feats[0]["modality"] == "image"
    assert (feats[0]["width"], feats[0]["height"]) == (1, 1)
    assert feats[0]["content_sum"] == 1 * 1 * 3  # v=0 → B,G,R = 0,1,2
    assert feats[3]["modality"] == "image"
    assert (feats[3]["width"], feats[3]["height"]) == (4, 4)
    assert feats[3]["content_sum"] == 4 * 4 * (3 * 3 + 3)
    assert feats[1]["modality"] == "audio"
    assert feats[1]["duration_ms"] == 101 * 1000 // 8000
    assert feats[1]["content_sum"] == 101 * (1 - 500)
    assert feats[1]["width"] is None
    assert feats[2]["modality"] == "text"
    assert feats[2]["n_bytes"] == len("plain text")
    assert feats[2]["content_sum"] is None


def test_extract_features_survives_corrupt_containers(spark):
    # a truncated BMP / WAV must fall back to byte-level features, not fail
    from simple_data_engineering_project_spark.operators import multimodal as mm

    corrupt = [
        (1, bytearray(b"BM" + b"\x00" * 20)),  # truncated BMP header
        (2, bytearray(b"RIFF1234WAVEjunk")),  # WAV magic, garbage body
    ]
    media = spark.createDataFrame(
        [
            (i, bytes(b), ("image", "x", None, None, None))
            for i, b in corrupt
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert rows[1]["n_bytes"] == 22 and rows[1]["width"] is None
    assert rows[2]["n_bytes"] == 16 and rows[2]["duration_ms"] is None


def test_decontaminate_flags_ngram_overlap(spark):
    from simple_data_engineering_project_spark.operators.text import decontaminate

    leak = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    # bucket b = ((id % 1000003) * 2654435761) % 2^32 % 100:
    # id=2 -> b=26 (train), id=4 -> b=52 (train), id=11 -> b=95 (test)
    docs = spark.createDataFrame(
        [
            (2, f"intro words {leak} trailing text here"),  # train, leaked
            (4, "completely unrelated content with no overlap at all ok"),
            (11, f"the test doc contains {leak} inside it"),  # test
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_shared_ngrams"] for r in decontaminate(docs).collect()}
    assert 2 in rows and rows[2] >= 1  # leaked train doc flagged
    assert 4 not in rows  # clean train doc absent
    assert 11 not in rows  # test docs never appear in the output
    from simple_data_engineering_project_spark.operators.text import (
        repetition_features,
    )

    docs = spark.createDataFrame(
        [
            # 4 non-empty lines (2×"buy…", 2×"spam"), 2 distinct → 0.5;
            # 14 tokens → 13 bigrams, "buy now"×6 → top 6/13 = 0.4615
            (1, "buy now buy now buy now\nspam\n\nspam\nbuy now buy now buy now"),
            # all lines unique, all bigrams unique
            (2, "alpha beta\ngamma delta"),
            # single token → no bigrams → 0.0
            (3, "hello"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_lines"], r["dup_line_frac"], r["top_bigram_frac"])
        for r in repetition_features(docs).collect()
    }
    assert rows[1] == (4, 0.5, 0.4615)
    assert rows[2] == (2, 0.0, 0.3333)  # 3 distinct bigrams → round(1/3, 4)
    assert rows[3] == (1, 0.0, 0.0)
    assert rows[4] == (0, 0.0, 0.0)


def test_chunk_documents_overlap_and_boundaries(spark):
    from simple_data_engineering_project_spark.operators.text import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    # chunk 4, overlap 1 → step 3: last start = ceil((10-4)/3)*3 = 6 →
    # starts 0,3,6, all full chunks; no redundant tail past the text end
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_chars"])
        for r in chunk_documents(docs, chunk_chars=4, overlap_chars=1).collect()
    )
    assert rows == [(1, 0, 4), (1, 1, 4), (1, 2, 4), (2, 0, 2)]
    # overlap: chunk 1 starts at offset 3 → "defg" overlaps "abcd" by... none
    # at step 3 the shared char is position 3 only when overlap=1: chunk0 is
    # chars [0,4), chunk1 [3,7) → they share char 3. Verify via md5 of "defg".
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk_md5"]
        for r in chunk_documents(docs, chunk_chars=4, overlap_chars=1).collect()
    }
    import hashlib

    assert got[(1, 1)] == hashlib.md5(b"defg").hexdigest()


def test_tfidf_keywords_ranks_rare_terms(spark):
    from simple_data_engineering_project_spark.operators.text import (
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra"),
            (2, "common common common"),
            (3, "common yak yak"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, k=2).collect()
    top = {r["doc_id"]: r["token"] for r in out if r["rank"] == 1}
    # "common" is in every doc (df=3 -> idf=1.0, score=tf); the rare
    # term has tf=2 and idf=ln(4/2)+1=1.69 -> 3.39 beats any common score
    assert top[1] == "zebra"
    assert top[3] == "yak"
    # ranks are dense 1..k and scores non-increasing per doc
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["tfidf"]))
    for doc, rs in by_doc.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))


def test_quantize_embeddings_exact_ints_and_norm(spark):
    from simple_data_engineering_project_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [
            (1, [3.0, -4.0]),     # norm 5; q = [floor(3/4*127+.5), -127] = [95,-127]
            (2, [0.0, 0.0]),      # zero vector → guarded zeros
            (3, [1.0]),           # q = [127]
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: (r["n_dims"], r["l2_norm_e4"], r["q_sum"], r["q_min"], r["q_max"])
        for r in quantize_embeddings(df).collect()
    }
    assert rows[1] == (2, 50000, 95 - 127, -127, 95)
    assert rows[2] == (2, 0, 0, 0, 0)
    assert rows[3] == (1, 10000, 127, 127, 127)


def test_pii_scrub_masks_and_counts(spark):
    import hashlib

    from simple_data_engineering_project_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.co or admin@example.org, call +1 (555) 123-4567"),
            (2, "server at 10.0.0.1 and 192.168.1.255"),
            (3, "clean prose with no identifiers"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["n_phones"], r["scrubbed_md5"])
        for r in pii_scrub(docs).collect()
    }
    assert rows[1][:3] == (2, 0, 1)
    assert rows[2][:3] == (0, 2, 0)
    assert rows[3][:3] == (0, 0, 0)
    assert rows[1][3] == hashlib.md5(
        b"mail <EMAIL> or <EMAIL>, call <PHONE>"
    ).hexdigest()
    assert rows[2][3] == hashlib.md5(b"server at <IP> and <IP>").hexdigest()


def test_hash_split_deterministic_and_partition_invariant(spark):
    from simple_data_engineering_project_spark.functions import hash_split

    ids = spark.range(0, 10000).select(F.col("id"))
    a = ids.select("id", hash_split(F.col("id")).alias("s"))
    b = ids.repartition(13).select("id", hash_split(F.col("id")).alias("s"))
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    frac = {
        r["s"]: r["n"]
        for r in a.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    # multiplicative hash ≈ uniform: 80/10/10 within a few points
    assert abs(frac["train"] / 10000 - 0.8) < 0.05
    assert abs(frac["val"] / 10000 - 0.1) < 0.03
    assert abs(frac["test"] / 10000 - 0.1) < 0.03


def test_ohlc_open_close_deterministic_under_ts_ties(spark):
    # two events share one timestamp in one bucket: the lower event_id
    # must be "open" by the (micros, id) composite key — layout-invariant
    rows = [
        (1, "2024-01-01 00:01:00", "x", 10.0),
        (2, "2024-01-01 00:01:00", "x", 20.0),
        (3, "2024-01-01 00:05:00", "x", 30.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).select("event_id", F.to_timestamp("ts").alias("ts"), "event_type", "value")
    # exercise the aggregation expressions directly on the literal frame
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    out = (
        ev.select("event_type", "value", key.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.min_by("value", "__k").alias("open"),
            F.max_by("value", "__k").alias("close"),
        )
        .collect()[0]
    )
    assert out["open"] == 10.0 and out["close"] == 30.0
    # permuted layout gives the identical answer
    out2 = (
        ev.repartition(7)
        .select("event_type", "value", key.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.min_by("value", "__k").alias("open"),
            F.max_by("value", "__k").alias("close"),
        )
        .collect()[0]
    )
    assert (out2["open"], out2["close"]) == (10.0, 30.0)


def test_hll_rollup_mergeable(spark, sf_smoke):
    from simple_data_engineering_project_spark.plans.catalog import catalog

    # accuracy: weekly estimates within HLL tolerance of exact distincts
    est = {
        (r["event_type"], r["week"]): r["est_users"]
        for r in catalog()["events_hll_rollup"].fn(spark, sf_smoke).collect()
    }
    from simple_data_engineering_project_spark.sources import read_table

    ev = read_table(spark, sf_smoke, "events")
    exact = {
        (r["event_type"], r["week"]): r["n"]
        for r in ev.groupBy(
            "event_type",
            F.date_trunc("week", F.date_trunc("day", "ts")).alias("week"),
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) / max(exact[k], 1) < 0.05, (k, e, exact[k])

    # mergeability: union of daily sketches == one-shot weekly sketch,
    # estimate-for-estimate (same sketch state, not merely close)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = {
        (r["event_type"], r["week"]): r["est"]
        for r in daily.groupBy(
            "event_type", F.date_trunc("week", "day").alias("week")
        )
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    oneshot = {
        (r["event_type"], r["week"]): r["est"]
        for r in ev.groupBy(
            "event_type",
            F.date_trunc("week", F.date_trunc("day", "ts")).alias("week"),
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert merged == oneshot


def test_hll_deterministic_estimate_accuracy(spark, sf_smoke):
    """The integer sketch columns of events_hll_deterministic feed the
    driver-side float estimator; pin its accuracy against exact
    distinct counts (the float step itself is deliberately outside the
    hash-graded columns — ln() is not bit-reproducible across engines)."""
    from simple_data_engineering_project_spark.plans.catalog import (
        catalog,
        hll_deterministic_estimate,
    )
    from simple_data_engineering_project_spark.sources import read_table

    est = {
        (r["event_type"], r["week"]): hll_deterministic_estimate(
            r["n_zero_regs"], r["harmonic_sum_scaled"]
        )
        for r in catalog()["events_hll_deterministic"].fn(spark, sf_smoke).collect()
    }
    ev = read_table(spark, sf_smoke, "events")
    exact = {
        (r["event_type"], r["week"]): r["n"]
        for r in ev.groupBy(
            "event_type",
            F.date_trunc("week", F.date_trunc("day", "ts")).alias("week"),
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    # m=256 => HLL std error ~1.04/sqrt(256) = 6.5%; allow 3 sigma.
    for k, e in est.items():
        assert abs(e - exact[k]) / max(exact[k], 1) < 0.20, (k, e, exact[k])


def test_pq_topk_recall_vs_brute_force(spark):
    from simple_data_engineering_project_spark.operators.similarity import pq_topk

    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {r["item_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx = {
        r["item_id"]
        for r in pq_topk(emb, q, k=10, m=4, ksub=16, oversample=5).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"PQ recall too low: {recall}"


def test_jpeg_dims_roundtrip_and_marker_walk():
    from simple_data_engineering_project_spark.operators.multimodal import (
        decode_jpeg_dims,
        encode_jpeg_shell,
    )

    d = decode_jpeg_dims(encode_jpeg_shell(640, 480))
    assert (d["width"], d["height"], d["n_components"]) == (640, 480, 3)
    # dimensions survive a leading EXIF-style APP1 segment (marker walk,
    # not fixed offsets)
    shell = encode_jpeg_shell(33, 7)
    app1 = b"\xff\xe1" + (10).to_bytes(2, "big") + b"Exif\x00\x00\x00\x00"
    with_app1 = shell[:2] + app1 + shell[2:]
    d2 = decode_jpeg_dims(with_app1)
    assert (d2["width"], d2["height"]) == (33, 7)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_jpeg_dims(b"\x89PNG\r\n\x1a\n")


# ---------------------------------------------------------------------
# round-5 operators: span dedup, CDC apply, incremental merge, fuzzy
# join, k-means
# ---------------------------------------------------------------------


def test_dedup_spans_scrubs_only_cross_doc_repeats(spark):
    from simple_data_engineering_project_spark.operators.dedup import (
        dedup_spans_global,
    )

    boiler = "all rights reserved by the site"  # 6 tokens, in 3 docs
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma"),
            (2, f"{boiler} delta epsilon zeta"),
            (3, f"eta theta iota {boiler}"),
            (4, "unique text with no shared spans at all"),
            (5, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup_spans_global(docs, n=5, min_docs=3).collect()
    }
    # every token of the 6-token boilerplate is covered by a dup 5-gram
    assert out[1].n_removed == 6 and out[1].n_kept == 3
    assert out[2].n_removed == 6 and out[2].n_kept == 3
    assert out[3].n_removed == 6 and out[3].n_kept == 3
    # untouched docs: nothing removed, short docs (< n tokens) kept whole
    assert out[4].n_removed == 0 and out[4].n_kept == 8
    assert out[5].n_removed == 0 and out[5].n_kept == 1
    # reassembly preserves original order of survivors
    import hashlib

    assert out[1].clean_md5 == hashlib.md5(b"alpha beta gamma").hexdigest()


def test_dedup_spans_maximal_scrubs_only_long_runs(spark):
    """Run-length semantics (r8 verdict Next #4): adjacent covered
    positions merge into ONE maximal run; only runs >= min_run are
    scrubbed, so short cross-doc repeats survive that
    dedup_spans_global would have removed."""
    import hashlib

    from simple_data_engineering_project_spark.operators.dedup import (
        dedup_spans_maximal,
    )

    long_boiler = "this content is provided strictly as is without any warranty"  # 10 tok
    short_boiler = "terms of service apply"  # 4 tokens — padded to 5 below
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {long_boiler} gamma"),
            (2, f"{long_boiler} delta epsilon"),
            (3, f"eta theta {long_boiler}"),
            # the 5-token short boilerplate repeats across 3 docs too,
            # but its maximal covered run is 5 < min_run=8 → kept
            (4, f"one two {short_boiler} now three"),
            (5, f"four five {short_boiler} now six"),
            (6, f"seven eight {short_boiler} now nine"),
            (7, "totally unique text with no shared spans here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup_spans_maximal(
            docs, n=5, min_docs=3, min_run=8
        ).collect()
    }
    # 10-token boilerplate → one maximal run of 10 >= 8: scrubbed
    assert out[1].n_removed == 10 and out[1].n_runs_scrubbed == 1
    assert out[1].n_kept == 3
    assert out[1].clean_md5 == hashlib.md5(b"alpha beta gamma").hexdigest()
    # 5-token repeat ("terms of service apply now") → run of 5 < 8: KEPT
    assert out[4].n_removed == 0 and out[4].n_runs_scrubbed == 0
    assert out[5].n_removed == 0 and out[6].n_removed == 0
    # untouched doc
    assert out[7].n_removed == 0 and out[7].n_runs_scrubbed == 0


def test_attribution_touch_encoding_total_order_for_negative_us(spark):
    """Review-pass regression: the zero-padded touch encoding must stay
    a total order for PRE-1970 (negative) epoch-microsecond values —
    lpad of a raw negative would keep the sign inside the padding and
    sort before every positive. Both engines shift by 2^62 first."""
    import duckdb

    vals = [-(10**15), -1, 0, 1, 10**15]
    rows = spark.createDataFrame(
        [(v,) for v in vals], "tus long"
    ).selectExpr(
        "tus", "lpad(cast(tus + 4611686018427387904 as string), 20, '0') AS enc"
    ).orderBy("tus").collect()
    encs = [r.enc for r in rows]
    assert encs == sorted(encs)  # string order == numeric order
    # bit-identical to the oracle's printf form
    duck = duckdb.sql(
        "SELECT printf('%020d', v + 4611686018427387904) FROM "
        "(SELECT unnest([" + ",".join(map(str, vals)) + "]) AS v)"
    ).fetchall()
    assert [d[0] for d in duck] == encs


def test_cdc_apply_delete_and_latest_state(spark):
    from simple_data_engineering_project_spark.operators.incremental import (
        cdc_apply,
    )

    log = spark.createDataFrame(
        [
            (1, 1, "U", 10.0),
            (1, 2, "U", 20.0),   # latest for key 1 -> survives with 20.0
            (2, 1, "U", 5.0),
            (2, 3, "D", 0.0),    # latest for key 2 is delete -> vanishes
            (3, 9, "D", 0.0),
            (3, 10, "U", 7.0),   # delete then re-insert -> survives
        ],
        "k long, seq long, op string, v double",
    )
    out = {
        r.k: r
        for r in cdc_apply(log, ["k"], ["seq"], op_col="op").collect()
    }
    assert set(out) == {1, 3}
    assert out[1].v == 20.0 and out[1].n_changes == 2
    assert out[3].v == 7.0 and out[3].n_changes == 2


def test_incremental_merge_equals_full_recompute(spark):
    from simple_data_engineering_project_spark.operators.incremental import (
        agg_state,
        merge_agg_state,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.23),
            (1, "2024-01-05 00:00:00", 2.34),
            (1, "2024-01-25 00:00:00", 3.45),
            (2, "2024-01-26 00:00:00", 9.99),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    split = F.lit("2024-01-21 00:00:00").cast("timestamp")
    merged = merge_agg_state(
        agg_state(ev.filter(F.col("ts") < split), ["user_id"], "value", "ts"),
        agg_state(ev.filter(F.col("ts") >= split), ["user_id"], "value", "ts"),
        ["user_id"],
    )
    full = agg_state(ev, ["user_id"], "value", "ts")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_fuzzy_join_blocked_pairs_and_threshold(spark):
    from simple_data_engineering_project_spark.operators.joins import (
        fuzzy_join_blocked,
    )

    names = spark.createDataFrame(
        [("red bolt",), ("red bolts",), ("red widget",), ("blue bolt",),
         ("red bolt",)],  # duplicate row: distinct-first must collapse it
        "name string",
    )
    out = {(r.name_a, r.name_b): r.edit_dist
           for r in fuzzy_join_blocked(names, max_dist=2).collect()}
    # same block ('red'), within distance: bolt~bolts (1)
    assert out[("red bolt", "red bolts")] == 1
    # same block but distance 5 > 2: bolt vs widget excluded
    assert ("red bolt", "red widget") not in out
    # cross-block pair never considered despite distance 1
    assert ("blue bolt", "red bolt") not in out
    assert len(out) == 1


def test_kmeans_fit_df_matches_literal_path(spark):
    """The row-local struct-argmin assignment (round-15 rewrite of
    _nearest_centroid: single broadcast model row + array_min, no
    corpus shuffle) must reproduce the literal-expression trainer
    bit-for-bit — including the lowest-cid tie-break, exercised here
    with duplicate points equidistant from both init centroids."""
    from pyspark.sql import functions as F

    from simple_data_engineering_project_spark.operators.similarity import (
        _nearest_centroid,
        kmeans_fit,
        kmeans_fit_df,
    )

    pts = [(i, [0.0 + i * 0.25, 1.0]) for i in range(1, 5)] + [
        (i, [5.0, 1.0]) for i in range(5, 9)  # exact duplicates: d2 ties
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    lit_cents = kmeans_fit(df, k=3, iters=3)
    df_cents = {
        r["__cid"]: [float(x) for x in r["__c"]]
        for r in kmeans_fit_df(df, k=3, iters=3).collect()
    }
    assert df_cents == {i: c for i, c in enumerate(lit_cents)}
    # assignment parity on the trained model, incl. carried columns
    vecs = df.select(
        F.col("vec_id").alias("__kid"), F.col("embedding").alias("__kv")
    )
    cents = kmeans_fit_df(df, k=3, iters=3)
    assigned = {
        r["__kid"]: (r["cluster_id"], [float(x) for x in r["__kv"]])
        for r in _nearest_centroid(
            vecs, cents, "__kid", "__kv", carry=("__kv",)
        ).collect()
    }
    for i, v in pts:
        d2s = [
            (sum((a - b) ** 2 for a, b in zip(v, c)), cid)
            for cid, c in df_cents.items()
        ]
        want = min(d2s)[1]
        assert assigned[i] == (want, v)


def test_kmeans_deterministic_and_separates(spark):
    from simple_data_engineering_project_spark.operators.similarity import (
        kmeans_clusters,
    )

    # two tight blobs far apart; k=2 must split them exactly
    pts = [(i, [0.0 + i * 0.01, 0.0]) for i in range(1, 6)] + [
        (i, [10.0 + i * 0.01, 10.0]) for i in range(6, 11)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    out1 = dict(
        (r.vec_id, r.cluster_id)
        for r in kmeans_clusters(df, k=2, iters=2).collect()
    )
    out2 = dict(
        (r.vec_id, r.cluster_id)
        for r in kmeans_clusters(df, k=2, iters=2).collect()
    )
    assert out1 == out2  # deterministic across runs
    blob_a = {out1[i] for i in range(1, 6)}
    blob_b = {out1[i] for i in range(6, 11)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_resize_image_gradient_nearest_neighbor():
    import numpy as np

    from simple_data_engineering_project_spark.operators import multimodal as mm

    # 4×4 gradient: pixel (y, x) = (10*y, 10*x, 0) — distinguishes index
    # mappings (a constant image cannot)
    src = np.zeros((4, 4, 3), dtype=np.uint8)
    for y in range(4):
        for x in range(4):
            src[y, x] = (10 * y, 10 * x, 0)
    payload = mm.encode_png_pixels(src)
    out = mm.image_pixels(mm.resize_image(payload, 2, 2))
    # floor mapping src = (dst * 4) // 2 → rows/cols {0, 2}
    expect = src[[0, 2]][:, [0, 2]]
    assert (out == expect).all()
    # upscale 4×4 → 8×8: each source pixel repeats in a 2×2 block
    up = mm.image_pixels(mm.resize_image(payload, 8, 8))
    assert up.shape == (8, 8, 3)
    assert (up[::2, ::2] == src).all() and (up[1::2, 1::2] == src).all()


def test_resize_image_bmp_input_channel_and_row_order():
    from simple_data_engineering_project_spark.operators import multimodal as mm

    # constant-color BMP stores BGR bottom-up; resize must emit RGB PNG
    payload = mm.encode_bmp(5, 3, bgr=(7, 20, 99))
    out = mm.image_pixels(mm.resize_image(payload, 2, 2))
    assert out.shape == (2, 2, 3)
    assert (out == (99, 20, 7)).all()  # RGB order after swap


def test_resize_media_distributed_roundtrip(spark):
    from simple_data_engineering_project_spark.operators import multimodal as mm

    docs = spark.range(1, 21).withColumnRenamed("id", "doc_id")
    media = mm.media_png_from_documents(docs)
    feats = {
        r.media_id: r
        for r in mm.extract_features(
            mm.resize_media(media, width=6, height=4)
        ).collect()
    }
    for did in range(1, 21):
        r, g, b = did % 250, (did + 3) % 250, (did + 7) % 250
        assert feats[did].width == 6 and feats[did].height == 4
        assert feats[did].content_sum == 6 * 4 * (r + g + b)


def test_semantic_dedup_planted_duplicates(spark):
    from simple_data_engineering_project_spark.operators.similarity import (
        semantic_dedup,
    )

    # Two tight groups far apart + one planted near-duplicate per group.
    # k=2 clustering must separate the groups; within each, the higher-id
    # near-copy is the duplicate and the group anchor survives.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.01, 0.999, 0.0]),   # near-dup of 3
        (5, [0.7, -0.7, 0.1]),     # distinct; lands in some cluster alone-ish
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster_id"], r["is_dup"])
        for r in semantic_dedup(df, k=2, iters=2, threshold=0.95).collect()
    }
    assert out[2][1] == 1 and out[4][1] == 1      # planted dups flagged
    assert out[1][1] == 0 and out[3][1] == 0      # anchors kept
    assert out[1][0] == out[2][0]                 # dup pairs co-clustered
    assert out[3][0] == out[4][0]
    assert len(out) == 5                          # nothing dropped


def test_semantic_dedup_blocking_blinds_cross_cluster_pairs(spark):
    from simple_data_engineering_project_spark.operators.similarity import (
        semantic_dedup,
    )

    # Identical vectors forced into different clusters are NOT compared —
    # pinning that the pair generation is cluster-blocked (the scale
    # contract: no global all-pairs), not a hidden cartesian.
    rows = [
        (1, [1.0, 0.0]),
        (2, [-1.0, 0.0]),
        (3, [1.0, 0.0]),  # identical to 1 → same cluster → dup
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster_id"], r["is_dup"])
        for r in semantic_dedup(df, k=2, iters=2, threshold=0.9).collect()
    }
    assert out[3][1] == 1 and out[1][1] == 0 and out[2][1] == 0
    assert out[1][0] != out[2][0]


def test_semantic_dedup_derives_k_from_corpus_size(spark):
    # Fixed k makes Σ|cluster|² ≈ n²/k quadratic at scale (round-5
    # VERDICT "What's wrong #2"). k=None must derive
    # max(8, ceil(n / target_cluster_size)) — which bounds EXPECTED
    # cluster size, hence candidate pairs, at ~n·target_cluster_size.
    from simple_data_engineering_project_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # n=40, target=5 → k = ceil(40/5) = 8 = the floor; target=3 → k=14
    out = semantic_dedup(df, iters=1, threshold=1.01, target_cluster_size=3)
    clusters = {r["cluster_id"] for r in out.collect()}
    assert max(clusters) >= 8  # more than the floor-8 clusters exist
    assert len(clusters) <= 14


def test_semantic_dedup_oversize_cluster_skips_pair_compare(spark):
    # A degenerate mega-cluster of size m is m² pairs no matter how k
    # was chosen — members of clusters above max_cluster_size must skip
    # the compare (is_dup=0) instead of exploding, exactly like the LSH
    # oversize-bucket drop. Identical vectors in the oversize cluster
    # would otherwise be flagged.
    from simple_data_engineering_project_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [(i, [1.0, 0.0]) for i in range(1, 7)] + [
        (10, [-1.0, 0.0]),
        (11, [-1.0, 0.001]),  # near-dup pair in the small cluster
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {
        r["vec_id"]: r["is_dup"]
        for r in semantic_dedup(
            df, k=2, iters=2, threshold=0.9, max_cluster_size=4
        ).collect()
    }
    # the 6 identical vectors form an oversize (>4) cluster: not compared
    assert all(out[i] == 0 for i in range(1, 7))
    # the size-2 cluster is still deduped normally
    assert out[10] == 0 and out[11] == 1
    assert len(out) == 8  # oversize members are reported, not dropped


def test_char_entropy_closed_forms(spark):
    import math

    from simple_data_engineering_project_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaa"),          # degenerate: H = 0
            (2, "abcd"),          # uniform over 4 chars: H = ln 4
            (3, "AbCd!!"),        # case-folded; '!' outside alphabet ignored
            (4, ""),              # empty: defined as 0, no NaN
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: (r["n_alnum"], r["char_entropy"]) for r in
           char_entropy(df).collect()}
    assert out[1] == (4, 0.0)
    assert out[2] == (4, round(math.log(4), 4))
    assert out[3] == (4, round(math.log(4), 4))
    assert out[4] == (0, 0.0)


def test_sink_jsonl_shards_escaping_roundtrip(spark, tmp_path):
    import os

    from simple_data_engineering_project_spark.plans import catalog

    # quotes and backslashes in text must survive the explicit JSON
    # serialization → JSON-source re-read; counts prove byte fidelity
    docs = spark.createDataFrame(
        [
            (1, 'say "hi" \\ twice', "en", "web", 16),
            (2, "plain", "en", "web", 5),
            (3, 'only "quotes"', "en", "web", 13),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "sfX")
    os.makedirs(sf_dir)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    out = {
        r["shard"]: (r["n_docs"], r["sum_chars"])
        for r in catalog()["sink_jsonl_shards"].fn(spark, sf_dir).collect()
    }
    assert sum(n for n, _ in out.values()) == 3
    assert sum(c for _, c in out.values()) == 16 + 5 + 13


def test_avi_frame_sampler_walks_real_container():
    from simple_data_engineering_project_spark.operators.multimodal import (
        encode_avi,
        sample_video_frames,
    )

    frames = [b"frame-%02d" % i for i in range(10)] + [b"odd"]  # odd size last
    avi = encode_avi(frames, us_per_frame=100_000)  # 10 fps
    # stride = 300ms / 100ms-per-frame = 3; odd-size chunk padding must
    # not desync the walk
    assert sample_video_frames(avi, every_ms=300) == frames[::3]
    # sub-frame interval clamps to every frame
    assert sample_video_frames(avi, every_ms=50) == frames
    # empty container: no frames, no crash
    assert sample_video_frames(encode_avi([], 40000), 1000) == []


def test_avi_sampler_rejects_non_riff():
    import pytest as _pytest

    from simple_data_engineering_project_spark.operators.multimodal import (
        sample_video_frames,
    )

    # ftyp now routes to the REAL MP4 walker — a garbage body is a
    # corrupt container (ValueError), not an unsupported format
    with _pytest.raises(ValueError):
        sample_video_frames(b"\x00\x00\x00 ftypisom fake-mp4", 1000)
    # unknown container magic (FLV) stays out; AVI/MP4/MKV all dispatch
    # to real walkers now
    with _pytest.raises(NotImplementedError):
        sample_video_frames(b"FLV\x01\x05\x00\x00\x00\x09 not sliceable", 1000)
    with _pytest.raises(NotImplementedError):
        sample_video_frames(None, 1000)


def test_heavy_hitters_equals_naive_under_pruning_pressure(spark):
    from simple_data_engineering_project_spark.operators.text import heavy_hitters

    # 40 distinct rare words + 3 hot ones, capacity=5 forces the MG
    # sketch to decrement constantly — completeness must still hold.
    rows = []
    for i in range(40):
        rows.append((i, f"rare{i} filler{i % 7}"))
    rows.append((100, " ".join(["hot"] * 30 + ["warm"] * 12 + ["tepid"] * 8)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs = docs.repartition(4)  # multiple partitions: union-of-candidates path

    out = {r["word"]: r["cnt"] for r in
           heavy_hitters(docs, capacity=5).collect()}

    toks = docs.select(F.explode(F.split(
        F.trim(F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", " ")), " "
    )).alias("w")).filter(F.col("w") != "")
    total = toks.count()
    threshold = total // 5 + 1
    naive = {
        r["w"]: r["c"]
        for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()
        if r["c"] >= threshold
    }
    assert out == naive
    assert "hot" in out  # the planted heavy hitter survived pruning


def test_audio_dsp_features_closed_forms(spark):
    from simple_data_engineering_project_spark.operators.multimodal import (
        audio_dsp_features,
        encode_wav_alternating,
        wav_samples,
    )

    # odd frame count keeps the trailing +amp sample; amp=0 is silence
    s, rate = wav_samples(encode_wav_alternating(5, 300))
    assert rate == 8000 and list(s) == [300, -300, 300, -300, 300]

    docs = spark.createDataFrame([(0,), (101,), (250,)], "doc_id long")
    from simple_data_engineering_project_spark.operators.multimodal import (
        media_wav_alternating_from_documents,
    )
    media = media_wav_alternating_from_documents(docs)
    out = {r["media_id"]: r for r in audio_dsp_features(media).collect()}
    for did in (0, 101, 250):
        n = 100 + did % 400
        v = did % 1000 - 500
        r = out[did]
        assert r["n_frames"] == n
        assert r["peak_abs"] == abs(v)
        assert r["sum_sq"] == n * v * v
        assert r["zcr"] == (n - 1 if v != 0 else 0)
        assert r["rms_e4"] == abs(v) * 10000
        assert r["duration_ms"] == n * 1000 // 8000


def test_compress_ratio_orders_boilerplate_prose_noise(spark):
    from simple_data_engineering_project_spark.operators.text import compress_ratio

    boiler = "click here to subscribe " * 50
    prose = (
        "The cocoa harvest arrived early this year, and the farmers of the "
        "western region negotiated new shipment contracts with the port "
        "authority despite the unusually heavy seasonal rains upcountry."
    )
    # unique prose compresses worst; the repeated-template noise string
    # still has 42-char periodicity zlib exploits, so it sits between
    noise = "qZ3#kV9$mW1!xT7&nB5@pL2^dH8*fJ4(sR6)gY0-eK" * 4
    docs = spark.createDataFrame(
        [(1, boiler), (2, prose), (3, noise)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in compress_ratio(docs).collect()}
    assert out[1]["ratio_e4"] < out[3]["ratio_e4"] < out[2]["ratio_e4"]
    assert out[1]["ratio_e4"] < 2000  # boilerplate collapses
    assert out[2]["ratio_e4"] > 5000  # unique prose barely compresses
    for did, text in [(1, boiler), (2, prose), (3, noise)]:
        assert out[did]["n_raw"] == len(text.encode())
        assert out[did]["ratio_e4"] == out[did]["n_gz"] * 10000 // out[did]["n_raw"]

def test_dedup_paragraphs_global_first_wins(spark):
    from simple_data_engineering_project_spark.operators.dedup import (
        dedup_paragraphs,
    )

    # 3-word paragraphs. doc 1: [a b c][d e f]; doc 2 repeats doc 1's
    # first paragraph then adds a fresh one; doc 3 is entirely doc 1.
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),
            (3, "a b c d e f"),
            (4, "???"),  # no alnum words -> no output row
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(df, para_words=3).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 2)
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (2, 0)
    import hashlib

    assert out[2]["kept_md5"] == hashlib.md5(b"x y z").hexdigest()
    assert out[3]["kept_md5"] == hashlib.md5(b"").hexdigest()


def test_url_normalize_axes(spark):
    from simple_data_engineering_project_spark.operators.text import (
        url_normalize,
    )

    cases = [
        # scheme+host case, default port, www, trailing slash, fragment,
        # param order + tracking params
        (
            "HTTP://WWW.Example.COM:80/a/b/?b=2&a=1&utm_source=x#frag",
            "http://example.com/a/b?a=1&b=2",
        ),
        # https default port stripped, non-default port kept
        ("https://Site.org:443/p", "https://site.org/p"),
        ("https://site.org:8443/p", "https://site.org:8443/p"),
        # http :443 is NOT default for http -> kept
        ("http://site.org:443/p", "http://site.org:443/p"),
        # empty query/path survive; lone '?' drops
        ("https://site.org?", "https://site.org"),
        # only tracking params -> no query at all
        ("https://site.org/x?utm_a=1&utm_b=2", "https://site.org/x"),
        # a '?' INSIDE the fragment is not a query string
        ("https://site.org/page#frag?x=1", "https://site.org/page"),
        # real query AND a fragment with a '?': keep only the query
        ("https://site.org/p?a=1#f?b=2", "https://site.org/p?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["canon"]
        for r in df.select(
            url_normalize("url").alias("canon")
        ).collect()
    ]
    assert got == [want for _, want in cases]

def test_mlm_mask_plan_is_deterministic_and_rate_bounded(spark):
    from simple_data_engineering_project_spark.plans.catalog import catalog

    q = catalog()["mlm_mask_plan"]
    a = {r["doc_id"]: r for r in q.fn(spark, "/root/testdata/sf0.001").collect()}
    b = {r["doc_id"]: r for r in q.fn(spark, "/root/testdata/sf0.001").collect()}
    assert a.keys() == b.keys() and all(
        a[k] == b[k] for k in a
    )  # replayable mask
    total = sum(r["n_tokens"] for r in a.values())
    masked = sum(r["n_masked"] for r in a.values())
    assert 0.10 < masked / total < 0.20  # 15% target rate
    assert all(r["n_masked"] <= r["n_tokens"] for r in a.values())


def test_cms_estimates_dominate_exact_counts(spark):
    from simple_data_engineering_project_spark.plans.catalog import catalog

    rows = catalog()["text_cms_topk"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 20
    # CMS error is one-sided: estimate >= exact count, always
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)
    # the top of the report should be genuinely frequent tokens
    assert rows[0]["exact_cnt"] > 1


def test_dq_expectations_rules(spark):
    import datetime

    from simple_data_engineering_project_spark.plans.catalog import catalog

    rows = {
        r["rule"]: r
        for r in catalog()["dq_expectations"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {
        "quantity_in_1_45", "discount_in_0_008", "returnflag_in_ANR",
        "orderkey_not_null", "orderline_unique",
    }
    # testdata has quantities up to 50 and duplicate line keys -> these
    # rules must FAIL with real violation counts
    assert not rows["quantity_in_1_45"]["pass"]
    assert rows["orderline_unique"]["n_violations"] > 0
    # and the always-clean rules must pass
    assert rows["orderkey_not_null"]["pass"]
    assert rows["returnflag_in_ANR"]["pass"]
    n = rows["quantity_in_1_45"]["n_rows"]
    assert all(r["n_rows"] == n for r in rows.values())

def test_parquet_footer_parser_matches_duckdb_on_all_tables():
    import duckdb

    from simple_data_engineering_project_spark.operators.parquet_meta import (
        read_footer_stats,
    )

    for t in (
        "lineitem", "orders", "events", "documents", "embeddings"
    ):  # embeddings has a nested list column
        p = f"/root/testdata/sf0.001/{t}.parquet"
        mine = read_footer_stats(p)
        duck = duckdb.sql(
            "SELECT row_group_id, path_in_schema, num_values, "
            "stats_null_count, total_compressed_size, "
            f"total_uncompressed_size, compression FROM parquet_metadata('{p}') "
            "ORDER BY row_group_id, column_id"
        ).fetchall()
        assert len(mine) == len(duck)
        for m, d in zip(mine, duck):
            assert (
                m["row_group"], m["column"], m["num_values"],
                m["null_count"], m["compressed_bytes"],
                m["uncompressed_bytes"], m["codec"],
            ) == d, (t, m, d)


def test_parquet_footer_rejects_non_parquet():
    import pytest

    from simple_data_engineering_project_spark.operators.parquet_meta import (
        parse_parquet_footer,
    )

    with pytest.raises(ValueError, match="parquet"):
        parse_parquet_footer(b"OggS definitely not a footer")


def test_bloom_prefilter_prunes_and_keeps_all_matches(spark):
    from pyspark.sql import functions as F

    from simple_data_engineering_project_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    dim = (
        read_table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = read_table(spark, sf, "orders")
    n_total = orders.count()
    n_true = orders.join(F.broadcast(dim), orders["o_custkey"] == dim["c_custkey"], "semi").count()
    # rebuild the entry's candidate set: bloom has no false negatives,
    # and at ~300 keys / 16384 bits it must actually prune
    from simple_data_engineering_project_spark.plans.catalog import catalog

    out = catalog()["join_bloom_prefilter"].fn(spark, sf)
    n_result = out.agg(F.sum("n_orders")).collect()[0][0]
    assert n_result == n_true  # no false negatives end-to-end
    assert n_true < n_total  # the filter has something to prune

def test_subtitle_parse_srt_and_vtt_forms(spark):
    from simple_data_engineering_project_spark.operators.subtitles import (
        subs_from_documents,
        subtitle_features,
    )

    df = spark.createDataFrame(
        [(0, "one two three four five six seven"),  # srt, 2 cues
         (1, "a b c d e"),  # vtt, 1 cue
         (2, "!!!")],  # no words -> no row
        "doc_id long, text string",
    )
    subs = {r["media_id"]: r for r in subs_from_documents(df).collect()}
    assert subs[0]["kind"] == "srt" and subs[0]["sub_text"].startswith("1\n00:")
    assert subs[1]["kind"] == "vtt" and subs[1]["sub_text"].startswith("WEBVTT")
    assert "00:00:00,000 --> 00:00:01,500" in subs[0]["sub_text"]
    assert "00:00:00.000 --> 00:00:01.500" in subs[1]["sub_text"]
    assert 2 not in subs

    feats = {
        r["media_id"]: r
        for r in subtitle_features(subs_from_documents(df)).collect()
    }
    import hashlib

    assert (feats[0]["n_cues"], feats[0]["total_cue_ms"]) == (2, 3000)
    assert (feats[1]["n_cues"], feats[1]["total_cue_ms"]) == (1, 1500)
    assert feats[0]["text_sha"] == hashlib.sha256(
        b"one two three four five six seven"
    ).hexdigest()
    assert feats[1]["text_sha"] == hashlib.sha256(b"a b c d e").hexdigest()

def test_pca_power_iteration_aligns_with_numpy(spark):
    import numpy as np

    from simple_data_engineering_project_spark.plans.catalog import catalog
    from simple_data_engineering_project_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    v = {
        r["dim"]: r["v_e4"]
        for r in catalog()["embedding_pca_power"].fn(spark, sf).collect()
    }
    got = np.array([v[i + 1] for i in range(64)], dtype=np.float64)
    got /= np.linalg.norm(got)
    X = np.array(
        [
            r["embedding"]
            for r in read_table(spark, sf, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    _w, vecs = np.linalg.eigh(X.T @ X)
    top = vecs[:, -1]
    # 12 integer-quantized rounds against this near-isotropic synthetic
    # spectrum (lambda2/lambda1 ~ 0.93) must align reasonably with the
    # true top eigenvector (sign-insensitive); exactness is the oracle's
    # job, convergence QUALITY is pinned here
    assert abs(float(got @ top)) > 0.85

def test_ols_trend_exact_rational_slope(spark):
    from simple_data_engineering_project_spark.plans.catalog import catalog

    # closed-form check: y = 3x + 5 exactly -> slope_num/slope_den == 3
    # after the e2 scaling (y2 = 300x + 500)
    df = spark.createDataFrame(
        [
            (1, f"2024-01-01 00:00:{s:02d}", 3.0 * s + 5.0)
            for s in range(0, 50, 7)
        ]
        + [(2, "2024-01-01 00:00:00", 9.9)],  # single event: filtered
        "user_id long, ts_s string, value double",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value",
                 "CAST(0 AS LONG) AS event_id", "'c' AS event_type",
                 "'{}' AS props")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.select("event_id", "ts", "user_id", "event_type", "value",
                  "props").write.parquet(os.path.join(d, "events.parquet"))
        # reuse the catalog fn against the synthetic table layout
        out = {
            r["user_id"]: r
            for r in catalog()["events_ols_trend"].fn(spark, d).collect()
        }
    assert set(out) == {1}
    r = out[1]
    assert r["slope_num"] == 300 * r["slope_den"] // 1  # exact ratio 300
    assert r["slope_num"] % r["slope_den"] == 0
    assert r["slope_num"] // r["slope_den"] == 300

def test_sink_webdataset_actually_shards(spark):
    import glob
    import os

    from simple_data_engineering_project_spark.plans.catalog import (
        SCRATCH,
        catalog,
    )

    out = catalog()["sink_webdataset"].fn(spark, "/root/testdata/sf0.001")
    n = out.count()
    assert n == 500  # every document exported exactly once
    shards = glob.glob(f"{SCRATCH}/sf0.001/wds_sink/shard-*.tar")
    assert len(shards) >= 1
    # shards are real tar files readable by the stdlib
    import tarfile

    with tarfile.open(shards[0]) as tf:
        names = tf.getnames()
    assert any(x.endswith(".txt") for x in names)
    assert any(x.endswith(".cls") for x in names)

def test_markov_stationary_is_a_fixed_point(spark):
    from simple_data_engineering_project_spark.plans.catalog import catalog

    sf = "/root/testdata/sf0.001"
    pi = {
        r["event_type"]: r["pi_e6"]
        for r in catalog()["events_markov_stationary"].fn(spark, sf).collect()
    }
    t = {
        (r["from_type"], r["to_type"]): r["cnt"]
        for r in catalog()["events_transitions"].fn(spark, sf).collect()
    }
    states = sorted(pi)
    rs = {i: sum(c for (a, _), c in t.items() if a == i) for i in states}
    # applying one more (float) transition step must leave the
    # normalized distribution nearly unchanged — converged fixed point
    total = sum(pi.values())
    p = {s: pi[s] / total for s in states}
    nxt = {
        j: sum(p[i] * t.get((i, j), 0) / rs[i] for i in states)
        for j in states
    }
    ntot = sum(nxt.values())
    for s in states:
        assert abs(nxt[s] / ntot - p[s]) < 1e-3, (s, nxt[s] / ntot, p[s])

def test_perplexity_buckets_are_tertiles(spark):
    from simple_data_engineering_project_spark.plans.catalog import catalog

    rows = catalog()["corpus_perplexity_buckets"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = len(rows)
    counts = {}
    for r in rows:
        counts[r["bucket"]] = counts.get(r["bucket"], 0) + 1
    assert set(counts) == {"head", "middle", "tail"}
    # exact integer tertile split: |head| = floor(n/3),
    # |head|+|middle| = floor(2n/3)
    assert counts["head"] == n // 3
    assert counts["head"] + counts["middle"] == (2 * n) // 3

def test_point_in_time_join_no_duplication_or_leakage(spark):
    from pyspark.sql import functions as F

    from simple_data_engineering_project_spark.plans.catalog import catalog
    from simple_data_engineering_project_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    out = catalog()["join_point_in_time"].fn(spark, sf)
    # every event matched EXACTLY one dim version: total matched events
    # equals the fact count (no duplication from overlapping intervals,
    # no drops from gaps)
    n_matched = out.agg(F.sum("n_events")).collect()[0][0]
    n_facts = read_table(spark, sf, "events").count()
    assert n_matched == n_facts
    # the join is keyed, never a cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

def test_decontaminate_embedding_finds_planted_duplicate(spark):
    import numpy as np

    from simple_data_engineering_project_spark.plans.catalog import catalog
    from simple_data_engineering_project_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    out = {
        r["vec_id"]: r
        for r in catalog()["decontaminate_embedding"].fn(spark, sf).collect()
    }
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in read_table(spark, sf, "embeddings").collect()
    }
    # sanity vs a float reference: the reported best test id must be the
    # true cosine argmax for a sample of corpus vectors
    tests = sorted(i for i in emb if i % 10 == 0)
    for vid in sorted(i for i in emb if i % 10 != 0)[:20]:
        v = emb[vid]
        sims = {
            t: float(v @ emb[t] / (np.linalg.norm(v) * np.linalg.norm(emb[t])))
            for t in tests
        }
        best = max(sims, key=lambda t: (sims[t], -t))
        assert out[vid]["best_test_id"] == best, (vid, best)
        assert abs(out[vid]["score_e6"] / 1e6 - sims[best]) < 2e-3

def test_warc_datasource_partitions_per_file(spark, tmp_path):
    from simple_data_engineering_project_spark.operators.datasources import (
        WarcShardDataSource,
    )
    from simple_data_engineering_project_spark.operators.warc import (
        encode_warc,
    )

    for k in range(3):
        (tmp_path / f"s{k}.warc").write_bytes(
            encode_warc(
                [(f"http://h/{k * 10 + i}", b"<p>x</p>") for i in range(2)],
                gzip_members=k % 2 == 0,
                seed=k,
            )
        )
    try:
        spark.dataSource.register(WarcShardDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("warcshards")
        .option("path", str(tmp_path))
        .load()
    )
    # one InputPartition per shard file -> file-per-task fan-out
    assert df.rdd.getNumPartitions() == 3
    rows = sorted(r["uri"] for r in df.collect())
    assert rows == sorted(f"http://h/{k * 10 + i}" for k in range(3) for i in range(2))
    assert all(r["html"] == "<p>x</p>" for r in df.collect())


def test_warc_reader_chunks_batches_by_byte_budget(tmp_path):
    """The DataSource reader flushes bounded Arrow batches instead of
    one batch per shard file, so a multi-GB shard cannot spike executor
    memory. Driven directly (no Spark) with a tiny byte budget."""
    from simple_data_engineering_project_spark.operators.datasources import (
        WarcShardReader,
    )
    from simple_data_engineering_project_spark.operators.warc import (
        encode_warc,
    )

    shard = tmp_path / "s0.warc"
    records = [(f"http://h/{i}", b"<p>" + bytes(200) + b"</p>") for i in range(10)]
    shard.write_bytes(encode_warc(records, gzip_members=False, seed=1))
    reader = WarcShardReader(str(tmp_path))
    reader.BATCH_BYTES = 500  # ~2 records per flush
    parts = reader.partitions()
    assert len(parts) == 1
    batches = list(reader.read(parts[0]))
    assert len(batches) > 1  # chunked, not one batch per file
    uris = [u for b in batches for u in b.column(0).to_pylist()]
    assert uris == [u for u, _ in records]
    assert all(b.num_rows <= 3 for b in batches)


def test_det_ann_small_and_empty_corpus(spark):
    """Round-15 review regression: corpora smaller than n_cells/ksub
    must clamp (not IndexError in the driver-side probe loops), and an
    empty corpus returns an empty frame with the standard schema."""
    from simple_data_engineering_project_spark.operators.similarity import (
        ivf_topk_det,
        pq_topk_det,
    )

    emb = _emb_tables(spark).filter(F.col("vec_id") < 10)  # 10 < 16
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ivf_topk_det(emb, q, k=5, n_cells=16, n_probe=4).collect()
    assert 0 < len(got) <= 5
    got = pq_topk_det(emb, q, k=5, m=4, ksub=16, oversample=5).collect()
    assert len(got) == 5
    assert got[0]["rank"] == 1

    empty = _emb_tables(spark).filter(F.col("vec_id") < 0)
    for fn, kw in (
        (ivf_topk_det, dict(n_cells=16, n_probe=4)),
        (pq_topk_det, dict(m=4, ksub=16)),
    ):
        out = fn(empty, q, k=5, **kw)
        assert out.columns == ["query_id", "item_id", "cosine", "rank"]
        assert out.count() == 0


def test_lsh_det_recall_and_determinism(spark):
    """Round-15 det-LSH twin: recall vs brute force at the unit-test
    plane density, bit-identical buckets across invocations (no RNG
    anywhere), and graceful empty-corpus degenerate (no driver-side
    corpus-dependent loop exists to crash)."""
    from simple_data_engineering_project_spark.operators.similarity import (
        lsh_topk_det,
    )

    emb = _emb_tables(spark)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {r["item_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    got1 = [(r["item_id"], r["rank"]) for r in
            lsh_topk_det(emb, q, dim=16, k=10, bands=12, bits=4)
            .orderBy("rank").collect()]
    recall = len(exact & {i for i, _ in got1}) / 10
    assert recall >= 0.6, f"det-LSH recall too low: {recall}"
    got2 = [(r["item_id"], r["rank"]) for r in
            lsh_topk_det(emb, q, dim=16, k=10, bands=12, bits=4)
            .orderBy("rank").collect()]
    assert got1 == got2

    empty = emb.filter(F.col("vec_id") < 0)
    out = lsh_topk_det(empty, q, dim=16, k=10, bands=12, bits=4)
    assert out.columns == ["query_id", "item_id", "cosine", "rank"]
    assert out.count() == 0


def test_lsh_det_dim_mismatch_fails_loudly(spark):
    """Round-15 review regression: a dim argument that disagrees with
    the embedding length must raise (query side: ValueError before any
    job; corpus side: raise_error in the signature scan) — never
    return a silently empty result."""
    import pytest as _pt

    from simple_data_engineering_project_spark.operators.similarity import (
        lsh_topk_det,
    )

    emb = _emb_tables(spark)  # 16-dim
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with _pt.raises(Exception) as ei:
        lsh_topk_det(emb, q, dim=32, k=5, bands=4, bits=4).collect()
    assert "dim" in str(ei.value)
