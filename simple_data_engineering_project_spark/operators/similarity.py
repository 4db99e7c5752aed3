"""Similarity search over embedding columns (SURVEY §2 C3).

Two strategies, one API:

- **Brute-force cosine top-k** — the exactness baseline. Dot products are
  pure codegen expressions (``zip_with``/``aggregate``); the query vector
  set is broadcast; top-k per query via window. Scan-dominated: at 100 TB
  this is one pass over the corpus with no shuffle except the final
  per-query k-row reduction.
- **LSH-bucketed (random hyperplane / signed random projection)** — the
  scale path. Each vector hashes to a signature of sign bits over seeded
  pseudo-random hyperplanes; candidates share a bucket in ≥1 band. Recall
  tunes with (bands × bits); cost drops from |corpus| dot products per
  query to |bucket| collisions.

Hyperplanes are derived deterministically from (seed, band, bit, dim) via
xxhash64 → uniform in [-1, 1): reproducible across engines and runs with
no RNG state, and the projection is again a codegen-only expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    Cross-join with the query side broadcast (queries ≪ corpus always),
    cosine in codegen, then ``row_number`` per query ordered by
    (similarity DESC, corpus_id ASC) — the id tiebreak keeps results
    deterministic under float ties.
    """
    c = corpus.select(
        F.col(corpus_id).alias("item_id"), F.col(corpus_vec).alias("__cv")
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "item_id",
        cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def _hyperplane(seed: int, band: int, bit: int, dim: int):
    """Deterministic pseudo-random hyperplane as an array<double> literal
    expression: component_d = xxhash64(seed, band, bit, d) scaled to [-1, 1)."""
    return F.array(
        *[
            (
                F.pmod(
                    F.xxhash64(F.lit(seed), F.lit(band), F.lit(bit), F.lit(d)),
                    F.lit(1 << 20),
                ).cast("double")
                / F.lit(float(1 << 19))
                - F.lit(1.0)
            )
            for d in range(dim)
        ]
    )


def srp_signature(vec, dim: int, bands: int = 8, bits: int = 8, seed: int = 42):
    """Signed-random-projection signature: array of per-band bucket ids."""
    vd = vec.cast("array<double>")

    def band_bucket(band: int):
        acc = F.lit(0).cast("long")
        for bit in range(bits):
            proj = F.aggregate(
                F.zip_with(vd, _hyperplane(seed, band, bit, dim), lambda x, h: x * h),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            acc = acc * 2 + F.when(proj >= 0, 1).otherwise(0)
        return acc

    return F.array(*[band_bucket(b) for b in range(bands)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bands: int = 8,
    bits: int = 8,
    seed: int = 42,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: SRP-LSH candidate generation + exact re-score.

    Corpus signatures explode to (band, bucket) rows once (cacheable /
    materializable as a bucketed table at scale); queries hash the same
    way and equi-join on (band, bucket). Only colliding candidates get the
    exact cosine. Returns the same schema as ``brute_force_topk`` —
    recall < 1.0 is the documented trade.
    """
    c = corpus.select(
        F.col(corpus_id).alias("item_id"),
        F.col(corpus_vec).alias("__cv"),
        srp_signature(F.col(corpus_vec), dim, bands, bits, seed).alias("__sig"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        srp_signature(F.col(query_vec), dim, bands, bits, seed).alias("__qsig"),
    )
    c_b = c.select(
        "item_id",
        "__cv",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col("__sig")[b].alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("item_id", "__cv", "bb.band", "bb.bucket")
    q_b = q.select(
        "query_id",
        "__qv",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col("__qsig")[b].alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("query_id", "__qv", "bb.band", "bb.bucket")
    cand = (
        c_b.join(F.broadcast(q_b), ["band", "bucket"])
        .select("query_id", "item_id", "__cv", "__qv")
        .dropDuplicates(["query_id", "item_id"])
    )
    scored = cand.select(
        "query_id",
        "item_id",
        cosine_similarity(F.col("__cv"), F.col("__qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )
