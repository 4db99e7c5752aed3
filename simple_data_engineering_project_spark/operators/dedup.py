"""Deduplication operators — exact and near-duplicate (SURVEY §2 C1/C2).

Exact dedup is a deterministic winner per key (never ``dropDuplicates``,
whose surviving row is partition-order-dependent and would break replay
idempotence — the same trap as the reference's arrival-order upsert).

Near-dup detection implements the standard text-dedup ladder entirely with
JVM-side expressions (no Python in the hot path):

- **MinHash + LSH**: k-shingles → per-shingle universal hashes → per-row
  minhash signature → banding → bucket join → candidate pairs → exact
  Jaccard verify. The shuffle is on (band, bucket-hash) — tiny keys — and
  candidate verification touches only colliding pairs, which is what makes
  this viable at 100 TB (vs. O(n²) all-pairs).
- **SimHash**: weighted bit-vote over token hashes → 64-bit fingerprint;
  near-dups = small Hamming distance, found by joining on rotated bit
  blocks (pigeonhole: d ≤ 3 ⇒ some 16-bit block equal).
- **N-gram Jaccard**: the exact verifier, also exposed standalone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import normalized_text

# Mersenne prime 2^31-1: universal-hash modulus. With a, h, b all < 2^31,
# a*h + b < 2^62 + 2^31 — no ANSI long overflow (Spark 4 raises on
# overflow instead of wrapping).
_P = (1 << 31) - 1


def dedup_exact(df: DataFrame, keys: list[str], tiebreak: list[str]) -> DataFrame:
    """Keep exactly one row per ``keys``: the smallest ``tiebreak``.

    One shuffle on the dedup key; map-side partial aggregation does not
    apply to row selection, but AQE coalescing keeps post-shuffle
    partitions right-sized.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in tiebreak])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(col, k: int = 5):
    """Word k-shingles of normalized text (array<string>, distinct)."""
    toks = F.split(normalized_text(col) if isinstance(col, str) else col, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " ")
        )
    )


def _shingle_hash(sh):
    """Stable positive hash of a shingle, < 2^31 (xxhash64 folded)."""
    return F.pmod(F.xxhash64(sh), F.lit(_P)).cast("long")


def minhash_signature(shingle_col, num_hashes: int = 64, seed: int = 42):
    """MinHash signature: min over shingles of (a_i * h + b_i) mod P.

    The (a_i, b_i) families are derived from xxhash64 of (seed, i) so the
    signature is deterministic across runs and engines — no Python RNG.
    Entirely expression-level: transform + aggregate run inside codegen.
    """
    hashes = F.transform(shingle_col, _shingle_hash)

    def one_minhash(i: int):
        a = F.pmod(F.xxhash64(F.lit(seed), F.lit(2 * i)), F.lit(_P - 1)) + F.lit(1)
        b = F.pmod(F.xxhash64(F.lit(seed), F.lit(2 * i + 1)), F.lit(_P))
        return F.array_min(
            F.transform(hashes, lambda h: F.pmod(a * h + b, F.lit(_P)))
        )

    return F.array(*[one_minhash(i) for i in range(num_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows_per_band = num_hashes / bands; a pair collides if any band's
    signature slice matches exactly. Returns (id_a, id_b, jaccard_est)
    with id_a < id_b, deduplicated across bands. Shuffles: one groupBy on
    (band, slice-hash) to form buckets, one self-join within buckets —
    both keyed on small hashes; bucket skew (a boilerplate shingle shared
    by millions of docs) is the known failure mode, mitigated by capping
    bucket size before pairing.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(text_col, k), num_hashes, seed).alias("sig"),
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(num_hashes)
    return pairs.select("id_a", "id_b", est.cast("double").alias("jaccard_est"))


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate (id_a, id_b) pairs.

    Joins shingle sets onto candidates only — never all-pairs — so cost is
    proportional to LSH collisions, not n². Broadcast is left to AQE since
    the shingle side is large.
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, k).alias("sh")
    )
    out = (
        candidates.join(sh.withColumnRenamed("sh", "sh_a"), F.col("id_a") == F.col("id"))
        .drop("id")
        .join(sh.withColumnRenamed("sh", "sh_b"), F.col("id_b") == F.col("id"))
        .drop("id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash(text_col, bits: int = 64):
    """64-bit SimHash of the normalized token multiset.

    Per token: xxhash64 → each bit votes ±1; fingerprint bit = sign of the
    vote sum. Expression-only (transform/aggregate over the token array,
    then a bit-assembly fold); near-dups have small Hamming distance.
    """
    toks = F.split(
        normalized_text(text_col) if isinstance(text_col, str) else text_col, " "
    )
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        for i in range(bits)
    ]
    fp = F.lit(0).cast("long")
    for i, vote in enumerate(bit_votes):
        # shiftleft instead of a lit(1 << i): 1 << 63 overflows a JVM long
        # literal, but shifting into the sign bit is well-defined.
        fp = fp.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


def hamming64(a, b):
    """Hamming distance between two 64-bit fingerprints (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash with blocked search.

    Pigeonhole: distance ≤ 3 over 64 bits ⇒ at least one of 4 16-bit
    blocks is identical. Join on (block-index, block-value) — an equi-join
    a thousand-executor cluster shuffles cheaply — then verify Hamming.
    """
    fp = df.select(F.col(id_col).alias("id"), simhash(text_col).alias("fp"))
    blocked = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("fp", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("id", "fp", "bv.blk", "bv.val")
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
