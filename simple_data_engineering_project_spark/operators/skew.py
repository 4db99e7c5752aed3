"""Skew mitigation: salted aggregation and salted replicated join.

AQE (`spark.sql.adaptive.skewJoin`) splits skewed *shuffle blocks* at
runtime and is the first line of defense. These operators cover the cases
AQE can't fix:

- a single group key so hot that even one shuffle block for it is too
  large (salted two-phase aggregation — the classic map-side spread);
- a join where one key accounts for a large fraction of the big side and
  the matching small side is broadcastable per-salt but not overall
  (salted replication).

Both are pure plan rewrites — results are provably identical to the
unsalted form; the salt only routes rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# (partial expr builder, merge expr builder) per supported aggregate —
# each is algebraic: partial per (key, salt), then re-aggregable per key.
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` is (function, column, alias) with function in
    {count, sum, min, max} — the algebraic set that re-aggregates
    exactly. A hot key spreads over ``buckets`` partial groups, so no
    single reducer sees the whole key; the second phase merges
    ``buckets`` rows per key — negligible.

    ``salt_on`` names a column whose hash routes rows (deterministic);
    default is a uniform spread via the row's whole content hash. The
    result is identical to the plain groupBy — only routing changes.
    """
    for fn, _, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"unsupported aggregate for salting: {fn}")
    salt_src = F.xxhash64(salt_on) if salt_on else F.xxhash64(*df.columns)
    salted = df.withColumn(_SALT, F.pmod(salt_src, F.lit(buckets)))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[
            _ALGEBRAIC[fn][0](c).alias(f"__p_{alias}")
            for fn, c, alias in aggs
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](f"__p_{alias}").alias(alias)
            for fn, _, alias in aggs
        ]
    )


def salted_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Each big-side row gets one of ``buckets`` salts (content hash —
    deterministic); each small-side row is exploded into all ``buckets``
    salts. The join key becomes (on…, salt), so a hot key's rows spread
    over ``buckets`` tasks instead of one. Small-side cost: ×buckets
    rows — use only when |small| × buckets is still shuffle-cheap.
    Output is identical to ``big.join(small, on, how)``.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # replication would duplicate unmatched small-side rows
        raise ValueError(f"salted join preserves semantics only for big-side-"
                         f"preserving joins, not {how!r}")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*big.columns), F.lit(buckets))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    return salted_big.join(replicated, [*on, _SALT], how).drop(_SALT)
