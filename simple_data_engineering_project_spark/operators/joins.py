"""Join strategies (SURVEY §2 C7): broadcast, semi/anti, range, as-of.

Each helper declares intent; Catalyst/AQE pick the physical join. The
helpers exist so call sites state *why* a strategy is right at scale:

- ``broadcast`` dims: region/nation are tiny at any SF — replicating them
  removes the shuffle on the fact side entirely.
- semi/anti: Spark plans these without materializing the right side's
  payload columns (existence-only join).
- range join: Spark has no native interval-join operator; for a small
  bucket dim a broadcast-nested-loop over the range predicate is optimal
  (fact side never shuffles). For two large ranged sides, pre-bucket both
  by coarsened range and equi-join on bucket before the fine predicate.
- as-of join: Spark has no ASOF JOIN; implemented as union + window
  (last non-null carry-forward), which costs exactly ONE shuffle on
  (key, ts) — the minimum possible — instead of a per-row lookup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_broadcast(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Equi-join with an explicit broadcast hint on the dimension side."""
    return fact.join(F.broadcast(dim), on, how)


def join_semi(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with ≥1 match in ``right`` (EXISTS)."""
    return left.join(right, on, "left_semi")


def join_anti(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on, "left_anti")


def join_range(
    fact: DataFrame,
    buckets: DataFrame,
    value: Column,
    lo: Column,
    hi: Column,
    how: str = "inner",
) -> DataFrame:
    """Interval join: fact rows against [lo, hi) bucket ranges.

    Broadcast the bucket side: the physical plan is BroadcastNestedLoopJoin
    with the range predicate evaluated fact-side — zero shuffle of the fact
    table. Correct strategy whenever the ranged side fits in memory (bucket
    dims, calendars, SLA bands). Two large sides instead want coarse-bucket
    equi pre-join; see ``join_range_banded``.
    """
    return fact.join(F.broadcast(buckets), (value >= lo) & (value < hi), how)


def join_range_banded(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    band_width: float,
    extra_on: Sequence[str] = (),
) -> DataFrame:
    """Large×large range join via banding (the scale path).

    Assign each left row the band ``floor(value / band_width)``; explode
    each right interval to every band it overlaps; equi-join on band (plus
    any ``extra_on`` keys), then apply the exact range predicate. Turns a
    nested-loop into a shuffled hash join keyed by band — the standard
    trick when neither side broadcasts. ``band_width`` should approximate
    the typical interval width so each interval lands in O(1) bands.
    """
    lband = left.withColumn(
        "__band", F.floor(F.col(left_value) / F.lit(band_width)).cast("long")
    )
    rband = right.withColumn(
        "__bands",
        F.sequence(
            F.floor(F.col(right_lo) / F.lit(band_width)).cast("long"),
            F.floor(
                (F.col(right_hi) - F.lit(1e-9)) / F.lit(band_width)
            ).cast("long"),
        ),
    ).withColumn("__band", F.explode("__bands")).drop("__bands")
    on = [lband["__band"] == rband["__band"]] + [
        lband[c] == rband[c] for c in extra_on
    ]
    cond = (F.col(left_value) >= F.col(right_lo)) & (
        F.col(left_value) < F.col(right_hi)
    )
    joined = lband.join(rband, on, "inner").filter(cond)
    drop_cols = [lband["__band"], rband["__band"]] + [rband[c] for c in extra_on]
    for c in drop_cols:
        joined = joined.drop(c)
    return joined


def join_asof(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` and the same key.

    Union-and-carry-forward: tag sides, sort within key by (ts, side), and
    ``last(value, ignorenulls=True)`` over an unbounded-preceding window
    carries each right value forward to the left rows it governs. One
    shuffle on the key — same cost as a single window over either input —
    versus the quadratic correlated-subquery formulation. Ties at equal ts
    resolve right-before-left (side=0 sorts first), then by ``tiebreak``
    descending (later wins), matching last-write-wins semantics.
    """
    lcols = left.columns
    right_sel = right.select(
        F.col(key).alias(key),
        F.col(right_ts).alias("__ts"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
    )
    left_sel = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_values
        ],
        *[F.col(c) for c in lcols if c != key],
    )
    unioned = right_sel.unionByName(left_sel)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_values
        ],
    )
    result = carried.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_values],
    )
    return result


def fuzzy_join_blocked(
    names: DataFrame,
    name_col: str = "name",
    max_dist: int = 4,
) -> DataFrame:
    """Blocked fuzzy self-match over an entity dictionary (record linkage).

    The entity-resolution join: candidate pairs come from a cheap
    BLOCKING key (here the first token — in production a phonetic code
    or sorted-token signature) plus a length band, and only candidates
    pay the O(len²) ``levenshtein`` verify. Emits each matched unordered
    pair once (``name_a < name_b``) with its edit distance.

    Scale shape: the classic all-pairs O(n²) fuzzy join is collapsed
    twice before any expensive work — (1) ``distinct`` first, because
    fuzzy matching operates on the entity DICTIONARY, not the fact
    table (dictionary cardinality is ~constant as facts grow: dedup the
    64 part names, not 2000/20000/… rows); (2) the equi-join on the
    block key means the shuffle pairs only within-block candidates.
    The length band then prunes verifies levenshtein can never pass
    (|len_a − len_b| > max_dist ⇒ distance > max_dist).
    """
    d = names.select(F.col(name_col).alias("name")).distinct()
    d = d.select(
        "name",
        F.split(F.col("name"), " ").getItem(0).alias("__block"),
        F.length("name").alias("__len"),
    )
    a = d.select(
        F.col("name").alias("name_a"),
        F.col("__block"),
        F.col("__len").alias("__len_a"),
    )
    b = d.select(
        F.col("name").alias("name_b"),
        F.col("__block"),
        F.col("__len").alias("__len_b"),
    )
    return (
        a.join(b, "__block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(
            F.abs(F.col("__len_a") - F.col("__len_b")) <= F.lit(max_dist)
        )
        .withColumn(
            "edit_dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("edit_dist") <= F.lit(max_dist))
        .select("name_a", "name_b", F.col("edit_dist").cast("int").alias("edit_dist"))
    )
