"""Incremental maintenance operators: CDC apply + algebraic state merge.

The reference's warehouse is maintained by row-level upsert
(dag.py:223-237 ``ON CONFLICT … DO UPDATE``); these operators are the two
generalizations a 100 TB lakehouse actually runs:

- :func:`cdc_apply` — collapse a change-data-capture log (ordered
  I/U/D operations per key) onto latest-state, Delta-``MERGE``
  semantics without a table format: the upsert extended with deletes.
- :func:`merge_agg_state` — maintain an aggregate materialization from
  partial states instead of recomputing over all history: aggregates
  that form a commutative monoid (count/sum/max) merge associatively,
  so a nightly 100 TB recompute becomes "merge yesterday's state with
  today's delta" touching only the delta's bytes.

Both are pure DataFrame plans: one keyed shuffle each, map-side partial
aggregation, no UDFs, no driver data paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(
    changelog: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest surviving row per key from an ordered changelog.

    For each key the operation with the highest ``seq_cols`` wins; if
    that operation is a delete the key vanishes from the output,
    otherwise its payload is the current state. ``seq_cols`` must be a
    total order within a key (ties would make the winner
    engine-dependent) — callers append a unique id as tiebreak.

    Scale shape: ONE shuffle on the key (the window partition), no
    join back — the count-of-changes column rides the same partitioning
    as a second window function over it. At 100 TB the changelog is the
    small daily slice; the result is then merged into the base table by
    the partition-scoped writer (pipeline.py), never a full rewrite.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_changes", F.count("*").over(Window.partitionBy(*key_cols)))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("__rn")
    )


def merge_agg_state(base: DataFrame, delta: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge two partial aggregate states into the combined state.

    Both inputs carry the monoid state columns ``cnt`` (count),
    ``sum_cents`` (integer-exact sum) and ``max_ts`` (max); the merge is
    itself an aggregation with the same combine functions, so
    state-of(base ∪ delta) == state-of(full recompute) exactly — the
    oracle checks that equality. Sums are kept in integer cents so the
    merge is bit-exact under any partitioning (double sums would drift
    with summation order).

    Scale shape: map-side partial aggregation collapses each side before
    the single keyed shuffle; the base state is one row per key (already
    tiny next to the raw fact table), so incremental maintenance reads
    |delta| + |state| bytes instead of |history|.
    """
    return (
        base.unionByName(delta)
        .groupBy(*key_cols)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_cents").alias("sum_cents"),
            F.max("max_ts").alias("max_ts"),
        )
    )


def agg_state(events: DataFrame, key_cols: list[str], value_col: str, ts_col: str) -> DataFrame:
    """Per-key monoid state (cnt, sum_cents, max_ts) of one event slice."""
    return events.groupBy(*key_cols).agg(
        F.count("*").alias("cnt"),
        F.sum(
            F.floor(F.col(value_col) * F.lit(100) + F.lit(0.5)).cast("long")
        ).alias("sum_cents"),
        F.max(ts_col).alias("max_ts"),
    )
