"""Keyed last-write-wins upsert (reference A13, the one non-trivial Tier A op).

The reference does ``INSERT … ON CONFLICT (shipment_id) DO UPDATE SET`` over
a temp table (cocoa_processing_dag.py:223-237): new rows win on every
non-key column; within a batch, later files win because files load
sequentially (dag.py:178).

Spark-first design: no transaction log needed — an upsert over immutable
inputs is a *deterministic winner selection*:

    union(new with priority 1, old with priority 0)
      → row_number() OVER (PARTITION BY key ORDER BY priority DESC, tiebreak)
      → keep rn = 1

Scale notes (100 TB): this is one shuffle on the upsert key — the same
shuffle a MERGE would do. Partition count follows AQE; skewed keys are
handled by AQE skew-join/agg splitting. If the base table is bucketed by
the key, Catalyst elides the base-side shuffle entirely. For true
warehouse-table semantics, pair with an atomic partition-overwrite sink
(or Delta MERGE where available); the engine's correctness contract is the
winning-row relation, which this computes exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PRI = "__upsert_priority"
_RN = "__upsert_rn"


def upsert_last_write_wins(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Return ``old`` upserted with ``new`` on ``keys`` (new wins).

    ``tiebreak`` orders duplicate keys *within* each side deterministically
    (the reference's arrival order is nondeterministic across retries; a
    declared tiebreak makes replays byte-identical — SURVEY §7 trap 3).
    """
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"upsert requires identical column sets: {sorted(old.columns)} "
            f"vs {sorted(new.columns)}"
        )
    unioned = new.withColumn(_PRI, F.lit(1)).unionByName(
        old.withColumn(_PRI, F.lit(0))
    )
    order = [F.col(_PRI).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        unioned.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_PRI, _RN)
    )
