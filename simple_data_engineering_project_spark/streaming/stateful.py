"""Custom stateful streaming operators (SURVEY §2 C6 — beyond built-in
windows).

``applyInPandasWithState`` is the sanctioned shape for operator semantics
Spark's windowed aggregations can't express: user-defined state schema,
explicit timeouts, arbitrary per-group transition logic — still sharded
by group key across executors, with state in the checkpointed state
store. Data arrives in Arrow batches (pandas), never row-at-a-time.

The operator here — per-user running totals with idle-timeout flush — is
the training-pipeline canonical example: per-entity accumulators that
must survive across triggers and emit on inactivity.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, sum_value double, closed boolean"
_STATE_SCHEMA = "n bigint, s double"


def _running_totals_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        n, s = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "closed": [True]}
        )
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    state.setTimeoutDuration(60_000)  # flush groups idle for >1 processing minute
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "closed": [False]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value) with idle-timeout flush.

    State is one (n, s) pair per user — O(distinct users) across the
    cluster, sharded by the group key; each trigger touches only users
    present in the micro-batch plus timed-out ones. ``closed=True`` rows
    mark timeout flushes (state dropped), the streaming analogue of the
    reference's end-of-batch upsert commit.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        RUNNING_TOTALS_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
