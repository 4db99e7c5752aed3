"""JDBC upsert writer vs the pure-Spark upsert (reference A12/A13 parity).

Uses embedded Derby (ships with Spark) as the warehouse — the same
stage-then-MERGE protocol works against PostgreSQL/Oracle/SQL Server by
swapping url+driver. The semantic oracle is operators.upsert
.upsert_last_write_wins: after any sequence of batches, the JDBC table
must equal the pure-Spark warehouse.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_data_engineering_project_spark.operators.jdbc import (
    jdbc_upsert,
    read_jdbc_table,
)
from simple_data_engineering_project_spark.operators.upsert import (
    upsert_last_write_wins,
)


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/wh;create=true"


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING, ver INT")


def _snapshot(spark, url):
    return {
        (r["k"]): (r["v"], r["ver"])
        for r in read_jdbc_table(spark, url, "shipments").collect()
    }


def test_first_batch_creates_and_loads(spark, derby_url):
    b1 = _batch(spark, [(1, "a", 1), (2, "b", 1)])
    jdbc_upsert(b1, derby_url, "shipments", keys=["k"], tiebreak=["ver"])
    assert _snapshot(spark, derby_url) == {1: ("a", 1), 2: ("b", 1)}


def test_second_batch_upserts_last_write_wins(spark, derby_url):
    b1 = _batch(spark, [(1, "a", 1), (2, "b", 1)])
    b2 = _batch(spark, [(2, "B", 2), (3, "c", 1)])
    jdbc_upsert(b1, derby_url, "shipments", keys=["k"], tiebreak=["ver"])
    jdbc_upsert(b2, derby_url, "shipments", keys=["k"], tiebreak=["ver"])
    assert _snapshot(spark, derby_url) == {
        1: ("a", 1),
        2: ("B", 2),  # overwritten, the ON CONFLICT DO UPDATE twin
        3: ("c", 1),
    }


def test_replay_is_idempotent(spark, derby_url):
    # the reference's guarantee (README.md:31): re-running a batch is a no-op
    b1 = _batch(spark, [(1, "a", 1), (2, "b", 1)])
    jdbc_upsert(b1, derby_url, "shipments", keys=["k"], tiebreak=["ver"])
    before = _snapshot(spark, derby_url)
    jdbc_upsert(b1, derby_url, "shipments", keys=["k"], tiebreak=["ver"])
    assert _snapshot(spark, derby_url) == before


def test_within_batch_duplicates_pick_deterministic_winner(spark, derby_url):
    dup = _batch(spark, [(1, "old", 1), (1, "new", 2)])
    jdbc_upsert(dup, derby_url, "shipments", keys=["k"], tiebreak=["ver"])
    assert _snapshot(spark, derby_url) == {1: ("new", 2)}


def test_matches_pure_spark_upsert(spark, derby_url):
    b1 = _batch(spark, [(i, f"v{i}", 1) for i in range(50)])
    b2 = _batch(spark, [(i, f"w{i}", 2) for i in range(25, 75)])
    jdbc_upsert(b1, derby_url, "shipments", keys=["k"], tiebreak=["ver"])
    jdbc_upsert(b2, derby_url, "shipments", keys=["k"], tiebreak=["ver"])
    pure = upsert_last_write_wins(b1, b2, keys=["k"])
    expected = {r["k"]: (r["v"], r["ver"]) for r in pure.collect()}
    assert _snapshot(spark, derby_url) == expected


def test_missing_key_column_raises(spark, derby_url):
    b = _batch(spark, [(1, "a", 1)])
    with pytest.raises(ValueError):
        jdbc_upsert(b, derby_url, "shipments", keys=["nope"])
