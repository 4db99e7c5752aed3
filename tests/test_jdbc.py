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


# ------------------------------------------------- PostgreSQL dialect

def test_postgres_dialect_sql_is_reference_protocol():
    # The reference loads PG with INSERT … ON CONFLICT (key) DO UPDATE
    # (cocoa_processing_dag.py:223-237); the builder must emit exactly
    # that construct, EXCLUDED-referenced and fully quoted, so the text
    # is verifiable without a PG server.
    from simple_data_engineering_project_spark.operators.jdbc import (
        build_create_sql,
        build_upsert_sql,
        detect_dialect,
    )

    sql = build_upsert_sql(
        "wh", "wh_stage", ["k", "v", "ver"], ["k"], dialect="postgres"
    )
    assert sql == (
        'INSERT INTO wh ("k", "v", "ver") SELECT "k", "v", "ver" FROM wh_stage '
        'ON CONFLICT ("k") DO UPDATE SET "v" = EXCLUDED."v", "ver" = EXCLUDED."ver"'
    )
    # all-key tables degrade to DO NOTHING (no non-key columns to update)
    assert build_upsert_sql("wh", "s", ["k"], ["k"], "postgres").endswith(
        "DO NOTHING"
    )
    # ON CONFLICT arbitration needs the unique index the reference's DDL
    # declares — the create path must install the PRIMARY KEY
    ddl = build_create_sql("wh", "wh_stage", ["k"], dialect="postgres")
    assert ddl[1] == 'ALTER TABLE wh ADD PRIMARY KEY ("k")'
    assert detect_dialect("jdbc:postgresql://h:5432/db") == "postgres"
    assert detect_dialect("jdbc:derby:memory:x;create=true") == "merge"


def test_merge_dialect_sql_unchanged():
    from simple_data_engineering_project_spark.operators.jdbc import (
        build_upsert_sql,
    )

    sql = build_upsert_sql("wh", "s", ["k", "v"], ["k"], dialect="merge")
    assert sql == (
        'MERGE INTO wh t USING s s ON t."k" = s."k" '
        'WHEN MATCHED THEN UPDATE SET t."v" = s."v" '
        'WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")'
    )


def test_postgres_dialect_end_to_end_if_available(spark):
    # Gated integration: set SDEP_PG_URL (jdbc:postgresql://…, with the
    # PG JDBC driver on the Spark classpath) to run the full protocol
    # against a real PostgreSQL THROUGH SPARK's JDBC writer — the Java
    # driver jar is absent in this container (no network), so the test
    # self-skips rather than silently not existing. The dialect half
    # (the exact ON CONFLICT statement sequence on a real PG 15) DOES
    # run here: test_pg_dialect_live.py provisions an ephemeral
    # PostgreSQL and drives it over the wire protocol directly.
    import os

    url = os.environ.get("SDEP_PG_URL")
    if not url:
        pytest.skip("SDEP_PG_URL not set; PostgreSQL unavailable here")
    from simple_data_engineering_project_spark.operators.jdbc import (
        read_jdbc_table,
    )

    drv = "org.postgresql.Driver"
    b1 = _batch(spark, [(1, "a", 1), (2, "b", 1)])
    b2 = _batch(spark, [(2, "B", 2), (3, "c", 1)])
    jdbc_upsert(b1, url, "pgwh", keys=["k"], tiebreak=["ver"], driver=drv)
    jdbc_upsert(b2, url, "pgwh", keys=["k"], tiebreak=["ver"], driver=drv)
    got = {
        r["k"]: (r["v"], r["ver"])
        for r in read_jdbc_table(spark, url, "pgwh", driver=drv).collect()
    }
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}
