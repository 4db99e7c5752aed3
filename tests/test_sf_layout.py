"""Physical-layout parity across scale factors.

The r3 regression class: a table whose parquet physical type differs
between sf dirs (events ``ts`` shipped as INT64 TIMESTAMP(NANOS) at
sf>=0.01 but TIMESTAMP(MICROS) at sf0.001) passes every sf0.001 test and
explodes only under the driver's sf0.01 run. These tests kill that class
locally at metadata cost: ``read_table`` must present an identical
logical schema for every table at every available scale factor, and the
events timestamp contract must hold under a hostile (non-UTC) session
timezone.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from simple_data_engineering_project_spark.sources import read_table

from .conftest import TESTDATA
from .oracle_compare import TABLES

SF_DIRS = [
    f"{TESTDATA}/{d}"
    for d in ("sf0.001", "sf0.01", "sf0.1")
    if os.path.isdir(f"{TESTDATA}/{d}")
]


@pytest.mark.parametrize("table", TABLES)
def test_read_table_schema_parity_across_sfs(spark, table):
    assert len(SF_DIRS) >= 2, f"need >=2 sf dirs under {TESTDATA}"
    schemas = {}
    for sf_dir in SF_DIRS:
        df = read_table(spark, sf_dir, table)
        # force reader init on one row so physical-decode errors surface
        df.limit(1).collect()
        schemas[sf_dir] = [(f.name, f.dataType.simpleString()) for f in df.schema]
    first = schemas[SF_DIRS[0]]
    for sf_dir, schema in schemas.items():
        assert schema == first, f"{table}: {sf_dir} diverges from {SF_DIRS[0]}"


def test_events_ts_is_timestamp_everywhere(spark):
    for sf_dir in SF_DIRS:
        df = read_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", sf_dir


def test_events_ts_instant_is_session_tz_independent(spark):
    # ADVICE r4: the NTZ->instant conversion must not depend on
    # spark.sql.session.timeZone (a caller bypassing session.get_spark
    # with a non-UTC session must read the same instants).
    sf_dir = SF_DIRS[0]
    tz_key = "spark.sql.session.timeZone"
    original = spark.conf.get(tz_key)
    utc_micros = (
        read_table(spark, sf_dir, "events")
        .select(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts")))
        .collect()[0]
    )
    try:
        spark.conf.set(tz_key, "America/New_York")
        hostile_micros = (
            read_table(spark, sf_dir, "events")
            .select(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts")))
            .collect()[0]
        )
    finally:
        spark.conf.set(tz_key, original)
    assert tuple(hostile_micros) == tuple(utc_micros)
