"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in ``simple_data_engineering_project_spark.plans``;
this module is the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simple_data_engineering_project_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by region over the 5-table dim chain — the testdata
    transposition of the reference's documented dashboard query
    (README.md:150: SELECT region, SUM(shipment_value_usd) ... GROUP BY
    region).
    """
    return plans.queries()["agg_value_by_region"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checked query."""
    return plans.oracle_sql()
