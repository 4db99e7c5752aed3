"""Ad-hoc SQL entry point (SURVEY §3 EP3 — Metabase→PostgreSQL parity).

The reference's analytics surface is "any SQL over the warehouse table"
(README.md:146-151, e.g. README.md:150's revenue-by-region). Here that is
``spark.sql`` over registered views — same declarative surface, one
engine, and every query gets Catalyst's pushdown/pruning/AQE for free.

Usage (module CLI)::

    python -m simple_data_engineering_project_spark.sql \
        "SELECT r_name, COUNT(*) FROM region JOIN nation ON \
         n_regionkey = r_regionkey GROUP BY r_name" \
        --data /root/testdata/sf0.01

or programmatically::

    register_views(spark, sf_dir)
    spark.sql("SELECT ...").show()
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TABLE_NAMES
from .sources import read_table


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every test table as a temp view; returns the view names.

    Views are lazy — registration costs one file-footer read per table;
    queries still scan only the columns/row-groups they need.
    """
    registered = []
    for name in TABLE_NAMES:
        if os.path.exists(f"{sf_dir}/{name}.parquet"):
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
    return registered


def sql(spark: SparkSession, query: str, sf_dir: str) -> DataFrame:
    """One-call ad-hoc SQL over the test tables."""
    register_views(spark, sf_dir)
    return spark.sql(query)


def main() -> None:
    from .session import get_spark, tune_for_queries

    p = argparse.ArgumentParser(description="Ad-hoc SQL over the warehouse tables")
    p.add_argument("query", help="SQL text; tables are registered as views")
    p.add_argument(
        "--data",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory of <table>.parquet files",
    )
    p.add_argument("--limit", type=int, default=100, help="max rows to print")
    p.add_argument("--explain", action="store_true", help="print the physical plan too")
    args = p.parse_args()

    spark = tune_for_queries(get_spark(app_name="sdep-spark-sql"))
    df = sql(spark, args.query, args.data)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)


if __name__ == "__main__":
    main()
