"""Every oracle-backed catalog query must match DuckDB at sf0.001.

This is the local mirror of the driver's CORRECTNESS gate; rows-only
queries are smoke-checked for non-failure and stable schema instead.
"""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.plans import catalog

from .oracle_compare import compare, duck_connection

CATALOG = catalog()
ORACLE_NAMES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in CATALOG.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_smoke):
    con = duck_connection(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_smoke, duck, name):
    q = CATALOG[name]
    df = q.fn(spark, sf_smoke)
    problems = compare(df, duck, q.oracle, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_smoke, name):
    q = CATALOG[name]
    df = q.fn(spark, sf_smoke)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"r_name", "revenue", "n_items"}


def test_contract_alignment():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
