"""Full oracle sweep at sf0.01 — the driver's actual scale.

The default suite oracles at sf0.001; the driver checks at sf0.01, and
layout- or distribution-sensitive bugs (r3's events INT64-nanos class)
only surface there. This module reruns every oracle-backed catalog query
against /root/testdata/sf0.01.

Gated behind SPARK_GRAFT_SF001=1 (adds ~4 min) so the quick default
suite stays quick:

    SPARK_GRAFT_SF001=1 python -m pytest tests/test_queries_vs_duckdb_sf001.py -q

Run it before every round hand-off.
"""

from __future__ import annotations

import os

import pytest

from simple_data_engineering_project_spark.plans import catalog

from .oracle_compare import compare, duck_connection

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF001", "") != "1",
    reason="set SPARK_GRAFT_SF001=1 to run the sf0.01 oracle sweep",
)

CATALOG = catalog()
ORACLE_NAMES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck_sf001(sf_oracle):
    con = duck_connection(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle_at_sf001(spark, sf_oracle, duck_sf001, name):
    q = CATALOG[name]
    df = q.fn(spark, sf_oracle)
    problems = compare(df, duck_sf001, q.oracle, name)
    assert not problems, "\n".join(problems)
