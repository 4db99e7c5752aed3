"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Compares row count, column-name set, and order-insensitive values
(floats to 1e-9 relative, everything else exact) so a catalog query that
passes here should hash-match in the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sorted_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda t: tuple((x is None, str(x)) for x in t))


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, con, sql: str, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(
            f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
        )
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(
            f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
        )
        return problems

    s_sorted = _sorted_rows(spark_rows, spark_cols)
    d_sorted = _sorted_rows(duck_rows, duck_cols)
    bad = 0
    for i, (s, d) in enumerate(zip(s_sorted, d_sorted)):
        if not _cells_equal(s, d):
            bad += 1
            if bad <= 3:
                problems.append(f"{name}: row {i} spark={s} duck={d}")
    if bad > 3:
        problems.append(f"{name}: … {bad} mismatched rows total")
    return problems
