"""JDBC warehouse upsert — true relational-twin of the reference's load.

The reference loads PostgreSQL via a three-step set-based protocol
(cocoa_processing_dag.py:213-237): CREATE TEMP TABLE ... WITH NO DATA,
bulk COPY into it, then one INSERT ... ON CONFLICT (key) DO UPDATE
merging staging into the warehouse. This module reproduces that protocol
over any JDBC target Spark can write to:

1. the batch is staged with ``df.write.jdbc`` (Spark's batched,
   set-based writer — the COPY equivalent; ``batchsize`` rows per
   round-trip per partition, all executors writing in parallel);
2. the warehouse table is created from the staging table's shape if
   absent (``CREATE TABLE ... AS SELECT ... WITH NO DATA`` — the
   reference's temp-table trick, aimed at the permanent table);
3. one keyed ``MERGE INTO`` applies last-write-wins (the ON CONFLICT
   equivalent in standard SQL, supported by Derby/PG 15+/Oracle/SQL
   Server); the statement is a single set-based round-trip, never
   row-at-a-time from the driver.

Scale note: the heavy lift (staging) is distributed; the MERGE runs
inside the database engine over the staged batch — exactly the
reference's shape. Batches must be key-unique before merging (MERGE
raises on duplicate matches, unlike ON CONFLICT which applies rows in
order); :func:`jdbc_upsert` enforces that with the same deterministic
winner rule as the pure-Spark upsert.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _connect(spark, url: str):
    """Open a JDBC connection in the driver JVM (DDL/MERGE control plane;
    bulk data moves through df.write.jdbc, not this connection)."""
    jvm = spark.sparkContext._jvm
    # keep derby.log out of the working directory
    jvm.java.lang.System.setProperty("derby.system.home", "/tmp")
    return jvm.java.sql.DriverManager.getConnection(url)


def _table_exists(conn, table: str) -> bool:
    meta = conn.getMetaData()
    rs = meta.getTables(None, None, table.upper(), None)
    try:
        return bool(rs.next())
    finally:
        rs.close()


def _execute(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    tiebreak: Sequence[str] | None = None,
    driver: str = DERBY_DRIVER,
    batchsize: int = 10_000,
    stage_table: str | None = None,
) -> None:
    """Keyed last-write-wins upsert of ``df`` into JDBC table ``table``.

    ``tiebreak`` picks the deterministic within-batch winner per key
    (greatest tiebreak wins, mirroring operators.upsert); defaults to
    ``keys`` (i.e. the batch is assumed key-unique, duplicates collapse
    arbitrarily-but-deterministically by key order).
    """
    from .upsert import upsert_last_write_wins  # noqa: F401  (semantic twin)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    cols = df.columns
    for k in keys:
        if k not in cols:
            raise ValueError(f"key column {k!r} not in DataFrame columns {cols}")
    tb = list(tiebreak or keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in tb])
    batch = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    stage = stage_table or f"{table}_stage"
    (
        batch.write.format("jdbc")
        .option("url", url)
        .option("dbtable", stage)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode("overwrite")
        .save()
    )

    conn = _connect(spark, url)
    try:
        if not _table_exists(conn, table):
            # the reference's WITH-NO-DATA shape clone (dag.py:214-216),
            # aimed at the permanent warehouse table
            _execute(
                conn,
                f"CREATE TABLE {table} AS SELECT * FROM {stage} WITH NO DATA",
            )
        # Spark's JDBC writer creates the stage with QUOTED (exact-case)
        # column names; every reference here must quote identically or
        # Derby/PG will case-fold to a non-existent column.
        def q(c: str) -> str:
            return '"' + c.replace('"', '""') + '"'

        on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
        nonkeys = [c for c in cols if c not in keys]
        set_clause = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in nonkeys)
        insert_cols = ", ".join(q(c) for c in cols)
        insert_vals = ", ".join(f"s.{q(c)}" for c in cols)
        merge = (
            f"MERGE INTO {table} t USING {stage} s ON {on} "
            + (f"WHEN MATCHED THEN UPDATE SET {set_clause} " if nonkeys else "")
            + f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
        )
        _execute(conn, merge)
        _execute(conn, f"DROP TABLE {stage}")
    finally:
        conn.close()


def read_jdbc_table(spark, url: str, table: str, driver: str = DERBY_DRIVER):
    """Scan a JDBC table back into a DataFrame (partitionable via the
    standard partitionColumn options when the table is large)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .load()
    )
