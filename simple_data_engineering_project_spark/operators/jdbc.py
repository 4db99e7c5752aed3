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
    # unquoted identifiers case-fold differently per engine: Derby
    # stores UPPER, PostgreSQL stores lower — probe all three spellings
    for name in (table, table.upper(), table.lower()):
        rs = meta.getTables(None, None, name, None)
        try:
            if rs.next():
                return True
        finally:
            rs.close()
    return False


def _execute(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def _q(c: str) -> str:
    """Quote an identifier exactly: Spark's JDBC writer creates staging
    columns with QUOTED (exact-case) names, so every reference must
    quote identically or Derby/PG case-fold to a non-existent column."""
    return '"' + c.replace('"', '""') + '"'


def detect_dialect(url: str) -> str:
    """'postgres' for jdbc:postgresql URLs, else 'merge' (standard SQL)."""
    return "postgres" if url.startswith("jdbc:postgresql:") else "merge"


def build_upsert_sql(
    table: str,
    stage: str,
    cols: Sequence[str],
    keys: Sequence[str],
    dialect: str = "merge",
) -> str:
    """The single set-based statement that applies the staged batch.

    dialect='postgres' emits the reference's exact construct
    (dag.py:223-237): ``INSERT … SELECT … FROM stage ON CONFLICT (keys)
    DO UPDATE SET col = EXCLUDED.col`` — PG-native last-write-wins that
    works on every PG version (MERGE needs 15+) and tolerates the
    warehouse key being enforced by any unique index. dialect='merge'
    emits standard ``MERGE INTO`` (Derby/Oracle/SQL Server/PG 15+).
    Pure string builder — unit-testable without a database."""
    nonkeys = [c for c in cols if c not in keys]
    if dialect == "postgres":
        insert_cols = ", ".join(_q(c) for c in cols)
        conflict = ", ".join(_q(k) for k in keys)
        set_clause = ", ".join(f"{_q(c)} = EXCLUDED.{_q(c)}" for c in nonkeys)
        return (
            f"INSERT INTO {table} ({insert_cols}) "
            f"SELECT {insert_cols} FROM {stage} "
            f"ON CONFLICT ({conflict}) "
            + (f"DO UPDATE SET {set_clause}" if nonkeys else "DO NOTHING")
        )
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in keys)
    set_clause = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in nonkeys)
    insert_cols = ", ".join(_q(c) for c in cols)
    insert_vals = ", ".join(f"s.{_q(c)}" for c in cols)
    return (
        f"MERGE INTO {table} t USING {stage} s ON {on} "
        + (f"WHEN MATCHED THEN UPDATE SET {set_clause} " if nonkeys else "")
        + f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )


def build_create_sql(
    table: str, stage: str, keys: Sequence[str], dialect: str = "merge"
) -> list[str]:
    """DDL for a missing warehouse table: shape-clone the staged batch
    (the reference's WITH-NO-DATA trick, dag.py:214-216, aimed at the
    permanent table). The postgres dialect additionally installs the
    PRIMARY KEY — ON CONFLICT arbitration requires a unique index,
    exactly as the reference's DDL declares (dag.py:157-170)."""
    ddl = [f"CREATE TABLE {table} AS SELECT * FROM {stage} WITH NO DATA"]
    if dialect == "postgres":
        pk = ", ".join(_q(k) for k in keys)
        ddl.append(f"ALTER TABLE {table} ADD PRIMARY KEY ({pk})")
    return ddl


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    tiebreak: Sequence[str] | None = None,
    driver: str = DERBY_DRIVER,
    batchsize: int = 10_000,
    stage_table: str | None = None,
    dialect: str | None = None,
) -> None:
    """Keyed last-write-wins upsert of ``df`` into JDBC table ``table``.

    ``tiebreak`` picks the deterministic within-batch winner per key
    (greatest tiebreak wins, mirroring operators.upsert); defaults to
    ``keys`` (i.e. the batch is assumed key-unique, duplicates collapse
    arbitrarily-but-deterministically by key order). ``dialect`` picks
    the apply statement (:func:`build_upsert_sql`); None autodetects
    from the URL — jdbc:postgresql gets the reference's native ON
    CONFLICT protocol, everything else standard MERGE.
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

    d = dialect or detect_dialect(url)
    conn = _connect(spark, url)
    try:
        if not _table_exists(conn, table):
            for ddl in build_create_sql(table, stage, keys, d):
                _execute(conn, ddl)
        _execute(conn, build_upsert_sql(table, stage, cols, keys, d))
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
