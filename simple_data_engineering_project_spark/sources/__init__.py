"""Source / sink operators (reference Tier A: A1, A4, A9, A10, A14).

Spark-first mapping of the reference's io surface:

- landing discovery (``dag.py:66-68`` boto3 listing) → file-source globs;
  Spark lists, splits, and schedules the files itself.
- chunked CSV parse (``dag.py:180-182``, 50k-row chunks) → a schema'd
  ``spark.read.csv``: partitions are the chunking, vectorized and parallel.
- parquet stage write/read (``dag.py:203-211``) → ``write.parquet`` /
  ``read.parquet`` with pushdown and pruning intact.
- archive move (``dag.py:259-266``) → filesystem rename via the JVM Hadoop
  FileSystem API so it works identically for file:// and s3a:// paths.

All paths are plain strings; anything Hadoop understands (local, s3a, hdfs)
works unchanged — at 100 TB these same calls fan out over the cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import TESTDATA_SCHEMAS


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver test table (parquet; pushdown + pruning apply).

    The events ``ts`` column has shipped in two physical layouts across
    testdata generations, so the read is schema-adaptive (the branch costs
    one footer read, which schema resolution does anyway):

    - INT64 TIMESTAMP(NANOS) — the vectorized reader rejects it; with
      ``nanosAsLong`` it surfaces as bigint nanos, truncated to micros via
      ``ts DIV 1000`` (exact integer division — a double cast would lose
      precision above 2^53), matching DuckDB's nanos→micros truncation.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) — surfaces as
      TIMESTAMP_NTZ; converted to an instant by interpreting the stored
      wall clock as UTC. The conversion is session-timezone-independent:
      ``timestampdiff(MICROSECOND, epoch, ts)`` is pure wall-clock
      arithmetic on NTZ operands (a plain ``cast`` would shift every
      event for a caller running a non-UTC session timezone).

    Either way callers see one stable contract: ``ts`` is TimestampType
    (LTZ) at micro precision.

    ``nanosAsLong`` is set session-level and deliberately NOT restored:
    the returned plan is lazy, and the physical scan re-reads the conf at
    action time — a save/restore here would break execution of the very
    DataFrame being returned. The setting is inert for micros files and
    for every other table; session setup (``session.get_spark`` /
    ``tune_for_queries``) sets the same value explicitly so the behavior
    is declared, not a read_table side effect.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type in ("bigint", "long"):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if ts_type == "timestamp_ntz":
            return df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND,"
                        " TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
                    )
                ),
            )
        return df
    return spark.read.parquet(path)


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Hadoop-FS existence probe — works for file://, s3a://, hdfs://."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return bool(p.getFileSystem(conf).exists(p))


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive Hadoop-FS delete (no-op if absent) — portable, unlike
    shutil.rmtree which only understands local paths."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        return bool(fs.delete(p, True))
    return False


def swap_directory(spark: SparkSession, tmp: str, path: str) -> None:
    """Publish ``tmp`` as ``path`` without a window where ``path`` is gone.

    Rename the old directory aside first (path → path__old), move the new
    one in, then drop the old: a crash at any point leaves either the old
    or the new dataset at ``path`` (plus at worst a stale __old to sweep),
    never a missing dataset — unlike delete-then-rename, whose crash
    window loses the path entirely.
    """
    old = f"{path}__old"
    fs_delete(spark, old)
    if fs_exists(spark, path):
        if not archive_move(spark, path, old):
            raise IOError(f"swap_directory: could not move {path} aside")
    if not archive_move(spark, tmp, path):
        # roll the old data back into place before failing
        if fs_exists(spark, old):
            archive_move(spark, old, path)
        raise IOError(f"swap_directory: could not publish {tmp} -> {path}")
    fs_delete(spark, old)


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV scan with an explicit schema (replaces dag.py:180-182 chunking).

    One declarative scan; Spark parallelizes by file splits, so the
    reference's 50k-row chunk loop is subsumed by partitioning. Explicit
    schema keeps the read single-pass (no inference pass) — at 100 TB an
    inference pass would read the data twice.
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def sink_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar stage write (replaces dag.py:203-207 pandas→buffer→S3 put)."""
    df.write.mode(mode).parquet(path)


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Stage read-back (replaces dag.py:210-211)."""
    return spark.read.parquet(path)


def parquet_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(name, bytes) of the parquet data files under ``path`` — Hadoop FS
    listing, so it works for s3a://hdfs:// too."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            out.append((name, int(st.getLen())))
    return out


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-file compaction: rewrite ``src`` as ⌈bytes/target⌉ files.

    The maintenance operation every long-running ingest needs — streaming
    and per-batch sinks accrete files far smaller than a good scan unit,
    and at 100 TB a scan's task count (and the NameNode/S3 listing cost)
    is driven by file count. Uses ``coalesce`` — a partition merge with
    NO shuffle: each output task concatenates whole input partitions, so
    compaction cost is one read + one write of the data, nothing moves
    between executors. Returns the output file count.
    """
    total = sum(sz for _, sz in parquet_data_files(spark, src))
    n = max(1, -(-total // target_file_bytes))
    spark.read.parquet(src).coalesce(n).write.mode("overwrite").parquet(dst)
    return n


def csv_roundtrip(
    spark: SparkSession, df: DataFrame, path: str, schema: T.StructType
) -> DataFrame:
    """Write ``df`` as CSV and scan it back with the explicit schema.

    Exercises the full CSV serializer/parser path (header, nulls as empty
    fields, timestamp format) the way the reference round-trips landing
    files through MinIO.
    """
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )


def json_roundtrip(
    spark: SparkSession, df: DataFrame, path: str, schema: T.StructType
) -> DataFrame:
    """Write ``df`` as JSON-lines and scan it back with the explicit schema.

    Line-delimited JSON is the splittable-at-scale layout (each executor
    parses its own byte range); the explicit schema keeps the read
    single-pass, like :func:`scan_csv`.
    """
    (
        df.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )
    return (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


def orc_roundtrip(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` as ORC and scan it back.

    ORC is the second columnar format the engine speaks natively —
    predicate pushdown and column pruning apply exactly as for parquet,
    and the schema rides in the file footer (no explicit schema needed).
    """
    df.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, sorted Spark table.

    Two tables bucketed (and sorted) on the same keys with the same
    bucket count join with ZERO shuffle and zero sort — the layout is the
    exchange, paid once at write time. This is the co-located-join
    strategy for repeatedly-joined 100 TB fact tables; bucket count
    should divide evenly into cluster cores (here: the local default).
    """
    w = df.write.mode("overwrite").bucketBy(buckets, *keys).sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def archive_move(spark: SparkSession, src: str, dst: str) -> bool:
    """Post-commit archive: rename src → dst via Hadoop FileSystem.

    Replaces the reference's copy+delete pair (dag.py:263-265) with an
    atomic-where-supported rename; works for any Hadoop-visible FS.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(src)
    dst_path = jvm.org.apache.hadoop.fs.Path(dst)
    fs = src_path.getFileSystem(conf)
    dst_parent = dst_path.getParent()
    if dst_parent is not None and not fs.exists(dst_parent):
        fs.mkdirs(dst_parent)
    return bool(fs.rename(src_path, dst_path))


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Compact a parquet directory's small files into ~target-size files.

    The small-file problem is the classic failure mode of continuous
    ingest (the reference lands one object per generated CSV,
    gen_dag.py:39-51; our streaming upsert inherits that shape): thousands
    of tiny files mean per-file open/footer overhead dominates scans and
    the driver's listing blows up. Compaction = read → repartition to
    ceil(bytes / target) → rewrite → atomic swap.

    ``sort_cols`` additionally clusters rows within each output file
    (sortWithinPartitions, no global shuffle beyond the repartition) so
    parquet row-group min/max stats become selective — the poor man's
    Z-order, and at 100 TB the difference between pruning row groups and
    reading them.

    Returns the number of output files written.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total_bytes = fs.getContentSummary(p).getLength()
    n_out = max(1, -(-total_bytes // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    out = df.repartition(int(n_out))
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp = f"{path}__compact"
    out.write.mode("overwrite").parquet(tmp)
    swap_directory(spark, tmp, path)
    files = [
        s
        for s in fs.listStatus(jvm.org.apache.hadoop.fs.Path(path))
        if s.isFile() and str(s.getPath().getName()).endswith(".parquet")
    ]
    return len(files)


def list_files(spark: SparkSession, directory: str, suffix: str = ".csv") -> list[str]:
    """Landing discovery (reference A1, dag.py:66-68): list + suffix filter.

    Driver-side by design — it is control-plane metadata (file names), not
    data; the reference's manifest snapshot is the same listing frozen as
    JSON. Bulk data never flows through this.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(directory)
    fs = path.getFileSystem(conf)
    if not fs.exists(path):
        return []
    statuses = fs.listStatus(path)
    out = [str(s.getPath().toString()) for s in statuses if s.isFile()]
    return sorted(k for k in out if k.endswith(suffix))


__all__ = [
    "TESTDATA_SCHEMAS",
    "read_table",
    "scan_csv",
    "sink_parquet",
    "scan_parquet",
    "csv_roundtrip",
    "json_roundtrip",
    "orc_roundtrip",
    "save_bucketed",
    "archive_move",
    "fs_exists",
    "fs_delete",
    "swap_directory",
    "compact_small_files",
    "list_files",
]
