"""SparkSession construction with scale-appropriate defaults.

Every knob here is chosen for the 100 TB posture first and local testing
second:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast-join demotion/promotion) — on a 1000-executor cluster this is
  what keeps a static plan from being wrong at runtime.
- ``spark.sql.session.timeZone=UTC`` — the reference stores TIMESTAMPTZ and
  stamps UTC (cocoa_processing_dag.py:194); all our timestamp semantics are
  UTC so results are independent of driver locale.
- shuffle partitions sized from local parallelism for tests; on a real
  cluster you would set this (or rely on AQE coalescing) from cluster size.
- Arrow enabled: every pandas interchange (createDataFrame, toPandas,
  pandas_udf, mapInPandas) moves columnar batches instead of pickled rows.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# application ids whose executors already received the package zip
_SHIPPED: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship this package to executor Pythons via ``addPyFile``.

    Arrow UDFs defined inside package modules pickle BY REFERENCE to
    their module, so every Python worker must be able to ``import
    simple_data_engineering_project_spark``. On a real cluster executors
    never share the driver's cwd/sys.path — shipping a zip of the
    package is the idiomatic mechanism (same posture as --py-files).
    Locally this makes the engine robust to harnesses that launch the
    driver from an arbitrary cwd instead of the repo root.

    Once per SparkContext; the zip is a few hundred KB of .py files.
    """
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"sdep_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(pkg_root):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.join(
                        os.path.basename(pkg_root),
                        os.path.relpath(full, pkg_root),
                    )
                    zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(app_id)


def get_spark(
    app_name: str = "simple-data-engineering-project-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session used by tests and bench.

    The driver supplies its own session to ``__spark_entry__.entry`` /
    ``queries()``; those paths call :func:`tune_for_queries` instead so
    correctness-critical settings (UTC, AQE) apply to any session.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores INT64 TIMESTAMP(NANOS); decode nanos as
        # long (read_table truncates to micros). Inert for all other
        # tables — declared here so it is session policy, not a scan-time
        # surprise.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Runtime row-level join pruning: a selective dim side injects a
        # bloom filter into the fact scan (semi-join reduction before the
        # shuffle). At 100 TB this can cut shuffled fact bytes by orders
        # of magnitude; inert when thresholds aren't met.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/sdep-spark-warehouse")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_package_on_executors(spark)
    return spark


def tune_for_queries(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable correctness/perf conf to an existing session.

    Called at the top of every catalog query so results are deterministic
    (UTC) and adaptive even when the harness built the session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # See get_spark: TIMESTAMP(NANOS) decode policy for events.parquet.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # See get_spark: runtime bloom-filter join pruning.
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # Executors must be able to import this package (Arrow UDFs pickle
    # by module reference) no matter where the harness launched from.
    ensure_package_on_executors(spark)
    return spark
