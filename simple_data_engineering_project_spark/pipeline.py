"""The batch ETL pipeline — reference Tier A behaviors, Spark-first.

Reproduces the semantics of the reference's two DAGs
(`cocoa_data_generation_dag.py` + `cocoa_processing_dag.py`) as one
declarative pipeline:

    generate → land CSVs → discover → validate (per-file skip) → enrich
    → stage parquet → upsert into warehouse → archive processed files

What the reference does with Airflow task boundaries, S3 round-trips, and
XCom manifests collapses into a single Spark plan per run; the pieces the
optimizer can't subsume (per-file schema validation, keyed upsert without
a txn log, archive-on-success) are the ~100 lines here.

Scale notes: file listing and header probing are control-plane metadata
(names + first line), never data; the data path is one DataFrame plan —
scan all valid files at once (vs the reference's sequential per-file
loop), derive columns, one shuffle for the keyed upsert.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.upsert import upsert_last_write_wins
from .schemas import (
    BEAN_TYPES,
    COCOA_LANDING_SCHEMA,
    COCOA_REGIONS,
    PRICE_PER_KG_USD,
    REQUIRED_COCOA_COLUMNS,
)
from .sources import archive_move, list_files, scan_parquet, sink_parquet


def generate_cocoa_data(
    spark: SparkSession, num_records: int, seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Synthetic cocoa shipments (reference A16, generate_data.py:24-47).

    Same value domains, rebuilt as KEY-DERIVED column expressions over
    ``spark.range`` — fully distributed (the reference builds rows in a
    Python loop) and deterministic given (num_records, seed):

    - shipment_id: md5(seed, id) — unique + reproducible (the reference's
      uuid4 is nondeterministic, a correctness trap per SURVEY §1.4)
    - every random draw is a Knuth multiplicative-hash uniform of
      (id, seed, column-index) in PURE INTEGER arithmetic (the
      dp_noisy_counts/dataset_split mechanism) instead of ``F.rand``:
      rand() values depend on the RANGE PARTITIONING (a different core
      count reshuffles every draw), while the hash is row-keyed — stable
      across parallelism, engines, and layouts, which is what makes the
      generator itself DuckDB-oracle-checkable
    - timestamp: uniform over a fixed 2-year window (the reference uses
      [now-2y, now], nondeterministic; we pin the window)
    - temperature_celsius: NULL with p = 0.1 (generate_data.py:40-41)
    """

    def u_int(k: int, scale: int):
        # floor(uniform(id,k) * scale) without any float op:
        # h ∈ [0, 2^32) via ((id*31+seed*131+k) % 1000003) * knuth, then
        # (h*scale) >> 32 — pure int64 (h*scale < 2^58 for every scale
        # here; a double division would lose exactness past 2^53),
        # ANSI-overflow-safe, and bit-identical in DuckDB
        h = (
            (F.col("id") * 31 + F.lit(seed * 131 + k)) % F.lit(1_000_003)
        ) * F.lit(2654435761) % F.lit(4294967296)
        return F.shiftrightunsigned(h * F.lit(scale), 32)

    regions = F.array(*[F.lit(r) for r in COCOA_REGIONS])
    beans = F.array(*[F.lit(b) for b in BEAN_TYPES])
    epoch_lo = F.lit(1672531200)  # 2023-01-01 UTC
    window_s = 2 * 365 * 24 * 3600
    rng = (
        spark.range(num_records)
        if partitions is None
        # callers generating MANY frames in one job (land_csv_files)
        # pass a per-frame width: the default splits every frame over
        # defaultParallelism tasks, and 6 frames × 32 cores = 192
        # near-empty tasks whose scheduling overhead dominated the
        # landing stage (round-16 measurement: ~1.5 s of the 3-4 s
        # stage was task dispatch)
        else spark.range(0, num_records, numPartitions=partitions)
    )
    return (
        rng
        .select(
            F.md5(F.concat(F.lit(f"seed{seed}-"), F.col("id"))).alias("shipment_id"),
            F.timestamp_seconds(epoch_lo + u_int(0, window_s)).alias("timestamp"),
            F.concat(
                F.lit("FARM-"), (100 + u_int(1, 101)).cast("string")
            ).alias("farm_id"),
            regions[u_int(2, len(COCOA_REGIONS)).cast("int")].alias("region"),
            beans[u_int(3, len(BEAN_TYPES)).cast("int")].alias("bean_type"),
            # integer basis points / deciunits: the domain is already
            # 2dp/1dp-stepped, and integer construction sidesteps the
            # Spark-vs-DuckDB ROUND half-boundary divergence
            ((750 + u_int(4, 230)) / F.lit(100.0)).alias("quality_score"),
            (500 + u_int(5, 4501)).cast("double").alias("shipment_weight_kg"),
            F.when(
                u_int(6, 10) >= 1,
                (180 + u_int(7, 70)) / F.lit(10.0),
            ).alias("temperature_celsius"),
        )
    )


def land_csv_files(
    spark: SparkSession,
    landing_dir: str,
    num_files: int = 3,
    rows_per_file: int = 2000,
    seed: int = 42,
) -> list[str]:
    """Land ``num_files`` CSV files (reference gen_dag.py:36-52).

    Each file is written as a single-partition CSV directory then renamed
    to a flat ``.csv`` path so the landing layout matches the reference's
    (one object per file).
    """
    import math

    from pyspark.sql import functions as F

    from .schemas import COCOA_LANDING_SCHEMA

    # ONE write job for all files, with the per-row work done at FULL
    # width before the one-file-per-object exchange (round-16, guide
    # §2.3 "project before the exchange" applied to a write): the CSV
    # LINE for every record is formatted as a string column while the
    # data is still spread over the cluster, so the exchange on the
    # file id moves finished text and the num_files single-task writers
    # (the one-object-per-file landing contract) only dump bytes.
    # Previously the 6 writer tasks did all 600k rows of CSV encoding
    # while 26 cores idled, and each per-seed frame split over
    # defaultParallelism tasks (192 near-empty tasks of scheduling
    # overhead). Line formatting mirrors the uniVocity writer exactly
    # on this schema (timestampFormat pattern via date_format;
    # Double.toString via cast(string); NULL → empty field) — every
    # value domain is quote-free, pinned by
    # tests/test_pipeline.py::test_land_csv_lines_match_jvm_writer.
    cols = [f.name for f in COCOA_LANDING_SCHEMA.fields]
    per_frame = max(
        1,
        math.ceil(spark.sparkContext.defaultParallelism / max(num_files, 1)),
    )
    tagged = None
    for i in range(num_files):
        df = generate_cocoa_data(
            spark, rows_per_file, seed=seed + i, partitions=per_frame
        ).withColumn("__file", F.lit(i))
        tagged = df if tagged is None else tagged.unionByName(df)
    line = F.concat_ws(
        ",",
        *[
            F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss")
            if c == "timestamp"
            else F.coalesce(F.col(c).cast("string"), F.lit(""))
            for c in cols
        ],
    )
    body = tagged.select(
        line.alias("line"), F.col("__file"), F.lit(1).alias("__rank")
    )
    header = spark.createDataFrame(
        [(",".join(cols), i, 0) for i in range(num_files)],
        "line string, __file int, __rank int",
    )
    tmp = f"{landing_dir}/.tmp_gen"
    (
        body.unionByName(header)
        .repartition(num_files, "__file")
        .sortWithinPartitions("__file", "__rank")  # header row first
        .select("line", "__file")
        .write.mode("overwrite")
        .partitionBy("__file")
        .text(tmp)
    )
    paths = []
    for i in range(num_files):
        part = [p for p in list_files(spark, f"{tmp}/__file={i}", ".txt")][0]
        dst = f"{landing_dir}/cocoa_shipments_{seed + i:04d}_{i}.csv"
        archive_move(spark, part, dst)
        paths.append(dst)
    _rm(spark, tmp)
    return paths


def _rm(spark: SparkSession, path: str) -> None:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        fs.delete(p, True)


def validate_header(spark: SparkSession, path: str) -> tuple[bool, set[str]]:
    """Reference A5 (dag.py:186-190): a file missing any required column is
    skipped whole with a warning, not failed.

    Probes only the header line, driver-side through the Hadoop
    FileSystem API (one buffered readLine — a metadata-sized read, no
    Spark job). The previous ``spark.read.text(path).limit(1).collect()``
    scheduled one full driver-coordinated job PER FILE — pure
    scheduler/barrier overhead multiplied by the batch's file count
    (round-15 optimization, guide §5 "the driver should do almost no
    data work" cuts both ways: a one-line read IS driver-sized work,
    and a Spark job per file is the expensive way to do it).
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        # ADVICE r15: a file that vanished between list_files and
        # validation is an infrastructure race, not a schema problem —
        # keep the skip semantics (pinned by test_pipeline) but log a
        # DISTINCT warning so the race is not reported as a
        # missing-column schema issue
        import logging

        logging.getLogger(__name__).warning(
            "landing file vanished before header validation "
            "(infrastructure race, not a schema problem): %s", path,
        )
        return False, set(REQUIRED_COCOA_COLUMNS)
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        first = reader.readLine()
    finally:
        stream.close()
    if first is None or first == "":
        return False, set(REQUIRED_COCOA_COLUMNS)
    cols = {c.strip() for c in first.split(",")}
    missing = set(REQUIRED_COCOA_COLUMNS) - cols
    return not missing, missing


def enrich(df: DataFrame, deterministic_ts: str | None = None) -> DataFrame:
    """Reference A6+A7 (dag.py:193-194): derived value + audit stamp.

    ``deterministic_ts`` freezes processed_at for replay-idempotent tests
    (SURVEY §1.4: never hash a current_timestamp column).
    """
    stamp = (
        F.lit(deterministic_ts).cast("timestamp")
        if deterministic_ts
        else F.current_timestamp()
    )
    return df.withColumn(
        "shipment_value_usd",
        F.round(F.col("shipment_weight_kg") * F.lit(PRICE_PER_KG_USD), 2),
    ).withColumn("processed_at", stamp)


@dataclass
class PipelineResult:
    processed_files: list[str] = field(default_factory=list)
    skipped_files: list[str] = field(default_factory=list)
    archived_files: list[str] = field(default_factory=list)
    rows_upserted: int = 0
    warehouse_rows: int = 0
    rewritten_partitions: list[str] = field(default_factory=list)
    version: int | None = None  # snapshot id when keep_history=True


#: Hive partition column of the warehouse table. Month-of-timestamp keeps
#: partition count bounded (12/year) while making the daily merge touch
#: only the months a batch lands in.
WAREHOUSE_PARTITION_COL = "load_month"


def _with_load_month(df: DataFrame) -> DataFrame:
    return df.withColumn(
        WAREHOUSE_PARTITION_COL,
        F.coalesce(F.date_format("timestamp", "yyyy-MM"), F.lit("unknown")),
    )


def _write_partitioned(df: DataFrame, path: str) -> None:
    """partitionBy write clustered on the partition column and SORTED
    on the merge key within partitions.

    Without the repartition every shuffle task holding rows of a month
    opens a writer for it — months × tasks small files. Clustering first
    yields ~one file per month; at real scale swap the plain repartition
    for (month, salt) with a per-file row target to cap file size.

    The within-partition sort on shipment_id (round 11) costs one local
    sort at write time — no extra shuffle — and makes every row group's
    shipment_id min/max zone map TIGHT and disjoint, so the next run's
    key-range probe (run_batch_pipeline's moved-month scan) skips row
    groups at the parquet footer instead of decoding them. The same
    layout move zorder_layout makes for multi-column ranges.
    """
    (
        df.repartition(F.col(WAREHOUSE_PARTITION_COL))
        .sortWithinPartitions("shipment_id")
        .write.mode("overwrite")
        .partitionBy(WAREHOUSE_PARTITION_COL)
        .parquet(path)
    )


def run_batch_pipeline(
    spark: SparkSession,
    landing_dir: str,
    staging_dir: str,
    warehouse_dir: str,
    archive_dir: str,
    deterministic_ts: str | None = None,
    keep_history: bool = False,
) -> PipelineResult:
    """One daily-run equivalent (reference EP2, dag.py:56-276).

    Empty landing short-circuits (A15); invalid files are skipped and NOT
    archived so they re-scan next run (A17 semantics); valid files scan as
    ONE DataFrame; the upsert is last-write-wins on shipment_id against
    the parquet warehouse (A13); archive only after a successful commit
    (A14 ordering — archival is what marks a file durable).

    ``keep_history=True`` turns every batch into a numbered snapshot
    (lakehouse-style time travel): instead of deleting a replaced
    partition, its pre-batch copy moves to
    ``{warehouse_dir}/_history/v{N}/`` and a JSON manifest records which
    partitions batch N created vs replaced. Reconstruct any past state
    with :func:`read_warehouse_version`; history cost is one extra copy
    of only the partitions each batch touches (never the table) — the
    same frugality contract as the merge itself.
    """
    result = PipelineResult()
    files = list_files(spark, landing_dir, ".csv")
    if not files:
        return result  # A15 empty-input short-circuit

    valid = []
    for path in files:
        ok, missing = validate_header(spark, path)
        if ok:
            valid.append(path)
        else:
            result.skipped_files.append(path)
    if not valid:
        return result

    landed = (
        spark.read.schema(COCOA_LANDING_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
        .csv(valid)
    )
    enriched = enrich(landed, deterministic_ts=deterministic_ts)

    # Stage columnar (A9) — the warehouse loads from the stage, so a load
    # failure never leaves the warehouse half-written from raw CSVs.
    sink_parquet(enriched, staging_dir)
    staged = scan_parquet(spark, staging_dir)
    result.rows_upserted = staged.count()

    warehouse_path = f"{warehouse_dir}/cocoa_shipments"
    staged_m = _with_load_month(staged)
    part = WAREHOUSE_PARTITION_COL
    if _exists(spark, warehouse_path):
        # Partition-scoped merge (reference A13, dag.py:223-237): the
        # reference's ON CONFLICT DO UPDATE touches only conflicting rows;
        # the file-granular equivalent is rewriting only the hive
        # partitions that can contain a winner or a loser of this batch —
        # never the whole table (a daily batch over a 100 TB warehouse
        # must not rewrite 100 TB).
        old = scan_parquet(spark, warehouse_path)
        if part not in old.columns:
            # legacy flat layout: one-time full rewrite into the
            # partitioned layout, then future runs merge per-partition
            old = _with_load_month(old)
            affected = None
            old_affected = old
        else:
            # months the batch lands in (bounded: one row per month)
            batch_months = {
                r[0] for r in staged_m.select(part).distinct().collect()
            }
            # months holding a PRIOR version of a batch key (an update may
            # move a key across months; its old copy must be deleted).
            # Column-pruned scan of (key, month) only — parquet reads two
            # columns, not the table — semi-joined against the batch keys.
            # The batch key-RANGE prefilter (round 11) is conservative
            # (the semi-join still decides membership) but PUSHES to the
            # parquet scan, where the sorted-within-partition warehouse
            # layout (_write_partitioned) gives every row group a tight
            # shipment_id zone map: row groups outside the batch's key
            # range are skipped at the footer, never decoded. Bounds are
            # a 1-row aggregate — bounded driver data.
            lo, hi = staged_m.agg(
                F.min("shipment_id"), F.max("shipment_id")
            ).first()
            moved = (
                old.select("shipment_id", part)
                .filter(F.col("shipment_id").between(lo, hi))
                .join(
                    F.broadcast(staged_m.select("shipment_id").distinct()),
                    "shipment_id",
                    "left_semi",
                )
                .select(part)
                .distinct()
                .collect()
            )
            affected = sorted(batch_months | {r[0] for r in moved})
            old_affected = old.filter(F.col(part).isin(affected))
        merged = upsert_last_write_wins(
            old_affected, staged_m, keys=["shipment_id"], tiebreak=["processed_at"]
        )
        # write-then-swap: never overwrite partitions we are reading from
        tmp = f"{warehouse_dir}/.cocoa_shipments_next"
        _write_partitioned(merged, tmp)
        version = _next_version(spark, warehouse_dir) if keep_history else None
        if affected is None:
            if keep_history:
                # pre-state is the whole (legacy flat) table — keep it as
                # one full snapshot
                archive_move(
                    spark,
                    warehouse_path,
                    f"{warehouse_dir}/{HISTORY_DIR}/v{version}/__full__",
                )
                _write_manifest(
                    spark,
                    warehouse_dir,
                    {"version": version, "full": True,
                     "created": [], "replaced": []},
                )
            else:
                _rm(spark, warehouse_path)
            archive_move(spark, tmp, warehouse_path)
            result.rewritten_partitions = ["*"]
        else:
            replaced, created = [], []
            for m in affected:
                dst = f"{warehouse_path}/{part}={m}"
                src = f"{tmp}/{part}={m}"
                if keep_history and _exists(spark, dst):
                    replaced.append(m)
                    archive_move(
                        spark,
                        dst,
                        f"{warehouse_dir}/{HISTORY_DIR}/v{version}/{part}={m}",
                    )
                else:
                    if keep_history:
                        created.append(m)
                    _rm(spark, dst)
                if _exists(spark, src):
                    archive_move(spark, src, dst)
            _rm(spark, tmp)
            if keep_history:
                _write_manifest(
                    spark,
                    warehouse_dir,
                    {"version": version, "full": False,
                     "created": sorted(created), "replaced": sorted(replaced)},
                )
            result.rewritten_partitions = list(affected)
        result.version = version
    else:
        _write_partitioned(staged_m, warehouse_path)
        result.rewritten_partitions = ["*"]
        if keep_history:
            months = sorted(
                {r[0] for r in staged_m.select(part).distinct().collect()}
            )
            _write_manifest(
                spark,
                warehouse_dir,
                {"version": 0, "full": False,
                 "created": months, "replaced": []},
            )
            result.version = 0

    result.warehouse_rows = scan_parquet(spark, warehouse_path).count()
    result.processed_files = list(valid)

    for path in valid:  # A14: archive only what committed
        name = path.rsplit("/", 1)[-1]
        if archive_move(spark, path, f"{archive_dir}/{name}"):
            result.archived_files.append(path)
    return result


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return bool(p.getFileSystem(conf).exists(p))


# ---------------------------------------------------------------- history

#: Subdirectory of the warehouse holding snapshot manifests and the
#: pre-batch copies of replaced partitions (lakehouse-style time travel).
HISTORY_DIR = "_history"


def _write_manifest(spark: SparkSession, warehouse_dir: str, obj: dict) -> None:
    import json

    path = (
        f"{warehouse_dir}/{HISTORY_DIR}/manifest_v{obj['version']:06d}.json"
    )
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def _read_manifests(spark: SparkSession, warehouse_dir: str) -> list[dict]:
    import json

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    out = []
    for path in list_files(spark, f"{warehouse_dir}/{HISTORY_DIR}", ".json"):
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        stream = fs.open(p)
        try:
            raw = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        out.append(json.loads(bytes(raw).decode("utf-8")))
    return sorted(out, key=lambda m: m["version"])


def _next_version(spark: SparkSession, warehouse_dir: str) -> int:
    manifests = _read_manifests(spark, warehouse_dir)
    return manifests[-1]["version"] + 1 if manifests else 0


def _list_partition_dirs(spark: SparkSession, table_path: str) -> list[str]:
    """Names of hive partition directories directly under ``table_path``."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    return sorted(
        str(s.getPath().getName())
        for s in fs.listStatus(p)
        if s.isDirectory() and "=" in str(s.getPath().getName())
    )


def read_warehouse_version(
    spark: SparkSession, warehouse_dir: str, version: int
) -> DataFrame:
    """Reconstruct the warehouse as of snapshot ``version`` (time travel).

    Snapshot N is the table state right after the batch that returned
    ``PipelineResult.version == N`` from a ``keep_history=True`` run.
    Reconstruction is pure metadata arithmetic — no data was copied at
    read time and none is copied now:

    - the BASE TREE is the live table, unless some later batch ``w`` did
      a FULL rewrite (legacy-layout upgrade or rollback): then the
      pre-``w`` tree saved at ``_history/v{w}/__full__`` is the state at
      ``w-1`` and becomes the base (``w`` = earliest full after
      ``version``);
    - each partition then resolves independently against batches in
      ``(version, w)``: the earliest one that REPLACED it holds its
      as-of copy in history; a partition none of them touched is served
      from the base tree; a partition CREATED after ``version`` is
      excluded.

    The same resolution Delta/Iceberg do from their logs, expressed over
    hive directories + JSON manifests.
    """
    part = WAREHOUSE_PARTITION_COL
    warehouse_path = f"{warehouse_dir}/cocoa_shipments"
    manifests = _read_manifests(spark, warehouse_dir)
    if not manifests:
        raise ValueError(f"no snapshot history under {warehouse_dir}")
    max_v = manifests[-1]["version"]
    min_v = manifests[0]["version"]
    if not min_v <= version <= max_v:
        raise ValueError(
            f"version {version} outside readable range [{min_v}, {max_v}]"
        )

    fulls_after = [
        m["version"] for m in manifests if m["full"] and m["version"] > version
    ]
    horizon = min(fulls_after) if fulls_after else None
    if horizon is not None:
        base_path = f"{warehouse_dir}/{HISTORY_DIR}/v{horizon}/__full__"
        if version == horizon - 1:
            # the saved full tree IS the requested state verbatim
            return scan_parquet(spark, base_path)
    else:
        base_path = warehouse_path

    created_at: dict[str, int] = {}
    for m in manifests:
        for p in m.get("created", []):
            created_at.setdefault(p, m["version"])
    base = {
        d.split("=", 1)[1] for d in _list_partition_dirs(spark, base_path)
    }
    replaced_later: dict[str, int] = {}
    for m in manifests:
        if m["version"] > version and (
            horizon is None or m["version"] < horizon
        ):
            for p in m.get("replaced", []):
                replaced_later.setdefault(p, m["version"])

    pieces = []
    for p in sorted(base | set(replaced_later)):
        if created_at.get(p, min_v - 1) > version:
            continue
        if p in replaced_later:
            src = (
                f"{warehouse_dir}/{HISTORY_DIR}/"
                f"v{replaced_later[p]}/{part}={p}"
            )
        elif p in base:
            src = f"{base_path}/{part}={p}"
        else:
            continue
        pieces.append(
            spark.read.parquet(src).withColumn(part, F.lit(p))
        )
    if not pieces:
        raise ValueError(f"version {version} reconstructs to no partitions")
    out = pieces[0]
    for df in pieces[1:]:
        out = out.unionByName(df)
    return out


def rollback_warehouse(
    spark: SparkSession, warehouse_dir: str, version: int
) -> int:
    """Restore the live warehouse to snapshot ``version`` — as a NEW
    snapshot, never by erasing history (the audit trail survives; a
    rollback of a rollback works).

    Materializes the reconstructed state to a temp tree first, then
    moves the current live tree into history as a ``__full__`` snapshot
    and swaps the rebuilt tree in — the same write-then-swap discipline
    as the merge. Returns the new snapshot id.
    """
    state = read_warehouse_version(spark, warehouse_dir, version)
    warehouse_path = f"{warehouse_dir}/cocoa_shipments"
    tmp = f"{warehouse_dir}/.cocoa_shipments_rollback"
    _write_partitioned(state, tmp)
    new_version = _next_version(spark, warehouse_dir)
    archive_move(
        spark,
        warehouse_path,
        f"{warehouse_dir}/{HISTORY_DIR}/v{new_version}/__full__",
    )
    archive_move(spark, tmp, warehouse_path)
    _write_manifest(
        spark,
        warehouse_dir,
        {"version": new_version, "full": True, "created": [],
         "replaced": [], "rollback_of": version},
    )
    return new_version


def expire_history(
    spark: SparkSession, warehouse_dir: str, keep_last: int
) -> list[int]:
    """Retention GC: drop the snapshot copies and manifests of all but
    the newest ``keep_last`` versions (the live table is never touched).

    Expired versions become unreadable — ``read_warehouse_version``
    reports the surviving readable range. This is the storage-cost bound
    every history-keeping table needs (Delta VACUUM / Iceberg
    expire_snapshots).
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    manifests = _read_manifests(spark, warehouse_dir)
    if not manifests:
        return []
    cutoff = manifests[-1]["version"] - keep_last + 1
    expired = [m["version"] for m in manifests if m["version"] < cutoff]
    for v in expired:
        _rm(spark, f"{warehouse_dir}/{HISTORY_DIR}/v{v}")
        _rm(
            spark,
            f"{warehouse_dir}/{HISTORY_DIR}/manifest_v{v:06d}.json",
        )
    return expired
