"""Per-stage timing of the bench pipeline_e2e path.

Usage: python scripts/profile_pipeline.py [--runs 2]

Replays bench.py's _timed_pipeline with a timer around each stage of
run_batch_pipeline's first-run branch (fresh warehouse each run, same
volumes: 6 files x 100k rows), after the same warmup bench.py does, so
the stage split explains the bench number rather than a cold variant
of it.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])

    from pyspark.sql import functions as F

    from simple_data_engineering_project_spark.pipeline import (
        enrich,
        land_csv_files,
        run_batch_pipeline,
        validate_header,
    )
    from simple_data_engineering_project_spark.session import get_spark
    from simple_data_engineering_project_spark.sources import list_files

    spark = get_spark(app_name="sdep-pipeline-profile", cpus=CPUS)
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    # warm the pipeline path like bench.py does (tiny land+run)
    warm_base = "/tmp/sdep_profile_pipeline_warm"
    shutil.rmtree(warm_base, ignore_errors=True)
    land_csv_files(spark, f"{warm_base}/landing", num_files=2, rows_per_file=500)
    run_batch_pipeline(
        spark,
        landing_dir=f"{warm_base}/landing",
        staging_dir=f"{warm_base}/staging",
        warehouse_dir=f"{warm_base}/warehouse",
        archive_dir=f"{warm_base}/archive",
        deterministic_ts="2024-01-01 00:00:00",
    )
    shutil.rmtree(warm_base, ignore_errors=True)

    for r in range(runs):
        base = "/tmp/sdep_profile_pipeline"
        shutil.rmtree(base, ignore_errors=True)
        marks: list[tuple[str, float]] = []
        t0 = time.perf_counter()

        def mark(label: str) -> None:
            marks.append((label, time.perf_counter() - t0))

        spark.sparkContext.setJobDescription("pipeline: land")
        land_csv_files(
            spark, f"{base}/landing", num_files=6, rows_per_file=100_000
        )
        mark("land_csv_files")

        # --- run_batch_pipeline unrolled (first-run branch) ---
        files = list_files(spark, f"{base}/landing", ".csv")
        mark("list_files")
        valid = [p for p in files if validate_header(spark, p)[0]]
        mark("validate_headers")

        from simple_data_engineering_project_spark.schemas import (
            COCOA_LANDING_SCHEMA,
        )

        landed = (
            spark.read.schema(COCOA_LANDING_SCHEMA)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
            .csv(valid)
        )
        enriched = enrich(landed, deterministic_ts="2024-01-01 00:00:00")
        from simple_data_engineering_project_spark.sources import (
            scan_parquet,
            sink_parquet,
        )

        spark.sparkContext.setJobDescription("pipeline: stage parquet")
        sink_parquet(enriched, f"{base}/staging")
        mark("sink_parquet_staging")
        staged = scan_parquet(spark, f"{base}/staging")
        n = staged.count()
        mark(f"staged.count={n}")

        from simple_data_engineering_project_spark.pipeline import (
            _with_load_month,
            _write_partitioned,
        )

        staged_m = _with_load_month(staged)
        spark.sparkContext.setJobDescription("pipeline: warehouse write")
        _write_partitioned(staged_m, f"{base}/warehouse/cocoa_shipments")
        mark("write_partitioned")
        wh = spark.read.parquet(f"{base}/warehouse/cocoa_shipments")
        nw = wh.count()
        mark(f"warehouse.count={nw}")

        spark.sparkContext.setJobDescription("pipeline: flagship agg")
        (
            wh.groupBy("region")
            .agg({"shipment_value_usd": "sum"})
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        mark("flagship_agg")
        total = time.perf_counter() - t0
        shutil.rmtree(base, ignore_errors=True)

        prev = 0.0
        print(f"run {r}: total={total:.3f}")
        for label, t in marks:
            print(f"  {t - prev:7.3f}  {label}")
            prev = t


if __name__ == "__main__":
    main()
