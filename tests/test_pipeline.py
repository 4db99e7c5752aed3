"""Pipeline-property tests — the reference's Tier A infra behaviors
(SURVEY §2 A5/A13/A14/A15/A17, §5): skip-on-missing-column,
archive-on-success, empty-input no-op, idempotent replay, null round-trip,
exact value enrichment.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from simple_data_engineering_project_spark.pipeline import (
    enrich,
    generate_cocoa_data,
    land_csv_files,
    run_batch_pipeline,
)
from simple_data_engineering_project_spark.sources import list_files

TS = "2024-06-01 00:00:00"


@pytest.fixture()
def dirs(tmp_path):
    base = str(tmp_path)
    yield {
        "landing": f"{base}/landing",
        "staging": f"{base}/staging",
        "warehouse": f"{base}/warehouse",
        "archive": f"{base}/archive",
    }
    shutil.rmtree(base, ignore_errors=True)


def _run(spark, dirs):
    return run_batch_pipeline(
        spark,
        landing_dir=dirs["landing"],
        staging_dir=dirs["staging"],
        warehouse_dir=dirs["warehouse"],
        archive_dir=dirs["archive"],
        deterministic_ts=TS,
    )


def test_empty_landing_is_noop(spark, dirs):
    # A15 (dag.py:70-72): zero CSVs → short-circuit, nothing written
    res = _run(spark, dirs)
    assert res.processed_files == []
    assert res.warehouse_rows == 0


def test_happy_path_processes_and_archives(spark, dirs):
    land_csv_files(spark, dirs["landing"], num_files=2, rows_per_file=500)
    res = _run(spark, dirs)
    assert len(res.processed_files) == 2
    assert res.warehouse_rows == 1000
    # A14: processed files moved out of landing into archive
    assert list_files(spark, dirs["landing"], ".csv") == []
    assert len(list_files(spark, dirs["archive"], ".csv")) == 2
    wh = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    assert wh.count() == 1000
    # enrichment landed: value = round(weight * 2.5, 2), never null
    bad = wh.filter(
        F.col("shipment_value_usd")
        != F.round(F.col("shipment_weight_kg") * 2.5, 2)
    ).count()
    assert bad == 0


def test_missing_column_file_skipped_not_archived(spark, dirs, tmp_path):
    # A5 (dag.py:186-190): a file without a required column is skipped
    # whole and left in landing for re-scan (never archived)
    land_csv_files(spark, dirs["landing"], num_files=1, rows_per_file=300)
    bad_path = f"{dirs['landing']}/bad_missing_quality.csv"
    with open(bad_path, "w") as f:
        f.write("shipment_id,timestamp,farm_id,region,bean_type,shipment_weight_kg,temperature_celsius\n")
        f.write("x1,2024-01-01T00:00:00,FARM-1,Volta,Criollo,1000,20.0\n")
    res = _run(spark, dirs)
    assert [p.rsplit("/", 1)[-1] for p in res.skipped_files] == [
        "bad_missing_quality.csv"
    ]
    assert res.warehouse_rows == 300
    # the bad file is still in landing; the good one is archived
    remaining = list_files(spark, dirs["landing"], ".csv")
    assert [p.rsplit("/", 1)[-1] for p in remaining] == ["bad_missing_quality.csv"]


def test_validate_header_empty_and_valid_files(spark, tmp_path):
    """The driver-side FS readLine probe (round-15: replaced one Spark
    job per file) keeps the old semantics: empty file → invalid with
    every required column reported missing; a valid header → valid."""
    from simple_data_engineering_project_spark.pipeline import (
        REQUIRED_COCOA_COLUMNS,
        validate_header,
    )

    empty = tmp_path / "empty.csv"
    empty.write_text("")
    ok, missing = validate_header(spark, str(empty))
    assert not ok and missing == set(REQUIRED_COCOA_COLUMNS)

    good = tmp_path / "good.csv"
    good.write_text(",".join(sorted(REQUIRED_COCOA_COLUMNS)) + "\n1,2\n")
    ok, missing = validate_header(spark, str(good))
    assert ok and missing == set()

    gone = tmp_path / "missing.csv"
    ok, missing = validate_header(spark, str(gone))
    assert not ok and missing == set(REQUIRED_COCOA_COLUMNS)


def test_replay_is_idempotent_upsert(spark, dirs):
    # A13 (dag.py:223-237, README:31): re-loading the same keys leaves the
    # warehouse unchanged; updated rows win on conflict
    land_csv_files(spark, dirs["landing"], num_files=1, rows_per_file=400, seed=7)
    _run(spark, dirs)
    wh1 = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    total1 = wh1.count()
    sum1 = wh1.agg(F.sum("shipment_value_usd")).collect()[0][0]

    # land the SAME data again (same seed → same shipment_ids)
    land_csv_files(spark, dirs["landing"], num_files=1, rows_per_file=400, seed=7)
    _run(spark, dirs)
    wh2 = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    assert wh2.count() == total1
    assert wh2.agg(F.sum("shipment_value_usd")).collect()[0][0] == sum1


def test_update_wins_on_conflict(spark, dirs):
    land_csv_files(spark, dirs["landing"], num_files=1, rows_per_file=100, seed=3)
    _run(spark, dirs)
    # hand-craft an update file reusing an existing shipment_id
    wh = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    sid = wh.orderBy("shipment_id").first()["shipment_id"]
    upd = f"{dirs['landing']}/update.csv"
    with open(upd, "w") as f:
        f.write(
            "shipment_id,timestamp,farm_id,region,bean_type,quality_score,"
            "shipment_weight_kg,temperature_celsius\n"
        )
        f.write(f"{sid},2024-01-01T00:00:00,FARM-999,Volta,Criollo,9.99,2000,21.5\n")
    _run(spark, dirs)
    wh2 = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    assert wh2.count() == 100  # no duplicate key
    row = wh2.filter(F.col("shipment_id") == sid).collect()[0]
    assert row["farm_id"] == "FARM-999"
    assert row["shipment_value_usd"] == 5000.0  # 2000 * 2.5


def _partition_file_hashes(warehouse_dir: str) -> dict[str, str]:
    """{relative file path: sha256} for every data file in the warehouse."""
    import hashlib
    import os

    root = f"{warehouse_dir}/cocoa_shipments"
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn.startswith(("_", ".")):
                continue  # _SUCCESS / CRC bookkeeping
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            out[rel] = hashlib.sha256(open(p, "rb").read()).hexdigest()
    return out


def test_merge_rewrites_only_affected_partitions(spark, dirs):
    # Scale contract: the warehouse merge is partition-scoped — a batch
    # touching one month must leave every other month's files
    # byte-identical (the 100 TB analogue of the reference's row-scoped
    # ON CONFLICT DO UPDATE, dag.py:223-237).
    land_csv_files(spark, dirs["landing"], num_files=2, rows_per_file=500, seed=5)
    res1 = _run(spark, dirs)
    assert res1.rewritten_partitions == ["*"]  # initial full write
    before = _partition_file_hashes(dirs["warehouse"])
    assert len({p.split("/")[0] for p in before}) > 3  # several months exist

    # craft an update that stays inside its original month
    wh = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    row = wh.orderBy("shipment_id").first()
    month = row["timestamp"].strftime("%Y-%m")
    ts = row["timestamp"].strftime("%Y-%m-%dT%H:%M:%S")
    with open(f"{dirs['landing']}/update.csv", "w") as f:
        f.write(
            "shipment_id,timestamp,farm_id,region,bean_type,quality_score,"
            "shipment_weight_kg,temperature_celsius\n"
        )
        f.write(f"{row['shipment_id']},{ts},FARM-777,Volta,Criollo,9.0,1234,20.0\n")
    res2 = _run(spark, dirs)
    assert res2.rewritten_partitions == [month]

    after = _partition_file_hashes(dirs["warehouse"])
    changed_months = {
        p.split("/")[0]
        for p in set(before) ^ set(after)
        | {p for p in set(before) & set(after) if before[p] != after[p]}
    }
    assert changed_months == {f"load_month={month}"}
    # and the merge is still correct: no duplicate key, update won
    wh2 = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    assert wh2.count() == 1000
    upd = wh2.filter(F.col("shipment_id") == row["shipment_id"]).collect()[0]
    assert upd["farm_id"] == "FARM-777"


def test_warehouse_scan_prunes_partitions(spark, dirs):
    # the month layout must actually buy partition pruning: a month-
    # filtered scan shows a PartitionFilters entry on load_month in the
    # physical plan (at 100 TB this is the difference between reading
    # one month and reading the table)
    land_csv_files(spark, dirs["landing"], num_files=1, rows_per_file=500, seed=13)
    _run(spark, dirs)
    wh = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    month = wh.select("load_month").first()["load_month"]
    plan = (
        wh.filter(F.col("load_month") == month)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "load_month" in plan.split("PartitionFilters", 1)[1][:200]


def test_merge_deletes_stale_copy_when_key_changes_month(spark, dirs):
    # an update that MOVES a key to a different month must delete the old
    # month's copy (cross-partition key movement), not just add the new one
    land_csv_files(spark, dirs["landing"], num_files=1, rows_per_file=200, seed=9)
    _run(spark, dirs)
    wh = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    row = wh.orderBy("shipment_id").first()
    old_month = row["timestamp"].strftime("%Y-%m")
    new_ts, new_month = "2030-07-01T00:00:00", "2030-07"
    assert old_month != new_month
    with open(f"{dirs['landing']}/move.csv", "w") as f:
        f.write(
            "shipment_id,timestamp,farm_id,region,bean_type,quality_score,"
            "shipment_weight_kg,temperature_celsius\n"
        )
        f.write(f"{row['shipment_id']},{new_ts},FARM-1,Volta,Criollo,8.0,1000,20.0\n")
    res = _run(spark, dirs)
    assert set(res.rewritten_partitions) == {old_month, new_month}
    wh2 = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    assert wh2.count() == 200  # no duplicate key across months
    assert (
        wh2.filter(F.col("shipment_id") == row["shipment_id"])
        .collect()[0]["load_month"]
        == new_month
    )


def test_null_temperature_roundtrip(spark, dirs):
    # SURVEY §1.4: 10% null temperature must survive CSV → parquet →
    # warehouse as real NULLs (empty CSV fields), and aggregates skip them
    land_csv_files(spark, dirs["landing"], num_files=1, rows_per_file=2000, seed=11)
    _run(spark, dirs)
    wh = spark.read.parquet(f"{dirs['warehouse']}/cocoa_shipments")
    n_null = wh.filter(F.col("temperature_celsius").isNull()).count()
    assert 100 < n_null < 400  # ~10% of 2000
    avg = wh.agg(F.avg("temperature_celsius")).collect()[0][0]
    assert 18.0 <= avg <= 25.0  # null-skipping average stays in domain


def test_enrich_rounding_boundary(spark):
    # SURVEY §1.4: integral weight × 2.50 has ≤1 decimal → round(…,2) is
    # an identity; pin the exact boundary the reference silently relies on
    df = spark.createDataFrame(
        [("a", 501.0), ("b", 4999.0)], "shipment_id string, shipment_weight_kg double"
    )
    out = {r["shipment_id"]: r["shipment_value_usd"] for r in enrich(df, TS).collect()}
    assert out == {"a": 1252.5, "b": 12497.5}


def test_generator_domains(spark):
    # A16 domains (generate_data.py:29-43): deterministic given seed
    df = generate_cocoa_data(spark, 5000, seed=42)
    row = df.agg(
        F.min("quality_score"), F.max("quality_score"),
        F.min("shipment_weight_kg"), F.max("shipment_weight_kg"),
        F.countDistinct("shipment_id"),
    ).collect()[0]
    assert 7.5 <= row[0] and row[1] <= 9.8
    assert 500 <= row[2] and row[3] <= 5000
    assert row[4] == 5000  # ids unique
    a = df.agg(F.sum("shipment_weight_kg")).collect()[0][0]
    b = generate_cocoa_data(spark, 5000, seed=42).agg(
        F.sum("shipment_weight_kg")
    ).collect()[0][0]
    assert a == b  # deterministic


def _run_hist(spark, dirs, seed):
    land_csv_files(
        spark, dirs["landing"], num_files=1, rows_per_file=400, seed=seed
    )
    return run_batch_pipeline(
        spark,
        landing_dir=dirs["landing"],
        staging_dir=dirs["staging"],
        warehouse_dir=dirs["warehouse"],
        archive_dir=dirs["archive"],
        deterministic_ts=TS,
        keep_history=True,
    )


def _snapshot(spark, dirs):
    from simple_data_engineering_project_spark.sources import scan_parquet

    df = scan_parquet(spark, f"{dirs['warehouse']}/cocoa_shipments")
    return sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())


def test_time_travel_reconstructs_every_snapshot(spark, dirs):
    from simple_data_engineering_project_spark.pipeline import (
        read_warehouse_version,
    )

    snaps = []
    for v, seed in enumerate([42, 99, 7]):
        res = _run_hist(spark, dirs, seed)
        assert res.version == v
        snaps.append(_snapshot(spark, dirs))
    # live state is the last snapshot; every older version reconstructs
    # byte-equal from live + history partitions
    for v, want in enumerate(snaps):
        df = read_warehouse_version(spark, dirs["warehouse"], v)
        got = sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())
        assert got == want, f"version {v} mismatch"
    # distinct seeds really changed the table between snapshots
    assert snaps[0] != snaps[1] != snaps[2]


def test_time_travel_rejects_out_of_range(spark, dirs):
    from simple_data_engineering_project_spark.pipeline import (
        read_warehouse_version,
    )

    _run_hist(spark, dirs, 42)
    with pytest.raises(ValueError):
        read_warehouse_version(spark, dirs["warehouse"], 1)
    with pytest.raises(ValueError):
        read_warehouse_version(spark, dirs["warehouse"], -1)


def test_history_off_keeps_layout_manifest_free(spark, dirs):
    import os

    land_csv_files(spark, dirs["landing"], num_files=1, rows_per_file=200)
    res = _run(spark, dirs)
    assert res.version is None
    assert not os.path.exists(f"{dirs['warehouse']}/_history")


def test_rollback_restores_and_preserves_history(spark, dirs):
    from simple_data_engineering_project_spark.pipeline import (
        read_warehouse_version,
        rollback_warehouse,
    )

    snaps = []
    for seed in [42, 99, 7]:
        _run_hist(spark, dirs, seed)
        snaps.append(_snapshot(spark, dirs))
    new_v = rollback_warehouse(spark, dirs["warehouse"], 0)
    assert new_v == 3
    # live table is back to snapshot 0
    assert _snapshot(spark, dirs) == snaps[0]
    # every pre-rollback version still reconstructs (resolution threads
    # through the rollback's __full__ horizon), and so does the rollback
    for v, want in [(0, snaps[0]), (1, snaps[1]), (2, snaps[2]), (3, snaps[0])]:
        df = read_warehouse_version(spark, dirs["warehouse"], v)
        got = sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())
        assert got == want, f"version {v} mismatch after rollback"


def test_expire_history_bounds_retention(spark, dirs):
    from simple_data_engineering_project_spark.pipeline import (
        expire_history,
        read_warehouse_version,
    )

    snaps = []
    for seed in [42, 99, 7]:
        _run_hist(spark, dirs, seed)
        snaps.append(_snapshot(spark, dirs))
    assert expire_history(spark, dirs["warehouse"], keep_last=2) == [0]
    with pytest.raises(ValueError):
        read_warehouse_version(spark, dirs["warehouse"], 0)
    for v in (1, 2):
        df = read_warehouse_version(spark, dirs["warehouse"], v)
        got = sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())
        assert got == snaps[v]


def test_land_csv_lines_match_jvm_writer(spark, dirs, tmp_path):
    # round-16: land_csv_files formats CSV lines itself (full-width
    # formatting before the one-file-per-object exchange). Pin byte
    # parity of every line against Spark's own uniVocity CSV writer on
    # the identical frame — header included — so a divergence in double
    # rendering, timestamp formatting, or null handling fails loudly.
    df = generate_cocoa_data(spark, 200, seed=11)
    jvm_dir = str(tmp_path / "jvm_csv")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
        .csv(jvm_dir)
    )
    jvm_part = [p for p in list_files(spark, jvm_dir, ".csv")][0]
    local = jvm_part[len("file:"):] if jvm_part.startswith("file:") else jvm_part
    with open(local) as f:
        jvm_lines = f.read().splitlines()

    paths = land_csv_files(
        spark, dirs["landing"], num_files=1, rows_per_file=200, seed=11
    )
    with open(paths[0]) as f:
        ours = f.read().splitlines()

    assert ours[0] == jvm_lines[0]  # header, first line
    assert sorted(ours[1:]) == sorted(jvm_lines[1:])
