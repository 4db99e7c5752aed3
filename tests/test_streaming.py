"""Structured Streaming tests (SURVEY §2 C6): the streamed plan must agree
with its batch twin — the Structured Streaming contract — plus
maxFilesPerTrigger batching and watermarked session windows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_data_engineering_project_spark.sources import read_table
from simple_data_engineering_project_spark.streaming import (
    read_events_stream,
    session_aggregates,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_smoke, tmp_path_factory):
    # re-stage events as micros-timestamp parquet (the stream source
    # schema matches TESTDATA_SCHEMAS['events'])
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    read_table(spark, sf_smoke, "events").repartition(4).write.parquet(path)
    return path


def _run_available_now(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark, sf_smoke, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    q = _run_available_now(tumbling_counts(stream), "t_tumbling")
    try:
        got = {
            (r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM t_tumbling").collect()
        }
        batch = read_table(spark, sf_smoke, "events")
        want = {
            (r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
            for r in (
                batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
                .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
            ).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_session_stream_matches_batch_query(spark, sf_smoke, events_dir):
    stream = read_events_stream(spark, events_dir)
    q = _run_available_now(session_aggregates(stream), "t_session")
    try:
        got = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in spark.sql("SELECT * FROM t_session").collect()
        }
        from simple_data_engineering_project_spark.plans import catalog

        want = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in catalog()["events_session_agg"].fn(spark, sf_smoke).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_sliding_windows_overlap(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    q = _run_available_now(sliding_counts(stream, "1 hour", "30 minutes"), "t_sliding")
    try:
        rows = spark.sql("SELECT * FROM t_sliding").collect()
        assert rows
        # every event lands in exactly 2 overlapping 1h/30m windows ⇒
        # total sliding count = 2 × event count
        total = sum(r["n"] for r in rows)
        n_events = spark.read.parquet(events_dir).count()
        assert total == 2 * n_events
    finally:
        q.stop()


def test_stateful_running_totals_match_batch(spark, sf_smoke, events_dir):
    from simple_data_engineering_project_spark.streaming.stateful import (
        running_user_totals,
    )

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        # state accumulates across triggers: the per-user row with the
        # highest n_events is the final running total
        got = {
            r["user_id"]: (r["n_events"], round(r["sum_value"], 4))
            for r in spark.sql(
                """SELECT user_id, n_events, sum_value FROM (
                     SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY n_events DESC) AS rn
                     FROM t_stateful) WHERE rn = 1"""
            ).collect()
        }
        batch = read_table(spark, sf_smoke, "events")
        want = {
            r["user_id"]: (r["n"], round(r["s"], 4))
            for r in batch.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert got == want
    finally:
        q.stop()


def test_stream_dedup_within_watermark(spark, sf_smoke, tmp_path):
    from simple_data_engineering_project_spark.streaming import stream_dedup

    # stage the corpus with every event duplicated 3× across files, so
    # duplicates of a key arrive in different triggers
    src = str(tmp_path / "dup_events")
    ev = read_table(spark, sf_smoke, "events")
    ev.unionByName(ev).unionByName(ev).repartition(6).write.parquet(src)

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    q = (
        stream_dedup(stream, watermark="365 days")
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        out = spark.sql("SELECT event_id FROM t_dedup").collect()
        ids = [r["event_id"] for r in out]
        assert len(ids) == len(set(ids))  # no duplicate survived
        assert set(ids) == set(r["event_id"] for r in ev.select("event_id").collect())
    finally:
        q.stop()


def test_stream_upsert_warehouse(spark, sf_smoke, events_dir, tmp_path):
    from simple_data_engineering_project_spark.streaming import (
        stream_upsert_warehouse,
    )

    wh = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")
    q = stream_upsert_warehouse(spark, events_dir, wh, ckpt, keys=["event_id"])
    q.awaitTermination(180)
    q.stop()
    loaded = spark.read.parquet(wh)
    batch = read_table(spark, sf_smoke, "events")
    assert loaded.count() == batch.count()  # event_id unique → full load
    assert sorted(loaded.columns) == sorted(batch.columns)
    # replay with a fresh checkpoint: idempotent (same keyed result)
    q2 = stream_upsert_warehouse(
        spark, events_dir, wh, str(tmp_path / "ckpt2"), keys=["event_id"]
    )
    q2.awaitTermination(180)
    q2.stop()
    assert spark.read.parquet(wh).count() == batch.count()


def test_stream_stream_conversion_join_matches_batch(spark, sf_smoke, events_dir):
    from simple_data_engineering_project_spark.plans import catalog
    from simple_data_engineering_project_spark.streaming import conversion_join

    # one micro-batch (files >> maxFilesPerTrigger): watermark starts at
    # -inf so no join state is evicted mid-run — exact batch parity. With
    # many batches over event-time-unordered files, pairs whose left side
    # trails the watermark by > horizon are (correctly) dropped; that
    # trade is documented on conversion_join.
    left = read_events_stream(spark, events_dir, max_files_per_trigger=1000)
    right = read_events_stream(spark, events_dir, max_files_per_trigger=1000)
    joined = conversion_join(left, right)
    q = (
        joined.writeStream.format("memory")
        .queryName("t_conversion")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        got = {
            (r["l_event"], r["r_event"])
            for r in spark.sql("SELECT * FROM t_conversion").collect()
        }
        want = {
            (r["l_event"], r["r_event"])
            for r in catalog()["events_conversion_join"].fn(spark, sf_smoke).collect()
        }
        assert got == want and got
    finally:
        q.stop()


def test_stream_static_enrichment_matches_batch(spark, sf_smoke, events_dir):
    from simple_data_engineering_project_spark.streaming import (
        enrich_stream_static,
        read_events_stream,
    )

    # deterministic user dim: tier by user_id residue
    users = (
        read_table(spark, sf_smoke, "events")
        .select("user_id")
        .distinct()
        .withColumn(
            "tier",
            F.when(F.col("user_id") % 3 == 0, "gold")
            .when(F.col("user_id") % 3 == 1, "silver")
            .otherwise("bronze"),
        )
    )

    def per_tier(events):
        return enrich_stream_static(events, users).groupBy("tier").agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    q = _run_available_now(per_tier(stream), "t_enrich")
    try:
        got = {
            r["tier"]: (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM t_enrich").collect()
        }
        want = {
            r["tier"]: (r["n"], r["sum_value"])
            for r in per_tier(read_table(spark, sf_smoke, "events")).collect()
        }
        assert got == want and set(got) == {"gold", "silver", "bronze"}
    finally:
        q.stop()


def test_stream_stream_outer_join_emits_unmatched(spark, sf_smoke, events_dir):
    from simple_data_engineering_project_spark.streaming import conversion_join

    # left-outer stream-stream join: views with no purchase inside the
    # horizon must surface (null purchase columns) once the watermark
    # proves no match can still arrive; the availableNow final no-data
    # batch flushes everything older than max(ts) - delay. Compare
    # against the batch twin restricted to lefts whose whole join
    # window + watermark delay is provably past — rows younger than
    # that may legitimately still sit in state at stream end.
    left = read_events_stream(spark, events_dir, max_files_per_trigger=1000)
    right = read_events_stream(spark, events_dir, max_files_per_trigger=1000)
    joined = conversion_join(left, right, how="left_outer")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_conversion_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
        batch = read_table(spark, sf_smoke, "events")
        max_ts = batch.agg(F.max("ts")).first()[0]
        cutoff = F.lit(max_ts) - F.expr("INTERVAL 95 minutes")  # 30m + 1h + slack
        got = {
            (r["l_event"], r["r_event"])
            for r in spark.sql(
                "SELECT * FROM t_conversion_outer"
            ).filter(F.col("l_ts") <= cutoff).collect()
        }
        want = {
            (r["l_event"], r["r_event"])
            for r in conversion_join(batch, batch, how="left_outer")
            .filter(F.col("l_ts") <= cutoff)
            .collect()
        }
        assert got == want and got
        # the outer join must actually emit misses, not just matches
        assert any(r_event is None for _, r_event in got)
    finally:
        q.stop()


def test_tws_running_totals_match_batch(spark, sf_smoke, events_dir):
    """transformWithStateInPandas leg of the running-totals operator.
    Gated on google.protobuf (the TWS state protocol's driver-worker
    dependency, absent from this image — see _have_tws_runtime for the
    enablement recipe); the plan still CONSTRUCTS unconditionally, so
    a pyspark upgrade that breaks the API surface fails loudly here."""
    from simple_data_engineering_project_spark.streaming import (
        read_events_stream,
    )
    from simple_data_engineering_project_spark.streaming.stateful import (
        _have_tws_runtime,
        running_user_totals_tws,
    )

    stream = read_events_stream(spark, events_dir)
    out = running_user_totals_tws(stream)  # plan construction: ungated
    assert set(out.schema.fieldNames()) == {
        "user_id", "n_events", "sum_value"
    }
    if not _have_tws_runtime():
        pytest.skip("google.protobuf not installed (TWS state protocol)")

    q = (
        out.writeStream.format("memory")
        .queryName("t_tws")
        .outputMode("update")
        .option(
            "checkpointLocation",
            f"{events_dir}/../tws_ckpt",
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql(
            """SELECT user_id, n_events, sum_value FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM t_tws) WHERE rn = 1"""
        ).collect()
    }
    from simple_data_engineering_project_spark.sources import read_table

    want = {
        (r["user_id"], r["n"], round(r["s"], 6))
        for r in read_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_tws_handler_logic_with_fake_handle():
    """Drives the StatefulProcessor's handleInputRows directly with a
    fake handle/ValueState (the live TWS path is protobuf-gated in
    this image), pinning state accumulation across calls, null
    handling, and the output row shape against outputStructType."""
    import pandas as pd

    from simple_data_engineering_project_spark.streaming.stateful import (
        make_user_totals_processor,
    )

    class _FakeState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class _FakeHandle:
        def __init__(self):
            self.state = _FakeState()

        def getValueState(self, name, schema):
            assert name == "agg"
            assert [f.name for f in schema.fields] == ["n", "s"]
            return self.state

    proc = make_user_totals_processor()
    h = _FakeHandle()
    proc.init(h)
    out1 = list(
        proc.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [1.5, None, 2.0]})]), None
        )
    )
    assert len(out1) == 1
    assert list(out1[0].columns) == ["user_id", "n_events", "sum_value"]
    assert out1[0].iloc[0].tolist() == [7, 3, 3.5]
    assert h.state.v == (3, 3.5)
    # state survives to the next micro-batch and accumulates
    out2 = list(
        proc.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [4.0]})]), None
        )
    )
    assert out2[0].iloc[0].tolist() == [7, 4, 7.5]
    proc.close()
