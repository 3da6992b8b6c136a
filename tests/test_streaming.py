"""Structured Streaming tests: the streaming variants must compute the
same aggregates as the batch operators on the same data, and the custom
stateful ride tracker must accumulate state across micro-batches and
finalize rides via event-time timeout (the settle guard)."""

import datetime
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from open_bus_stride_etl_spark.streaming import incremental as si
from tests import stride_fixtures

LOC_SCHEMA = (
    "id long, siri_ride_stop_id long, siri_snapshot_id long, recorded_at_time timestamp, "
    "lat double, lon double, bearing int, velocity int, distance_from_journey_start int, "
    "distance_from_siri_ride_stop_meters double"
)


@pytest.fixture(scope="module")
def tables(spark):
    return stride_fixtures.build(spark)


@pytest.fixture(scope="module")
def loc_stream_dir(spark, tables, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("loc_stream"))
    tables["siri_vehicle_location"].coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _run_to_memory(df, name, mode, spark):
    ckpt = f"/tmp/ckpt_{name}_{time.time_ns()}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # awaitTermination returns False on timeout (no raise): stop the
        # query before the finally rmtree's its checkpoint, or a slow
        # run turns into a confusing mid-stream failure instead of a
        # clean assertion here.
        terminated = q.awaitTermination(120)
        if not terminated:
            q.stop()
        assert terminated, f"stream {name} did not finish within 120s"
        return spark.table(name)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)  # don't leak /tmp dirs per run


def test_stream_ride_first_last_matches_batch(spark, tables, loc_stream_dir):
    stream = spark.readStream.schema(LOC_SCHEMA).parquet(loc_stream_dir)
    out = _run_to_memory(
        si.stream_ride_first_last(stream, tables["siri_ride_stop"]),
        "ride_fl", "complete", spark,
    )
    got = {
        r["siri_ride_id"]: (
            r["first_vehicle_location_id"], r["last_vehicle_location_id"], r["n_points"]
        )
        for r in out.collect()
    }
    batch = (
        tables["siri_vehicle_location"]
        .join(
            tables["siri_ride_stop"].select(
                F.col("id").alias("siri_ride_stop_id"), "siri_ride_id"
            ),
            on="siri_ride_stop_id",
        )
        .groupBy("siri_ride_id")
        .agg(*si.first_last_aggs("recorded_at_time", "id"))
    )
    want = {
        r["siri_ride_id"]: (
            r["first_vehicle_location_id"], r["last_vehicle_location_id"], r["n_points"]
        )
        for r in batch.collect()
    }
    assert got == want and len(got) == 26  # 30 rides - 4 without telemetry


def test_stream_hourly_stats_matches_batch(spark, tables, loc_stream_dir):
    stream = spark.readStream.schema(LOC_SCHEMA).parquet(loc_stream_dir)
    out = _run_to_memory(si.stream_hourly_stats(stream), "hourly", "complete", spark)
    got = {r["hour_start"]: (r["min_ts"], r["max_ts"], r["n_rows"]) for r in out.collect()}
    batch = (
        tables["siri_vehicle_location"]
        .where(F.col("recorded_at_time").isNotNull())
        .groupBy(F.date_trunc("hour", "recorded_at_time").alias("hour_start"))
        .agg(F.min("recorded_at_time").alias("a"), F.max("recorded_at_time").alias("b"),
             F.count(F.lit(1)).alias("n"))
    )
    want = {r["hour_start"]: (r["a"], r["b"], r["n"]) for r in batch.collect()}
    assert got == want and len(got) > 5


def test_stream_ride_tracker_state_and_finalize(spark, tmp_path):
    """Three micro-batches: ride 1 accumulates across batches 1-2, then
    finalizes by event-time timeout in batch 3 once the watermark passes
    last_ts + settle_hours. Duration = round((last-first)/60) = 30."""
    D = datetime.datetime
    d = str(tmp_path / "stream")
    os.makedirs(d)
    batches = [
        [(1, 1, D(2024, 5, 1, 10, 0)), (2, 1, D(2024, 5, 1, 10, 10))],
        [(3, 1, D(2024, 5, 1, 10, 30)), (10, 2, D(2024, 5, 20, 8, 0))],
        [(11, 2, D(2024, 5, 21, 8, 0))],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "id long, siri_ride_id long, recorded_at_time timestamp"
        ).coalesce(1)
        p = str(tmp_path / f"b{i}")
        df.write.mode("overwrite").parquet(p)
        part = [f for f in os.listdir(p) if f.startswith("part-")][0]
        dst = os.path.join(d, f"{i:02d}.parquet")
        os.rename(os.path.join(p, part), dst)
        os.utime(dst, (1700000000 + i * 100, 1700000000 + i * 100))

    stream = (
        spark.readStream.schema("id long, siri_ride_id long, recorded_at_time timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = _run_to_memory(
        si.stream_ride_tracker(stream, watermark="10 minutes", settle_hours=1),
        "tracker", "update", spark,
    )
    rows = out.collect()
    snaps = [r for r in rows if r["siri_ride_id"] == 1 and not r["finalized"]]
    # batch 1 snapshot: 2 points; batch 2 snapshot: 3 points (state
    # accumulated across micro-batches)
    assert sorted(r["n_points"] for r in snaps) == [2, 3]
    assert all(r["first_vehicle_location_id"] == 1 for r in snaps)

    fin = [r for r in rows if r["siri_ride_id"] == 1 and r["finalized"]]
    assert len(fin) == 1
    assert fin[0]["last_vehicle_location_id"] == 3
    assert fin[0]["duration_minutes"] == 30


def test_stream_flat_export_smoke(spark, tables, loc_stream_dir):
    stream = spark.readStream.schema(LOC_SCHEMA).parquet(loc_stream_dir)
    wide = si.stream_flat_export(
        stream,
        tables["siri_ride_stop"],
        tables["siri_ride"],
        tables["siri_route"],
        tables["siri_stop"],
        tables["gtfs_stop"],
    )
    assert wide.isStreaming
    out = _run_to_memory(wide, "flatstream", "append", spark)
    n = out.count()
    assert n == tables["siri_vehicle_location"].where(
        F.col("recorded_at_time").isNotNull()
    ).count()
    assert "hour" in out.columns and "stop_city" in out.columns


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """Duplicate keys arriving in different micro-batches are dropped;
    the first arrival survives."""
    D = datetime.datetime
    d = str(tmp_path / "dd")
    os.makedirs(d)
    batches = [
        [(1, "a", D(2024, 5, 1, 10, 0)), (2, "b", D(2024, 5, 1, 10, 1))],
        [(3, "a", D(2024, 5, 1, 10, 5)), (4, "c", D(2024, 5, 1, 10, 6))],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "id long, k string, ts timestamp").coalesce(1)
        p = str(tmp_path / f"db{i}")
        df.write.mode("overwrite").parquet(p)
        part = [f for f in os.listdir(p) if f.startswith("part-")][0]
        dst = os.path.join(d, f"{i:02d}.parquet")
        os.rename(os.path.join(p, part), dst)
        os.utime(dst, (1700000000 + i * 100, 1700000000 + i * 100))

    stream = (
        spark.readStream.schema("id long, k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = _run_to_memory(
        si.stream_exact_dedup(stream, ["k"], "ts", watermark="1 hour"),
        "dedup_stream", "append", spark,
    )
    rows = sorted((r["k"], r["id"]) for r in out.collect())
    # key 'a' re-arrived in batch 2 (id 3) and was dropped
    assert rows == [("a", 1), ("b", 2), ("c", 4)]


def test_run_task_error_capture(spark, capsys):
    from open_bus_stride_etl_spark.plans.tasks import run_task, task

    @task("t-fails")
    def _boom(spark):
        raise ValueError("nope")

    import json

    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_task(spark, "t-fails")
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rec = json.loads(out[-1])
    assert rec["task"] == "t-fails" and rec["error"] == "ValueError: nope"


def test_stream_session_windows_match_batch(spark, tables, loc_stream_dir):
    """Native session windows work identically under readStream: the
    complete-mode streaming result equals the batch sessionization."""
    gap = "30 minutes"
    stream = spark.readStream.schema(LOC_SCHEMA).parquet(loc_stream_dir)

    def sessions(df):
        return (
            df.where(F.col("recorded_at_time").isNotNull())
            .groupBy(
                F.session_window("recorded_at_time", gap).alias("w"),
                "siri_ride_stop_id",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "siri_ride_stop_id", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n"
            )
        )

    got = _run_to_memory(
        sessions(stream.withWatermark("recorded_at_time", "1 hour")),
        "sess_stream", "complete", spark,
    )
    want = sessions(tables["siri_vehicle_location"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_stream_partitions_sizing(spark, tmp_path):
    """State-shuffle width follows the bounded source's byte volume:
    min-clamped for toy inputs, one partition per ~8 MB in between,
    ceiling-clamped at defaultParallelism — and the
    `stride.streaming.widthCeiling` runtime conf (the production knob
    for sizing state-store count to planned capacity) raises that
    ceiling without touching the data-sized width below it."""
    from open_bus_stride_etl_spark.plans.q_streaming import (
        _STREAM_CEILING_CONF,
        _stream_partitions,
    )

    d = tmp_path / "src"
    d.mkdir()
    (d / "tiny.parquet").write_bytes(b"x" * 1024)
    assert _stream_partitions(str(d), spark) == 8  # min clamp

    (d / "mid.parquet").write_bytes(b"x" * (96 << 20))
    par = max(8, spark.sparkContext.defaultParallelism)
    assert _stream_partitions(str(d), spark) == min(par, 13)  # ceil(96MB+1KB / 8MB), ceiling-capped

    (d / "big.parquet").write_bytes(b"x" * (900 << 20))
    assert _stream_partitions(str(d), spark) == par  # ceiling binds (125 > cores)

    spark.conf.set(_STREAM_CEILING_CONF, "120")
    try:
        assert _stream_partitions(str(d), spark) == 120  # raised ceiling, width still data-bound
        spark.conf.set(_STREAM_CEILING_CONF, "4")
        assert _stream_partitions(str(d), spark) == 8  # override never drops below the min
    finally:
        spark.conf.unset(_STREAM_CEILING_CONF)


def test_streaming_dedup_lsh_verdicts(spark, tmp_path):
    """The persisted-index near-dup probe: a stream doc identical to an
    indexed doc hits all 4 bands; a lightly-edited near-dup still hits
    >= 1 band; unrelated prose hits 0 (novel). Runs the REAL streaming
    query path (foreachBatch against a reloaded parquet index) on a
    synthetic corpus written in the test-table layout."""
    import __spark_entry__ as m

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest to hide from every hunter"
    )
    docs = [
        # doc_id % 5 == 0 -> seen index
        (0, base),
        (5, "completely different seed text about spark shuffles and "
            "partition pruning strategies for columnar scan engines"),
        # stream side
        (1, base),                                   # exact copy of doc 0
        (2, base.replace("hunter", "ranger")),       # near-dup of doc 0
        (3, "unrelated short essay regarding the migration patterns of "
            "arctic terns across hemispheres during equinox seasons"),
    ]
    d = tmp_path / "lake"
    d.mkdir()
    # test-table layout: documents.parquet is a single FILE, not a dir
    staged = str(tmp_path / "staged")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(staged)
    part = [f for f in os.listdir(staged) if f.startswith("part-")][0]
    os.rename(os.path.join(staged, part), str(d / "documents.parquet"))
    out = {
        r["doc_id"]: r["n_bands_hit"]
        for r in m.queries()["streaming_dedup_lsh"](spark, str(d)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == 4          # identical -> every band collides
    assert out[2] >= 1          # near-dup -> banding catches it
    assert out[3] == 0          # novel
