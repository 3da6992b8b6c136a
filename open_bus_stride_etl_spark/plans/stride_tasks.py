"""Runnable stride tasks: the reference's Airflow DAG tasks, registered
in the engine's task registry and operating on a stride lake directory.

Reference DAG declarations (/root/reference/open_bus_stride_etl/*/dags.yaml):
- stride-etl-siri-add-ride-durations            @hourly, num_days=4
- stride-etl-siri-update-ride-stops-gtfs        @hourly, num_days=1
- stride-etl-siri-update-rides-gtfs             @hourly, num_days=1
- stride-etl-siri-update-ride-stops-vehicle-locations @hourly, num_days=1
- stride-etl-gtfs-update-ride-aggregations      @daily (ledger-driven)
- stride-etl-packagers-siri-hourly-update-packages @daily
- stride-etl-stats-collect [--validate]         @daily

Each task here is ``(spark, base_dir, window) -> metrics dict``; the
plan functions (plans/stride.py) are pure, so the task layer only does
lake I/O, ledger bookkeeping, and metric counting — mirroring the
reference's split between SQL and orchestration.
"""

from __future__ import annotations

import datetime
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ledger import missing_dates
from ..operators.stats import status_counts, validate_freshness
from ..sources import parquet_stats, stride_lake as lake
from ..sources.artifacts import register_artifact
from ..sources.csv_package import publish_if_changed, read_manifest
from . import stride
from .tasks import task


def _nonnull(
    spark: SparkSession, base_dir: str, name: str, col: str
) -> int:
    """Non-null count of one enrichment column of a lake table — the
    task's 'rows already set' bookkeeping. Answered from parquet footer
    statistics when the snapshot is a local parquet dir (exact
    null_count metadata, O(files) driver-side, no Spark job — r9, guide
    §6); any non-local lake or stats-less chunk falls back to the
    column-pruned scan, so the metric is exact either way."""
    n = parquet_stats.nonnull_count(lake.table_path(base_dir, name), col)
    if n is not None:
        return n
    return (
        lake.read_table(spark, base_dir, name)
        .where(F.col(col).isNotNull())
        .count()
    )


def _write_and_count(
    spark: SparkSession, out: DataFrame, base_dir: str, name: str, col: str, n_before: int
) -> tuple[int, int]:
    """Write the new snapshot with the 'rows updated' metric observed IN
    the write job (Observation API — one plan execution total, r9).
    Counting on the unwritten plan would execute the whole enrichment
    twice; the pre-r9 shape (write, then re-read the written table to
    count non-nulls) paid an extra scan per task. Returns
    (rows, newly_set)."""
    m = lake.overwrite_table_observed(
        out, base_dir, name, metrics={"n_after": F.count(F.col(col))}
    )
    return m["rows"], m["n_after"] - n_before


@task("siri-add-ride-durations", cadence="hourly", num_days=4)
def siri_add_ride_durations(
    spark: SparkSession,
    base_dir: str,
    min_date: str,
    max_date: str,
    now_ts: str | None = None,
):
    """``now_ts`` pins the settle/stale guard clock for deterministic
    backfills (and the stride_dag_convergence invariance oracle); the
    scheduler default is wall-clock, like the reference's
    datetime.datetime.now (siri/add_ride_durations.py:68-84)."""
    rides = lake.read_table(spark, base_dir, "siri_ride")
    n_before = _nonnull(spark, base_dir, "siri_ride", "updated_duration_minutes")
    out = stride.add_ride_durations(
        rides,
        lake.read_table(spark, base_dir, "siri_ride_stop"),
        lake.read_table(spark, base_dir, "siri_vehicle_location"),
        min_date,
        max_date,
        now=F.lit(now_ts).cast("timestamp") if now_ts else F.current_timestamp(),
    )
    n, n_updated = _write_and_count(
        spark, out, base_dir, "siri_ride", "updated_duration_minutes", n_before
    )
    return {"rows": n, "updated_duration": n_updated}


@task("siri-update-ride-stops-gtfs", cadence="hourly", num_days=1)
def siri_update_ride_stops_gtfs(spark: SparkSession, base_dir: str, min_date: str, max_date: str):
    ride_stops = lake.read_table(spark, base_dir, "siri_ride_stop")
    n_before = _nonnull(spark, base_dir, "siri_ride_stop", "gtfs_stop_id")
    out = stride.update_ride_stops_gtfs(
        ride_stops,
        lake.read_table(spark, base_dir, "siri_ride"),
        lake.read_table(spark, base_dir, "siri_stop"),
        lake.read_table(spark, base_dir, "gtfs_stop"),
        min_date,
        max_date,
    )
    n, n_matched = _write_and_count(
        spark, out, base_dir, "siri_ride_stop", "gtfs_stop_id", n_before
    )
    return {"rows": n, "matched_gtfs_stops": n_matched}


@task("siri-update-rides-gtfs", cadence="hourly", num_days=1)
def siri_update_rides_gtfs(spark: SparkSession, base_dir: str, min_date: str, max_date: str):
    rides = lake.read_table(spark, base_dir, "siri_ride")
    n_before = _nonnull(spark, base_dir, "siri_ride", "gtfs_ride_id")
    out = stride.update_rides_gtfs(
        rides,
        lake.read_table(spark, base_dir, "siri_route"),
        lake.read_table(spark, base_dir, "gtfs_route"),
        lake.read_table(spark, base_dir, "gtfs_ride"),
        min_date,
        max_date,
    )
    n, n_matched = _write_and_count(
        spark, out, base_dir, "siri_ride", "gtfs_ride_id", n_before
    )
    return {"rows": n, "matched_gtfs_rides": n_matched}


@task("siri-update-ride-stops-vehicle-locations", cadence="hourly", num_days=1)
def siri_update_ride_stops_vehicle_locations(
    spark: SparkSession, base_dir: str, min_date: str, max_date: str
):
    ride_stops = lake.read_table(spark, base_dir, "siri_ride_stop")
    n_before = _nonnull(spark, base_dir, "siri_ride_stop", "nearest_siri_vehicle_location_id")
    out = stride.update_ride_stops_vehicle_locations(
        ride_stops,
        lake.read_table(spark, base_dir, "siri_ride"),
        lake.read_table(spark, base_dir, "siri_vehicle_location"),
        lake.read_table(spark, base_dir, "gtfs_stop"),
        min_date,
        max_date,
    )
    n, n_matched = _write_and_count(
        spark, out, base_dir, "siri_ride_stop", "nearest_siri_vehicle_location_id", n_before
    )
    return {"rows": n, "matched_nearest_locations": n_matched}


def _ledger(spark: SparkSession, base_dir: str) -> DataFrame:
    if lake.table_exists(base_dir, "gtfs_data_task"):
        return lake.read_table(spark, base_dir, "gtfs_data_task")
    return spark.createDataFrame(
        [], "date date, task_name string, started_at timestamp, completed_at timestamp, "
        "error string, success boolean"
    )


def _record_ledger(
    spark: SparkSession, base_dir: str, task_name: str, outcomes: list
) -> None:
    """Append (date, task) completion rows — the reference's
    idempotent_process_gtfs_data.py:30-78 bookkeeping. Parquet append
    creates new files only, so no read-overwrite hazard. ``outcomes``:
    [(date, success, error), ...] — success and failure rows ride ONE
    append write (r9; was one tiny write job per outcome class)."""
    if not outcomes:
        return
    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    rows = [(d, task_name, now, now, error, success) for d, success, error in outcomes]
    df = spark.createDataFrame(
        rows,
        "date date, task_name string, started_at timestamp, completed_at timestamp, "
        "error string, success boolean",
    )
    df.write.mode("append").parquet(lake.table_path(base_dir, "gtfs_data_task"))


@task("gtfs-update-ride-aggregations", cadence="daily")
def gtfs_update_ride_aggregations(spark: SparkSession, base_dir: str):
    """Ledger-driven: only dates never processed or previously failed are
    (re)computed (idempotent_process_gtfs_data.py:93-124); afterwards a
    date is recorded successful only if >= 90% of its rides got non-null
    start/end (gtfs/update_ride_aggregations.py:58-74)."""
    task_name = "gtfs-update-ride-aggregations"
    g_rides = lake.read_table(spark, base_dir, "gtfs_ride")
    g_routes = lake.read_table(spark, base_dir, "gtfs_route")
    dated = g_rides.join(
        g_routes.select(F.col("id").alias("gtfs_route_id"), "date"), on="gtfs_route_id"
    )
    todo_dates = [
        r["date"]
        for r in missing_dates(
            dated.select("date").distinct(), _ledger(spark, base_dir), task_name=task_name
        ).collect()
    ]
    if not todo_dates:
        return {"dates_processed": 0}

    # One distributed pass over all todo dates (the reference loops dates;
    # Spark processes the union and the ledger records per-date outcome).
    out = stride.update_gtfs_ride_aggregations(
        g_rides, lake.read_table(spark, base_dir, "gtfs_ride_stop")
    )
    lake.overwrite_table(out, base_dir, "gtfs_ride")

    fresh = lake.read_table(spark, base_dir, "gtfs_ride").join(
        g_routes.select(F.col("id").alias("gtfs_route_id"), "date"), on="gtfs_route_id"
    )
    complete = F.when(
        F.col("start_time").isNotNull() & F.col("end_time").isNotNull(), 100.0
    ).otherwise(0.0)
    pct = {
        r["date"]: r["pct"]
        for r in fresh.where(F.col("date").isin(todo_dates))
        .groupBy("date")
        .agg(F.avg(complete).alias("pct"))
        .collect()
    }
    ok = [d for d in todo_dates if pct.get(d, 0.0) >= 90.0]
    bad = [d for d in todo_dates if d not in ok]
    _record_ledger(
        spark, base_dir, task_name,
        [(d, True, None) for d in ok]
        + [(d, False, "completeness below 90%") for d in bad],
    )
    # refresh the materialized-aggregate analogs (siri/update_rides_gtfs.py:
    # 130-137). The by_hour view is computed from the fresh ride table;
    # the non-hour view is its exact ROLLUP (num_rides = Σ per-hour
    # counts, first/last = min/max over hours — NULL start_time rows sit
    # in the NULL-hour group, so nothing is lost), read back from the
    # just-written tiny table instead of re-scanning + re-joining
    # gtfs_ride (r9: one big aggregation job per run, not two).
    by_hour_df = stride.gtfs_rides_agg(
        lake.read_table(spark, base_dir, "gtfs_ride"), g_routes, by_hour=True
    )
    lake.overwrite_table(by_hour_df, base_dir, "gtfs_rides_agg_by_hour")
    rollup = (
        lake.read_table(spark, base_dir, "gtfs_rides_agg_by_hour")
        .groupBy("date", "gtfs_route_id", "line_ref")
        .agg(
            F.sum("num_rides").alias("num_rides"),
            F.min("first_ride_start").alias("first_ride_start"),
            F.max("last_ride_start").alias("last_ride_start"),
        )
    )
    lake.overwrite_table(rollup, base_dir, "gtfs_rides_agg")
    return {"dates_processed": len(todo_dates), "dates_ok": len(ok), "dates_failed": len(bad)}


def _hour_key(hour: datetime.datetime) -> str:
    return hour.strftime("%Y-%m-%d.%H")


def _flat_export_hourly(
    spark: SparkSession, base_dir: str, lo: str, hi: str
) -> DataFrame:
    """The packager's wide frame over [lo, hi) with an `_hour` label —
    the shared source of both packager tasks' per-hour hash/write jobs."""
    return stride.siri_flat_export(
        lake.read_table(spark, base_dir, "siri_vehicle_location"),
        lake.read_table(spark, base_dir, "siri_ride_stop"),
        lake.read_table(spark, base_dir, "siri_ride"),
        lake.read_table(spark, base_dir, "siri_route"),
        lake.read_table(spark, base_dir, "siri_stop"),
        lake.read_table(spark, base_dir, "gtfs_stop"),
        lo,
        hi,
    ).withColumn(
        "_hour", F.date_format(F.date_trunc("hour", "recorded_at_time"), "yyyy-MM-dd.HH")
    )


def _hour_hashes(wide: DataFrame) -> dict[str, tuple[int, int]]:
    """ONE aggregation job → {hour_key: (content_hash, row_count)} for
    every hour present in ``wide``. Hash formula identical to
    csv_package.write_package's observed metrics (sum of per-row
    md5-longs + count, order-insensitive)."""
    from ..functions.hashing import hex_to_long, row_md5  # noqa: PLC0415

    data_cols = [c for c in wide.columns if c != "_hour"]
    h = hex_to_long(F.substring(row_md5(*[F.col(c) for c in data_cols]), 1, 10))
    return {
        r["_hour"]: ((r["h"] or 0) + r["n"], r["n"])
        for r in wide.groupBy("_hour")
        .agg(F.sum(h).alias("h"), F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _write_hour_packages(
    wide: DataFrame,
    hours: list[str],
    hashes: dict[str, tuple[int, int]],
    out_dir: str,
    zip_it: bool,
) -> None:
    """Materialize `{hour}.csv` + manifest (+zip) for every hour in
    ``hours`` from ONE partitioned CSV write (`repartition("_hour")`
    routes each hour to exactly one shuffle partition, `partitionBy`
    yields one directory per hour), then stitch each hour's shards
    driver-side — the backfill's two-job shape, shared with the hourly
    sweep so a catch-up sweep does not pay one Spark job per hour.
    Artifact bytes and manifests are identical to write_package's
    (same header handling, same manifest builder, same zip params)."""
    import glob  # noqa: PLC0415
    import json  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415
    import zipfile  # noqa: PLC0415

    from ..sources.csv_package import build_manifest  # noqa: PLC0415

    data_cols = [c for c in wide.columns if c != "_hour"]
    fields = [
        {"name": c, "type": wide.schema[c].dataType.simpleString()} for c in data_cols
    ]
    os.makedirs(out_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="pkg_hours_")
    try:
        (
            wide.where(F.col("_hour").isin(hours))
            .repartition("_hour")
            .write.mode("overwrite")
            .option("header", True)
            .partitionBy("_hour")
            .csv(tmp)
        )
        for hour in hours:
            hdir = os.path.join(tmp, f"_hour={hour}")
            parts = sorted(glob.glob(os.path.join(hdir, "part-*.csv")))
            csv_path = os.path.join(out_dir, f"{hour}.csv")
            with open(csv_path, "wb") as out:
                out.write((",".join(f["name"] for f in fields) + "\n").encode())
                for p in parts:
                    with open(p, "rb") as fh:
                        fh.readline()  # per-shard header
                        shutil.copyfileobj(fh, out)
            # The manifest row count is the EXACT aggregation count from
            # _hour_hashes (the same job that produced the hash), never a
            # physical-line count of the stitched file: a string field
            # containing a newline is RFC-4180-quoted by Spark's CSV
            # writer and spans multiple physical lines (r10 — the hourly
            # sweep briefly line-counted here and would have overcounted).
            manifest = build_manifest(hour, fields, hashes.get(hour, (0, 0))[1], hashes.get(hour, (0, 0))[0])
            mpath = os.path.join(out_dir, f"{hour}-metadata.json")
            with open(mpath, "w") as fh:
                json.dump(manifest, fh, indent=1, sort_keys=True)
            if zip_it:
                zpath = os.path.join(out_dir, f"{hour}.zip")
                with zipfile.ZipFile(
                    zpath, "w", zipfile.ZIP_DEFLATED, compresslevel=9
                ) as zf:
                    zf.write(csv_path, f"{hour}.csv")
                    zf.write(mpath, f"{hour}-metadata.json")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@task("siri-hourly-update-packages", cadence="daily", force_days=5, chunk_hours=168)
def siri_hourly_update_packages(
    spark: SparkSession,
    base_dir: str,
    out_dir: str | None = None,
    force_days: int = 5,
    max_hours: int | None = None,
    budget_seconds: int = 36000,
    chunk_hours: int = 168,
):
    """Hour sweep, newest first (packagers/siri.py:206-240): each hour's
    flat export becomes one package. Hours older than ``force_days`` that
    already have a manifest are skipped without recompute (:218's
    force-refresh horizon); otherwise the content-hash compare decides
    created/updated/skipped (:194-202). ``budget_seconds`` is the
    reference's 10h wall-clock budget (:216).

    Execution shape (r9; guide §2.4 — the loop's DECISIONS are per-hour
    and manifest-driven, exactly the reference's control flow, but its
    Spark work is batched): the sweep first resolves every hour's
    short-circuit verdict from the manifests alone (no Spark job), then
    ONE aggregation computes the content hash of every remaining hour
    (was: one hash/write job per hour — 11 created hours cost 11 serial
    jobs ≈ 0.9 s each at sf0.1), classifies each against its manifest
    (created / updated / skipped — same decisions row-for-row), and ONE
    partitioned write materializes just the changed hours. The
    wall-clock budget bounds the sweep enumeration as before, AND
    (r10) the batched Spark work itself: hours needing a hash compare
    are processed in ``chunk_hours`` chunks (newest first), with the
    budget re-checked before every chunk's hash/write jobs — a catch-up
    sweep over an unbounded backlog stops mid-sweep like the
    reference's per-hour loop instead of running its whole enumerated
    window past the budget. Within one chunk the shape is unchanged
    (one hash aggregation + one partitioned write), so an in-budget
    window no larger than ``chunk_hours`` pays exactly the r9 job
    count; each chunk's flat export carries its own [lo, hi) range so
    parquet pushdown prunes per chunk. Hours enumerated but left
    unprocessed by an exhausted budget contribute to ``hours_scanned``
    only — their created/updated/skipped/empty outcomes are simply not
    decided this run, matching the reference's stop-where-you-are
    contract."""
    out_dir = out_dir or os.path.join(base_dir, "packages")
    locations = lake.read_table(spark, base_dir, "siri_vehicle_location")

    bounds = locations.agg(
        F.date_trunc("hour", F.min("recorded_at_time")).alias("lo"),
        F.date_trunc("hour", F.max("recorded_at_time")).alias("hi"),
    ).collect()[0]
    if bounds["lo"] is None:
        return {"hours_scanned": 0}
    force_cutoff = bounds["hi"] - datetime.timedelta(days=force_days)

    t0 = time.time()
    counts = {"created": 0, "updated": 0, "skipped": 0, "skipped_exists": 0, "empty": 0}
    hour = bounds["hi"]
    scanned = 0
    need: list[datetime.datetime] = []  # newest-first, hash compare required
    while hour >= bounds["lo"]:
        if time.time() - t0 > budget_seconds or (max_hours and scanned >= max_hours):
            break
        if hour < force_cutoff and read_manifest(out_dir, _hour_key(hour)) is not None:
            counts["skipped_exists"] += 1
        else:
            need.append(hour)
        scanned += 1
        hour -= datetime.timedelta(hours=1)

    step = max(1, int(chunk_hours))
    for i in range(0, len(need), step):
        if time.time() - t0 > budget_seconds:
            break  # budget exhausted between chunks: stop mid-sweep
        sub = need[i : i + step]
        # Range predicate keeps parquet pushdown (per chunk); the isin
        # filter drops any interior skipped_exists hours from the jobs.
        wide = _flat_export_hourly(
            spark, base_dir,
            str(min(sub)), str(max(sub) + datetime.timedelta(hours=1)),
        )
        keys = [_hour_key(h) for h in sub]
        wide = wide.where(F.col("_hour").isin(keys))
        hashes = _hour_hashes(wide)
        to_write: list[str] = []
        for key in keys:
            chash, n = hashes.get(key, (0, 0))
            existing = read_manifest(out_dir, key)
            if existing is None:
                if n == 0:
                    counts["empty"] += 1  # no rows, nothing published
                else:
                    counts["created"] += 1
                    to_write.append(key)
            elif existing.get("hash") == chash:
                counts["skipped"] += 1
            else:
                counts["updated"] += 1
                to_write.append(key)
        if to_write:
            _write_hour_packages(wide, to_write, hashes, out_dir, zip_it=True)
    return {"hours_scanned": scanned, **counts}


@task("siri-packages-backfill", cadence="daily")
def siri_packages_backfill(
    spark: SparkSession, base_dir: str, out_dir: str | None = None
):
    """The packager backfill as ONE distributed job instead of an hour
    loop (SURVEY.md §3.3: "the whole backfill can also run as one job
    partitioned by hour"). Two Spark jobs total for ANY number of hours:

    1. one aggregation computes every hour's order-insensitive content
       hash (the same sum-of-md5-longs as csv_package);
    2. one partitioned write materializes ONLY the hours whose hash
       differs from their existing manifest.

    The newest-first loop (siri-hourly-update-packages) remains the
    incremental path; this is the catch-up path, where per-hour loop
    latency (2 jobs x N hours) would dominate at scale. Hash / write /
    stitch machinery is shared with the hourly sweep (r9:
    `_hour_hashes` / `_write_hour_packages`)."""
    out_dir = out_dir or os.path.join(base_dir, "packages")
    wide = _flat_export_hourly(spark, base_dir, "1970-01-01", "9999-01-01")
    hashes = _hour_hashes(wide)
    changed = [
        hour
        for hour, (chash, _n) in hashes.items()
        if (read_manifest(out_dir, hour) or {}).get("hash") != chash
    ]
    counts = {"hours_total": len(hashes), "skipped": len(hashes) - len(changed), "written": 0}
    if not changed:
        return counts
    _write_hour_packages(wide, changed, hashes, out_dir, zip_it=True)
    counts["written"] = len(changed)
    return counts


@task("update-areas-fake-gtfs", cadence="daily")
def update_areas_fake_gtfs(
    spark: SparkSession,
    base_dir: str,
    areas_file: str | None = None,
    out_dir: str | None = None,
    days: int = 32,
    only_area: str | None = None,
    only_hours: str | None = None,
    limit_fake_gtfs_processed: int | None = None,
    today: datetime.date | None = None,
):
    """urbanaccess/update_areas_fake_gtfs.py:28-72 — per configured area
    (bbox), per configured Israel-local hour window, per date of a
    backward sweep, ensure a "fake GTFS" artifact exists, keyed
    ``{area}-{date}-{start_hour_utc:02}-{end_hour_utc:02}`` with
    bbox-change invalidation (an existing artifact whose metadata bbox
    differs from the config is treated as absent and recreated,
    reference :37-39). The bbox predicate is a pure column filter
    (SURVEY.md §2.2 P9); the YAML area config (areas.yaml:1-17) is the
    S13 config source; ``only_area``/``only_hours``/
    ``limit_fake_gtfs_processed`` mirror the reference CLI params
    (:62-72). Actual GTFS synthesis is external to the reference too
    (stride-client's create_fake_gtfs); the data-plane stand-in is the
    per-date bbox stop extract.

    Scale/shape notes vs the reference's N+1 loop: the existing-artifact
    probe reads the registry ONCE and resolves every key driver-side
    (the registry is control-plane small), instead of one lookup query
    per (area, window, date); and all missing dates of an area are
    extracted in ONE partitioned Spark job, then packaged per artifact
    from the partition files. Steady-state runs skip everything without
    touching the data plane.

    Config shapes: the reference's areas.yaml (``bbox: "min_lon,
    min_lat, max_lon, max_lat"`` string + ``hours: [[8, 12], ...]``
    Israel-local inclusive windows) runs the full sweep; the simple
    ``{min_lon: ..}`` dict shape (no hours) keeps the legacy single
    whole-table package per area."""
    import glob  # noqa: PLC0415
    import json  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415
    import zipfile  # noqa: PLC0415

    from ..functions.timeutil import israel_hour_to_utc_hour  # noqa: PLC0415
    from ..sources.artifacts import read_registry  # noqa: PLC0415

    areas = _load_areas(areas_file)
    out_dir = out_dir or os.path.join(base_dir, "fake_gtfs")
    gtfs_stops = lake.read_table(spark, base_dir, "gtfs_stop")
    metrics: dict = {}
    only_hw = (
        tuple(int(x.strip()) for x in only_hours.split(",")) if only_hours else None
    )

    # Legacy simple-shape areas (flat bbox dict, no hour windows).
    for name, cfg in areas.items():
        if "bbox" in cfg or (only_area and name != only_area):
            continue
        in_box = gtfs_stops.where(
            F.col("lon").between(cfg["min_lon"], cfg["max_lon"])
            & F.col("lat").between(cfg["min_lat"], cfg["max_lat"])
        )
        res = publish_if_changed(in_box, os.path.join(out_dir, name), f"{name}-fake-gtfs")
        if res["status"] != "skipped":
            register_artifact(
                spark,
                base_dir,
                f"fake-gtfs-{name}",
                os.path.join(out_dir, name, f"{name}-fake-gtfs.zip"),
                metadata={"area": name, **cfg, "rows": res["row_count"]},
            )
        metrics[name] = {"status": res["status"], "rows": res["row_count"]}

    sweep_areas = {
        name: cfg
        for name, cfg in areas.items()
        if "bbox" in cfg and not (only_area and name != only_area)
    }
    if not sweep_areas:
        return {"areas": metrics}

    today = today or datetime.date.today()
    # One registry read; newest metadata per prefix resolved driver-side.
    reg = {
        r["file_prefix"]: r["metadata_json"]
        for r in read_registry(spark, base_dir)
        .where(F.col("status") == "uploaded")
        .orderBy("created_at")  # later rows overwrite: newest wins
        .select("file_prefix", "metadata_json")
        .collect()
    }
    stats = {"fake_gtfs_processed": 0, "skipped": 0, "invalidated": 0}
    todo: dict[str, list] = {}  # area -> [(date, sh_utc, eh_utc, prefix)]
    for area_id, cfg in sweep_areas.items():
        bbox = [float(x.strip()) for x in cfg["bbox"].split(",")]
        for sh, eh in cfg.get("hours", [[0, 23]]):
            if only_hw and (sh, eh) != only_hw:
                continue
            sh_utc = israel_hour_to_utc_hour(sh, today)
            eh_utc = israel_hour_to_utc_hour(eh, today)
            for i in range(1, int(days) + 1):
                d = today - datetime.timedelta(days=i)
                prefix = (
                    f"urbanaccess/areas_fake_gtfs/"
                    f"{area_id}-{d.isoformat()}-{sh_utc:02d}-{eh_utc:02d}"
                )
                meta = reg.get(prefix)
                if meta is not None:
                    if json.loads(meta).get("bbox") == bbox:
                        stats["skipped"] += 1
                        continue
                    stats["invalidated"] += 1  # bbox changed: recreate
                todo.setdefault(area_id, []).append((d, sh_utc, eh_utc, prefix))

    budget = int(limit_fake_gtfs_processed) if limit_fake_gtfs_processed else None
    for area_id, items in todo.items():
        if budget is not None and stats["fake_gtfs_processed"] >= budget:
            break
        if budget is not None:
            items = items[: budget - stats["fake_gtfs_processed"]]
        bbox = [float(x.strip()) for x in sweep_areas[area_id]["bbox"].split(",")]
        dates = sorted({d for d, *_ in items})
        min_lon, min_lat, max_lon, max_lat = bbox
        extract = gtfs_stops.where(
            F.col("lon").between(min_lon, max_lon)
            & F.col("lat").between(min_lat, max_lat)
            & F.col("date").isin([str(d) for d in dates])
        )
        tmp = tempfile.mkdtemp(prefix=f"fake_gtfs_{area_id}_")
        try:
            (
                extract.withColumn("_d", F.col("date").cast("string"))
                .repartition("_d")
                .write.mode("overwrite")
                .option("header", True)
                .partitionBy("_d")
                .csv(tmp)
            )
            for d, sh_utc, eh_utc, prefix in items:
                parts = sorted(glob.glob(os.path.join(tmp, f"_d={d}", "part-*.csv")))
                zpath = os.path.join(tmp, f"{os.path.basename(prefix)}.zip")
                with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
                    for j, p in enumerate(parts):
                        zf.write(p, f"stops-{j}.csv")
                register_artifact(
                    spark,
                    base_dir,
                    prefix,
                    zpath,
                    metadata={
                        "area_id": area_id,
                        "start_hour_utc": sh_utc,
                        "end_hour_utc": eh_utc,
                        "bbox": bbox,
                    },
                )
                stats["fake_gtfs_processed"] += 1
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return {"areas": metrics, **stats}


def _load_areas(areas_file: str | None) -> dict:
    """Area bboxes from YAML (if available) or JSON; the reference ships
    areas.yaml with (min_lon, min_lat, max_lon, max_lat) per area."""
    if areas_file is None:
        return {}
    with open(areas_file) as fh:
        text = fh.read()
    try:
        import yaml  # noqa: PLC0415

        return yaml.safe_load(text)
    except ImportError:
        import json as _json  # noqa: PLC0415

        return _json.loads(text)


@task("siri-storage-backup-cleanup", cadence="daily", older_than_days=7)
def siri_storage_backup_cleanup(
    spark: SparkSession, base_dir: str, storage_root: str | None = None,
    backup_dir: str | None = None, older_than_days: int = 7,
):
    """siri/storage_backup_cleanup.py:46-73 — archive dated raw-SIRI dirs
    older than the retention window to the backup store, prune locals."""
    from ..sources.artifacts import backup_and_cleanup  # noqa: PLC0415

    storage_root = storage_root or os.path.join(base_dir, "siri-storage")
    backup_dir = backup_dir or os.path.join(base_dir, "siri-storage-backup")
    if not os.path.isdir(storage_root):
        return {"archived_days": 0, "pruned_dirs": 0}
    return backup_and_cleanup(storage_root, backup_dir, older_than_days=older_than_days)


@task("db-copy-backup", cadence="daily")
def db_copy_backup(spark: SparkSession, base_dir: str, src_path: str):
    """db/copy_backup_to_s3.py:16-26 — copy a DB dump into the artifact
    store under a collision-free name (the __{i} suffix probe) and record
    it in the registry."""
    r = register_artifact(spark, base_dir, "db-backup", src_path)
    return {"url": r["url"], "file_size": r["file_size"]}


@task("stats-collect", cadence="daily", validate=False)
def stats_collect(spark: SparkSession, base_dir: str, validate: bool = False):
    """stats/api.py:18-117 — snapshot status counts + freshness; with
    ``validate`` the task raises (exit 1) when the newest snapshot is
    older than 1 hour."""
    snaps = lake.read_table(spark, base_dir, "siri_snapshot")
    counts = status_counts(snaps, "etl_status")
    metrics = {"snapshot_status_counts": counts}
    if validate:
        metrics["freshness_age_sec"] = validate_freshness(snaps, 3600)
    return metrics


@task("lake-compact", cadence="daily", target_mb=128)
def lake_compact(
    spark: SparkSession,
    base_dir: str,
    dataset: str,
    target_mb: int = 128,
    sort_cols: str = "",
):
    """Small-file compaction for a lake dataset (no reference analog —
    Postgres has autovacuum; a parquet lake needs this pass after
    incremental/streaming writers fragment a table). Delegates to
    sources/fs.py:compact_parquet; ``sort_cols`` (comma-separated)
    additionally clusters rows so parquet min/max stats support range
    pruning."""
    from ..sources.fs import compact_parquet, join_path  # noqa: PLC0415

    cols = [c.strip() for c in sort_cols.split(",") if c.strip()]
    return compact_parquet(
        spark,
        join_path(base_dir, dataset),
        target_file_bytes=target_mb << 20,
        sort_cols=cols or None,
    )
