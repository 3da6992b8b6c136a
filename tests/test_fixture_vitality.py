"""Fixture-vitality guards for the stride-DAG invariance fixture.

The driver oracle proves Spark == DuckDB on whatever the synthetic lake
CONTAINS — so a silent fixture drift that empties a planted
contract-edge class (no more rides without telemetry, no more journey-
or scheduled-strategy matches, every stop suddenly matchable) would
keep both engines agreeing while stride_dag_convergence quietly stops
pinning that contract. These tests run the real four-task chain ONCE
at the smallest sf and assert every planted class is non-empty AND a
strict subset of its universe — the property the cross-engine equality
cannot see. See q_stride_dag._build_lake's mod-class docstring for the
planting map (reference tasks: siri/add_ride_durations.py,
siri/update_rides_gtfs.py:80-97, siri/update_ride_stops_gtfs.py,
siri/update_ride_stops_vehicle_locations.py).
"""

import pytest
from pyspark.sql import functions as F

from open_bus_stride_etl_spark.plans import q_stride_dag as qsd
from open_bus_stride_etl_spark.plans import stride_tasks  # noqa: F401 - registers tasks
from open_bus_stride_etl_spark.plans.tasks import run_task
from open_bus_stride_etl_spark.sources import stride_lake as lake


@pytest.fixture(scope="module")
def enriched(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("dag_vitality"))
    qsd._build_lake(spark, sf_dir, base)
    window = {"min_date": "2024-03-01", "max_date": "2024-03-15"}
    run_task(
        spark, "siri-add-ride-durations", base_dir=base, now_ts=qsd.NOW_TS, **window
    )
    run_task(spark, "siri-update-rides-gtfs", base_dir=base, **window)
    run_task(spark, "siri-update-ride-stops-gtfs", base_dir=base, **window)
    run_task(
        spark, "siri-update-ride-stops-vehicle-locations", base_dir=base, **window
    )
    rides = lake.read_table(spark, base, "siri_ride")
    stops = lake.read_table(spark, base, "siri_ride_stop")
    return rides.toPandas(), stops.toPandas()


def test_ride_contract_classes_all_populated(enriched):
    rides, _ = enriched
    n = len(rides)
    assert n > 0
    marker = rides["updated_duration_minutes"].notna().sum()
    duration = rides["duration_minutes"].notna().sum()
    route = rides["route_gtfs_ride_id"].notna().sum()
    journey = rides["journey_gtfs_ride_id"].notna().sum()
    sched = rides["scheduled_time_gtfs_ride_id"].notna().sum()
    gtfs = rides["gtfs_ride_id"].notna().sum()
    # the still-todo class (todo AND no-telemetry, rid % 51 == 0) must
    # survive the run: convergence over re-processed NULLs is the A4
    # contract the query exists to pin
    assert 0 < marker < n, (marker, n)
    # durations settle for telemetry rides only — both sides non-empty
    assert 0 < duration < n, (duration, n)
    # every gtfs match strategy must win somewhere (J4 route tiers,
    # journey key, exact scheduled time) AND the no-match fall-through
    # class must stay non-empty
    assert route > 0
    assert journey > 0
    assert sched > 0
    assert 0 < gtfs < n, (gtfs, n)


# The packager fixture's planted empty hour (rid % 48 == 43) needs
# rid >= 43, i.e. >= 2150 events — present from sf0.01 (the driver's
# correctness-gate scale, where vitality matters) but not at sf0.001's
# 1k events. Pin these two tests to the gate scale.
PKG_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def packaged(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("pkg_vitality"))
    qsd._build_packager_lake(spark, PKG_SF_DIR, base)
    out = f"{base}/packages"
    m1 = run_task(spark, "siri-packages-backfill", base_dir=base, out_dir=out)
    wide = (
        spark.read.option("header", True).csv(f"{out}/*.csv").toPandas()
    )
    return out, m1, wide


def test_packager_contract_classes_all_populated(packaged):
    out, m1, wide = packaged
    import glob
    import os

    # the planted telemetry-less slot (rid % 48 == 43 -> hour
    # 2024-03-02T19) must publish NOTHING while its neighbours publish
    assert not os.path.exists(os.path.join(out, "2024-03-02.19-metadata.json"))
    assert os.path.exists(os.path.join(out, "2024-03-02.18-metadata.json"))
    assert os.path.exists(os.path.join(out, "2024-03-02.20-metadata.json"))
    assert int(m1["written"]) > 1
    n = len(wide)
    assert n > 0
    # NULL-ts pings are excluded: fewer rows than 3 pings x 2 stops
    # per ride would produce if nothing were planted
    n_rides = wide["ride_id"].nunique()
    assert n < 6 * n_rides
    # left-join NULL classes reach the artifact (empty CSV fields) and
    # their populated counterparts exist too
    for col in ("stop_name", "duration_minutes"):
        assert 0 < wide[col].notna().sum() < n, col


def test_hourly_loop_outcome_classes_all_fire(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("hourly_vitality"))
    qsd._build_packager_lake(spark, PKG_SF_DIR, base)
    kw = {
        "base_dir": base,
        "out_dir": f"{base}/packages",
        "force_days": 0,
        "max_hours": 12,
    }
    m1 = run_task(spark, "siri-hourly-update-packages", **kw)
    m2 = run_task(spark, "siri-hourly-update-packages", **kw)
    # run 1: creations AND the planted empty slot
    assert int(m1["created"]) >= 2
    assert int(m1["empty"]) >= 1
    # run 2: both skip classes fire, nothing is written
    assert int(m2["skipped"]) >= 1
    assert int(m2["skipped_exists"]) >= 1
    assert int(m2["empty"]) >= 1
    assert int(m2["created"]) == 0 and int(m2["updated"]) == 0


def test_ride_stop_contract_classes_all_populated(enriched):
    _, stops = enriched
    n = len(stops)
    assert n > 0
    matched = stops["gtfs_stop_id"].notna().sum()
    nearest = stops["nearest_siri_vehicle_location_id"].notna().sum()
    # sid > 35 stops have no GTFS counterpart: both matched and
    # unmatched classes must be present
    assert 0 < matched < n, (matched, n)
    # no-telemetry rides' stops never get a nearest location; the rest do
    assert 0 < nearest < n, (nearest, n)


def test_curate_drop_reason_classes_all_fire(spark, tmp_path_factory):
    """Every curation drop REASON must be exercised by the gate-scale
    corpus: quality/lang filtering, exact-dup keeper pruning, and LSH
    near-dup loser pruning. curate_incremental_noop's oracle equality
    holds even if the corpus drifts to exercise none of them."""
    import shutil

    from open_bus_stride_etl_spark.plans import llm_tasks  # noqa: F401

    import pyspark.sql.functions as F

    base = str(tmp_path_factory.mktemp("curate_vitality"))
    # the same staging curate_incremental_noop uses: documents + full-
    # text clones (the shared corpus plants only PREFIX dups, so the
    # keeper branch needs the clones to be non-vacuous)
    docs = qsd.load_table(spark, PKG_SF_DIR, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    clones = docs.where(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + F.lit(max_id)).alias("doc_id"), "text"
    )
    docs.unionByName(clones).write.mode("overwrite").parquet(
        f"{base}/documents.parquet"
    )
    m = run_task(spark, "llm-curate-corpus", base_dir=base, out_dir=f"{base}/out")
    assert int(m["n_final"]) > 0
    assert int(m["n_quality_lang"]) < int(m["n_total"])      # quality/lang drops
    assert int(m["n_after_exact"]) < int(m["n_quality_lang"])  # exact dups
    assert int(m["n_near_dup_dropped"]) > 0                  # LSH near-dups
    shutil.rmtree(base, ignore_errors=True)


def test_planted_query_classes_fire_at_gate_scale(spark):
    """The r9 in-query derivations (boundary pings, PII, multilingual
    suffixes, the PNG matrix) must stay non-vacuous at the driver's
    sf0.01 gate — if a planted class empties, both engines agree on the
    degenerate value and the green row stops pinning the contract."""
    from pyspark.sql import functions as F

    from open_bus_stride_etl_spark.plans import registry

    qs = registry.queries()
    sf = PKG_SF_DIR

    hw = qs["time_window_halfopen"](spark, sf)
    lo = F.lit("2024-01-10 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-11 00:00:00").cast("timestamp")
    assert hw.where(F.col("ts") == lo).count() > 0  # inclusive edge
    assert hw.where(F.col("ts") == hi).count() == 0  # exclusive edge

    pii = qs["pii_redaction_stats"](spark, sf).agg(
        F.sum("n_emails").alias("e"), F.sum("n_phones").alias("p")
    ).first()
    assert pii.e > 0 and pii.p > 0

    langs = {
        r.predicted_lang
        for r in qs["lang_id"](spark, sf).select("predicted_lang").distinct().collect()
    }
    assert {"en", "und", "es", "de", "fr"} <= langs, langs

    mm = qs["multimodal_decode_stats"](spark, sf)
    chans = {r.n_channels for r in mm.select("n_channels").distinct().collect()}
    assert {None, 1, 2, 3, 4} <= chans, chans  # corrupt + all color types

    # source balancing must actually drop rows (the driver corpus is
    # perfectly balanced, so without the derived skew rate_bp == 10000
    # everywhere and the mechanism was a no-op)
    docs_n = qsd.load_table(spark, sf, "documents").count()
    bal = qs["balanced_corpus"](spark, sf)
    assert 0 < bal.count() < docs_n
    assert bal.where(F.col("source") == "even").count() > 0  # skew class kept some


def test_shard_export_every_shard_populated(spark, sf_dir):
    """All 8 shards of the training export must be non-empty: an empty
    shard would hash-match the analytic oracle (both sides predict the
    same degenerate assignment), but a training loader reading the
    artifact would see a missing partition."""
    from open_bus_stride_etl_spark.plans import registry

    rows = registry.queries()["shard_export_invariance"](spark, sf_dir).collect()
    assert len(rows) == 8, rows
    assert min(r["n_docs"] for r in rows) > 0, rows


def test_watermark_late_drop_classes_fire(spark):
    """streaming_watermark_late_drop's boundary classes must all be
    observable at the driver gate scale: the data-derived dropped-late
    clones, both watermark-boundary plantings (filter end<=wm drop,
    eviction end<=final_wm emit), the kept-late rows, and the withheld
    open window. If any class empties, both engines agree on the
    degenerate value and the green row stops pinning the contract."""
    import datetime as dt

    from open_bus_stride_etl_spark.plans import registry
    from open_bus_stride_etl_spark.sources.lake import load_table

    sf = PKG_SF_DIR
    ev = load_table(spark, sf, "events").where(F.col("ts").isNotNull())
    n_b0 = ev.where(F.col("user_id") % 5 == 0).count()
    n_clones = ev.where(F.col("user_id") % 10 == 0).count()
    assert n_clones > 0  # the data-derived dropped-late class is non-empty
    h0 = (
        ev.where(F.col("user_id") % 5 == 0)
        .agg(F.date_trunc("hour", F.max("ts")).alias("h"))
        .first()["h"]
    )
    a = h0 + dt.timedelta(hours=8)
    w = a - dt.timedelta(hours=6)
    out = (
        registry.queries()["streaming_watermark_late_drop"](spark, sf)
        .toPandas()
        .set_index("window_start")
    )
    # filter boundary: the window ending exactly AT the watermark holds
    # only the planted -2/-3 rows, both dropped -> window absent
    assert w - dt.timedelta(hours=1) not in out.index
    # kept-late class fires (marker -4 merged with late-but-live -5)
    assert out.loc[w].n_rows == 2 and out.loc[w].sum_ids == -9
    assert out.loc[w + dt.timedelta(hours=1)].sum_ids == -6
    # eviction boundary: window ending exactly at the final watermark emitted
    assert out.loc[a + dt.timedelta(hours=17)].sum_ids == -8
    # append mode withholds the far-future driver's still-open window
    assert a + dt.timedelta(hours=24) not in out.index
    # exact ledger: batch-0 sample + anchor + the four kept plantings,
    # nothing more (every clone and the -2/-3/-7 plantings dropped)
    assert out.n_rows.sum() == n_b0 + 5


def test_corpus_clean_verdict_classes_all_fire(spark):
    """corpus_clean_verdicts must exercise every curation outcome at
    the driver gate scale — 'lang' via the planted es/de/fr suffixes
    (each language individually), 'exact_dup' via the planted
    full-text clones, plus data-carried 'quality'/'near_dup'/'keep'.
    An empty class means both engines agree on a branch that never
    fires and the green row stops pinning it."""
    from open_bus_stride_etl_spark.plans import registry

    out = registry.queries()["corpus_clean_verdicts"](spark, PKG_SF_DIR)
    counts = {r["verdict"]: r["n"] for r in out.groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    for cls in ("keep", "quality", "lang", "exact_dup", "near_dup"):
        assert 0 < counts.get(cls, 0) < total, (cls, counts)
    langs = {
        r["predicted_lang"]
        for r in out.where(F.col("verdict") == "lang")
        .select("predicted_lang").distinct().collect()
    }
    assert {"es", "de", "fr"} <= langs, langs


def test_builder_staging_layout_and_parallel_flush(spark, sf_dir, tmp_path_factory):
    """r9 staging optimization guard: the literal-range dim tables must
    stay SINGLE-FILE (numPartitions=1 — 32 one-row-ish files per tiny
    dim was pure task/listing overhead for every downstream task read)
    and the parallel flush must still materialize EVERY table of the
    build (a dropped pair would only surface as a downstream
    read-failure otherwise)."""
    import os

    base = str(tmp_path_factory.mktemp("stage_layout"))
    qsd._build_lake(spark, sf_dir, base)
    all_tables = [
        "siri_ride", "siri_route", "siri_ride_stop", "siri_stop",
        "siri_vehicle_location", "gtfs_stop", "gtfs_route", "gtfs_ride",
    ]
    for t in all_tables:
        assert lake.table_exists(base, t), t
    for dim in ("siri_route", "siri_stop", "gtfs_stop", "gtfs_route"):
        parts = [
            f for f in os.listdir(lake.table_path(base, dim))
            if f.startswith("part-")
        ]
        assert len(parts) == 1, (dim, parts)
