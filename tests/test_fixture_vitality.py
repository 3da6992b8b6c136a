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
