"""Legacy CSV import: the UD2 row-mapper semantics as expressions —
field fallbacks, Israel localization, journey-ref synthesis, empty-string
canonicalization, per-key unique ids."""

import datetime

from pyspark.sql import Row

from open_bus_stride_etl_spark.plans.legacy import legacy_import


def _raw(spark):
    rows = [
        # full row, summer date (IDT = UTC+3)
        Row(snapshot_key="2023/07/01/10", date="2023-07-01", date_recorded="2023-07-01",
            time_recorded="10:30:00", planned_start_date="", planned_start_time="10:00:00",
            predicted_end_date="2023-07-01", predicted_end_time="11:00:00",
            service_id=" 123 ", bus_id="B1", stop_point_ref="S9", agency_id="3",
            route_id="77", route_short_name="r77", lat="32.1", lon="34.8",
            num_duplicates="2"),
        # ragged row: date_recorded empty -> falls back to date; blank
        # service_id -> '0'; missing stop ref -> ''
        Row(snapshot_key="2023/07/01/10", date="2023-01-15", date_recorded="",
            time_recorded="08:00:00", planned_start_date="", planned_start_time="07:45:00",
            predicted_end_date="", predicted_end_time="08:30:00",
            service_id="", bus_id="B2", stop_point_ref="", agency_id="3",
            route_id="78", route_short_name="r78", lat="32.2", lon="34.9",
            num_duplicates=""),
    ]
    return spark.createDataFrame(rows)


def test_legacy_import_semantics(spark):
    out = {r["siri_vehicle_ref"]: r for r in legacy_import(_raw(spark)).collect()}

    r1 = out["B1"]
    # Israel summer local 10:30 -> 07:30 UTC
    assert r1["recorded_at_time"] == datetime.datetime(2023, 7, 1, 7, 30)
    # planned_start_date empty -> falls back to `date`
    assert r1["siri_scheduled_start_time"] == datetime.datetime(2023, 7, 1, 7, 0)
    assert r1["siri_journey_ref"] == "2023-07-01-123"  # service_id trimmed
    assert r1["siri_stop_code"] == "S9"
    assert r1["num_duplicates"] == "2"
    assert r1["date"] == datetime.date(2023, 7, 1)

    r2 = out["B2"]
    # winter date (IST = UTC+2) via the date fallback
    assert r2["recorded_at_time"] == datetime.datetime(2023, 1, 15, 6, 0)
    assert r2["siri_journey_ref"] == "2023-01-15-0"  # blank service -> 0
    assert r2["siri_stop_code"] == "" and r2["num_duplicates"] == ""

    # ids: unique, prefixed by the snapshot key
    ids = {r["id"] for r in out.values()}
    assert len(ids) == 2 and all(i.startswith("2023/07/01/10-") for i in ids)
    assert {r1["siri_snapshot_id"], r2["siri_snapshot_id"]} == {"2023/07/01/10"}
