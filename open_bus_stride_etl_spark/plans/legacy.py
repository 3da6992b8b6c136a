"""Legacy SIRI CSV import: the reference's per-row Python mapper as a
pure column-expression set (SURVEY.md §2.10 UD2).

Reference: /root/reference/open_bus_stride_etl/packagers/siri.py —
``legacy_process_row`` (:265-286) renames/derives 15 output fields from
a raw legacy CSV row, synthesizes an id from the package key + row
index, and Israel-localizes the naive date+time fields
(``legacy_get_datetime_field`` :243-257, first non-empty date column +
first non-empty time column; ``legacy_get_siri_journey_ref`` :260-262,
``'{date}-{service_id or 0}'``).

Here the whole mapper is ~15 Column expressions — no Python in the loop,
so the import runs at scan speed and whole-stage codegen applies. The
synthesized id uses a per-key row_number over a deterministic ordering
(the reference's enumerate order is its CSV file order, which a
distributed read cannot and should not promise; uniqueness is the
contract)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import ISRAEL_TZ


def _nonempty(col: str) -> Column:
    """'' and missing both mean absent (legacy CSVs are ragged)."""
    c = F.col(col)
    return F.when(c.isNotNull() & (F.trim(c) != ""), F.trim(c))


def legacy_datetime(df_cols: list[str], date_fields: list[str], time_fields: list[str]) -> Column:
    """First non-empty date field + first non-empty time field, parsed
    as a naive Israel-local timestamp and converted to the UTC instant
    (the reference's pytz localize + isoformat)."""
    dates = [_nonempty(c) for c in date_fields if c in df_cols]
    times = [_nonempty(c) for c in time_fields if c in df_cols]
    naive = F.to_timestamp(
        F.concat_ws(" ", F.coalesce(*dates), F.coalesce(*times)), "yyyy-MM-dd HH:mm:ss"
    )
    return F.to_utc_timestamp(naive, ISRAEL_TZ)


def legacy_import(raw: DataFrame, key_col: str = "snapshot_key") -> DataFrame:
    """All-string legacy rows -> canonical flat-export-shaped rows."""
    cols = raw.columns
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c) for c in cols if c != key_col]
    )
    service_id = F.coalesce(_nonempty("service_id"), F.lit("0"))
    out = raw.select(
        F.concat_ws("-", F.col(key_col), (F.row_number().over(w) - 1).cast("string")).alias("id"),
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
        legacy_datetime(cols, ["date_recorded", "date"], ["time_recorded"]).alias(
            "recorded_at_time"
        ),
        legacy_datetime(
            cols, ["planned_start_date", "date"], ["planned_start_time"]
        ).alias("siri_scheduled_start_time"),
        F.concat_ws("-", F.col("date"), service_id).alias("siri_journey_ref"),
        F.col("bus_id").alias("siri_vehicle_ref"),
        F.coalesce(_nonempty("stop_point_ref"), F.lit("")).alias("siri_stop_code"),
        F.col("agency_id").alias("siri_operator_ref"),
        F.col("route_id").alias("siri_line_ref"),
        F.col(key_col).alias("siri_snapshot_id"),
        F.col("route_short_name").alias("gtfs_route_short_name"),
        legacy_datetime(cols, ["predicted_end_date", "date"], ["predicted_end_time"]).alias(
            "predicted_end_time"
        ),
        F.col("date").cast("date").alias("date"),
        F.coalesce(_nonempty("num_duplicates"), F.lit("")).alias("num_duplicates"),
    )
    return out
