"""Runtime data-quality checks — the reference's stand-in for tests
(SURVEY.md §5): snapshot freshness, status counts, completeness.

Reference: /root/reference/open_bus_stride_etl/stats/api.py:18-117
(counts + freshness validation, exit 1 when the latest snapshot is older
than 1 hour) and gtfs/update_ride_aggregations.py:58-74 (a GTFS date is
"missing" when <90% of its rides have non-null start/end).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FreshnessError(RuntimeError):
    pass


def latest_snapshot_age_seconds(
    snapshots: DataFrame, ts_col: str = "etl_start_time", now: datetime.datetime | None = None
) -> float | None:
    """Age of the newest snapshot; None when the table is empty."""
    row = snapshots.agg(F.max(ts_col).alias("latest")).collect()[0]
    if row["latest"] is None:
        return None
    # naive-UTC to match the tz-naive instants Spark rows collect as
    # (session tz is pinned UTC); utcnow() is deprecated and drifts into
    # naive/aware mixing when callers pass aware datetimes.
    now = now or datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    if now.tzinfo is not None:
        now = now.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return (now - row["latest"]).total_seconds()


def validate_freshness(
    snapshots: DataFrame,
    max_age_seconds: int = 3600,
    ts_col: str = "etl_start_time",
    now: datetime.datetime | None = None,
) -> float:
    """Raise FreshnessError when the newest snapshot is older than the
    threshold (stats/api.py:102-112's exit-1 contract)."""
    age = latest_snapshot_age_seconds(snapshots, ts_col, now)
    if age is None or age > max_age_seconds:
        raise FreshnessError(
            f"latest snapshot age {age}s exceeds {max_age_seconds}s (or table empty)"
        )
    return age


def status_counts(df: DataFrame, status_col: str, window: Column | None = None) -> dict[str, int]:
    """Counts by status within an optional predicate window
    (stats/api.py:48-78's per-filter counts, one pass)."""
    base = df.where(window) if window is not None else df
    return {
        r[status_col]: r["n"]
        for r in base.groupBy(status_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }


def incomplete_dates(
    rides: DataFrame,
    date_col: str = "date",
    start_col: str = "start_time",
    end_col: str = "end_time",
    threshold_pct: float = 90.0,
) -> DataFrame:
    """Dates whose completeness (rides with both start & end non-null)
    falls below the threshold -> need reprocessing. One aggregation:
    avg(when(complete,100,0)) per date."""
    complete = F.when(F.col(start_col).isNotNull() & F.col(end_col).isNotNull(), 100.0).otherwise(
        0.0
    )
    return (
        rides.groupBy(date_col)
        .agg(F.avg(complete).alias("pct_complete"), F.count(F.lit(1)).alias("n_rides"))
        .where(F.col("pct_complete") < threshold_pct)
        .orderBy(F.col(date_col).desc())
    )
