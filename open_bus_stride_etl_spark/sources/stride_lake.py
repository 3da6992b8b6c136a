"""Stride lake: the engine's storage layer for the transit tables.

The reference keeps these tables in PostgreSQL and mutates them with
UPDATEs (SURVEY.md §1.1). Here each table is a parquet directory under a
base dir; enrichment tasks read a table, recompute the enrichment
columns, and atomically replace the table snapshot (write-new + swap).
Re-running a window converges to the same state — the reference's
``IS NULL`` todo-marker contract — so the swap is safe to repeat.

On a real cluster with date-partitioned facts the swap narrows to
``INSERT OVERWRITE`` of the affected date partitions
(sources/lake.py:write_partitioned); the whole-table swap here is the
local-mode equivalent that keeps tests hermetic.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import fs

STRIDE_TABLES = (
    "siri_snapshot",
    "siri_route",
    "siri_stop",
    "siri_ride",
    "siri_ride_stop",
    "siri_vehicle_location",
    "gtfs_stop",
    "gtfs_route",
    "gtfs_ride",
    "gtfs_ride_stop",
    "gtfs_data_task",
)


def table_path(base_dir: str, name: str) -> str:
    """``base_dir`` may be a plain path or any Hadoop-FS URI (s3a://…):
    every consumer goes through sources/fs.py for existence/rename."""
    return fs.join_path(base_dir, f"{name}.parquet")


def table_exists(base_dir: str, name: str) -> bool:
    return fs.exists(table_path(base_dir, name))


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(base_dir, name))


def overwrite_table(df: DataFrame, base_dir: str, name: str) -> int:
    """Replace the table snapshot. Spark cannot overwrite a path it is
    concurrently reading (self-join of source and sink), so: write to a
    temp sibling, then swap directories driver-side. Returns row count.

    Single-writer semantics (one scheduler per task), like the reference's
    per-task Airflow DAGs.
    """
    return overwrite_table_observed(df, base_dir, name)["rows"]


def overwrite_table_observed(
    df: DataFrame, base_dir: str, name: str, metrics: dict[str, Column] | None = None
) -> dict:
    """``overwrite_table`` with the row count — and any extra aggregate
    ``metrics`` — computed via the Observation API IN the write job
    itself (the csv_package.write_package pattern), instead of
    re-reading the written files. One plan execution per snapshot swap;
    the pre-r9 read-back count was a whole extra scan per task write,
    and task metrics like "rows newly set" paid yet another
    (`stride_tasks._write_and_count`). Returns ``{"rows": n, **metrics}``.
    """
    spark = df.sparkSession
    final = table_path(base_dir, name)
    tmp = f"{final}.tmp-{int(time.time() * 1000)}"
    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("_rows")] + [
        c.alias(k) for k, c in (metrics or {}).items()
    ]
    df.observe(obs, *aggs).write.mode("overwrite").parquet(tmp)
    vals = dict(obs.get)
    n = vals.pop("_rows")
    old = f"{final}.old-{int(time.time() * 1000)}"
    # Hadoop FileSystem.rename reports failure by RETURNING false (not
    # raising); an unchecked false here would nest tmp inside the still-
    # existing final dir and silently corrupt the snapshot.
    if fs.exists(final, spark):
        if not fs.rename(final, old, spark):
            raise OSError(f"snapshot swap failed: could not move {final} -> {old}")
    if not fs.rename(tmp, final, spark):
        raise OSError(f"snapshot swap failed: could not move {tmp} -> {final}")
    fs.delete(old, spark)
    return {"rows": n, **vals}
