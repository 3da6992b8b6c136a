"""Idempotent run-ledger: which (date, task) units still need processing.

Reference: /root/reference/open_bus_stride_etl/idempotent_process_gtfs_data.py
:95-109 — "missing" dates are (dates with no ledger row for the task)
UNION (dates whose ledger row has ``success IS FALSE OR success IS NULL``),
ordered descending. Anti-join ∪ filtered-join, exactly as SQL tri-state
boolean logic demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def missing_dates(
    all_units: DataFrame,
    ledger: DataFrame,
    unit_col: str = "date",
    task_col: str = "task_name",
    success_col: str = "success",
    task_name: str | None = None,
) -> DataFrame:
    """Units that need (re)processing for ``task_name``: never attempted,
    or attempted without recorded success (tri-state: false OR null)."""
    led = ledger
    if task_name is not None:
        led = led.where(F.col(task_col) == F.lit(task_name))
    never = all_units.select(unit_col).join(
        led.select(unit_col), on=unit_col, how="left_anti"
    )
    failed = (
        all_units.select(unit_col)
        .join(
            led.where(F.col(success_col).isNull() | (F.col(success_col) == F.lit(False))).select(
                unit_col
            ),
            on=unit_col,
            how="left_semi",
        )
    )
    return never.union(failed).distinct().orderBy(F.col(unit_col).desc())
