"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship denormalizing flat-export join on
sf0.001 (the reference's packager query shape,
/root/reference/open_bus_stride_etl/packagers/siri.py:27-67).
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with a DuckDB oracle; definitions live in
``open_bus_stride_etl_spark/plans/registry.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_bus_stride_etl_spark.plans import registry  # noqa: E402
from open_bus_stride_etl_spark.session import configure  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return registry.QUERIES["flat_export"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
