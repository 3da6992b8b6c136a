"""Shared operator plumbing helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Ensure ``df`` has at least ``defaultParallelism`` partitions
    before it enters an Arrow-batch stage (``mapInPandas`` and friends):
    the stage's parallelism IS the partition count, and a small
    single-file parquet scan arrives as ONE partition — which would
    serialize the whole vectorized stage on one core. The round-robin
    shuffle moves only the stage's input columns; on a real multi-file
    table partitions >> cores and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
