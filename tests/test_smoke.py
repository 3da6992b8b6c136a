"""Smoke: entry() runs, flagship query has sane shape, lake reader
normalizes nano timestamps."""

from pyspark.sql import types as T

import __spark_entry__ as entry_mod
from open_bus_stride_etl_spark.sources.lake import load_table


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "orderkey" in df.columns and "region_name" in df.columns


def test_nano_timestamps_become_timestamps(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    row = ev.orderBy("event_id").first()
    assert row["ts"].year >= 2024


def test_queries_and_oracles_aligned():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 5
