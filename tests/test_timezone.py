"""Timezone correctness (SURVEY.md §7.4 risk): UTC storage with
Asia/Jerusalem conversions only at export boundaries, including the DST
transitions that make israel-hour <-> utc-hour date-dependent
(reference common.py:69-71)."""

import datetime

from pyspark.sql import functions as F

from open_bus_stride_etl_spark.functions.timeutil import israel_iso_string, to_israel_local


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _il(spark, utc_str):
    return _one(spark, to_israel_local(F.lit(utc_str).cast("timestamp")))


def test_winter_offset_ist(spark):
    # IST = UTC+2 in winter
    assert _il(spark, "2024-01-15 10:00:00") == datetime.datetime(2024, 1, 15, 12, 0)


def test_summer_offset_idt(spark):
    # IDT = UTC+3 in summer
    assert _il(spark, "2024-07-15 10:00:00") == datetime.datetime(2024, 7, 15, 13, 0)


def test_spring_forward_gap(spark):
    """Israel DST 2024 starts Mar 29 02:00 local (clocks jump to 03:00).
    00:30 UTC would naively be 02:30 local — a time that does not exist;
    the tzdb-correct answer is 03:30 IDT."""
    assert _il(spark, "2024-03-29 00:30:00") == datetime.datetime(2024, 3, 29, 3, 30)
    # one hour earlier is still IST (+2)
    assert _il(spark, "2024-03-28 23:30:00") == datetime.datetime(2024, 3, 29, 1, 30)


def test_fall_back_overlap(spark):
    """DST ends Oct 27 02:00 IDT (= Oct 26 23:00 UTC, clocks back to
    01:00): the UTC instants 22:30 (+3) and 23:30 (+2) both render as
    01:30 local — the ambiguity is real and resolves per-instant,
    exactly what storing UTC guarantees."""
    assert _il(spark, "2024-10-26 22:30:00") == datetime.datetime(2024, 10, 27, 1, 30)
    assert _il(spark, "2024-10-26 23:30:00") == datetime.datetime(2024, 10, 27, 1, 30)
    assert _il(spark, "2024-10-27 00:30:00") == datetime.datetime(2024, 10, 27, 2, 30)


def test_israel_iso_string_null_canonicalization(spark):
    # export canonicalization: NULL timestamp -> empty string (F10)
    s = _one(spark, israel_iso_string(F.lit(None).cast("timestamp")))
    assert s == ""
    s2 = _one(spark, israel_iso_string(F.lit("2024-07-15 10:00:00").cast("timestamp")))
    assert s2 == "2024-07-15 13:00:00"
