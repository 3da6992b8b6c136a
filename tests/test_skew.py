"""Skew-mitigation operators (operators/skew.py): the two-phase salted
forms must be row-identical to the single-window / single-set forms on
both skewed and uniform data — they are shuffle-shape rewrites, never
semantic changes."""

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from open_bus_stride_etl_spark.operators import skew as sk


def _skewed(spark):
    rows = [Row(user_id=0, event_id=i, ts=1000 + (i * 37) % 500) for i in range(400)]
    rows += [Row(user_id=u, event_id=1000 + u * 10 + j, ts=2000 + j)
             for u in range(1, 20) for j in range(3)]
    return spark.createDataFrame(rows, "user_id long, event_id long, ts long")


@pytest.mark.parametrize("n_salts", [1, 4, 16])
def test_salted_topk_matches_window(spark, n_salts):
    df = _skewed(spark)
    order = [F.col("ts").desc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    plain = sorted(
        (r["user_id"], r["event_id"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5).collect()
    )
    got = sorted(
        (r["user_id"], r["event_id"], r["rn"])
        for r in sk.topk_per_key_salted(
            df, ["user_id"], order, k=5, n_salts=n_salts
        ).collect()
    )
    assert got == plain


def test_salted_topk_k_larger_than_group(spark):
    df = spark.createDataFrame(
        [Row(user_id=1, event_id=1, ts=10), Row(user_id=1, event_id=2, ts=20)],
        "user_id long, event_id long, ts long",
    )
    order = [F.col("ts").desc(), F.col("event_id").asc()]
    got = sorted(
        (r["event_id"], r["rn"])
        for r in sk.topk_per_key_salted(df, ["user_id"], order, k=10).collect()
    )
    assert got == [(1, 2), (2, 1)]


def test_distinct_count_two_phase_matches_count_distinct(spark):
    df = _skewed(spark).withColumn("v", F.col("ts") % 7)
    plain = {
        (r["user_id"],): r["n"]
        for r in df.groupBy("user_id").agg(F.countDistinct("v").alias("n")).collect()
    }
    got = {
        (r["user_id"],): r["n_distinct"]
        for r in sk.distinct_count_two_phase(df, ["user_id"], "v").collect()
    }
    assert got == plain
