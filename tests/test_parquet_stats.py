"""Footer-statistics counts (sources/parquet_stats.py) must agree
EXACTLY with the Spark scan they replace — the values feed task metrics
that are oracle-pinned query outputs (stride_dag_convergence's upd2_*
convergence row, curate_incremental_noop's n_index_fps)."""

from pyspark.sql import functions as F

from open_bus_stride_etl_spark.sources import parquet_stats


def test_footer_counts_match_spark(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    df = spark.range(0, 10_000, 1, 4).select(
        "id",
        F.when(F.col("id") % 3 == 0, F.col("id")).alias("maybe_long"),
        F.when(
            F.col("id") % 7 == 0, F.lit("2024-03-01 00:00:00").cast("timestamp")
        ).alias("maybe_ts"),
        F.when(F.col("id") % 2 == 0, F.concat(F.lit("s"), F.col("id"))).alias(
            "maybe_str"
        ),
    )
    df.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    assert parquet_stats.row_count(p) == back.count()
    for col in ("id", "maybe_long", "maybe_ts", "maybe_str"):
        want = back.where(F.col(col).isNotNull()).count()
        assert parquet_stats.nonnull_count(p, col) == want, col


def test_footer_counts_empty_and_missing_column(spark, tmp_path):
    p = str(tmp_path / "e.parquet")
    spark.range(0).select(
        F.col("id"), F.lit(None).cast("long").alias("v")
    ).write.mode("overwrite").parquet(p)
    assert parquet_stats.row_count(p) == 0
    assert parquet_stats.nonnull_count(p, "v") == 0
    # a column absent from every file's schema is all-null under merge
    assert parquet_stats.nonnull_count(p, "not_there") == 0


def test_footer_counts_fall_back_on_remote_or_missing():
    assert parquet_stats.row_count("s3a://bucket/t.parquet") is None
    assert parquet_stats.nonnull_count("s3a://bucket/t.parquet", "c") is None
    assert parquet_stats.row_count("/no/such/dir") is None
