"""Package write -> read roundtrip (S4/S5/S6) and the salted skew join."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from open_bus_stride_etl_spark.operators.skew import salted_join
from open_bus_stride_etl_spark.sources.csv_package import load_package, write_package


def test_package_roundtrip_types(spark, tmp_path):
    df = spark.createDataFrame(
        [
            Row(id=1, name="a,b", ts=datetime.datetime(2024, 5, 1, 10, 0), v=1.5, ok=True),
            Row(id=2, name=None, ts=None, v=None, ok=False),
        ],
        "id long, name string, ts timestamp, v double, ok boolean",
    )
    write_package(df, str(tmp_path), "rt")
    back = load_package(spark, str(tmp_path), "rt")
    # schema restored from the manifest contract, not inference
    assert [(f.name, f.dataType.simpleString()) for f in back.schema] == [
        ("id", "bigint"), ("name", "string"), ("ts", "timestamp"), ("v", "double"),
        ("ok", "boolean"),
    ]
    got = {r["id"]: r for r in back.collect()}
    assert got[1]["name"] == "a,b"  # quoted comma survived CSV
    assert got[1]["ts"] == datetime.datetime(2024, 5, 1, 10, 0)
    assert got[2]["v"] is None and got[2]["ok"] is False


def test_salted_join_matches_plain_join(spark):
    # heavily skewed big side: 90% of rows share key 1
    big = spark.createDataFrame(
        [Row(k=1 if i % 10 else 2 + i % 5, payload=i) for i in range(1000)]
    )
    small = spark.createDataFrame([Row(k=i, label=f"dim{i}") for i in range(1, 7)])
    plain = big.join(small, on="k").select("k", "payload", "label")
    salted = salted_join(big, small, on="k", n_salts=8).select("k", "payload", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # salt spreads the hot key across reducers: >1 distinct salt for k=1
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    n_salts_hot = b.where(F.col("k") == 1).select("_salt").distinct().count()
    assert n_salts_hot == 8
