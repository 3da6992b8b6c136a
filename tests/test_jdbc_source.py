"""load_table_jdbc plumbing tests (SURVEY §2.1 S1, JDBC branch).

No JDBC driver jar ships in this environment, so these tests mock the
DataFrameReader and assert the exact reader-API contract: which overload
is selected, how predicates / range-partitioning / fetchsize are passed.
The streaming-cursor concern (fetchsize) and the chunked-read analog
(predicates) are the reference behaviors being pinned; the real network
read is Spark's own code path.
"""

from __future__ import annotations

import pytest

from open_bus_stride_etl_spark.sources.lake import load_table_jdbc

URL = "jdbc:postgresql://db.example.internal:5432/stride"


class _FakeReader:
    def __init__(self):
        self.calls = []

    def jdbc(self, url, table, **kwargs):
        self.calls.append((url, table, kwargs))
        return f"df:{table}"


class _FakeSpark:
    def __init__(self):
        self.read = _FakeReader()


def test_jdbc_predicates_one_partition_per_fragment():
    spark = _FakeSpark()
    preds = ["id >= 0 AND id < 100", "id >= 100 AND id < 200"]
    out = load_table_jdbc(spark, URL, "siri_rides", predicates=preds)
    assert out == "df:siri_rides"
    (url, table, kwargs), = spark.read.calls
    assert url == URL and table == "siri_rides"
    assert kwargs["predicates"] == preds
    assert kwargs["properties"]["fetchsize"] == "10000"


def test_jdbc_range_partitioning():
    spark = _FakeSpark()
    load_table_jdbc(
        spark,
        URL,
        "siri_vehicle_locations",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
        fetchsize=500,
    )
    (_, _, kwargs), = spark.read.calls
    assert kwargs["column"] == "id"
    assert kwargs["lowerBound"] == 0
    assert kwargs["upperBound"] == 1_000_000
    assert kwargs["numPartitions"] == 16
    assert kwargs["properties"]["fetchsize"] == "500"


def test_jdbc_single_partition_default_and_custom_properties():
    spark = _FakeSpark()
    load_table_jdbc(
        spark, URL, "gtfs_stops", properties={"user": "reader", "fetchsize": "99"}
    )
    (_, _, kwargs), = spark.read.calls
    assert "column" not in kwargs and "predicates" not in kwargs
    # caller-supplied properties win over the fetchsize default
    assert kwargs["properties"] == {"fetchsize": "99", "user": "reader"}


def test_jdbc_partition_column_requires_bounds():
    spark = _FakeSpark()
    with pytest.raises(ValueError, match="lower_bound"):
        load_table_jdbc(spark, URL, "t", partition_column="id")
    assert spark.read.calls == []
