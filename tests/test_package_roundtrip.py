"""Package write -> read roundtrip (S4/S5/S6) and the salted skew join."""

import datetime
import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from open_bus_stride_etl_spark.operators.skew import salted_join
from open_bus_stride_etl_spark.sources.csv_package import (
    load_package,
    manifest_row_count,
    read_manifest,
    write_package,
)


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


def test_write_package_single_execution(spark, tmp_path):
    """The hash/count ride along with the CSV write as observed metrics:
    exactly ONE Spark job per package (the reference-parity fix for the
    hash+count+write triple execution)."""
    df = spark.range(0, 100, 1, 4).select(F.col("id"), (F.col("id") * 2).alias("v"))
    sc = spark.sparkContext
    sc.setLocalProperty("spark.jobGroup.id", "pkg_single_exec")
    try:
        manifest = write_package(df, str(tmp_path), "one")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("pkg_single_exec")
    assert len(jobs) == 1, f"expected 1 Spark job for write_package, saw {len(jobs)}"
    assert manifest_row_count(manifest) == 100
    assert manifest["hash"] > 0


def test_manifest_is_frictionless_shaped(spark, tmp_path):
    df = spark.createDataFrame([Row(id=1, v=1.5)], "id long, v double")
    write_package(df, str(tmp_path), "fr")
    m = read_manifest(str(tmp_path), "fr")
    res = m["resources"][0]
    assert m["profile"] == "data-package" and "hash" in m and "count_of_rows" in m
    assert res["path"] == "fr.csv" and res["profile"] == "tabular-data-resource"
    assert [(f["name"], f["type"]) for f in res["schema"]["fields"]] == [
        ("id", "integer"), ("v", "number"),
    ]


def test_load_reference_shaped_manifest(spark, tmp_path):
    """A datapackage.json as the reference's `dataflows` dump emits it —
    datapackage types only, no spark_type annotations — must load with
    the right Spark schema (packagers/siri.py:125-147 consumers)."""
    (tmp_path / "ref.csv").write_text(
        "id,name,seen,score,ok\n1,ana,2024-05-01T10:00:00,1.5,true\n2,,,,false\n"
    )
    manifest = {
        "name": "ref",
        "profile": "data-package",
        "hash": "a" * 32,  # reference stores an md5 string; must not crash us
        "count_of_rows": 2,
        "resources": [
            {
                "name": "ref",
                "path": "ref.csv",
                "profile": "tabular-data-resource",
                "format": "csv",
                "schema": {
                    "fields": [
                        {"name": "id", "type": "integer"},
                        {"name": "name", "type": "string"},
                        {"name": "seen", "type": "datetime"},
                        {"name": "score", "type": "number"},
                        {"name": "ok", "type": "boolean"},
                    ]
                },
            }
        ],
    }
    (tmp_path / "ref-metadata.json").write_text(json.dumps(manifest))
    back = load_package(spark, str(tmp_path), "ref")
    assert [(f.name, f.dataType.simpleString()) for f in back.schema] == [
        ("id", "bigint"), ("name", "string"), ("seen", "timestamp"),
        ("score", "double"), ("ok", "boolean"),
    ]
    got = {r["id"]: r for r in back.collect()}
    assert got[1]["seen"] == datetime.datetime(2024, 5, 1, 10, 0)
    assert got[1]["score"] == 1.5 and got[2]["name"] is None and got[2]["ok"] is False


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


def test_write_package_zero_rows_header_only(spark, tmp_path):
    """An empty hour still publishes a valid package: header-only CSV,
    count_of_rows 0, hash 0 — and loads back empty with the right
    schema (the backfill/sweep agreement depends on this)."""
    df = spark.createDataFrame([], "id long, name string").where(F.lit(False))
    manifest = write_package(df, str(tmp_path), "empty")
    assert manifest_row_count(manifest) == 0 and manifest["hash"] == 0
    back = load_package(spark, str(tmp_path), "empty")
    assert back.count() == 0
    assert [f.name for f in back.schema] == ["id", "name"]


def test_hour_packages_manifest_exact_rows_with_newlines(spark, tmp_path):
    """The stitched-hour manifest's count_of_rows is the aggregation's
    EXACT row count, never a physical-line count of the CSV (r10 —
    VERDICT r9 #1): a string field containing a newline is RFC-4180-
    quoted by Spark's writer and spans multiple physical lines, which
    the old line counter overcounted. Round-trips through load_package
    (multiLine read) to prove the bytes themselves are sound."""
    from pyspark.sql import Row

    from open_bus_stride_etl_spark.plans.stride_tasks import (
        _hour_hashes,
        _write_hour_packages,
    )

    wide = spark.createDataFrame(
        [
            Row(id=1, name="line1\nline2", _hour="2024-05-08.10"),
            Row(id=2, name="plain", _hour="2024-05-08.10"),
            Row(id=3, name="x", _hour="2024-05-08.11"),
        ],
        "id long, name string, _hour string",
    )
    hashes = _hour_hashes(wide)
    _write_hour_packages(
        wide, ["2024-05-08.10", "2024-05-08.11"], hashes, str(tmp_path), zip_it=False
    )
    m = read_manifest(str(tmp_path), "2024-05-08.10")
    # 2 logical rows even though the CSV body spans 3 physical lines
    assert manifest_row_count(m) == 2
    with open(str(tmp_path / "2024-05-08.10.csv"), "rb") as fh:
        assert fh.read().count(b"\n") == 4  # header + 3 body lines
    back = load_package(spark, str(tmp_path), "2024-05-08.10")
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [
        (1, "line1\nline2"),
        (2, "plain"),
    ]
    assert manifest_row_count(read_manifest(str(tmp_path), "2024-05-08.11")) == 1
