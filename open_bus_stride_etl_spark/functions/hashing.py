"""Deterministic, engine-portable hashing.

The reference skips re-uploading an hourly package when the frictionless
datapackage content hash is unchanged
(/root/reference/open_bus_stride_etl/packagers/siri.py:140-147,194-202).
Under Spark's nondeterministic row order that contract needs an
ORDER-INSENSITIVE hash: we sum per-row md5-derived longs, which is
commutative, distributed-friendly, and reproducible across engines
(DuckDB computes the identical value — md5 is standard; xxhash64 is not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hex_to_long(hexstr: Column) -> Column:
    """Hex chars -> non-negative bigint. Use <= 10 hex chars (2^40) for
    values that will be SUMmed: a 2^40-bounded term keeps a bigint sum
    exact up to ~8M rows per aggregation and safely off int64 overflow
    (engines disagree on overflow: Spark wraps, DuckDB widens to hugeint)."""
    return F.conv(hexstr, 16, 10).cast("long")


def row_md5(*cols: Column) -> Column:
    """Canonical per-row hash: md5 over '|'-joined string forms with an
    explicit NULL sentinel (concat_ws drops nulls silently, which would
    collide 'a,NULL' with 'a')."""
    safe = [F.coalesce(c.cast("string"), F.lit("\x00NULL\x00")) for c in cols]
    return F.md5(F.concat_ws("|", *safe))


def content_hash_and_count(df: DataFrame, cols: list[str] | None = None) -> tuple[int, int]:
    """(order-insensitive content hash, row count) in one aggregation."""
    cols = cols or df.columns
    h = hex_to_long(F.substring(row_md5(*[F.col(c) for c in cols]), 1, 10))
    row = df.agg(F.sum(h).alias("h"), F.count(F.lit(1)).alias("n")).collect()[0]
    return (row["h"] or 0) + row["n"], row["n"]


def content_hash_agg(df: DataFrame, cols: list[str] | None = None) -> int:
    """Order-insensitive content hash of a DataFrame: sum of per-row
    md5-longs. One number per dataset; identical across re-runs and
    partitionings. Used by the idempotent publish protocol."""
    return content_hash_and_count(df, cols)[0]
