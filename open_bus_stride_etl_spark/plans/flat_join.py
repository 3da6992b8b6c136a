"""Flagship denormalizing flat join — the packager's wide export query.

Reference: /root/reference/open_bus_stride_etl/packagers/siri.py:27-67
joins 10 tables (vehicle locations ⋈ ride stops ⋈ rides ⋈ routes ⋈ stops
⋈ 4 GTFS dims) into a 40-column flat projection, streamed row-by-row
through a server-side cursor into CSV.

Re-expressed on the shared TPC-H-ish test tables with the same shape:
the big fact (lineitem ≈ vehicle locations) joined through its FK chain
(orders ≈ rides) onto small dimensions (customer/supplier/part ≈ routes/
stops, nation/region ≈ GTFS dims), wide aliased projection.

Scale notes: dimensions are broadcast (they are small by construction —
the reference's GTFS dims are per-date slivers); the single shuffle is
fact⋈orders, which AQE sizes at runtime. Filters and the 20-odd-column
projection push down to the parquet scan (verified via
``.explain("formatted")`` — PushedFilters + pruned ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import load_table


def flat_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The denormalized wide export (P1/J1/J7 in SURVEY.md §2)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    return (
        lineitem.alias("l")
        .join(orders.alias("o"), F.col("l.l_orderkey") == F.col("o.o_orderkey"), "inner")
        .join(
            F.broadcast(customer.alias("c")),
            F.col("o.o_custkey") == F.col("c.c_custkey"),
            "inner",
        )
        .join(
            F.broadcast(supplier.alias("s")),
            F.col("l.l_suppkey") == F.col("s.s_suppkey"),
            "left",
        )
        .join(
            F.broadcast(part.alias("p")),
            F.col("l.l_partkey") == F.col("p.p_partkey"),
            "left",
        )
        .join(
            F.broadcast(nation.alias("n")),
            F.col("c.c_nationkey") == F.col("n.n_nationkey"),
            "left",
        )
        .join(
            F.broadcast(region.alias("r")),
            F.col("n.n_regionkey") == F.col("r.r_regionkey"),
            "left",
        )
        .select(
            F.col("l.l_orderkey").alias("orderkey"),
            F.col("l.l_linenumber").alias("linenumber"),
            F.col("l.l_quantity").alias("quantity"),
            F.col("l.l_extendedprice").alias("extendedprice"),
            F.col("l.l_discount").alias("discount"),
            F.col("l.l_returnflag").alias("returnflag"),
            F.col("l.l_linestatus").alias("linestatus"),
            F.col("l.l_shipdate").alias("shipdate"),
            F.col("o.o_orderstatus").alias("orderstatus"),
            F.col("o.o_totalprice").alias("totalprice"),
            F.col("o.o_orderdate").alias("orderdate"),
            F.col("o.o_orderpriority").alias("orderpriority"),
            F.col("c.c_name").alias("customer_name"),
            F.col("c.c_mktsegment").alias("mktsegment"),
            F.col("s.s_name").alias("supplier_name"),
            F.col("p.p_name").alias("part_name"),
            F.col("p.p_brand").alias("brand"),
            F.col("p.p_type").alias("part_type"),
            F.col("n.n_name").alias("nation_name"),
            F.col("r.r_name").alias("region_name"),
        )
    )
