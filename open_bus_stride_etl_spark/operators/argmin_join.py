"""Nearest-point-by-geodesic-distance (argmin-distance per group).

Reference: /root/reference/open_bus_stride_etl/siri/
update_ride_stops_vehicle_locations.py:14-56 walks vehicle locations per
ride in Python, computes geopy distances row-by-row, and keeps a running
min per ride stop. Re-expressed as: distance as a native column
expression (functions/geo.py) + ``min_by`` aggregation — one shuffle, no
Python in the loop, deterministic tiebreak by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_meters


def nearest_by_distance(
    points: DataFrame,
    group_col: str,
    id_col: str,
    lat_col: str,
    lon_col: str,
    target_lat_col: str,
    target_lon_col: str,
) -> DataFrame:
    """Per group: the id of the point nearest to its target coordinate
    (rows with NULL coordinates are dropped, mirroring the reference's
    try/except row filter at update_ride_stops_vehicle_locations.py:19-31).

    Output: group_col, nearest_<id_col>, distance_meters (rounded long).
    """
    d = haversine_meters(
        F.col(lat_col), F.col(lon_col), F.col(target_lat_col), F.col(target_lon_col)
    )
    valid = points.where(
        F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & F.col(target_lat_col).isNotNull()
        & F.col(target_lon_col).isNotNull()
    ).withColumn("_dist", d)
    okey = F.struct(F.col("_dist"), F.col(id_col))
    return valid.groupBy(group_col).agg(
        F.min_by(F.col(id_col), okey).alias(f"nearest_{id_col}"),
        F.round(F.min("_dist")).cast("long").alias("distance_meters"),
    )
