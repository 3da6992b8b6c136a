"""Geodesic distance as a native column expression.

The reference's only true UDF is geopy's geodesic distance
(/root/reference/open_bus_stride_etl/siri/update_ride_stops_vehicle_locations.py:20-23),
called per row in Python. Re-expressed as a haversine column expression so
the whole computation stays inside JVM whole-stage codegen — no Python
round-trip, vectorized, ~100x the throughput of a row UDF. Haversine vs
geopy's Karney geodesic differs <0.5% at bus-route scale (documented
tolerance; SURVEY.md §2.8 F8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_meters(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two (lat, lon) points,
    in degrees. Pure built-in trig — stays in codegen."""
    phi1 = F.radians(lat1)
    phi2 = F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlam = F.radians(lon2 - lon1)
    a = F.pow(F.sin(dphi / 2), 2) + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlam / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


# The same formula as ANSI SQL, for oracle-side parity checks. Column
# references are interpolated by name.
def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2.0 * 6371000.0 * atan2("
        f"sqrt(pow(sin(radians({lat2} - {lat1}) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians({lon2} - {lon1}) / 2), 2)), "
        f"sqrt(1 - (pow(sin(radians({lat2} - {lat1}) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians({lon2} - {lon1}) / 2), 2))))"
    )
