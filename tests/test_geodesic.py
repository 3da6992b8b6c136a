"""F8 geodesic-exact option (functions/geo.py:geodesic_meters).

Pins (a) the WGS-84 geodesic against independently-known distances and
(b) the documented <0.5% haversine-vs-geodesic drift on bus-route-scale
fixtures — the tolerance SURVEY §2.8 records for the default F8 mapping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from open_bus_stride_etl_spark.functions.geo import (
    distance_meters,
    geodesic_meters,
    haversine_meters,
)

# (name, lat1, lon1, lat2, lon2, wgs84_meters) — reference distances from
# the standard Vincenty/Karney test values (public geodesic literature):
# one degree of longitude on the equator and one degree of meridian arc.
KNOWN = [
    ("equator_1deg_lon", 0.0, 0.0, 0.0, 1.0, 111319.491),
    ("meridian_1deg_lat", 0.0, 0.0, 1.0, 0.0, 110574.389),
]

# Bus-route-scale fixtures (Israel intercity + urban hops).
ROUTES = [
    ("tlv_jerusalem", 32.0853, 34.7818, 31.7683, 35.2137),
    ("tlv_haifa", 32.0853, 34.7818, 32.7940, 34.9896),
    ("urban_hop", 32.0853, 34.7818, 32.0900, 34.7850),
    ("beersheba_eilat", 31.2530, 34.7915, 29.5577, 34.9519),
]


def _one(spark, fn, lat1, lon1, lat2, lon2):
    return (
        spark.range(1)
        .select(fn(F.lit(lat1), F.lit(lon1), F.lit(lat2), F.lit(lon2)).alias("m"))
        .collect()[0]["m"]
    )


@pytest.mark.parametrize("name,lat1,lon1,lat2,lon2,expected", KNOWN)
def test_geodesic_matches_known_wgs84_distances(spark, name, lat1, lon1, lat2, lon2, expected):
    got = _one(spark, geodesic_meters, lat1, lon1, lat2, lon2)
    assert got == pytest.approx(expected, abs=0.5)  # within 0.5 m


def test_geodesic_vs_haversine_within_documented_tolerance(spark):
    rows = [Row(name=n, lat1=a, lon1=b, lat2=c, lon2=d) for n, a, b, c, d in ROUTES]
    df = spark.createDataFrame(rows).select(
        "name",
        haversine_meters(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("hav"),
        geodesic_meters(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("geo"),
    )
    for r in df.collect():
        drift = abs(r["hav"] - r["geo"]) / r["geo"]
        assert drift < 0.005, f"{r['name']}: drift {drift:.4%} exceeds the documented 0.5%"


def test_distance_meters_dispatch(spark):
    hav = _one(spark, lambda *c: distance_meters(*c), *ROUTES[0][1:])
    geo = _one(spark, lambda *c: distance_meters(*c, exact=True), *ROUTES[0][1:])
    hav_direct = _one(spark, haversine_meters, *ROUTES[0][1:])
    assert hav == hav_direct
    assert geo != hav and abs(geo - hav) / geo < 0.005


def test_geodesic_zero_for_coincident_points(spark):
    assert _one(spark, geodesic_meters, 32.0, 34.0, 32.0, 34.0) == 0.0


def test_geodesic_stays_vectorized_no_optional_library_branch(spark):
    """VERDICT r7 item 5: geodesic_meters must route every Arrow batch
    through the module-level numpy Vincenty kernel — never a per-row
    library loop that an installed optional package could silently
    re-enable. Pins (a) no third-party geodesic import is reachable
    from functions/geo.py, and (b) the Spark column output is
    bit-identical to vincenty_meters_np called directly on the batch."""
    import inspect

    import numpy as np

    from open_bus_stride_etl_spark.functions import geo
    from open_bus_stride_etl_spark.functions.geo import vincenty_meters_np

    src = inspect.getsource(geo)
    for line in src.split("\n"):
        stripped = line.strip()
        assert not (
            stripped.startswith(("import geopy", "from geopy"))
        ), f"per-row geodesic library branch reintroduced: {stripped!r}"

    lat1, lon1, lat2, lon2 = (
        np.array([a for _, a, _, _, _ in ROUTES]),
        np.array([b for _, _, b, _, _ in ROUTES]),
        np.array([c for _, _, _, c, _ in ROUTES]),
        np.array([d for _, _, _, _, d in ROUTES]),
    )
    expected = vincenty_meters_np(lat1, lon1, lat2, lon2)
    rows = [Row(name=n, lat1=a, lon1=b, lat2=c, lon2=d) for n, a, b, c, d in ROUTES]
    # one partition -> one Arrow batch: the kernel's shared convergence
    # loop makes results batch-composition-dependent at the 1e-8 level,
    # so bit-identity is only defined against the same batch
    got = {
        r["name"]: r["m"]
        for r in spark.createDataFrame(rows)
        .coalesce(1)
        .select(
            "name",
            geodesic_meters(
                F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
            ).alias("m"),
        )
        .collect()
    }
    for (name, *_), exp in zip(ROUTES, expected):
        assert got[name] == exp  # bit-identical: same kernel, same batch dtype


# --- numpy-kernel property tests (no Spark session; fast) ----------------

def test_vincenty_kernel_properties():
    """Property pins on vincenty_meters_np directly: symmetry,
    non-negativity, zero at coincidence, and haversine agreement within
    the documented drift bound — guards the kernel now that it is the
    sole exact path (r8 geopy-branch removal)."""
    import numpy as np

    from open_bus_stride_etl_spark.functions.geo import vincenty_meters_np

    rng = np.random.default_rng(20260816)
    n = 256
    # bus-route-scale pairs: points within ~2 degrees of each other,
    # mid-latitudes (the reference's operating envelope)
    lat1 = rng.uniform(29.0, 34.0, n)
    lon1 = rng.uniform(34.0, 36.0, n)
    lat2 = lat1 + rng.uniform(-1.0, 1.0, n)
    lon2 = lon1 + rng.uniform(-1.0, 1.0, n)

    d_fwd = vincenty_meters_np(lat1, lon1, lat2, lon2)
    d_rev = vincenty_meters_np(lat2, lon2, lat1, lon1)
    assert np.all(d_fwd >= 0)
    np.testing.assert_allclose(d_fwd, d_rev, rtol=1e-9)

    zero = vincenty_meters_np(lat1, lon1, lat1.copy(), lon1.copy())
    assert np.all(zero == 0.0)

    # haversine (spherical) agreement: < 0.6% on this envelope
    r = 6371000.0
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi, dlam = np.radians(lat2 - lat1), np.radians(lon2 - lon1)
    a = np.sin(dphi / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam / 2) ** 2
    hav = 2 * r * np.arctan2(np.sqrt(a), np.sqrt(1 - a))
    nz = d_fwd > 1.0
    drift = np.abs(hav[nz] - d_fwd[nz]) / d_fwd[nz]
    assert drift.max() < 0.006, f"max drift {drift.max():.4%}"
