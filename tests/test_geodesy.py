"""Golden-vector tests ported from reference src/test/scala/GeoSearch.scala
and SqlUdf.scala (distances, offsets, units). Pure numpy — no Spark."""

import numpy as np

from geoengine import geodesy


def test_add_distance_to_longitude_golden():
    # GeoSearch.scala:43-50 (eps 0.001)
    lat, lon = 38.907192, -77.036873
    assert abs(geodesy.add_distance_to_longitude(10, lat, lon) - (-76.921303)) < 1e-3
    assert abs(geodesy.add_distance_to_longitude(-10, lat, lon) - (-77.152443)) < 1e-3


def test_add_distance_to_latitude_golden():
    # GeoSearch.scala:52-57
    lat = 38.907192
    assert abs(geodesy.add_distance_to_latitude(10, lat) - 38.997127) < 1e-3
    assert abs(geodesy.add_distance_to_latitude(-10, lat) - 38.817257) < 1e-3


def test_distance_golden_10km():
    # GeoSearch.scala:59-60: offset point is exactly 10 km east
    d = geodesy.dist_law_of_cosines_km(
        38.907192, -77.036873, 38.907192, -76.92130337219517
    )
    assert abs(d - 10.0) < 1e-3


def test_distance_golden_422km():
    # GeoSearch.scala:61-62: Dallas <-> San Antonio
    d = geodesy.dist_law_of_cosines_km(32.9697, -96.80322, 29.46786, -98.53506)
    assert abs(d - 422.759) < 1e-3


def test_sql_udf_golden_miles_km():
    # SqlUdf.scala:10-11 (eps 0.01)
    d_km = geodesy.dist_law_of_cosines_km(42.5787980, -71.5728, 42.461886, -71.5485457)
    assert abs(d_km - 13.151) < 1e-2
    assert abs(geodesy.from_km(d_km, "mi") - 8.1717) < 1e-2


def test_unit_conversions():
    assert geodesy.to_km(1.0, "miles") == 1.60934
    assert geodesy.to_km(5.0, "km") == 5.0
    assert abs(geodesy.from_km(1.60934, "Mi") - 1.60934 * 0.621371) < 1e-12


def test_haversine_close_to_loc():
    rng = np.random.default_rng(3)
    lat1, lon1 = rng.uniform(-80, 80, 100), rng.uniform(-179, 179, 100)
    lat2 = lat1 + rng.uniform(-2, 2, 100)
    lon2 = lon1 + rng.uniform(-2, 2, 100)
    d1 = geodesy.dist_law_of_cosines_km(lat1, lon1, lat2, lon2)
    d2 = geodesy.dist_haversine_km(lat1, lon1, lat2, lon2)
    np.testing.assert_allclose(d1, d2, atol=1e-6, rtol=1e-6)


def test_disabled_reference_e2e_distances():
    # reference src/test/scala/DataStore.scala:17-36 (disabled there; live
    # here): from (11,11) radius 500mi -> neighbors a(10,10) ~155, b(10.1,10.1)
    # ~140. Those golden numbers are the KM distances (the live SparkDS path
    # would report miles via sizeAsMi(km, Km), SparkDS.scala:84 — the disabled
    # expectations predate that); we assert the km values and the radius set.
    da = geodesy.dist_law_of_cosines_km(11, 11, 10, 10)
    db = geodesy.dist_law_of_cosines_km(11, 11, 10.1, 10.1)
    assert abs(da - 155) < 1 and abs(db - 140) < 1
    radius_km = geodesy.to_km(500, "mi")
    assert da <= radius_km and db <= radius_km
    dc = geodesy.dist_law_of_cosines_km(11, 11, 55, -55)
    dd = geodesy.dist_law_of_cosines_km(11, 11, -55.1, 50.1)
    assert dc > radius_km and dd > radius_km  # c, d excluded


# ---------------------------------------------------------------------------
# property-based invariants (hypothesis) — numpy kernels, no Spark session
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_lat = st.floats(-89.9, 89.9, allow_nan=False)
_lon = st.floats(-180.0, 180.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(_lat, _lon, _lat, _lon)
def test_distance_symmetric_and_bounded(lat1, lon1, lat2, lon2):
    from geoengine import geodesy

    d_ab = float(geodesy.dist_law_of_cosines_km(lat1, lon1, lat2, lon2))
    d_ba = float(geodesy.dist_law_of_cosines_km(lat2, lon2, lat1, lon1))
    assert abs(d_ab - d_ba) < 1e-6
    assert 0.0 <= d_ab <= np.pi * geodesy.EARTH_RADIUS_KM + 1e-6
    d_self = float(geodesy.dist_law_of_cosines_km(lat1, lon1, lat1, lon1))
    assert d_self < 1e-3  # acos clamp keeps self-distance ~0


@settings(max_examples=200, deadline=None)
@given(_lat, _lon, st.floats(0.1, 2000.0, allow_nan=False))
def test_bbox_contains_center_and_orders(lat, lon, r_km):
    from geoengine import geodesy

    lat_min, lat_max, lon_min, lon_max = geodesy.bounding_box(lat, lon, r_km)
    assert lat_min < lat < lat_max
    # reference semantics: no clamping; lon offsets at SHIFTED latitudes may
    # blow past +-180 near poles — but ordering around the center must hold
    # whenever the shifted-latitude cosines stay positive
    if abs(lat_min) < 90 and abs(lat_max) < 90:
        assert lon_min < lon < lon_max


@settings(max_examples=100, deadline=None)
@given(st.floats(0.1, 5000.0), st.sampled_from(["km", "miles", "Mi", "K"]))
def test_unit_roundtrip(val, unit):
    from geoengine import geodesy

    assert abs(geodesy.from_km(geodesy.to_km(val, unit), unit) - val) < val * 1e-4
