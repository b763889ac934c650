"""Golden-vector tests ported from reference src/test/scala/GeoSearch.scala
(cell codec) plus property tests for the codec itself. Pure numpy — no Spark.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geoengine import cells, geodesy

GOLDEN_KEY = "0100110110100001010011000111111011001001"  # GeoSearch.scala:72


def test_golden_40bit_key():
    c = cells.encode(np.array([34.932603]), np.array([-117.907324]), bits=40)
    assert cells.to_binary_string(c[0], 40) == GOLDEN_KEY


def test_string_intersect_golden():
    # GeoSearch.scala:10-14: stringIntersect("101100","101001") == "101"
    a = int("101100", 2)
    b = int("101001", 2)
    assert cells.common_prefix_len(np.array([a]), np.array([b]), 6)[0] == 3


def test_bbox_17bit_prefix_golden():
    # GeoSearch.scala:16-41: 25 km box @ (38.907192, -77.036873) ->
    # 17-char common prefix of the 4 corner geohashes, containing the
    # center's prefix.
    lat, lon = 38.907192, -77.036873
    lat_min, lat_max, lon_min, lon_max = geodesy.bounding_box(lat, lon, 25.0)
    corners_lat = np.array([lat_min, lat_min, lat_max, lat_max])
    corners_lon = np.array([lon_min, lon_max, lon_min, lon_max])
    cs = cells.encode(corners_lat, corners_lon, bits=40)
    prefix, plen = cells.common_prefix(cs, 40)
    assert plen == 17
    center = cells.encode(np.array([lat]), np.array([lon]), bits=40)[0]
    assert int(center) >> (40 - plen) == prefix


def test_prefix_containment_monotone():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 500)
    lon = rng.uniform(-179.9, 179.9, 500)
    c40 = cells.encode(lat, lon, 40)
    for r in (10, 20, 30):
        cr = cells.encode(lat, lon, r)
        np.testing.assert_array_equal(cells.parent(c40, 40, r), cr)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 1000)
    lon = rng.uniform(-180, 180, 1000)
    for bits in (20, 40, 52):
        hb = bits // 2
        ix, iy = cells.lon_index(lon, hb), cells.lat_index(lat, hb)
        c = cells.encode(lat, lon, bits)
        dx, dy = cells.decode_xy(c, bits)
        np.testing.assert_array_equal(dx, ix)
        np.testing.assert_array_equal(dy, iy)
        np.testing.assert_array_equal(cells.encode_xy(ix, iy), c)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(-90, 90, allow_nan=False),
    st.floats(-180, 180, allow_nan=False),
    st.integers(1, 26),
)
def test_point_inside_own_cell(lat, lon, half_bits):
    bits = half_bits * 2
    c = cells.encode(np.array([lat]), np.array([lon]), bits)[0]
    lat_min, lat_max, lon_min, lon_max = cells.cell_bounds(int(c), bits)
    eps = 1e-9
    assert lat_min - eps <= lat <= lat_max + eps or lat == 90.0
    assert lon_min - eps <= lon <= lon_max + eps or lon == 180.0


def test_kring_wraps_longitude_and_clips_latitude():
    hb = 4  # 16x16 grid
    rows, nx, ny = cells.kring_xy(np.array([0]), np.array([0]), 1, hb)
    assert set(zip(nx.tolist(), ny.tolist())) == {
        (15, 0), (15, 1), (0, 0), (0, 1), (1, 0), (1, 1),
    }
    rows, nx, ny = cells.kring_xy(np.array([8]), np.array([15]), 1, hb)
    assert set(ny.tolist()) == {14, 15}
    assert len(nx) == 6


def test_common_prefix_len_vectorized():
    a = np.array([0b1111, 0b1010, 0b0001, 5])
    b = np.array([0b1110, 0b1010, 0b1001, 5])
    np.testing.assert_array_equal(
        cells.common_prefix_len(a, b, 4), np.array([3, 4, 0, 4])
    )


def test_bits_validation():
    with pytest.raises(ValueError):
        cells.encode(np.array([0.0]), np.array([0.0]), bits=41)


def test_tile_bounds_roundtrip(spark):
    # inverse mapping sanity: every point's latitude lies between its
    # tile's north edge and the next row's north edge (rows grow south),
    # and its longitude at/east of the tile's west edge
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from geoengine import exprs

    z = 8
    rng = np.random.default_rng(23)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "lat": rng.uniform(-84.9, 84.9, 3000),
                "lon": rng.uniform(-179.9, 179.9, 3000),
            }
        )
    )
    df = pts.select(
        "lat",
        "lon",
        exprs.tile_x(F.col("lon"), z).alias("tx"),
        exprs.tile_y(F.col("lat"), z).alias("ty"),
    ).select(
        "*",
        exprs.tile_lon_west(F.col("tx"), z).alias("w"),
        exprs.tile_lon_west(F.col("tx") + 1, z).alias("e"),
        exprs.tile_lat_north(F.col("ty"), z).alias("n"),
        exprs.tile_lat_north(F.col("ty") + 1, z).alias("s"),
    )
    bad = df.where(
        ~(
            (F.col("lon") >= F.col("w"))
            & (F.col("lon") < F.col("e"))
            & (F.col("lat") <= F.col("n"))
            & (F.col("lat") > F.col("s"))
        )
    ).count()
    assert bad == 0
