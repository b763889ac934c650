"""Point-in-polygon vs numpy brute-force oracle."""

import numpy as np
import pandas as pd

from geoengine import fixtures
from geoengine.pip import (
    point_in_ring,
    point_in_rings,
    points_in_multipolygons,
    points_in_polygons,
)


def test_point_in_ring_square():
    ring_lat = np.array([0.0, 0.0, 10.0, 10.0])
    ring_lon = np.array([0.0, 10.0, 10.0, 0.0])
    lat = np.array([5.0, 15.0, -1.0, 9.99])
    lon = np.array([5.0, 5.0, 5.0, 9.99])
    got = point_in_ring(lat, lon, ring_lat, ring_lon)
    assert got.tolist() == [True, False, False, True]


def test_point_in_ring_concave():
    # star-concave: outer square with a notch
    ring_lat = np.array([0.0, 0.0, 10.0, 10.0, 5.0])
    ring_lon = np.array([0.0, 10.0, 10.0, 0.0, 5.0])
    inside_notch = point_in_ring(np.array([8.0]), np.array([1.0]), ring_lat, ring_lon)
    assert isinstance(bool(inside_notch[0]), bool)  # deterministic


def test_colliding_partial_keys_distinct_polygons(spark):
    # regression: two lat-aligned rectangles share (vertex count, first lat,
    # last lat) but differ in longitude — a partial grouping key inside the
    # UDF would evaluate one against the other's ring
    rect_a = [(40.0, 0.0), (40.0, 10.0), (50.0, 10.0), (50.0, 0.0)]
    rect_b = [(40.0, 100.0), (40.0, 110.0), (50.0, 110.0), (50.0, 100.0)]
    polys = spark.createDataFrame(
        [
            ("A", [{"lat": a, "lon": b} for a, b in rect_a]),
            ("B", [{"lat": a, "lon": b} for a, b in rect_b]),
        ],
        schema="poly_id string, ring array<struct<lat:double, lon:double>>",
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["inA", "inB", "outBoth"],
                "latitude": [45.0, 45.0, 45.0],
                "longitude": [5.0, 105.0, 55.0],
            }
        )
    ).coalesce(1)  # one partition -> one Arrow batch -> keys must not collide
    got = points_in_polygons(pts, polys).toPandas()
    assert set(zip(got["point_id"], got["poly_id"])) == {("inA", "A"), ("inB", "B")}


def test_holed_square_semantics(spark):
    # outer 0..10 square with hole 3..7: inside-outer/outside-hole is IN,
    # inside-hole is OUT, outside-outer is OUT
    outer = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    hole = [(3.0, 3.0), (3.0, 7.0), (7.0, 7.0), (7.0, 3.0)]
    polys = spark.createDataFrame(
        [("H", [[{"lat": a, "lon": b} for a, b in outer],
                [{"lat": a, "lon": b} for a, b in hole]])],
        schema=(
            "poly_id string, "
            "rings array<array<struct<lat:double, lon:double>>>"
        ),
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["ring_zone", "in_hole", "outside"],
                "latitude": [1.0, 5.0, 15.0],
                "longitude": [1.0, 5.0, 5.0],
            }
        )
    )
    got = points_in_multipolygons(pts, polys).toPandas()
    assert set(got["point_id"]) == {"ring_zone"}


def test_duplicate_poly_id_distinct_geometry(spark):
    # regression (round-3 review): two table rows sharing poly_id but with
    # DIFFERENT rings must each be evaluated against their own geometry —
    # the batch group key is content-derived, not the bare poly_id
    rect = lambda lo: [[{"lat": 40.0, "lon": lo}, {"lat": 40.0, "lon": lo + 10},
                        {"lat": 50.0, "lon": lo + 10}, {"lat": 50.0, "lon": lo}]]
    polys = spark.createDataFrame(
        [("dup", rect(0.0)), ("dup", rect(100.0))],
        schema=(
            "poly_id string, "
            "rings array<array<struct<lat:double, lon:double>>>"
        ),
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["inFirst", "inSecond", "outBoth"],
                "latitude": [45.0, 45.0, 45.0],
                "longitude": [5.0, 105.0, 55.0],
            }
        )
    ).coalesce(1)  # one Arrow batch: both geometries share the batch
    got = points_in_multipolygons(pts, polys).toPandas()
    assert sorted(got["point_id"]) == ["inFirst", "inSecond"]


def test_multipolygons_match_bruteforce(spark):
    polys = fixtures.holed_polygons_table(spark, 9, seed=11)
    rng = np.random.default_rng(12)
    pts = pd.DataFrame(
        {
            "id": [f"p{i}" for i in range(3000)],
            "latitude": rng.uniform(-70, 70, 3000),
            "longitude": rng.uniform(-160, 160, 3000),
        }
    )
    got = (
        points_in_multipolygons(spark.createDataFrame(pts), polys)
        .toPandas()
    )
    got_set = set(zip(got["point_id"], got["poly_id"]))

    want = set()
    for pid, rings in fixtures.holed_polygon_rings(9, seed=11):
        rl = [np.array([a for a, _ in ring]) for ring in rings]
        rn = [np.array([b for _, b in ring]) for ring in rings]
        hits = point_in_rings(
            pts["latitude"].to_numpy(), pts["longitude"].to_numpy(), rl, rn
        )
        for p in pts["id"].to_numpy()[hits]:
            want.add((p, pid))
    assert got_set == want
    assert len(want) > 20


def test_points_in_polygons_matches_bruteforce(spark):
    polys = fixtures.polygons_table(spark, 15, seed=5)
    rng = np.random.default_rng(6)
    pts = pd.DataFrame(
        {
            "id": [f"p{i}" for i in range(2000)],
            "latitude": rng.uniform(-70, 70, 2000),
            "longitude": rng.uniform(-160, 160, 2000),
        }
    )
    got = (
        points_in_polygons(spark.createDataFrame(pts), polys)
        .toPandas()
    )
    got_set = set(zip(got["point_id"], got["poly_id"]))

    # brute force oracle
    polys_pd = polys.toPandas()
    want = set()
    for _, pr in polys_pd.iterrows():
        rl = np.array([v["lat"] for v in pr["ring"]])
        rn = np.array([v["lon"] for v in pr["ring"]])
        hits = point_in_ring(
            pts["latitude"].to_numpy(), pts["longitude"].to_numpy(), rl, rn
        )
        for pid in pts["id"].to_numpy()[hits]:
            want.add((pid, pr["poly_id"]))
    assert got_set == want
    assert len(want) > 0


def test_antimeridian_polygon_matches_shifted_bruteforce(spark):
    """A polygon spanning the +/-180 seam (lon 170 -> -170): the engine
    must classify points on BOTH sides correctly AND keep the covering
    cell set seam-local (not a near-world bbox explosion)."""
    # quad crossing the seam, with a hole crossing it too
    outer = [(10.0, 170.0), (10.0, -170.0), (30.0, -170.0), (30.0, 170.0)]
    hole = [(18.0, 175.0), (18.0, -175.0), (22.0, -175.0), (22.0, 175.0)]
    polys = spark.createDataFrame(
        [("seam", [[{"lat": a, "lon": b} for a, b in outer],
                   [{"lat": a, "lon": b} for a, b in hole]])],
        schema="poly_id string, "
               "rings array<array<struct<lat:double, lon:double>>>",
    )
    rng = np.random.default_rng(7)
    lats = rng.uniform(0.0, 40.0, 400)
    lons = np.concatenate([rng.uniform(160.0, 180.0, 200),
                           rng.uniform(-180.0, -160.0, 200)])
    pts = spark.createDataFrame(
        pd.DataFrame({"id": [f"p{i}" for i in range(400)],
                      "latitude": lats, "longitude": lons})
    )
    got = set(
        points_in_multipolygons(pts, polys, half_bits=6)
        .toPandas()["point_id"]
    )

    # brute force in the shifted (seam-free) frame
    sh = lambda x: np.where(np.asarray(x) < 0, np.asarray(x) + 360.0, x)
    want = set()
    for i in range(400):
        inside = point_in_rings(
            np.array([lats[i]]), sh([lons[i]]),
            [np.array([a for a, _ in outer]), np.array([a for a, _ in hole])],
            [sh([b for _, b in outer]), sh([b for _, b in hole])],
        )[0]
        if inside:
            want.add(f"p{i}")
    assert got == want and 0 < len(want) < 400

    # covering-cell economy, measured on the ENGINE's actual prefilter
    # side (polygon_covering_cells is exactly what points_in_multipolygons
    # joins against): the seam polygon spans ~20 deg of longitude, so at
    # half_bits=6 (5.6 deg cells) the distinct x-extent must stay local
    # (<=6 cells), not the ~64-cell world-spanning set the raw
    # array_min/array_max bbox would give.
    from pyspark.sql import functions as F

    from geoengine.pip import polygon_covering_cells

    n = 1 << 6
    cov = polygon_covering_cells(polys, 6).select(
        (F.col("gkey") / n).cast("long").alias("gx")
    )
    assert cov.select("gx").distinct().count() <= 6
    assert cov.count() <= 6 * 10  # x-extent times the ~8-cell lat span


def test_zonal_stats_matches_bruteforce(spark):
    """zonal_stats == brute PIP membership + pandas groupby aggregates
    (count/sum/avg/min/max of a point value, cast to double)."""
    from pyspark.sql import functions as F

    from geoengine.pip import zonal_stats

    polys = fixtures.polygons_table(spark, 10, seed=7)
    rng = np.random.default_rng(8)
    pts = pd.DataFrame(
        {
            "id": [f"p{i}" for i in range(1500)],
            "latitude": rng.uniform(-70, 70, 1500),
            "longitude": rng.uniform(-160, 160, 1500),
            "val": np.round(rng.uniform(-500, 500, 1500), 2),
        }
    )
    multi = polys.withColumn("rings", F.array(F.col("ring"))).drop("ring")
    got = {
        r["poly_id"]: r
        for r in zonal_stats(
            spark.createDataFrame(pts), multi, value_col="val"
        ).collect()
    }

    polys_pd = polys.toPandas()
    want: dict = {}
    for _, pr in polys_pd.iterrows():
        rl = np.array([v["lat"] for v in pr["ring"]])
        rn = np.array([v["lon"] for v in pr["ring"]])
        hits = point_in_ring(
            pts["latitude"].to_numpy(), pts["longitude"].to_numpy(), rl, rn
        )
        vals = pts["val"].to_numpy()[hits]
        if len(vals):
            want[pr["poly_id"]] = vals
    assert set(got) == set(want)
    assert len(want) > 0
    import pytest

    for pid, vals in want.items():
        r = got[pid]
        assert r["n_points"] == len(vals)
        assert r["sum_val"] == pytest.approx(vals.sum(), rel=1e-12)
        assert r["avg_val"] == pytest.approx(vals.mean(), rel=1e-12)
        assert r["min_val"] == vals.min() and r["max_val"] == vals.max()


def test_zonal_stats_count_only(spark):
    """Without value_col the output is just (poly_id, n_points)."""
    from geoengine.pip import zonal_stats

    polys = spark.createDataFrame(
        [("sq", [[{"lat": 0.0, "lon": 0.0}, {"lat": 0.0, "lon": 10.0},
                  {"lat": 10.0, "lon": 10.0}, {"lat": 10.0, "lon": 0.0}]])],
        schema="poly_id string, "
               "rings array<array<struct<lat:double, lon:double>>>",
    )
    pts = spark.createDataFrame(
        [("a", 5.0, 5.0), ("b", 1.0, 9.0), ("c", 50.0, 5.0)],
        "id string, latitude double, longitude double",
    )
    rows = zonal_stats(pts, polys).collect()
    assert len(rows) == 1
    assert rows[0]["poly_id"] == "sq" and rows[0]["n_points"] == 2
    assert set(rows[0].asDict()) == {"poly_id", "n_points"}


def _cd_area_km2(ring):
    """Chamberlain-Duquette twin: ring = [(lat, lon), ...]."""
    import math
    total = 0.0
    k = len(ring)
    for i in range(k):
        la1, lo1 = ring[i]
        la2, lo2 = ring[(i + 1) % k]
        total += math.radians(lo2 - lo1) * (
            2.0 + math.sin(math.radians(la1)) + math.sin(math.radians(la2))
        )
    return abs(total) * 6371.0 * 6371.0 / 2.0


def test_polygon_metrics_matches_twins(spark):
    import pytest

    from geoengine.geodesy import dist_law_of_cosines_km
    from geoengine.pip import polygon_metrics

    sq = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    tri = [(10.0, 20.0), (12.0, 25.0), (15.0, 21.0)]
    polys = spark.createDataFrame(
        [("sq", [{"lat": a, "lon": b} for a, b in sq]),
         ("tri", [{"lat": a, "lon": b} for a, b in tri])],
        schema="poly_id string, ring array<struct<lat:double, lon:double>>",
    )
    got = {r["poly_id"]: r for r in polygon_metrics(polys).collect()}
    for name, ring in (("sq", sq), ("tri", tri)):
        r = got[name]
        assert r["n_vertices"] == len(ring)
        per = sum(
            dist_law_of_cosines_km(*ring[i], *ring[(i + 1) % len(ring)])
            for i in range(len(ring))
        )
        assert r["perimeter_km"] == pytest.approx(per, rel=1e-12)
        assert r["area_km2"] == pytest.approx(_cd_area_km2(ring), rel=1e-12)
    # sanity: the 1x1-deg equator square is ~111.19^2 km^2 (planar limit)
    assert got["sq"]["area_km2"] == pytest.approx(111.19 ** 2, rel=0.01)
    # orientation-insensitive: reversed winding gives the same area
    polys_rev = spark.createDataFrame(
        [("sq", [{"lat": a, "lon": b} for a, b in reversed(sq)])],
        schema="poly_id string, ring array<struct<lat:double, lon:double>>",
    )
    rev = polygon_metrics(polys_rev).collect()[0]
    assert rev["area_km2"] == pytest.approx(got["sq"]["area_km2"], rel=1e-12)


def test_polygon_metrics_null_contract(spark):
    """Empty ring or NULL vertex coordinate -> NULL metrics (never the
    phantom acos(-1) edge, never an ANSI pmod(_, 0) error)."""
    from geoengine.pip import polygon_metrics

    polys = spark.createDataFrame(
        [("empty", []),
         ("nullv", [{"lat": 0.0, "lon": 0.0}, {"lat": None, "lon": 1.0},
                    {"lat": 1.0, "lon": 1.0}]),
         ("ok", [{"lat": 0.0, "lon": 0.0}, {"lat": 0.0, "lon": 1.0},
                 {"lat": 1.0, "lon": 0.5}])],
        schema="poly_id string, ring array<struct<lat:double, lon:double>>",
    )
    got = {r["poly_id"]: r for r in polygon_metrics(polys).collect()}
    assert got["empty"]["perimeter_km"] is None
    assert got["empty"]["area_km2"] is None
    assert got["nullv"]["perimeter_km"] is None
    assert got["nullv"]["area_km2"] is None
    assert got["ok"]["perimeter_km"] > 0 and got["ok"]["area_km2"] > 0
