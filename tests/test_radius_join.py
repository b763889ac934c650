"""Radius-join correctness vs brute-force numpy oracle, plus the reference's
(disabled) e2e scenario and the nested SearchResult shape."""

import numpy as np
import pandas as pd
import pytest

from geoengine import geodesy
from geoengine.join import radius_join_pairs
from geoengine.results import assemble_search_results
from geoengine.topk import top_n_per_origin


def _random_points(seed, n, lat_range=(-80, 80), lon_range=(-179.95, 179.95)):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": [f"p{seed}_{i:06d}" for i in range(n)],
            "latitude": rng.uniform(*lat_range, n),
            "longitude": rng.uniform(*lon_range, n),
        }
    )


def _brute_pairs(origins: pd.DataFrame, neighbors: pd.DataFrame, radius_km: float):
    la1 = origins["latitude"].to_numpy()[:, None]
    lo1 = origins["longitude"].to_numpy()[:, None]
    la2 = neighbors["latitude"].to_numpy()[None, :]
    lo2 = neighbors["longitude"].to_numpy()[None, :]
    d = geodesy.dist_law_of_cosines_km(la1, lo1, la2, lo2)
    oi, ni = np.nonzero(d <= radius_km)
    return set(
        zip(origins["id"].to_numpy()[oi].tolist(), neighbors["id"].to_numpy()[ni].tolist())
    )


@pytest.mark.parametrize("radius_km,seed", [(50.0, 1), (250.0, 2), (5.0, 3)])
def test_radius_join_matches_bruteforce(spark, radius_km, seed):
    o = _random_points(seed, 300)
    nb = _random_points(seed + 100, 400)
    got = (
        radius_join_pairs(
            spark.createDataFrame(o), spark.createDataFrame(nb), radius_km, "km"
        )
        .select("origin_id", "neighbor_id", "distance_km")
        .toPandas()
    )
    want = _brute_pairs(o, nb, radius_km)
    got_set = set(zip(got["origin_id"], got["neighbor_id"]))
    assert got_set == want
    # distances match numpy within fp tolerance
    dd = {
        (r.origin_id, r.neighbor_id): r.distance_km for r in got.itertuples()
    }
    la = o.set_index("id")
    lb = nb.set_index("id")
    for (a, b), dv in list(dd.items())[:200]:
        ref = geodesy.dist_law_of_cosines_km(
            la.loc[a, "latitude"], la.loc[a, "longitude"],
            lb.loc[b, "latitude"], lb.loc[b, "longitude"],
        )
        assert abs(dv - ref) < 1e-9 * max(1.0, ref)


def test_antimeridian_pairs_found(spark):
    o = pd.DataFrame(
        {"id": ["west"], "latitude": [10.0], "longitude": [179.95]}
    )
    nb = pd.DataFrame(
        {"id": ["east"], "latitude": [10.0], "longitude": [-179.95]}
    )
    got = radius_join_pairs(
        spark.createDataFrame(o), spark.createDataFrame(nb), 30.0, "km"
    ).count()
    assert got == 1  # ~22 km apart across the antimeridian


def test_invalid_coords_dropped(spark):
    o = pd.DataFrame(
        {"id": ["ok", "bad1", "bad2"], "latitude": [10.0, 91.0, None],
         "longitude": [10.0, 200.0, 5.0]}
    )
    nb = pd.DataFrame({"id": ["n"], "latitude": [10.0], "longitude": [10.0]})
    got = radius_join_pairs(
        spark.createDataFrame(o), spark.createDataFrame(nb), 10.0, "km"
    ).toPandas()
    assert got["origin_id"].tolist() == ["ok"]


def test_reference_disabled_e2e_scenario(spark):
    # reference src/test/scala/DataStore.scala:17-36: 4 points, origin (11,11)
    # radius 500 miles -> exactly {a, b}; distances ~155/~140 km
    pts = pd.DataFrame(
        {
            "id": ["a", "b", "c", "d"],
            "latitude": [10.0, 10.1, 55.0, -55.1],
            "longitude": [10.0, 10.1, -55.0, 50.1],
        }
    )
    o = pd.DataFrame({"id": ["q"], "latitude": [11.0], "longitude": [11.0]})
    pairs = radius_join_pairs(
        spark.createDataFrame(o), spark.createDataFrame(pts), 500.0, "miles"
    )
    got = pairs.select("neighbor_id", "distance_km", "distance").toPandas()
    assert set(got["neighbor_id"]) == {"a", "b"}
    dk = got.set_index("neighbor_id")["distance_km"]
    assert abs(dk["a"] - 155) < 1 and abs(dk["b"] - 140) < 1
    # reported distance is in inquiry unit (miles), SparkDS.scala:84-86
    dm = got.set_index("neighbor_id")["distance"]
    assert abs(dm["a"] - dk["a"] * geodesy.KM_TO_MI) < 1e-9


def test_polar_origins(spark):
    # near-pole box spans the full longitude circle; grid must cap at one
    # revolution and still find everything
    o = pd.DataFrame(
        {"id": ["np", "sp"], "latitude": [89.5, -89.5], "longitude": [10.0, -170.0]}
    )
    nb = pd.DataFrame(
        {
            "id": [f"n{i}" for i in range(36)] + ["far"],
            "latitude": [89.6] * 36 + [80.0],
            "longitude": list(range(-180, 180, 10)) + [0.0],
        }
    )
    got = radius_join_pairs(
        spark.createDataFrame(o), spark.createDataFrame(nb), 200.0, "km"
    ).toPandas()
    want = _brute_pairs(o, nb, 200.0)
    assert set(zip(got["origin_id"], got["neighbor_id"])) == want
    assert len(want) >= 30  # all ring points near the north pole


def test_tiny_radius(spark):
    o = _random_points(51, 100)
    nb = o.copy()  # identical points -> each finds at least itself
    got = radius_join_pairs(
        spark.createDataFrame(o), spark.createDataFrame(nb), 0.001, "km"
    ).toPandas()
    self_pairs = set(zip(o["id"], o["id"]))
    assert self_pairs <= set(zip(got["origin_id"], got["neighbor_id"]))


def test_topk_and_nested_result_shape(spark):
    o = _random_points(7, 50)
    nb = _random_points(8, 500)
    pairs = radius_join_pairs(
        spark.createDataFrame(o), spark.createDataFrame(nb), 800.0, "km"
    )
    top = top_n_per_origin(pairs, 5)
    counts = top.groupBy("origin_id").count().toPandas()
    assert (counts["count"] <= 5).all()
    res = assemble_search_results(top, unit="km", radius=800.0)
    row = res.limit(1).collect()[0]
    assert set(res.columns) == {"origin", "neighbors", "searchSpace", "searchTimerSeconds"}
    ds = [n["euclideanDistance"] for n in row["neighbors"]]
    assert ds == sorted(ds)
    assert set(row["searchSpace"]) <= {"0", "1"}


def test_parity_topn_keeps_farthest_and_dedups(spark):
    o = pd.DataFrame({"id": ["q"], "latitude": [0.0], "longitude": [0.0]})
    nb = pd.DataFrame(
        {
            "id": ["n1", "n2", "n2dup", "n3", "n4"],
            "latitude": [0.0, 0.0, 0.0, 0.0, 0.0],
            "longitude": [0.1, 0.2, -0.2, 0.3, 0.4],
        }
    )
    pairs = radius_join_pairs(
        spark.createDataFrame(o), spark.createDataFrame(nb), 100.0, "km"
    )
    got = top_n_per_origin(pairs, 2, parity_topn=True).toPandas()
    # dedup of the 0.2-distance tie, then keep the 2 FARTHEST: n4, n3
    assert set(got["neighbor_id"]) == {"n4", "n3"}
    sane = top_n_per_origin(pairs, 2).toPandas()
    assert set(sane["neighbor_id"]) == {"n1", "n2"}


def test_per_row_radius_matches_bruteforce(spark):
    """R4 full generality: mixed per-row radii (5..500 km) + per-row k
    against the numpy brute-force oracle at each row's own radius."""
    from geoengine.join import radius_join_pairs_per_row

    o = _random_points(11, 250)
    radii = (5.0 + (np.arange(250) % 9) * 60.0)  # 5..485 km, mixed
    o["radius_km"] = radii
    nb = _random_points(211, 400)

    got = radius_join_pairs_per_row(
        spark.createDataFrame(o), spark.createDataFrame(nb),
        radius_col="radius_km", unit="km",
    ).toPandas()
    got_set = set(zip(got["origin_id"], got["neighbor_id"]))

    la1 = o["latitude"].to_numpy()[:, None]
    lo1 = o["longitude"].to_numpy()[:, None]
    la2 = nb["latitude"].to_numpy()[None, :]
    lo2 = nb["longitude"].to_numpy()[None, :]
    d = geodesy.dist_law_of_cosines_km(la1, lo1, la2, lo2)
    oi, ni = np.nonzero(d <= radii[:, None])
    want = set(zip(o["id"].to_numpy()[oi], nb["id"].to_numpy()[ni]))
    assert got_set == want

    # per-row caps: k derived per origin, ranks bounded by each row's cap
    o["max_results"] = (np.arange(250) % 4) + 1
    pairs = radius_join_pairs_per_row(
        spark.createDataFrame(o), spark.createDataFrame(nb),
        radius_col="radius_km", unit="km",
    )
    top = top_n_per_origin(pairs, "origin_max_results").toPandas()
    counts = top.groupby("origin_id").size()
    caps = o.set_index("id")["max_results"]
    for oid, n in counts.items():
        assert n <= caps[oid]
    # kept rows are each origin's n NEAREST
    for oid, grp in top.groupby("origin_id"):
        i = int(np.nonzero(o["id"].to_numpy() == oid)[0][0])
        within = np.nonzero(d[i] <= radii[i])[0]
        order = within[np.lexsort((nb["id"].to_numpy()[within], d[i][within]))]
        want_ids = list(nb["id"].to_numpy()[order[: caps[oid]]])
        assert sorted(grp["neighbor_id"]) == sorted(want_ids)


def test_per_row_radius_miles_unit(spark):
    """Per-row radius in MILES: conversion happens per row (first-letter
    unit rule), distance reported in the inquiry unit."""
    from geoengine.join import radius_join_pairs_per_row

    o = pd.DataFrame(
        {"id": ["a", "b"], "latitude": [0.0, 0.0], "longitude": [0.0, 10.0],
         "radius": [100.0, 50.0]}
    )
    nb = pd.DataFrame(
        {"id": ["x", "y"], "latitude": [0.0, 0.0],
         "longitude": [1.0, 10.5]}
    )
    got = radius_join_pairs_per_row(
        spark.createDataFrame(o), spark.createDataFrame(nb),
        radius_col="radius", unit="miles",
    ).toPandas()
    # a->x: 111.19 km = 69.1 mi <= 100 mi: kept; b->y: 55.6km=34.5mi <= 50: kept
    # a->y (10.5 deg) and b->x (9 deg) are far outside
    assert set(zip(got["origin_id"], got["neighbor_id"])) == {("a", "x"), ("b", "y")}
    mi = got.set_index("origin_id")["distance"]
    km = got.set_index("origin_id")["distance_km"]
    assert np.allclose(mi, km * geodesy.KM_TO_MI)


def test_per_row_unit_column_mixed(spark):
    """Per-row UNIT column (the last SearchInquery field): one inquiry in
    miles, one in km, same numeric radius — conversion, refinement and
    distance reporting all per row; NULL/unknown units drop the origin
    silently (documented NULL propagation)."""
    from geoengine.join import radius_join_pairs_per_row

    o = pd.DataFrame(
        {"id": ["mi", "km", "bad", "nul"],
         "latitude": [0.0, 0.0, 0.0, 0.0],
         "longitude": [0.0, 0.0, 0.0, 0.0],
         "radius": [100.0, 100.0, 100.0, None],
         "unit": ["miles", "km", "furlongs", "km"]}
    )
    # x at ~111.19 km = 69.1 mi: inside 100 mi, OUTSIDE 100 km
    nb = pd.DataFrame(
        {"id": ["x"], "latitude": [0.0], "longitude": [1.0]}
    )
    got = radius_join_pairs_per_row(
        spark.createDataFrame(o), spark.createDataFrame(nb),
        radius_col="radius", unit_col="unit", max_radius=200.0,
    ).toPandas()
    assert set(zip(got["origin_id"], got["neighbor_id"])) == {("mi", "x")}
    row = got.iloc[0]
    assert row["origin_unit"] == "miles"
    assert np.isclose(row["distance"], row["distance_km"] * geodesy.KM_TO_MI)


def test_search_per_row_unit_col_nested(spark):
    """Facade: per-row unit flows into the nested ms field and searchSpace."""
    from geoengine.engine import search_per_row

    o = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1, 2], "latitude": [0.0, 0.0], "longitude": [0.0, 5.0],
             "radius": [100.0, 100.0], "max_results": [5, 5],
             "unit": ["miles", "km"]}
        )
    )
    nb = spark.createDataFrame(
        pd.DataFrame(
            {"id": [10, 20], "latitude": [0.0, 0.0],
             "longitude": [1.0, 5.5]}
        )
    )
    res = search_per_row(o, nb, radius_col="radius", unit_col="unit",
                         max_radius=200.0).collect()
    by_id = {str(r["origin"]["id"]): r for r in res}
    assert set(by_id) == {"1", "2"}
    assert by_id["1"]["neighbors"][0]["ms"] == "miles"
    assert by_id["2"]["neighbors"][0]["ms"] == "km"
    # searchSpace is rendered at each origin's own km radius: 100 mi vs
    # 100 km give different prefixes at the same origin geometry offset
    assert set(by_id["1"]["searchSpace"]) <= {"0", "1"}


def test_assemble_uniform_radius_with_unit_col(spark):
    """Public assemble surface: uniform numeric radius + per-row unit col —
    the radius is in each row's OWN unit, so the searchSpace prefix must
    differ between a miles row and a km row at the same geometry (100 mi
    covers more than 100 km -> shorter or equal prefix), and ms reports
    per row."""
    from geoengine.join import radius_join_pairs_per_row

    o = spark.createDataFrame(pd.DataFrame(
        {"id": ["m", "k"], "latitude": [10.0, 10.0],
         "longitude": [20.0, 20.0], "radius": [100.0, 100.0],
         "unit": ["miles", "km"]}
    ))
    nb = spark.createDataFrame(pd.DataFrame(
        {"id": ["x"], "latitude": [10.1], "longitude": [20.1]}
    ))
    pairs = radius_join_pairs_per_row(
        spark.createDataFrame(o.toPandas()), nb,
        radius_col="radius", unit_col="unit", max_radius=200.0,
    )
    res = assemble_search_results(pairs, unit="km", radius=100.0,
                                  unit_col="origin_unit")
    rows = {r["origin"]["id"]: r for r in res.collect()}
    assert rows["m"]["neighbors"][0]["ms"] == "miles"
    assert rows["k"]["neighbors"][0]["ms"] == "km"
    sm, sk = rows["m"]["searchSpace"], rows["k"]["searchSpace"]
    assert len(sm) <= len(sk) and sm != sk  # bigger km radius -> shorter prefix
