"""Spatial field estimation (interpolate.py): IDW prediction and grid
KDE vs numpy brute twins, the zero-distance singularity rule, k-capping,
validation, and plan shape (no cartesian, no Python nodes)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from geoengine.geodesy import dist_law_of_cosines_km as law_of_cosines_km
from geoengine.interpolate import cell_centers, idw_interpolate, kde_cells


def _points(rng, n, lo_lat=-60, hi_lat=60):
    return [(i, rng.uniform(lo_lat, hi_lat), rng.uniform(-170, 170))
            for i in range(n)]


def _brute_idw(queries, samples, radius_km, k=None, power=2):
    """numpy-free brute twin: per query, all samples within radius,
    optional (distance, id) top-k, IDW with the zero-distance rule."""
    out = {}
    for qid, qla, qlo in queries:
        cand = []
        for sid, sla, slo, val in samples:
            d = law_of_cosines_km(qla, qlo, sla, slo)
            if d <= radius_km:
                cand.append((d, sid, val))
        if not cand:
            continue
        cand.sort(key=lambda t: (t[0], t[1]))
        if k is not None:
            cand = cand[:k]
        zeros = [v for d, _, v in cand if d == 0.0]
        if zeros:
            pred = sum(zeros) / len(zeros)
        else:
            wv = sum(v / d**power for d, _, v in cand)
            w = sum(1.0 / d**power for d, _, v in cand)
            pred = wv / w
        out[qid] = (pred, len(cand), min(d for d, _, _ in cand))
    return out


def _spark_idw(spark, queries, samples, radius_km, **kw):
    q = spark.createDataFrame(
        queries, "id long, latitude double, longitude double")
    s = spark.createDataFrame(
        samples, "id long, latitude double, longitude double, val double")
    rows = idw_interpolate(q, s, "val", radius_km, **kw).collect()
    return {r["id"]: (r["predicted"], r["n_samples"], r["nearest_km"])
            for r in rows}


def test_idw_matches_brute(spark):
    rng = random.Random(7)
    queries = _points(rng, 40)
    samples = [(i, la, lo, rng.uniform(-100.0, 100.0))
               for i, la, lo in _points(rng, 200)]
    got = _spark_idw(spark, queries, samples, 800.0)
    want = _brute_idw(queries, samples, 800.0)
    assert set(got) == set(want)
    for qid, (pred, n, near) in want.items():
        gp, gn, gnear = got[qid]
        assert gn == n
        assert gp == pytest.approx(pred, abs=1e-9)
        assert gnear == pytest.approx(near, abs=1e-9)


def test_idw_k_cap_and_power(spark):
    rng = random.Random(8)
    queries = _points(rng, 25)
    samples = [(i, la, lo, rng.uniform(0.0, 50.0))
               for i, la, lo in _points(rng, 300)]
    for k, power in ((5, 2), (1, 1), (3, 3)):
        got = _spark_idw(spark, queries, samples, 2000.0, k=k, power=power)
        want = _brute_idw(queries, samples, 2000.0, k=k, power=power)
        assert set(got) == set(want)
        for qid in want:
            assert got[qid][0] == pytest.approx(want[qid][0], abs=1e-9)
            assert got[qid][1] == want[qid][1]


def test_idw_zero_distance_rule(spark):
    # At lat=0 with equal lon the law-of-cosines argument computes to
    # EXACTLY 1.0 (sin(0)=0, cos(0)=1), so acos yields exact 0.0 and the
    # singularity rule MUST divert those rows before the 1/d^p division
    # (Spark ANSI raises on double division by zero): prediction = plain
    # average of the coincident samples, others ignored.
    queries = [(0, 0.0, 20.0)]
    samples = [(1, 0.0, 20.0, 4.0), (2, 0.0, 20.0, 8.0),
               (3, 0.1, 20.0, 1000.0)]
    got = _spark_idw(spark, queries, samples, 100.0)
    assert got[0][0] == pytest.approx(6.0)
    assert got[0][1] == 3  # n_samples still counts every in-radius sample
    assert got[0][2] == 0.0
    # Identical coordinates AWAY from the exact-1.0 regime land at the
    # acos noise floor (~1e-4 km), not 0: the finite-weight path takes
    # over and the coincident samples dominate (w ~ 1e8 vs ~1e-4).
    near = _spark_idw(
        spark, [(0, 10.0, 20.0)],
        [(1, 10.0, 20.0, 4.0), (2, 10.0, 20.0, 8.0), (3, 10.1, 20.0, 1000.0)],
        100.0)
    assert near[0][0] == pytest.approx(6.0, abs=0.01)
    assert near[0][2] > 0.0
    # no sample in radius -> query absent (inner semantics)
    far = _spark_idw(spark, [(9, -60.0, -150.0)], samples, 50.0)
    assert 9 not in far


def test_idw_validation(spark):
    q = spark.createDataFrame(
        [(0, 0.0, 0.0)], "id long, latitude double, longitude double")
    s = spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0)],
        "id long, latitude double, longitude double, val double")
    with pytest.raises(ValueError, match="power"):
        idw_interpolate(q, s, "val", 10.0, power=0)
    with pytest.raises(ValueError, match="power"):
        idw_interpolate(q, s, "val", 10.0, power=2.5)
    with pytest.raises(ValueError, match="k must be"):
        idw_interpolate(q, s, "val", 10.0, k=0)


def _brute_kde(points, bw_km, half_bits, cutoff_sigmas=3.0):
    n = 1 << half_bits

    def cell_of(la, lo):
        ix = min(max(int(math.floor((lo + 180.0) / 360.0 * n)), 0), n - 1)
        iy = min(max(int(math.floor((la + 90.0) / 180.0 * n)), 0), n - 1)
        return ix * n + iy

    centers = {}
    for _, la, lo in points:
        c = cell_of(la, lo)
        ix, iy = c >> half_bits, c & (n - 1)
        centers[c] = ((iy + 0.5) * (180.0 / n) - 90.0,
                      (ix + 0.5) * (360.0 / n) - 180.0)
    cutoff = cutoff_sigmas * bw_km
    out = {}
    for c, (cla, clo) in centers.items():
        dens, cnt = 0.0, 0
        for _, la, lo in points:
            d = law_of_cosines_km(cla, clo, la, lo)
            if d <= cutoff:
                dens += math.exp(-(d * d) / (2.0 * bw_km * bw_km))
                cnt += 1
        if cnt:
            out[c] = (dens, cnt)
    return out


def test_kde_matches_brute(spark):
    rng = random.Random(9)
    pts = _points(rng, 300)
    df = spark.createDataFrame(
        pts, "id long, latitude double, longitude double")
    got = {r["cell"]: (r["density"], r["n_points"])
           for r in kde_cells(df, 200.0, 6).collect()}
    want = _brute_kde(pts, 200.0, 6)
    assert set(got) == set(want)
    for c in want:
        assert got[c][0] == pytest.approx(want[c][0], rel=1e-9)
        assert got[c][1] == want[c][1]


def test_kde_null_coords_dropped_and_validation(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 10.0), (1, None, 10.0), (2, 10.0, None)],
        "id long, latitude double, longitude double")
    rows = kde_cells(df, 100.0, 7).collect()
    assert len(rows) == 1 and rows[0]["n_points"] == 1
    with pytest.raises(ValueError, match="bandwidth"):
        kde_cells(df, 0.0, 7)
    with pytest.raises(ValueError, match="cutoff_sigmas"):
        kde_cells(df, 100.0, 7, cutoff_sigmas=-1.0)
    # resolution-consistency guard: a 100-km bandwidth cannot reach the
    # corners of a half_bits=4 (~11-deg) cell -> eager error, not an
    # occupied cell that silently emits no density row
    with pytest.raises(ValueError, match="center-to-corner"):
        kde_cells(df, 100.0, 4)


def test_cell_centers_inverse(spark):
    """center lat/lon of a point's cell always lands back in that cell
    (inverse consistency of grid_center vs grid_ix/iy)."""
    rng = random.Random(10)
    pts = _points(rng, 100, lo_lat=-89, hi_lat=89)
    from geoengine.join import with_grid_cell

    df = with_grid_cell(
        spark.createDataFrame(
            pts, "id long, latitude double, longitude double"),
        6, out="cell",
    ).select("cell").distinct()
    back = with_grid_cell(
        cell_centers(df, 6).select(
            F.col("center_lat").alias("latitude"),
            F.col("center_lon").alias("longitude"), "cell"),
        6, out="cell2",
    )
    assert back.where(F.col("cell") != F.col("cell2")).count() == 0


def test_interpolate_plan_shape(spark):
    rng = random.Random(11)
    q = spark.createDataFrame(
        _points(rng, 20), "id long, latitude double, longitude double")
    s = spark.createDataFrame(
        [(i, la, lo, 1.0) for i, la, lo in _points(rng, 50)],
        "id long, latitude double, longitude double, val double")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for df in (idw_interpolate(q, s, "val", 500.0, k=4),
               kde_cells(q, 150.0, 7)):
        p = df._jdf.queryExecution().explainString(jmode)
        assert "CartesianProduct" not in p
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert node not in p
