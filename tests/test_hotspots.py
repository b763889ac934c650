"""Getis-Ord Gi* hot-spot detection (index.getis_ord_gi_star):
handcrafted grids with a numpy twin of the exact formula."""

import numpy as np
import pytest

from geoengine.index import getis_ord_gi_star


def _pts(spark, coords):
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in coords],
        schema="latitude double, longitude double",
    )


def _numpy_twin(cells: dict, n: int, ring: int = 1):
    """cells: {(ix,iy): count} -> {(ix,iy): (sum_x, w, z|None)}."""
    xs = np.array(list(cells.values()), dtype=float)
    N, mean = len(xs), xs.mean()
    s = np.sqrt((xs * xs).mean() - xs.mean() ** 2)
    out = {}
    for (ix, iy), _ in cells.items():
        sum_x = w = 0
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                k = ((ix + dx) % n, iy + dy)
                if k in cells:
                    sum_x += cells[k]
                    w += 1
        denom = s * np.sqrt((N * w - w * w) / (N - 1)) if N > 1 else 0.0
        z = (sum_x - mean * w) / denom if denom > 0 else None
        out[(ix, iy)] = (sum_x, w, z)
    return out


class TestGetisOrd:
    def test_values_match_numpy_twin(self, spark):
        hb, n = 4, 16  # 16x16 grid, cell = 11.25 x 22.5 deg
        rng = np.random.default_rng(3)
        coords = [(float(rng.uniform(-85, 85)), float(rng.uniform(-179, 179)))
                  for _ in range(300)]
        # hot block: pile 80 extra points into one spot
        coords += [(40.0 + float(rng.uniform(0, 1)),
                    40.0 + float(rng.uniform(0, 1)))] * 80
        got = {
            (r["ix"], r["iy"]): r
            for r in getis_ord_gi_star(_pts(spark, coords), hb).collect()
        }
        cells: dict = {}
        for la, lo in coords:
            ix = int((lo + 180.0) / 360.0 * n)
            iy = int((la + 90.0) / 180.0 * n)
            cells[(ix, iy)] = cells.get((ix, iy), 0) + 1
        want = _numpy_twin(cells, n)
        assert set(got) == set(want)
        hot = max(got.values(), key=lambda r: r["gi_z"] or -9e9)
        for k, (sum_x, w, z) in want.items():
            r = got[k]
            assert r["sum_x"] == sum_x and r["w"] == w, k
            if z is None:
                assert r["gi_z"] is None, k
            else:
                assert r["gi_z"] == pytest.approx(z, rel=1e-9), k
        # the piled-up cell (or a ring neighbor) carries the max z
        hx = int((40.5 + 180.0) / 360.0 * n)
        hy = int((40.5 + 90.0) / 180.0 * n)
        assert abs(hot["ix"] - hx) <= 1 and abs(hot["iy"] - hy) <= 1

    def test_longitude_wrap(self, spark):
        # occupied cells on both sides of the antimeridian are ring
        # neighbors: ix = 0 and ix = n-1 at the same iy
        hb, n = 4, 16
        coords = [(0.0, -179.0)] * 5 + [(0.0, 179.9)] * 3
        got = {
            (r["ix"], r["iy"]): r
            for r in getis_ord_gi_star(_pts(spark, coords), hb).collect()
        }
        assert {k[0] for k in got} == {0, n - 1}
        for r in got.values():
            assert r["sum_x"] == 8 and r["w"] == 2

    def test_single_cell_frame_is_null(self, spark):
        got = getis_ord_gi_star(_pts(spark, [(10.0, 10.0)] * 4), 4).collect()
        assert len(got) == 1
        assert got[0]["gi_z"] is None and got[0]["sum_x"] == 4
