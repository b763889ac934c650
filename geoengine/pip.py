"""Point-in-polygon (north-rule extension; no reference counterpart).

Even-odd (ray casting) test, vectorized numpy inside a pandas UDF over
``array<struct<lat,lon>>`` polygon rings. The scale path prefilters with a
cell-keyed join: polygons are exploded to the grid cells covering their
bbox, points carry their single cell — so the O(N_points * N_vertices)
exact test only runs on (point, polygon) pairs whose cells collide.

Edge semantics: boundary points follow the standard even-odd half-open rule
(a point exactly on a horizontal-crossing vertex counts per the crossing
parity); deterministic and documented rather than geodesic-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from . import exprs
from .join import with_grid_cell


def point_in_ring(lat: np.ndarray, lon: np.ndarray, ring_lat: np.ndarray,
                  ring_lon: np.ndarray) -> np.ndarray:
    """Vectorized even-odd test of N points against ONE ring (planar
    lat/lon space). Returns bool[N]."""
    x, y = np.asarray(lon, float), np.asarray(lat, float)
    xj, yj = np.asarray(ring_lon, float), np.asarray(ring_lat, float)
    xk, yk = np.roll(xj, 1), np.roll(yj, 1)
    inside = np.zeros(x.shape, dtype=bool)
    for j in range(len(xj)):
        cond = (yj[j] > y) != (yk[j] > y)
        xint = (xk[j] - xj[j]) * (y - yj[j]) / (yk[j] - yj[j] + 1e-300) + xj[j]
        inside ^= cond & (x < xint)
    return inside


from functools import lru_cache


@lru_cache(maxsize=1)
def _pip_udf():
    @pandas_udf("boolean")
    def _inner(
        lat: pd.Series, lon: pd.Series, ring_lat: pd.Series, ring_lon: pd.Series
    ) -> pd.Series:
        """Batch test: each row has its own polygon ring (arrays)."""
        out = np.zeros(len(lat), dtype=bool)
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        # group identical rings inside the batch so the vectorized kernel
        # runs once per polygon, not per row; the key is the FULL ring
        # content (both axes) — partial keys (len, first, last) collide for
        # distinct polygons, e.g. lat-aligned rectangles at different lons
        groups: dict[bytes, list[int]] = {}
        for pos in range(len(lat)):
            key = (
                np.asarray(ring_lat.iloc[pos], dtype=np.float64).tobytes()
                + np.asarray(ring_lon.iloc[pos], dtype=np.float64).tobytes()
            )
            groups.setdefault(key, []).append(pos)
        for poss in groups.values():
            i = np.asarray(poss)
            rl = np.asarray(ring_lat.iloc[i[0]], dtype=np.float64)
            rn = np.asarray(ring_lon.iloc[i[0]], dtype=np.float64)
            out[i] = point_in_ring(la[i], lo[i], rl, rn)
        return pd.Series(out)

    return _inner


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    half_bits: int = 8,
    point_id: str = "id",
    poly_id: str = "poly_id",
) -> DataFrame:
    """(point_id, poly_id) pairs where the point lies inside the ring.

    points: (id, latitude, longitude); polygons: (poly_id,
    ring: array<struct<lat:double, lon:double>>).

    Plan: polygon bbox -> covering cells (explode) | point -> single cell
    -> equi-join on cell -> exact ray-cast UDF on survivors only.
    """
    n = 1 << half_bits
    polys = polygons.select(
        poly_id,
        "ring",
        F.expr("transform(ring, p -> p.lat)").alias("_rlat"),
        F.expr("transform(ring, p -> p.lon)").alias("_rlon"),
        F.expr("array_min(transform(ring, p -> p.lat))").alias("_lat0"),
        F.expr("array_max(transform(ring, p -> p.lat))").alias("_lat1"),
        F.expr("array_min(transform(ring, p -> p.lon))").alias("_lon0"),
        F.expr("array_max(transform(ring, p -> p.lon))").alias("_lon1"),
    )
    cov = (
        polys.withColumn(
            "_gx",
            F.explode(
                F.sequence(
                    exprs.grid_ix(F.col("_lon0"), half_bits),
                    exprs.grid_ix(F.col("_lon1"), half_bits),
                )
            ),
        )
        .withColumn(
            "_gy",
            F.explode(
                F.sequence(
                    exprs.grid_iy(F.col("_lat0"), half_bits),
                    exprs.grid_iy(F.col("_lat1"), half_bits),
                )
            ),
        )
        .withColumn("gkey", exprs.grid_key(F.col("_gx"), F.col("_gy"), half_bits))
        .select(poly_id, "_rlat", "_rlon", "gkey")
    )
    pts = with_grid_cell(points, half_bits)
    cand = pts.join(cov, "gkey")
    hit = cand.where(
        _pip_udf()(
            F.col("latitude"), F.col("longitude"), F.col("_rlat"), F.col("_rlon")
        )
    )
    return hit.select(F.col(point_id).alias("point_id"), poly_id)
