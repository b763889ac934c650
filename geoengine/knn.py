"""k-nearest-neighbor join via grid ring expansion (north-rule extension;
no reference counterpart — the reference only does radius search).

Strategies:
  brute  — crossJoin(broadcast(neighbors)) + window top-k. Exact; right
           physical plan whenever the neighbor side fits in a broadcast
           (dimension-sized tables).
  rings  — scale path: probe ring r of the grid around each origin's cell,
           keep origins whose k-th candidate distance is provably inside the
           ring's guaranteed-covered circle, re-probe the rest at 2r
           (driver loop, anti-join), brute-force fallback for stragglers.
           Exactness argument: a point outside Chebyshev ring r is at least
           r * min(cell_lat_km, cell_lon_km(|lat|+ring extent)) away, so any
           origin whose k-th distance is below that bound cannot gain a
           closer neighbor from outside the ring.

Both return identical results (property-tested); strategy='auto' picks
brute when the neighbor side is small.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import exprs
from .geodesy import EARTH_RADIUS_KM
from .join import validate_points, with_grid_cell

KM_PER_DEG = math.pi * EARTH_RADIUS_KM / 180.0


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("origin_id").orderBy(
        F.col("distance_km").asc(), F.col("neighbor_id").asc()
    )
    return pairs.withColumn("knn_rank", F.row_number().over(w)).where(
        F.col("knn_rank") <= k
    )


def _pairs_dist(o: DataFrame, nb: DataFrame, how: str, on=None) -> DataFrame:
    d = exprs.dist_km(
        F.col("origin_latitude"),
        F.col("origin_longitude"),
        F.col("neighbor_latitude"),
        F.col("neighbor_longitude"),
    )
    j = o.crossJoin(nb) if on is None else o.join(nb, on, how)
    return j.withColumn("distance_km", d)


def _prefixed(df: DataFrame, p: str) -> DataFrame:
    return df.select([F.col(c).alias(p + c) for c in df.columns])


def knn_join_brute(origins: DataFrame, neighbors: DataFrame, k: int) -> DataFrame:
    o = _prefixed(validate_points(origins), "origin_")
    nb = _prefixed(validate_points(neighbors), "neighbor_")
    return _ranked(_pairs_dist(o, F.broadcast(nb), "cross"), k)


def knn_join_rings(
    origins: DataFrame,
    neighbors: DataFrame,
    k: int,
    half_bits: int | None = None,
    max_rounds: int = 3,
    neighbor_count: int | None = None,
) -> DataFrame:
    """Exact kNN by iterative ring probing (see module docstring)."""
    o_all = _prefixed(validate_points(origins), "origin_")
    nb = _prefixed(validate_points(neighbors), "neighbor_")

    if neighbor_count is None:
        neighbor_count = nb.count()
    if half_bits is None:
        # aim for ~4k neighbors expected inside ring 1 (9 cells)
        density_target = max(k * 4, 16)
        cells_needed = max(neighbor_count * 9 // density_target, 1)
        half_bits = max(2, min(20, int(math.log2(max(cells_needed, 4))) // 2))
    hb = half_bits
    n = 1 << hb
    lat_cell_km = (180.0 / n) * KM_PER_DEG

    nb = with_grid_cell(
        nb, hb, lat="neighbor_latitude", lon="neighbor_longitude", out="n_gkey"
    ).cache()
    pending = o_all.withColumn(
        "_oix", exprs.grid_ix(F.col("origin_longitude"), hb)
    ).withColumn("_oiy", exprs.grid_iy(F.col("origin_latitude"), hb))

    results = []
    cached = []
    r = 1
    pending = pending.cache()
    cached.append(pending)
    for _ in range(max_rounds):
        if not pending.take(1):
            break
        dxy = F.explode(F.sequence(F.lit(-r), F.lit(r)))
        probe = (
            pending.withColumn("_dx", dxy)
            .withColumn("_dy", dxy)
            .withColumn(
                "n_gkey",
                exprs.grid_key(
                    F.pmod(F.col("_oix") + F.col("_dx"), F.lit(n)).cast("long"),
                    F.least(
                        F.greatest(F.col("_oiy") + F.col("_dy"), F.lit(0)),
                        F.lit(n - 1),
                    ).cast("long"),
                    hb,
                ),
            )
            .drop("_dx", "_dy")
            .dropDuplicates(["origin_id", "n_gkey"])
        )
        cand = _ranked(
            _pairs_dist(probe, nb, "inner", on="n_gkey").drop("n_gkey"), k
        )
        # guaranteed-covered radius of ring r at this origin's latitude
        lat_extent = (F.abs(F.col("origin_latitude")) + (r + 1) * 180.0 / n)
        cos_worst = F.cos(
            F.least(lat_extent, F.lit(89.9)) * math.pi / 180.0
        )
        guar = r * lat_cell_km * F.least(F.lit(1.0), 2.0 * cos_worst)
        kth = (
            cand.groupBy("origin_id")
            .agg(F.max("distance_km").alias("_dk"), F.count("*").alias("_cnt"))
        )
        cand = cand.join(kth, "origin_id")
        done = cand.where((F.col("_cnt") >= k) & (F.col("_dk") <= guar)).drop(
            "_dk", "_cnt", "_oix", "_oiy"
        ).cache()  # each round's output is read twice (anti-join + union)
        cached.append(done)
        results.append(done)
        done_ids = done.select("origin_id").distinct()
        pending = pending.join(done_ids, "origin_id", "left_anti").cache()
        cached.append(pending)
        r *= 2

    # brute-force fallback for origins no round could certify
    if pending.take(1):
        rest = _ranked(
            _pairs_dist(
                pending.drop("_oix", "_oiy"),
                F.broadcast(nb.drop("n_gkey")),
                "cross",
            ),
            k,
        )
        results.append(rest)

    out = results[0]
    for x in results[1:]:
        out = out.unionByName(x)
    return out


def knn_join(
    origins: DataFrame,
    neighbors: DataFrame,
    k: int,
    strategy: str = "auto",
    broadcast_threshold_rows: int = 5_000_000,
    **kw,
) -> DataFrame:
    if strategy == "brute":
        return knn_join_brute(origins, neighbors, k)
    if strategy == "rings":
        return knn_join_rings(origins, neighbors, k, **kw)
    cnt = neighbors.count()
    if cnt <= broadcast_threshold_rows:
        return knn_join_brute(origins, neighbors, k)
    return knn_join_rings(origins, neighbors, k, neighbor_count=cnt, **kw)
