"""Spatial field estimation: inverse-distance-weighted interpolation and
grid-cell Gaussian kernel density.

Both operators are COMPOSITIONS of certified primitives — the cell-keyed
radius join (join.radius_join_pairs: covering-cell explode -> single
int64 equi-join -> codegen'd law-of-cosines `<=` refinement,
GeoSearch.scala:169-177 constants) plus plain aggregates (and, for the
k-capped IDW variant, the deterministic top-k window topk.py uses for
the reference's maxResults rule). No UDFs, no cartesian, nothing
driver-side: at 100 TB the cost is the one certified pair join plus one
hash aggregate on the query/cell key.

Cross-engine float parity (the repo's oracle rules): weights use exact
IEEE multiplication chains (d*d, never pow()) for integer powers, the
Gaussian exponent divides by a Python-computed literal (2*bw^2) shared
verbatim with the SQL twin, and outputs are rounded by the CALLER's gate
query (6dp at gate row counts — sums are partition-reassociated, so
last-ulp drift is expected and bounded ~1e-11 relative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from . import exprs
from .geodesy import to_km


def _inv_power_weight(d: Column, power: int) -> Column:
    """1 / d^power as an exact multiplication chain (cross-engine IEEE
    parity: libm pow() may differ in the last ulp between the JVM and
    DuckDB; repeated multiplication cannot)."""
    acc = d
    for _ in range(power - 1):
        acc = acc * d
    return F.lit(1.0) / acc


def sql_inv_power_weight(d: str, power: int) -> str:
    """DuckDB twin of :func:`_inv_power_weight` — same multiplication
    order (left fold), same literal style."""
    acc = d
    for _ in range(power - 1):
        acc = f"({acc} * {d})"
    return f"(1.0e0 / {acc})"


def idw_interpolate(
    queries: DataFrame,
    samples: DataFrame,
    value_col: str,
    radius: float,
    k: int | None = None,
    power: int = 2,
    unit: str = "km",
    half_bits: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Inverse-distance-weighted interpolation: predict ``value_col`` at
    each query point from the samples within ``radius`` (optionally only
    the ``k`` nearest — deterministic (distance, sample-id) tie-break,
    the same rule the reference's maxResults truncation uses,
    GeoSearch.scala:169-175 via topk.top_n_per_origin).

    prediction = sum(v_i / d_i^power) / sum(1 / d_i^power)

    Exact-location samples (d == 0, where the weight is singular) follow
    the standard IDW rule: the prediction is the plain average of the
    zero-distance samples' values, deterministically.

    Inputs: ``queries`` (id, latitude, longitude), ``samples`` (id,
    latitude, longitude, value_col). Output: (id, predicted, n_samples,
    nearest_km) — one row per query that has >= 1 sample in radius
    (inner semantics; left-join the query table downstream if absent
    queries must surface as NULL).

    Scale posture: one certified radius join + (optionally) one window
    + one hash aggregate on the query id. ``power`` must be a positive
    int (exact multiplication chains keep the DuckDB oracle bit-honest;
    see module docstring).
    """
    if not isinstance(power, int) or power < 1:
        raise ValueError(f"power must be a positive int, got {power!r}")
    if k is not None and int(k) < 1:
        raise ValueError(f"k must be >= 1, got {k!r}")
    from .join import radius_join_pairs
    from .topk import top_n_per_origin

    pairs = radius_join_pairs(
        queries.select("id", "latitude", "longitude"),
        samples.select("id", "latitude", "longitude", value_col),
        radius, unit=unit, half_bits=half_bits, strategy=strategy,
    )
    if k is not None:
        pairs = top_n_per_origin(pairs, int(k))
    d = F.col("distance_km")
    v = F.col(f"neighbor_{value_col}").cast("double")
    w = _inv_power_weight(d, power)
    agg = pairs.groupBy(F.col("origin_id").alias("id")).agg(
        # non-NULL iff any zero-distance sample exists -> coalesce picks it
        F.avg(F.when(d == 0.0, v)).alias("_zavg"),
        F.sum(F.when(d > 0.0, v * w)).alias("_wv"),
        F.sum(F.when(d > 0.0, w)).alias("_w"),
        F.count(F.lit(1)).alias("n_samples"),
        F.min(d).alias("nearest_km"),
    )
    return agg.select(
        "id",
        F.coalesce("_zavg", F.col("_wv") / F.col("_w")).alias("predicted"),
        "n_samples",
        "nearest_km",
    )


def cell_centers(cells: DataFrame, half_bits: int,
                 cell_col: str = "cell") -> DataFrame:
    """Attach center_lat/center_lon for grid-cell keys (grid_key layout:
    ix * 2^half_bits + iy — the inverse of join.with_grid_cell)."""
    n = 1 << half_bits
    ix = F.shiftright(F.col(cell_col), half_bits)
    iy = F.col(cell_col).bitwiseAND(n - 1)
    return cells.select(
        "*",
        exprs.grid_center_lat(iy, half_bits).alias("center_lat"),
        exprs.grid_center_lon(ix, half_bits).alias("center_lon"),
    )


def kde_cells(
    points: DataFrame,
    bandwidth: float,
    half_bits: int,
    unit: str = "km",
    cutoff_sigmas: float = 3.0,
    strategy: str = "auto",
) -> DataFrame:
    """Gaussian kernel density over the OCCUPIED-cell grid: for each
    grid cell that contains >= 1 point, density at the cell center =
    sum over points within cutoff_sigmas*bandwidth of
    exp(-d^2 / (2*bandwidth^2)).

    The truncation at ``cutoff_sigmas`` (default 3 -> kernel mass beyond
    it < 1.2e-2 of a point's total) is what makes this a bounded radius
    join instead of an all-pairs pass: each point lands in O(cutoff-disc
    / cell-area) cells. Density SURFACES (not per-point smoothing) are
    the standard hot-spot rendering input; for statistical hot/cold
    classification see clusters/hotspot (Getis-Ord).

    Output: (cell, center_lat, center_lon, density, n_points). Cost at
    100 TB: one distinct on the cell key (bounded by 4^half_bits), one
    certified radius join cells x points, one hash aggregate per cell.
    """
    if not (bandwidth > 0):
        raise ValueError(f"bandwidth must be > 0, got {bandwidth!r}")
    if not (cutoff_sigmas > 0):
        raise ValueError(
            f"cutoff_sigmas must be > 0, got {cutoff_sigmas!r}")
    from .clusters import _KM_PER_DEG
    from .join import radius_join_pairs, validate_points, with_grid_cell

    bw_km = to_km(float(bandwidth), unit)
    cutoff_km = cutoff_sigmas * bw_km
    # resolution-consistency rule: the truncation radius must cover the
    # worst-case center-to-corner path of one cell (meridian + parallel
    # leg bound, same family as clusters._CONTRACT_NUM), else a cell's
    # OWN points can fall outside the kernel's reach and an occupied
    # cell silently emits nothing — an eager error beats that surprise
    half_diag_km = _KM_PER_DEG * 270.0 / (1 << half_bits)
    if cutoff_km < half_diag_km:
        raise ValueError(
            f"cutoff ({cutoff_km:.1f} km) is below the worst-case "
            f"center-to-corner distance of a half_bits={half_bits} cell "
            f"({half_diag_km:.1f} km): points could not reach their own "
            "cell's center. Use finer half_bits or a larger bandwidth/"
            "cutoff_sigmas."
        )
    two_bw2 = 2.0 * bw_km * bw_km  # Python literal, shared with the twin
    pts = validate_points(points).select("id", "latitude", "longitude")
    cells = cell_centers(
        with_grid_cell(pts, half_bits, out="cell").select("cell").distinct(),
        half_bits,
    ).select(
        F.col("cell").alias("id"),
        F.col("center_lat").alias("latitude"),
        F.col("center_lon").alias("longitude"),
    )
    pairs = radius_join_pairs(
        cells, pts, cutoff_km, unit="km", strategy=strategy, validate=False,
    )
    d = F.col("distance_km")
    kern = F.exp(-(d * d) / F.lit(two_bw2))
    return (
        pairs.groupBy(
            F.col("origin_id").alias("cell"),
            F.col("origin_latitude").alias("center_lat"),
            F.col("origin_longitude").alias("center_lon"),
        )
        .agg(
            F.sum(kern).alias("density"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
