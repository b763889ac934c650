"""SearchResult-shaped nested output (reference R14, ``GeoSearch.scala:74``,
``SparkDS.scala:94-97``).

One row per origin:
  origin: struct<id, latitude, longitude>
  neighbors: array<struct<value: struct<id, latitude, longitude>,
                          euclideanDistance: double, ms: string>>
             ordered by distance asc (reference Ordering, GeoSearch.scala:70-71)
  searchSpace: the reference's binary-geohash prefix string (parity render)
  searchTimerSeconds: per-origin wall clock in the reference (SparkDS.scala:71).
             Column always present (schema parity). timing=False (default)
             emits 0.0 and keeps the plan pure-JVM — job-level timing is
             free via metrics.JobTimer; timing=True is the per-row parity
             mode (REAL amortized wall-clock via metrics.with_batch_timing,
             an Arrow tail stage). The notebook's avg/median/p75 tuning
             queries run via metrics.search_timer_summary on parity-mode
             output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import udfs
from .geodesy import to_km


def assemble_search_results(
    pairs: DataFrame,
    unit: str = "km",
    radius: float | str | None = None,
    bits: int = 40,
    include_search_space: bool = True,
    timing: bool = False,
    unit_col: str | None = None,
) -> DataFrame:
    """pairs (origin_*, neighbor_*, distance, distance_km) -> nested rows.

    ``radius`` is a float (uniform inquiry radius) or the NAME of a
    per-origin radius column on ``pairs`` (e.g. ``origin_radius_km`` from
    the per-row join) — the searchSpace prefix is then rendered at each
    origin's own radius. ``unit_col`` names a per-origin unit column on
    ``pairs`` (e.g. ``origin_unit`` from the per-row join with mixed
    units): the ``ms`` field reports each row's own unit and the
    searchSpace radius converts per row; ``unit`` is then ignored.

    ``timing=False`` (default) emits a deterministic 0.0 searchTimerSeconds
    — schema parity with the reference, pure-JVM plan (no Python stage);
    job-level timing is free via metrics.JobTimer. ``timing=True`` is the
    per-row PARITY mode: real per-origin amortized pipeline wall-clock via
    metrics.with_batch_timing (an Arrow mapInPandas tail stage — pay it
    only when per-row timers are the point)."""
    per_row_radius = isinstance(radius, str)
    neigh = F.struct(
        F.struct(
            F.col("neighbor_id").alias("id"),
            F.col("neighbor_latitude").alias("latitude"),
            F.col("neighbor_longitude").alias("longitude"),
        ).alias("value"),
        F.col("distance").alias("euclideanDistance"),
        (F.lit(unit) if unit_col is None else F.col(unit_col)).alias("ms"),
    )
    keys = ["origin_id", "origin_latitude", "origin_longitude"]
    if per_row_radius:
        keys.append(radius)  # functionally dependent on origin_id
    if unit_col is not None and unit_col not in keys:
        keys.append(unit_col)  # likewise per-origin
    grouped = (
        pairs.withColumn("_n", neigh)
        .groupBy(*keys)
        .agg(F.collect_list("_n").alias("_neighbors"))
    )
    out = grouped.select(
        F.struct(
            F.col("origin_id").alias("id"),
            F.col("origin_latitude").alias("latitude"),
            F.col("origin_longitude").alias("longitude"),
        ).alias("origin"),
        F.array_sort(
            F.col("_neighbors"),
            lambda a, b: F.when(a.euclideanDistance < b.euclideanDistance, -1)
            .when(a.euclideanDistance > b.euclideanDistance, 1)
            .when(a.value.id < b.value.id, -1)
            .when(a.value.id > b.value.id, 1)
            .otherwise(0),
        ).alias("neighbors"),
        F.col("origin_latitude").alias("_lat"),
        F.col("origin_longitude").alias("_lon"),
        *([F.col(radius).alias("_rkm_src")] if per_row_radius else []),
        *([F.col(unit_col).alias("_unit_src")] if unit_col is not None else []),
    )
    if include_search_space and radius is not None:
        from . import exprs

        render = udfs.make_search_space_string_udf(bits)
        unit_expr = F.lit(unit) if unit_col is None else F.col("_unit_src")
        if per_row_radius:
            r_km = exprs.radius_as_km(F.col("_rkm_src").cast("double"),
                                      unit_expr)
        elif unit_col is not None:
            # uniform radius + per-row units: the radius is in each row's
            # OWN unit (`unit` really is ignored, as documented) — convert
            # per row so searchSpace agrees with the ms field
            r_km = exprs.radius_as_km(F.lit(float(radius)), unit_expr)
        else:
            r_km = F.lit(to_km(radius, unit))
        out = out.withColumn(
            "searchSpace", render(F.col("_lat"), F.col("_lon"), r_km)
        )
    else:
        out = out.withColumn("searchSpace", F.lit(""))
    out = out.drop("_lat", "_lon", "_rkm_src", "_unit_src")
    if timing:
        from .metrics import with_batch_timing

        return with_batch_timing(out, "searchTimerSeconds")
    return out.withColumn("searchTimerSeconds", F.lit(0.0))
