"""Structured Streaming surface (engine extension — SURVEY.md §2.3: the
reference has nothing streaming; the engine exposes its tile/cell operators
over readStream so a live point feed rolls up into tile manifests).

All transforms reuse the same Column builders as batch (exprs.py), so the
streaming plan is the batch plan + watermarked state. Tests drive it with
trigger(availableNow=True) over parquet input — no live source needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import exprs


def streaming_tile_counts(
    stream: DataFrame,
    zoom: int,
    ts_col: str = "ts",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-tile point counts with late-data watermarking.

    Input: a streaming DataFrame with an event-time column and lat/lon.
    Output (append-mode capable): window, tile_x, tile_y, n_points.
    """
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window),
            exprs.tile_x(F.col(lon_col), zoom).alias("tile_x"),
            exprs.tile_y(F.col(lat_col), zoom).alias("tile_y"),
        )
        .agg(F.count("*").alias("n_points"))
    )


def streaming_cell_counts(
    stream: DataFrame,
    half_bits: int,
    ts_col: str = "ts",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Same rollup keyed by grid cell (index-maintenance shape: the batch
    neighbor index can be incrementally refreshed from this stream)."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window),
            exprs.grid_key(
                exprs.grid_ix(F.col(lon_col), half_bits),
                exprs.grid_iy(F.col(lat_col), half_bits),
                half_bits,
            ).alias("gkey"),
        )
        .agg(F.count("*").alias("n_points"))
    )
