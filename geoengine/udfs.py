"""Arrow-batched pandas UDFs + SQL registration.

The only Python that ever runs on the hot path — everything else is Column
expressions. Mirrors the reference's SQL UDF surface
(``SqlUDF.scala:10-31``): ``distanceKm``/``distanceMi`` take four STRING
columns and return -1.0 on any parse failure, exactly like the reference's
try/catch contract (``SqlUDF.scala:14-16,27-29``).

All factories are lazy (pandas_udf return-type parsing requires an active
SparkSession), and cached per (kind, bits).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from . import cells, geodesy


def _parse4(lat1, lon1, lat2, lon2):
    a = pd.to_numeric(lat1, errors="coerce").to_numpy(dtype=np.float64)
    b = pd.to_numeric(lon1, errors="coerce").to_numpy(dtype=np.float64)
    c = pd.to_numeric(lat2, errors="coerce").to_numpy(dtype=np.float64)
    d = pd.to_numeric(lon2, errors="coerce").to_numpy(dtype=np.float64)
    bad = np.isnan(a) | np.isnan(b) | np.isnan(c) | np.isnan(d)
    return a, b, c, d, bad


def _distance_km_values(lat1, lon1, lat2, lon2) -> pd.Series:
    a, b, c, d, bad = _parse4(lat1, lon1, lat2, lon2)
    out = geodesy.dist_law_of_cosines_km(
        np.nan_to_num(a), np.nan_to_num(b), np.nan_to_num(c), np.nan_to_num(d)
    )
    out = np.asarray(out, dtype=np.float64)
    out[bad] = -1.0
    return pd.Series(out)


@lru_cache(maxsize=None)
def distance_km_udf():
    """String-in, double-out great-circle km; -1.0 on parse failure
    (reference SqlUDF.scala:10-18)."""

    @pandas_udf("double")
    def _km(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        return _distance_km_values(lat1, lon1, lat2, lon2)

    return _km


@lru_cache(maxsize=None)
def distance_mi_udf():
    """Miles variant = kmToMi ∘ distance (reference SqlUDF.scala:23-31)."""

    @pandas_udf("double")
    def _mi(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        km = _distance_km_values(lat1, lon1, lat2, lon2).to_numpy()
        out = km * geodesy.KM_TO_MI
        out[km < 0] = -1.0
        return pd.Series(out)

    return _mi


@lru_cache(maxsize=None)
def make_cell_encode_udf(bits: int):
    """pandas_udf (lat, lon) -> interleaved int64 cell at `bits`.

    High-res twin of exprs.cell_encode for bits > ~40 where the expression
    tree gets wide; numpy bit-spreading is O(1) per row.
    """

    @pandas_udf("long")
    def _cell(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            cells.encode(lat.to_numpy(np.float64), lon.to_numpy(np.float64), bits)
        )

    return _cell


@lru_cache(maxsize=None)
def make_cell_string_udf(bits: int):
    """Render interleaved cell id to the reference's '0'/'1' string
    (parity output, GeoSearch.scala:17 ``toBinaryString``)."""

    @pandas_udf("string")
    def _s(cell: pd.Series) -> pd.Series:
        return cell.map(lambda c: format(int(c) & ((1 << bits) - 1), f"0{bits}b"))

    return _s


def _search_space_frame(lat, lon, radius_km, bits: int) -> pd.DataFrame:
    la = lat.to_numpy(np.float64)
    lo = lon.to_numpy(np.float64)
    r = radius_km.to_numpy(np.float64)
    lat_min = geodesy.add_distance_to_latitude(-r, la)
    lat_max = geodesy.add_distance_to_latitude(r, la)
    # parity: lon offsets at the SHIFTED latitudes (GeoSearch.scala:136-137
    # applies addDistanceToLongitude to the latitude-shifted point) — the SW
    # lon offset is taken at lat_min, the NE offset at lat_max
    lon_min = geodesy.add_distance_to_longitude(-r, lat_min, lo)
    lon_max = geodesy.add_distance_to_longitude(r, lat_max, lo)
    c_sw = cells.encode(lat_min, lon_min, bits)
    c_se = cells.encode(lat_min, lon_max, bits)
    c_nw = cells.encode(lat_max, lon_min, bits)
    c_ne = cells.encode(lat_max, lon_max, bits)
    plen = np.minimum.reduce(
        [
            cells.common_prefix_len(c_sw, c_se, bits),
            cells.common_prefix_len(c_sw, c_nw, bits),
            cells.common_prefix_len(c_sw, c_ne, bits),
        ]
    )
    prefix = np.where(plen > 0, c_sw >> (bits - np.maximum(plen, 1)), 0)
    return pd.DataFrame(
        {"prefix_bits": prefix.astype(np.int64), "prefix_len": plen.astype(np.int32)}
    )


@lru_cache(maxsize=None)
def make_search_space_udf(bits: int):
    """Per-origin search space (reference GeoSearch.scala:109-123):
    common bit-prefix of the 4 corner cells of the radius bounding box.
    Input (lat, lon, radius_km) -> struct(prefix_bits long, prefix_len int).
    """

    @pandas_udf("struct<prefix_bits: long, prefix_len: int>")
    def _ss(lat: pd.Series, lon: pd.Series, radius_km: pd.Series) -> pd.DataFrame:
        return _search_space_frame(lat, lon, radius_km, bits)

    return _ss


@lru_cache(maxsize=None)
def make_search_space_string_udf(bits: int):
    """Parity render of the per-origin search space as the reference's
    '0'/'1' prefix string (GeoSearch.scala:109-123 output contract; empty
    string == match-all, the LIKE '%' degradation at SparkDS.scala:72)."""

    @pandas_udf("string")
    def _render(lat: pd.Series, lon: pd.Series, radius_km: pd.Series) -> pd.Series:
        df = _search_space_frame(lat, lon, radius_km, bits)
        return pd.Series(
            [
                format(int(p) & ((1 << bits) - 1), "b").zfill(int(n))[-int(n):]
                if n > 0
                else ""
                for p, n in zip(df["prefix_bits"], df["prefix_len"])
            ]
        )

    return _render


def register_sql_udfs(spark: SparkSession, bits: int = 40) -> None:
    """Register the reference-parity SQL UDF surface
    (README.md:113-120 usage contract)."""
    spark.udf.register("distanceKm", distance_km_udf())
    spark.udf.register("distanceMi", distance_mi_udf())
    spark.udf.register("cellEncode", make_cell_encode_udf(bits))
    spark.udf.register("cellString", make_cell_string_udf(bits))
