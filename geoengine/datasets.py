"""Adapters from the driver's TPC-H-ish parquet to the engine's point
tables. Spatial columns are derived deterministically with pure integer
arithmetic on keys (FIXTURES.md §5) so the PySpark queries and the DuckDB
oracle SQL agree bit-exactly:

  lat = (key * A % 18000) / 100.0 - 90.0
  lon = (key * B % 36000) / 100.0 - 180.0

customer: A,B = 37,91 (origins) | supplier: 53,71 (neighbors) |
events: 37,91 on event_id (timestamped points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .exprs import POINT_MULTS as MULTS  # single source for the multipliers


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def with_point(df: DataFrame, key: str, a: int, b: int) -> DataFrame:
    """Attach the derived point via the exprs builders — the same module
    that owns the DuckDB twins (sql_lat/lon_from_key), so the Column
    formula and the oracle formula cannot drift apart."""
    from . import exprs

    k = F.col(key)
    return df.withColumn("latitude", exprs.lat_from_key(k, a)).withColumn(
        "longitude", exprs.lon_from_key(k, b)
    )


def customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = MULTS["customer"]
    return with_point(load(spark, sf_dir, "customer"), "c_custkey", a, b).select(
        F.col("c_custkey").alias("id"), "latitude", "longitude"
    )


def supplier_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = MULTS["supplier"]
    return with_point(load(spark, sf_dir, "supplier"), "s_suppkey", a, b).select(
        F.col("s_suppkey").alias("id"), "latitude", "longitude"
    )


def event_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = MULTS["events"]
    return with_point(load(spark, sf_dir, "events"), "event_id", a, b).select(
        F.col("event_id").alias("id"), "latitude", "longitude", "event_type", "value"
    )


# SQL twins (DuckDB dialect) -------------------------------------------------

def sql_point_cols(key: str, a: int, b: int) -> tuple[str, str]:
    from . import exprs

    return (exprs.sql_lat_from_key(key, a), exprs.sql_lon_from_key(key, b))
