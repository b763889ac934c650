"""Search timing metrics — the set-oriented replacement for the reference's
per-row ``searchTimerSeconds`` (``SparkDS.scala:71,95-97``; consumed by the
notebook's avg/median/p75 tuning queries,
``01_geospatial_searches.scala:208-227``).

The reference times each origin's remote round-trip individually. In a
set-oriented engine the honest per-row figure is the wall-clock the
pipeline spent producing that row's Arrow batch, amortized over the batch:
``mapInPandas`` pulls batches lazily from the upstream operators, so the
gap between successive batch arrivals in this stage IS the upstream compute
time (join + refinement + aggregation) attributable to that batch. Values
are real seconds, vary with data/skew/parallelism, and support the same
tuning queries as the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField

from .images import _extended  # single schema-copy helper (never mutate)


def with_batch_timing(df: DataFrame, col: str = "searchTimerSeconds") -> DataFrame:
    """Append per-row wall-clock seconds: the elapsed time between
    successive Arrow batch arrivals in this stage divided by batch rows."""
    schema = _extended(df, StructField(col, DoubleType()))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        prev = time.perf_counter()
        for b in batches:
            now = time.perf_counter()
            b[col] = (now - prev) / max(len(b), 1)
            yield b
            prev = time.perf_counter()

    return df.mapInPandas(gen, schema=schema)


class JobTimer:
    """Free-path search timing: an ``Observation`` riding the result plan
    (CollectMetrics — evaluated alongside the caller's own action, NO extra
    stage, no Arrow round-trip) plus driver wall-clock around the
    materialization. The per-origin figure is elapsed / n_origins — the
    same amortized quantity ``with_batch_timing`` stamps per row, measured
    once at the job level instead of per Arrow batch.

    Usage:
        timer = JobTimer()
        df = timer.attach(search(o, nb, 500.0))   # wrap the plan
        with timer:
            df.write.parquet(out)                 # any action
        timer.summary(spark).show()               # n_origins, s_per_origin
    """

    def __init__(self) -> None:
        from pyspark.sql import Observation

        self.observation = Observation()
        self.seconds: float | None = None
        self._t0: float | None = None
        self._count_col = "n_rows"

    def attach(self, df: DataFrame, count_col: str = "n_rows") -> DataFrame:
        self._count_col = count_col
        return df.observe(
            self.observation, F.count(F.lit(1)).alias(count_col)
        )

    def __enter__(self) -> "JobTimer":
        import time

        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        import time

        self.seconds = time.perf_counter() - self._t0

    def summary(self, spark) -> DataFrame:
        n = int(self.observation.get[self._count_col])
        per = (self.seconds / n) if (self.seconds and n) else None
        return spark.createDataFrame(
            [(n, float(self.seconds or 0.0), per)],
            schema="n_origins long, total_s double, s_per_origin double",
        )


def search_timer_summary(results: DataFrame,
                         col: str = "searchTimerSeconds") -> DataFrame:
    """The reference notebook's tuning aggregates
    (01_geospatial_searches.scala:208-227): avg / median / p75 of the
    per-origin search timer, plus row count."""
    return results.agg(
        F.count("*").alias("n_origins"),
        F.avg(col).alias("avg_s"),
        F.expr(f"percentile({col}, 0.5)").alias("p50_s"),
        F.expr(f"percentile({col}, 0.75)").alias("p75_s"),
        F.max(col).alias("max_s"),
    )
