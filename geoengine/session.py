"""SparkSession factory with engine defaults (local test profile).

Scale posture: AQE on (runtime coalesce + skew-join split), explicit
shuffle-partition count, Arrow enabled for the pandas-UDF kernels. On a real
cluster these come from spark-submit conf; this factory is for tests/bench.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "geoengine",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # pin BLAS to 1 thread per python worker: numpy kernels otherwise
        # oversubscribe cores and flatten executor-level scaling
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        # fork a fresh python worker per task instead of reusing (default
        # here, overridable via SPARK_GRAFT_WORKER_REUSE=1): at 32
        # concurrent workers, reused workers left behind by a heavy Arrow
        # stage (e.g. image mapInPandas) stall the NEXT pandas-UDF stage by
        # >10x (measured 47s -> 2.9s on the minhash stage); fork from
        # pyspark.daemon is ~ms, so per-task spawn is cheaper than the
        # poisoning. On a real cluster with few cores per executor the
        # default reuse=true is fine — this is a wide-local-mode profile.
        .config(
            "spark.python.worker.reuse",
            "true" if os.environ.get("SPARK_GRAFT_WORKER_REUSE") == "1"
            else "false",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
