"""Checkpoint/resume semantics: interrupted run resumes without recompute
and equals the single-shot result; metrics/lineage recorded per bucket."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geoengine import snapshots


def _build_fn(spark, sf_dir, n_buckets):
    def build(b):
        df = spark.read.parquet(f"{sf_dir}/customer.parquet")
        return df.where(
            snapshots.bucket_of("c_custkey", n_buckets) == b
        ).withColumn("flag", F.lit(b))

    return build


def test_resume_skips_completed_and_matches_full(spark, sf_dir, tmp_path):
    root = str(tmp_path / "snap")
    n = 4
    build = _build_fn(spark, sf_dir, n)

    # partial run: only bucket 0+1 committed (simulated crash after 2)
    calls = []

    def crashing(b):
        if b >= 2:
            raise KeyboardInterrupt("simulated crash")
        calls.append(b)
        return build(b)

    with pytest.raises(KeyboardInterrupt):
        snapshots.run_with_checkpoint(crashing, root, n)
    m = snapshots.read_manifest(root)
    assert set(m["buckets"]) == {"0", "1"}

    # resume: only buckets 2,3 execute
    resumed_calls = []

    def counting(b):
        resumed_calls.append(b)
        return build(b)

    m = snapshots.run_with_checkpoint(counting, root, n, lineage={"src": "customer"})
    assert resumed_calls == [2, 3]
    assert set(m["buckets"]) == {"0", "1", "2", "3"}

    got = snapshots.read_snapshot(spark, root)
    full = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert got.count() == full.count()
    assert set(got.select("c_custkey").toPandas()["c_custkey"]) == set(
        full.select("c_custkey").toPandas()["c_custkey"]
    )

    metrics = snapshots.metrics_table(spark, root).toPandas()
    assert len(metrics) == 4
    assert (metrics["rows"] > 0).any()
    assert metrics["seconds"].min() >= 0


def test_snapshot_time_travel_versions(spark, sf_dir, tmp_path):
    root = str(tmp_path / "snap_tt")
    n = 4
    build = _build_fn(spark, sf_dir, n)
    # serial commits -> deterministic version order 1..4
    snapshots.run_with_checkpoint(build, root, n, max_parallel=1)

    hist = snapshots.snapshot_versions(root)
    assert [h["version"] for h in hist] == [1, 2, 3, 4]
    assert [h["n_buckets"] for h in hist] == [1, 2, 3, 4]
    assert all(h["committed_utc"] for h in hist)

    # version 2 = table as of the second commit: buckets 0 and 1 only
    v2 = snapshots.read_snapshot(spark, root, version=2).toPandas()
    assert set(v2["flag"]) == {0, 1}
    live = snapshots.read_snapshot(spark, root).toPandas()
    assert set(live["flag"]) == {0, 1, 2, 3}
    full = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert len(live) == full.count()

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        snapshots.read_manifest(root, version=99)


def test_snapshot_versions_wave_parallel(spark, sf_dir, tmp_path):
    # parallel commits: order is nondeterministic but every commit still
    # creates exactly one version and the final version is the live state
    root = str(tmp_path / "snap_wave")
    build = _build_fn(spark, sf_dir, 4)
    m = snapshots.run_with_checkpoint(build, root, 4, max_parallel=4)
    assert m["version"] == 4
    hist = snapshots.snapshot_versions(root)
    assert [h["n_buckets"] for h in hist] == [1, 2, 3, 4]
    last = snapshots.read_manifest(root, version=4)
    assert last["buckets"] == m["buckets"]
