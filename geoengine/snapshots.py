"""Checkpoint/resume + per-partition lineage & metrics (north_rule).

Batch snapshot semantics over plain parquet behind a small catalog seam —
an Iceberg catalog can replace the manifest with real snapshots via config;
this sandbox has no Iceberg jars (SURVEY.md §7 risk note), so the layout is:

    <root>/
      manifest.json          — committed buckets: lineage + metrics
      bucket=<i>/*.parquet   — output of bucket i (atomic: tmp dir + rename)

A "bucket" is a deterministic horizontal slice of the input keyspace
(pmod(xxhash64(key), n_buckets)). ``run_with_checkpoint`` executes only the
buckets missing from the manifest — kill it anywhere, rerun, and completed
work is never recomputed; output equals the single-shot run
(tests/test_snapshots.py).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def _manifest_path(root: str) -> str:
    return os.path.join(root, "manifest.json")


def read_manifest(root: str, version: int | None = None) -> dict:
    """The live manifest, or a historical snapshot version (time travel
    over COMMIT MEMBERSHIP: every bucket commit writes manifest-v{n}.json,
    so version n is the table as of its n-th commit — the Iceberg
    snapshot-history seam. Data files are not themselves versioned: a
    bucket recomputed after a crash replaces its files, so historical
    versions see current file contents for still-live buckets, exactly
    like an Iceberg table after a rewrite without retained snapshots)."""
    p = (_manifest_path(root) if version is None
         else os.path.join(root, f"manifest-v{int(version)}.json"))
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    if version is not None:
        raise FileNotFoundError(f"no snapshot version {version} under {root}")
    return {"buckets": {}, "schema_version": 1, "version": 0}


def snapshot_versions(root: str) -> list[dict]:
    """Commit history: one row per snapshot version (version, n_buckets,
    committed_utc of the commit that created it)."""
    out = []
    m = read_manifest(root)
    for v in range(1, int(m.get("version", 0)) + 1):
        mv = read_manifest(root, version=v)
        out.append(
            {
                "version": v,
                "n_buckets": len(mv["buckets"]),
                "committed_utc": mv.get("committed_utc"),
            }
        )
    return out


def _commit_bucket(root: str, bucket: int, meta: dict) -> None:
    m = read_manifest(root)
    m["buckets"][str(bucket)] = meta
    m["version"] = int(m.get("version", 0)) + 1
    m["committed_utc"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
    )
    body = json.dumps(m, indent=1, sort_keys=True)
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(body)
    # history BEFORE the live pointer: a crash between the two writes
    # loses at most the convenience copy, never the live manifest
    with open(os.path.join(root, f"manifest-v{m['version']}.json"), "w") as f:
        f.write(body)
    os.replace(tmp, _manifest_path(root))


def bucket_of(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))


def run_with_checkpoint(
    build: Callable[[int], DataFrame],
    root: str,
    n_buckets: int,
    lineage: dict | None = None,
    max_parallel: int = 4,
) -> dict:
    """Execute build(bucket_id) -> DataFrame for every uncommitted bucket.

    Each bucket writes to a tmp dir then renames (atomic on one FS) and is
    recorded in the manifest with row count, wall seconds, and caller
    lineage. Returns the final manifest.

    Scale posture: buckets are INDEPENDENT Spark jobs, so up to
    ``max_parallel`` are submitted concurrently from a thread pool (Spark's
    scheduler interleaves their stages across the cluster — a serial driver
    loop would leave executors idle between bucket tails). The row count
    rides the write job itself via ``df.observe`` — no re-read of the
    written files (the round-2 version paid a full second scan per bucket).
    Manifest commits are serialized by a lock; the manifest stays the
    single source of truth for resume, so a crash mid-wave loses only the
    buckets whose rename had not yet happened.
    """
    os.makedirs(root, exist_ok=True)
    committed = set(read_manifest(root)["buckets"])
    todo = [b for b in range(n_buckets) if str(b) not in committed]
    lock = threading.Lock()

    def run_bucket(b: int) -> None:
        t0 = time.time()
        obs = Observation()
        df = build(b).observe(obs, F.count(F.lit(1)).alias("rows"))
        final = os.path.join(root, f"bucket={b}")
        tmp = os.path.join(root, f"_tmp_bucket={b}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        n_rows = int(obs.get["rows"])
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        with lock:
            _commit_bucket(
                root,
                b,
                {
                    "rows": n_rows,
                    "seconds": round(time.time() - t0, 3),
                    "lineage": lineage or {},
                },
            )

    if todo:
        if max_parallel <= 1:
            for b in todo:
                run_bucket(b)
        else:
            with ThreadPoolExecutor(max_workers=max_parallel) as pool:
                # materialize so the first exception propagates (fail fast;
                # already-renamed buckets stay committed for resume)
                list(pool.map(run_bucket, todo))
    return read_manifest(root)


def read_snapshot(spark: SparkSession, root: str,
                  version: int | None = None) -> DataFrame:
    """Union of all committed buckets — of the live manifest, or of a
    historical snapshot ``version`` (time travel over commit membership;
    see read_manifest for the data-file caveat)."""
    m = read_manifest(root, version=version)
    paths = [os.path.join(root, f"bucket={b}") for b in sorted(m["buckets"], key=int)]
    if not paths:
        raise FileNotFoundError(f"no committed buckets under {root}")
    return spark.read.parquet(*paths)


def metrics_table(spark: SparkSession, root: str) -> DataFrame:
    """Per-partition (bucket) metrics as a DataFrame (north_rule lineage +
    metrics tables)."""
    m = read_manifest(root)
    rows = [
        {
            "bucket": int(b),
            "rows": v["rows"],
            "seconds": float(v["seconds"]),
            "lineage": json.dumps(v.get("lineage", {}), sort_keys=True),
        }
        for b, v in m["buckets"].items()
    ]
    return spark.createDataFrame(
        rows, schema="bucket int, rows long, seconds double, lineage string"
    )
