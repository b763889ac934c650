"""spark-submit entry point: end-to-end radius-neighborhood search / tiling
with checkpoint/resume (north_rule: ships as a spark-submit --py-files job).

Usage:
  spark-submit --py-files geoengine.zip geoengine/jobs/search_job.py \
      --origins /path/origins.parquet --neighbors /path/neighbors.parquet \
      --radius 500 --unit miles --max-results 10 --out /path/out \
      [--checkpoint-buckets 16] [--salt-threshold 1000000] [--tiles-zoom 12]

Inputs are point tables (id, latitude, longitude[, payload...]); output is
the nested SearchResult table plus optional tile assignments, written via
the snapshot layer (resumable; per-bucket lineage + metrics in
<out>/manifest.json).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from geoengine import exprs, snapshots
from geoengine.join import radius_join_pairs
from geoengine.results import assemble_search_results
from geoengine.topk import top_n_per_origin


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--origins", required=True)
    p.add_argument("--neighbors", required=True)
    p.add_argument("--radius", type=float, required=True)
    p.add_argument("--unit", default="km")
    p.add_argument("--max-results", type=int, default=10)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint-buckets", type=int, default=16)
    p.add_argument("--tiles-zoom", type=int, default=0)
    p.add_argument("--parity-topn", action="store_true")
    p.add_argument(
        "--parallelism", type=int, default=0,
        help="explicit DOP knob (reference repartition(n), README.md:51); "
             "0 = let AQE decide",
    )
    args = p.parse_args()

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("geoengine-search").getOrCreate()
    origins = spark.read.parquet(args.origins)
    neighbors = spark.read.parquet(args.neighbors)
    if args.parallelism:
        origins = origins.repartition(args.parallelism)

    def build(bucket: int):
        o = origins.where(
            snapshots.bucket_of("id", args.checkpoint_buckets) == bucket
        )
        pairs = radius_join_pairs(o, neighbors, args.radius, args.unit)
        top = top_n_per_origin(
            pairs, args.max_results, parity_topn=args.parity_topn
        )
        return assemble_search_results(top, unit=args.unit, radius=args.radius)

    import time as _time

    already = set(snapshots.read_manifest(args.out)["buckets"])
    t0 = _time.perf_counter()
    manifest = snapshots.run_with_checkpoint(
        build,
        args.out,
        args.checkpoint_buckets,
        lineage={
            "origins": args.origins,
            "neighbors": args.neighbors,
            "radius": args.radius,
            "unit": args.unit,
        },
    )
    # jobs-layer timing (free path — per-bucket rows/seconds already ride
    # the manifest via df.observe; this is the run-level roll-up the
    # reference's searchTimerSeconds tuning queries would consume). Only
    # buckets THIS invocation built count — a resume that skipped
    # committed work must not report their rows against its own clock.
    new = {b: v for b, v in manifest["buckets"].items() if b not in already}
    new_rows = sum(v["rows"] for v in new.values())
    elapsed = _time.perf_counter() - t0
    rate = f" ({new_rows / elapsed:.0f} rows/s)" if elapsed > 0 and new else ""
    print(
        f"geoengine-search: built {len(new)} bucket(s) / {new_rows} rows "
        f"in {elapsed:.2f}s{rate}; {len(already)} pre-committed bucket(s) "
        f"skipped"
    )

    if args.tiles_zoom:
        tiles = neighbors.select(
            "id",
            exprs.tile_x(F.col("longitude"), args.tiles_zoom).alias("tile_x"),
            exprs.tile_y(F.col("latitude"), args.tiles_zoom).alias("tile_y"),
        )
        tiles.write.mode("overwrite").parquet(args.out + "_tiles")

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
