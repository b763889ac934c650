"""Dump .explain("formatted") for the bench/headline query plans to
plans/r06/<name>_<tag>.txt.  Run:  python tools/dump_plans.py before|after
[names...]

Uses the same constructions bench.py uses (the frozen driver bench times
exactly these library calls), so the captured plans are the plans the
measured queries run.  spatial_dbscan / dedup_clusters are iterative
operators: their final-output plan is captured (the loop's per-round plans
are described in OPTIMIZATION_r06.md instead), and building it executes the
operator's bounded probe actions — expect those two to take a few seconds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from geoengine import datasets, exprs
    from geoengine.join import radius_join_pairs
    from geoengine.knn import knn_join_rings
    from geoengine.session import get_spark
    from geoengine.text import exact_dedup, minhash_near_dup_pairs
    from geoengine.topk import top_n_per_origin

    spark = get_spark("plan-dump", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def explain_str(df) -> str:
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        return df._jdf.queryExecution().explainString(jmode)

    def dump(name: str, df_fn) -> None:
        if only and name not in only:
            return
        df = df_fn()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {path}")

    origins = datasets.with_point(
        spark.read.parquet(f"{sf_dir}/orders.parquet"), "o_orderkey", 41, 97
    ).select(F.col("o_orderkey").alias("id"), "latitude", "longitude")
    customers = datasets.customer_points(spark, sf_dir)
    suppliers = datasets.supplier_points(spark, sf_dir)
    events = datasets.event_points(spark, sf_dir)

    pairs = lambda: radius_join_pairs(origins, customers, 100.0, "km")  # noqa: E731
    dump("radius_join", pairs)
    dump("radius_topk", lambda: top_n_per_origin(pairs(), 10))
    dump("knn_rings", lambda: knn_join_rings(customers, suppliers, 5))

    def tiles():
        return events.select(
            "id",
            exprs.tile_x(F.col("longitude"), 12).alias("tile_x"),
            exprs.tile_y(F.col("latitude"), 12).alias("tile_y"),
        )

    dump("tile_assign", tiles)
    dump("tile_rollup", lambda: tiles().groupBy("tile_x", "tile_y")
         .agg(F.count("*").alias("n")))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dump("dedup_exact", lambda: exact_dedup(docs))
    dump("minhash_lsh",
         lambda: minhash_near_dup_pairs(docs, jaccard_threshold=0.5))

    from geoengine.fixtures import images_table
    from geoengine.images import with_computed_phash

    dump("images_phash",
         lambda: with_computed_phash(images_table(spark, 6000, partitions=8)))

    from geoengine.similarity import cosine_topk_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") % 29 == 0)
    dump("embedding_ivf", lambda: cosine_topk_ivf(
        qs, emb, 3, n_centroids=16, n_probe=4, refine_iters=2, n_assign=3
    ))

    from geoengine.fixtures import polygons_table
    from geoengine.trajectories import geofence_visits, trajectory_stats

    ev_fix = datasets.with_point(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "event_id", 37, 91
    ).select(F.col("event_id").alias("id"), "user_id", "ts",
             "latitude", "longitude")
    fences = polygons_table(
        spark, 6, seed=11, half_width_scale=16.0
    ).withColumn("rings", F.array("ring")).drop("ring")
    dump("trajectory_stats", lambda: trajectory_stats(ev_fix))
    dump("geofence_visits", lambda: geofence_visits(ev_fix, fences))

    # iterative operators: capture the final-output plan (probe actions run)
    import __spark_entry__ as _entry
    from geoengine.clusters import spatial_dbscan

    db_pts = _entry._dbscan_points(spark, sf_dir)
    dump("spatial_dbscan", lambda: spatial_dbscan(db_pts, 10.0, 8))

    from geoengine.index import emerging_hotspots

    em_pts = (
        ev_fix.select(
            "latitude", "longitude",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .withColumn("bin", F.expr(f"us div {_entry.EMERGE_BIN_US}"))
        .drop("us")
    )
    dump("emerging_hotspots", lambda: emerging_hotspots(em_pts, _entry.EMERGE_HB))

    spark.stop()


if __name__ == "__main__":
    main()
