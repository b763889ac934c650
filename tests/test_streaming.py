"""Streaming tile rollup == batch rollup on the same input (availableNow)."""

import os

from pyspark.sql import functions as F

from geoengine import exprs
from geoengine.streaming import streaming_tile_counts


def test_streaming_tile_counts_matches_batch(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/events.parquet"
    batch = spark.read.parquet(src)
    schema = batch.schema

    pts = lambda df: df.withColumn(
        "latitude", ((F.col("event_id") * 37) % 18000) / 100.0 - 90.0
    ).withColumn("longitude", ((F.col("event_id") * 91) % 36000) / 100.0 - 180.0)

    stream = spark.readStream.schema(schema).parquet(os.path.dirname(src) or src)
    # readStream needs a directory; copy the file into one
    d = tmp_path / "in"
    d.mkdir()
    batch.write.mode("overwrite").parquet(str(d))
    stream = spark.readStream.schema(schema).parquet(str(d))

    out = streaming_tile_counts(pts(stream), zoom=6, window="24 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT tile_x, tile_y, sum(n_points) AS n FROM tile_counts "
        "GROUP BY 1, 2"
    ).toPandas()
    want = (
        pts(batch)
        .groupBy(
            exprs.tile_x(F.col("longitude"), 6).alias("tile_x"),
            exprs.tile_y(F.col("latitude"), 6).alias("tile_y"),
        )
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    g = {(r.tile_x, r.tile_y): r.n for r in got.itertuples()}
    w = {(r.tile_x, r.tile_y): r.n for r in want.itertuples()}
    assert g == w and len(w) > 0
