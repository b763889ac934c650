"""spark-submit job end-to-end (resumable) + clustered index layout +
payload passthrough invariant (input_hint: caption byte-equality and
decoded-pixel equality per joined row)."""

import sys

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geoengine import fixtures, images, snapshots
from geoengine.index import clustered_index_write
from geoengine.join import radius_join_pairs


def test_search_job_main(spark, tmp_path, monkeypatch):
    rng = np.random.default_rng(44)
    pts = pd.DataFrame(
        {
            "id": [f"p{i}" for i in range(300)],
            "latitude": rng.uniform(-60, 60, 300),
            "longitude": rng.uniform(-170, 170, 300),
        }
    )
    o_path, n_path = str(tmp_path / "o"), str(tmp_path / "n")
    spark.createDataFrame(pts[:100]).write.parquet(o_path)
    spark.createDataFrame(pts[100:]).write.parquet(n_path)

    from geoengine.jobs import search_job

    out = str(tmp_path / "out")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "search_job",
            "--origins", o_path,
            "--neighbors", n_path,
            "--radius", "300",
            "--unit", "km",
            "--max-results", "5",
            "--out", out,
            "--checkpoint-buckets", "3",
            "--tiles-zoom", "6",
        ],
    )
    search_job.main()
    res = snapshots.read_snapshot(spark, out)
    assert res.count() > 0
    assert set(res.columns) == {
        "origin", "neighbors", "searchSpace", "searchTimerSeconds",
    }
    tiles = spark.read.parquet(out + "_tiles")
    assert tiles.count() == 200
    m = snapshots.read_manifest(out)
    assert len(m["buckets"]) == 3
    assert all(v["lineage"]["radius"] == 300 for v in m["buckets"].values())


def test_clustered_index_write_layout(spark, tmp_path):
    rng = np.random.default_rng(45)
    pts = pd.DataFrame(
        {
            "id": [f"p{i}" for i in range(5000)],
            "latitude": rng.uniform(-80, 80, 5000),
            "longitude": rng.uniform(-179, 179, 5000),
        }
    )
    path = str(tmp_path / "idx")
    clustered_index_write(spark.createDataFrame(pts), path, half_bits=10)
    back = spark.read.parquet(path)
    assert back.count() == 5000
    # within every file, cell values are sorted (Z-order-equivalent layout
    # -> parquet min/max row-group skipping works)
    files = back.select("cell", F.input_file_name().alias("f")).toPandas()
    for _, grp in files.groupby("f"):
        v = grp["cell"].to_numpy()
        assert (np.diff(v) >= 0).all()


def test_nosql_index_view_parity(spark):
    # reference document model: key = exact 40-bit binary-geohash string,
    # value = bucket of points; golden key from GeoSearch.scala:72
    from geoengine.index import nosql_index_view

    pts = pd.DataFrame(
        {
            "id": ["g", "g2", "other"],
            "latitude": [34.932603, 34.932604, -12.0],
            "longitude": [-117.907324, -117.907323, 77.0],
        }
    )
    view = nosql_index_view(spark.createDataFrame(pts)).toPandas()
    golden = "0100110110100001010011000111111011001001"
    row = view[view["key"] == golden]
    assert len(row) == 1
    ids = sorted(v["id"] for v in row.iloc[0]["value"])
    assert ids == ["g", "g2"]  # both points share the exact 40-bit cell
    assert len(view) == 2
    assert all(len(k) == 40 and set(k) <= {"0", "1"} for k in view["key"])


def test_payload_passthrough_through_radius_join(spark):
    """input_hint invariant: after a spatial join over the image table,
    captions are byte-equal and decoded pixels exact per joined row."""
    imgs = fixtures.images_table(spark, 300, partitions=4)
    pts = imgs.select(
        F.col("image_id").alias("id"), "latitude", "longitude",
        "caption", "bytes", "w", "h", "fmt",
    )
    pairs = radius_join_pairs(pts, pts, 500.0, "km").where(
        F.col("origin_id") != F.col("neighbor_id")
    )
    got = pairs.select(
        "neighbor_id", "neighbor_caption", "neighbor_bytes",
        "neighbor_w", "neighbor_h", "neighbor_fmt",
    ).toPandas()
    assert len(got) > 0
    ref = fixtures.images_pandas(300).set_index("image_id")
    for r in got.itertuples():
        assert r.neighbor_caption == ref.loc[r.neighbor_id, "caption"]
        px_joined = images.decode_image(
            r.neighbor_bytes, r.neighbor_w, r.neighbor_h, r.neighbor_fmt
        )
        px_ref = images.decode_image(
            ref.loc[r.neighbor_id, "bytes"],
            ref.loc[r.neighbor_id, "w"],
            ref.loc[r.neighbor_id, "h"],
            ref.loc[r.neighbor_id, "fmt"],
        )
        assert np.array_equal(px_joined, px_ref)


def test_bucketed_index_join_elides_build_shuffle(spark):
    """The co-location pattern: a radius join against the bucketed catalog
    table must produce identical results to the shuffle join AND show no
    Exchange above the bucketed scan (the probe side is the only shuffle)."""
    from geoengine.index import (
        radius_join_pairs_bucketed,
        write_bucketed_neighbor_index,
    )
    from geoengine.join import radius_join_pairs

    rng = np.random.default_rng(71)
    mk = lambda seed, n: pd.DataFrame(
        {
            "id": [f"b{seed}_{i}" for i in range(n)],
            "latitude": np.random.default_rng(seed).uniform(-70, 70, n),
            "longitude": np.random.default_rng(seed).uniform(-170, 170, n),
        }
    )
    origins = spark.createDataFrame(mk(1, 400))
    neighbors = spark.createDataFrame(mk(2, 1500))
    hb = 5
    write_bucketed_neighbor_index(neighbors, "t_bucketed_nb", hb, n_buckets=8)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at sandbox size Catalyst would broadcast the tiny table (also a
        # fine plan, but then there is no distribution requirement to
        # elide); disable broadcast to exercise the bucketed path the
        # pattern exists for — the big-build-side regime
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = radius_join_pairs_bucketed(
            spark, origins, "t_bucketed_nb", 500.0, "km", half_bits=hb
        )
        want = radius_join_pairs(origins, neighbors, 500.0, "km", half_bits=hb)
        g = set(map(tuple, got.select("origin_id", "neighbor_id").collect()))
        w = set(map(tuple, want.select("origin_id", "neighbor_id").collect()))
        assert g == w and len(w) > 0

        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        p = got._jdf.queryExecution().explainString(jmode)
        # exactly one shuffle: the exploded probe side; the bucketed scan
        # satisfies the join's required distribution without an Exchange
        n_exchanges = sum(
            1 for line in p.splitlines()
            if "Exchange hashpartitioning" in line
        )
        assert n_exchanges == 1, p
        assert "Bucketed: true" in p or "SelectedBucketsCount" in p or \
            "bucketed: true" in p.lower(), p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS t_bucketed_nb")


def test_bucketed_index_per_row_radius(spark):
    """Per-row radius against the SAME prebuilt index (no rebuild): bucketed
    answer == plain per-row join answer, still no build-side Exchange."""
    import numpy as np
    import pandas as pd

    from geoengine.index import (
        radius_join_pairs_bucketed,
        write_bucketed_neighbor_index,
    )
    from geoengine.join import pick_half_bits, radius_join_pairs_per_row

    rng = np.random.default_rng(17)
    origins = spark.createDataFrame(pd.DataFrame({
        "id": [f"o{i}" for i in range(150)],
        "latitude": rng.uniform(-60, 60, 150),
        "longitude": rng.uniform(-170, 170, 150),
        "radius_km": (50.0 + (np.arange(150) % 6) * 90.0),  # 50..500 km
    }))
    neighbors = spark.createDataFrame(pd.DataFrame({
        "id": [f"n{i}" for i in range(300)],
        "latitude": rng.uniform(-60, 60, 300),
        "longitude": rng.uniform(-170, 170, 300),
    }))
    hb = pick_half_bits(500.0)
    write_bucketed_neighbor_index(neighbors, "t_bucketed_prr", hb, n_buckets=8)
    try:
        got = radius_join_pairs_bucketed(
            spark, origins, "t_bucketed_prr", "radius_km", "km", half_bits=hb
        )
        want = radius_join_pairs_per_row(
            origins, neighbors, radius_col="radius_km", unit="km", half_bits=hb
        )
        g = set(map(tuple, got.select("origin_id", "neighbor_id").collect()))
        w = set(map(tuple, want.select("origin_id", "neighbor_id").collect()))
        assert g == w and len(w) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_prr")


def test_bucketed_index_per_row_unit(spark):
    """Per-row radius AND unit on the bucketed scale path: same prebuilt
    index, mixed miles/km inquiries — answer and reported distance match
    the plain per-row join with unit_col."""
    import numpy as np
    import pandas as pd

    from geoengine.geodesy import MI_TO_KM
    from geoengine.index import (
        radius_join_pairs_bucketed,
        write_bucketed_neighbor_index,
    )
    from geoengine.join import pick_half_bits, radius_join_pairs_per_row

    rng = np.random.default_rng(23)
    n = 120
    origins = spark.createDataFrame(pd.DataFrame({
        "id": [f"o{i}" for i in range(n)],
        "latitude": rng.uniform(-60, 60, n),
        "longitude": rng.uniform(-170, 170, n),
        "radius": (50.0 + (np.arange(n) % 6) * 90.0),
        "unit": ["miles" if i % 2 == 0 else "km" for i in range(n)],
    }))
    neighbors = spark.createDataFrame(pd.DataFrame({
        "id": [f"n{i}" for i in range(250)],
        "latitude": rng.uniform(-60, 60, 250),
        "longitude": rng.uniform(-170, 170, 250),
    }))
    hb = pick_half_bits(500.0 * MI_TO_KM)
    write_bucketed_neighbor_index(neighbors, "t_bucketed_pru", hb, n_buckets=8)
    try:
        got = radius_join_pairs_bucketed(
            spark, origins, "t_bucketed_pru", "radius", unit_col="unit",
            half_bits=hb,
        )
        want = radius_join_pairs_per_row(
            origins, neighbors, radius_col="radius", unit_col="unit",
            half_bits=hb,
        )
        cols = ["origin_id", "neighbor_id", "distance"]
        g = {(a, b, round(d, 9)) for a, b, d in got.select(*cols).collect()}
        w = {(a, b, round(d, 9)) for a, b, d in want.select(*cols).collect()}
        assert g == w and len(w) > 0
        # uniform-radius call with unit_col must refuse
        import pytest
        with pytest.raises(ValueError, match="per-row"):
            radius_join_pairs_bucketed(
                spark, origins, "t_bucketed_pru", 100.0, unit_col="unit",
                half_bits=hb,
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_pru")
