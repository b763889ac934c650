"""One-call facade: reference searchMiles scenario end-to-end."""

import pandas as pd

from geoengine.engine import search_miles


def test_search_miles_reference_scenario(spark):
    # reference src/test/scala/DataStore.scala:17-36 through the facade
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["a", "b", "c", "d"],
                "latitude": [10.0, 10.1, 55.0, -55.1],
                "longitude": [10.0, 10.1, -55.0, 50.1],
            }
        )
    )
    origins = spark.createDataFrame(
        pd.DataFrame({"id": ["q"], "latitude": [11.0], "longitude": [11.0]})
    )
    out = search_miles(origins, pts, 500.0, max_results=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["origin"]["id"] == "q"
    ids = [n["value"]["id"] for n in r["neighbors"]]
    assert set(ids) == {"a", "b"}
    # ordered nearest-first, distances in MILES (inquiry unit)
    ds = [n["euclideanDistance"] for n in r["neighbors"]]
    assert ds == sorted(ds)
    assert all(n["ms"] == "miles" for n in r["neighbors"])
    assert 85 < ds[0] < 90 and 95 < ds[1] < 100  # ~140/155 km in miles


def test_search_per_row_full_inquiry_model(spark):
    """Per-row radius + per-row maxResults through the one-call facade:
    nested SearchResult rows, each origin capped at ITS OWN k, searched at
    ITS OWN radius, searchSpace rendered per-origin."""
    import numpy as np

    from geoengine.engine import search_per_row

    rng = np.random.default_rng(23)
    neighbors = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [f"n{i}" for i in range(200)],
                "latitude": rng.uniform(9.0, 13.0, 200),
                "longitude": rng.uniform(9.0, 13.0, 200),
            }
        )
    )
    origins = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["near", "far"],
                "latitude": [11.0, 11.0],
                "longitude": [11.0, 11.0],
                "radius": [30.0, 300.0],  # km
                "max_results": [2, 7],
            }
        )
    )
    rows = {r["origin"]["id"]: r
            for r in search_per_row(origins, neighbors).collect()}
    assert len(rows["near"]["neighbors"]) <= 2
    assert len(rows["far"]["neighbors"]) == 7
    # same center point: the small-radius origin's neighbor set is a
    # prefix of the large-radius one's (both sorted nearest-first)
    near_ids = [n["value"]["id"] for n in rows["near"]["neighbors"]]
    far_ids = [n["value"]["id"] for n in rows["far"]["neighbors"]]
    assert near_ids == far_ids[: len(near_ids)]
    # per-origin searchSpace: wider radius -> shorter (or equal) prefix
    assert len(rows["far"]["searchSpace"]) <= len(rows["near"]["searchSpace"])
    assert set(rows["near"]["searchSpace"]) <= {"0", "1"}
    # every reported distance respects the row's own radius
    for oid, rad in (("near", 30.0), ("far", 300.0)):
        for n in rows[oid]["neighbors"]:
            assert n["euclideanDistance"] <= rad
