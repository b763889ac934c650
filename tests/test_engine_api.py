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
