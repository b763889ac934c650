"""Parity mode (R10a): prefix-grouped equi-join reproduces the reference's
LIKE-'prefix%' retrieval exactly, verified against a numpy reimplementation
of the reference's search (searchSpace prefix + distance filter)."""

import numpy as np
import pandas as pd

from geoengine import cells, geodesy
from geoengine.join import radius_join_pairs_prefix

BITS = 40


def _reference_search(origins: pd.DataFrame, neighbors: pd.DataFrame,
                      radius_km: float):
    """Numpy twin of the reference pipeline: per-origin bbox with CORNER
    lon-offset semantics (addDistanceToLongitude applied to the already
    latitude-shifted point, GeoSearch.scala:136-137) -> 4-corner common
    prefix -> candidates by prefix match -> law-of-cosines filter."""
    n_cells = cells.encode(
        neighbors["latitude"].to_numpy(), neighbors["longitude"].to_numpy(), BITS
    )
    out = set()
    for _, o in origins.iterrows():
        la, lo = o["latitude"], o["longitude"]
        lat_min = geodesy.add_distance_to_latitude(-radius_km, la)
        lat_max = geodesy.add_distance_to_latitude(radius_km, la)
        lon_min = geodesy.add_distance_to_longitude(-radius_km, lat_min, lo)
        lon_max = geodesy.add_distance_to_longitude(radius_km, lat_max, lo)
        corners = cells.encode(
            np.array([lat_min, lat_min, lat_max, lat_max]),
            np.array([lon_min, lon_max, lon_min, lon_max]),
            BITS,
        )
        prefix, plen = cells.common_prefix(corners, BITS)
        if plen == 0:
            cand = np.ones(len(neighbors), dtype=bool)
        else:
            cand = (n_cells >> (BITS - plen)) == prefix
        d = geodesy.dist_law_of_cosines_km(
            la, lo,
            neighbors["latitude"].to_numpy()[cand],
            neighbors["longitude"].to_numpy()[cand],
        )
        for nid in neighbors["id"].to_numpy()[cand][d <= radius_km]:
            out.add((o["id"], nid))
    return out


def test_prefix_parity_matches_reference_retrieval(spark):
    rng = np.random.default_rng(33)
    o = pd.DataFrame(
        {
            "id": [f"o{i}" for i in range(120)],
            "latitude": rng.uniform(-75, 75, 120),
            "longitude": rng.uniform(-179, 179, 120),
        }
    )
    nb = pd.DataFrame(
        {
            "id": [f"n{i}" for i in range(400)],
            "latitude": rng.uniform(-75, 75, 400),
            "longitude": rng.uniform(-179, 179, 400),
        }
    )
    got = radius_join_pairs_prefix(
        spark.createDataFrame(o), spark.createDataFrame(nb), 200.0, "km"
    ).select("origin_id", "neighbor_id").toPandas()
    got_set = set(zip(got["origin_id"], got["neighbor_id"]))
    want = _reference_search(o, nb, 200.0)
    assert got_set == want
    assert len(want) > 0
