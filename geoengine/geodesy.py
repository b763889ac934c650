"""Great-circle geodesy kernels — numpy twins of the Column expressions.

Formulas and constants are parity-exact with the reference:
  - law-of-cosines distance, R = 6371 km (reference ``GeoSearch.scala:169-177``)
  - miToKm = 1.60934, kmToMi = 0.621371 (``GeoSearch.scala:178-179``)
  - addDistanceToLatitude/Longitude (``GeoSearch.scala:149-163``)
  - bounding box = SW/NE corners at +-size (``GeoSearch.scala:134-139``)

A haversine variant is provided for numerical stability at small distances;
parity mode uses law-of-cosines.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0
MI_TO_KM = 1.60934
KM_TO_MI = 0.621371


def to_km(size, unit):
    """Radius in `unit` ('mi'/'km', first-letter rule per reference
    ``DataStore.scala:30-34``) -> km."""
    u = unit.strip().lower()[:1]
    if u == "k":
        return size
    if u == "m":
        return size * MI_TO_KM
    raise ValueError(f"unknown unit {unit!r}")


def from_km(size_km, unit):
    u = unit.strip().lower()[:1]
    if u == "k":
        return size_km
    if u == "m":
        return size_km * KM_TO_MI
    raise ValueError(f"unknown unit {unit!r}")


def dist_law_of_cosines_km(lat1, lon1, lat2, lon2):
    """Great-circle distance (km), law of cosines — reference
    ``GeoSearch.scala:169-175``. Vectorized; clamps acos arg to [-1, 1]."""
    la1, lo1 = np.radians(np.asarray(lat1, float)), np.radians(np.asarray(lon1, float))
    la2, lo2 = np.radians(np.asarray(lat2, float)), np.radians(np.asarray(lon2, float))
    c = np.sin(la1) * np.sin(la2) + np.cos(la1) * np.cos(la2) * np.cos(lo1 - lo2)
    return np.arccos(np.clip(c, -1.0, 1.0)) * EARTH_RADIUS_KM


def dist_haversine_km(lat1, lon1, lat2, lon2):
    la1, lo1 = np.radians(np.asarray(lat1, float)), np.radians(np.asarray(lon1, float))
    la2, lo2 = np.radians(np.asarray(lat2, float)), np.radians(np.asarray(lon2, float))
    a = (
        np.sin((la2 - la1) / 2.0) ** 2
        + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2.0) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def add_distance_to_latitude(dist_km, lat):
    """Move north by dist_km — reference ``GeoSearch.scala:161-163``."""
    return np.asarray(lat, float) + (np.asarray(dist_km, float) / EARTH_RADIUS_KM) * (
        180.0 / np.pi
    )


def add_distance_to_longitude(dist_km, lat, lon):
    """Move east by dist_km at given latitude — ``GeoSearch.scala:149-151``.

    NOTE (parity): no clamping at +-180 or poles, same as the reference —
    callers must handle antimeridian-crossing boxes (join layer wraps the
    grid index instead).
    """
    return np.asarray(lon, float) + np.asarray(dist_km, float) * (
        1.0 / ((np.pi / 180.0) * EARTH_RADIUS_KM)
    ) / np.cos(np.asarray(lat, float) * np.pi / 180.0)


def bounding_box(lat, lon, size_km):
    """(lat_min, lat_max, lon_min, lon_max) — ``GeoSearch.scala:134-139``.

    Corner semantics, parity-exact: the reference applies
    addDistanceToLongitude to the already latitude-shifted point, so the
    SW lon offset is taken at lat_min and the NE lon offset at lat_max
    (``GeoSearch.scala:136-137``) — NOT at the center latitude.
    """
    lat_min = add_distance_to_latitude(-size_km, lat)
    lat_max = add_distance_to_latitude(size_km, lat)
    return (
        lat_min,
        lat_max,
        add_distance_to_longitude(-size_km, lat_min, lon),
        add_distance_to_longitude(size_km, lat_max, lon),
    )
