"""Deterministic synthetic generators (FIXTURES.md) — seed-stable, no
wall-clock, no unseeded random. The image+caption table matches
BASELINE.json input_hint exactly:
  (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
   caption:string, phash:int64) + derived lat/lon placement.

Generation is distributed (mapInPandas over spark.range) so the generator
itself scales with the cluster — at 10^12 rows the same plan fans out over
executors; nothing is collected on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .images import encode_q6, phash64_batch

_ADJ = ["quiet", "bright", "ancient", "rapid", "smooth", "dense", "hollow", "pale"]
_NOUN = ["harbor", "forest", "circuit", "meadow", "engine", "canyon", "archive", "tide"]

SIZES = (16, 24, 32)

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, latitude double, longitude double"
)


# image placement / metadata derived from the integer index with pure
# arithmetic so a SQL oracle (DuckDB range()) can reproduce it exactly
IMG_LAT_MULT, IMG_LON_MULT = 9973, 7919


def img_lat(i: int) -> float:
    return ((i * IMG_LAT_MULT) % 1_700_000) / 10_000.0 - 85.0


def img_lon(i: int) -> float:
    return ((i * IMG_LON_MULT) % 3_600_000) / 10_000.0 - 180.0


def sql_img_cols(i: str = "i") -> dict[str, str]:
    """DuckDB twins of every index-derived image column (same IEEE ops)."""
    return {
        "image_id": f"printf('img%010d', {i})",
        "w": f"CAST(CASE {i} % 3 WHEN 0 THEN 16 WHEN 1 THEN 24 ELSE 32 END AS INTEGER)",
        "h": f"CAST(CASE ({i} // 3) % 3 WHEN 0 THEN 16 WHEN 1 THEN 24 ELSE 32 END AS INTEGER)",
        "fmt": f"CASE WHEN {i} % 10 = 7 THEN 'q6' ELSE 'raw' END",
        "latitude": f"((({i} * {IMG_LAT_MULT}) % 1700000) / 10000.0e0 - 85.0e0)",
        "longitude": f"((({i} * {IMG_LON_MULT}) % 3600000) / 10000.0e0 - 180.0e0)",
    }


def _make_batch(ids: list[int], seed: int) -> pd.DataFrame:
    """Deterministic rows for a batch of indices; phash computed as batched
    matmuls per (h, w) shape group."""
    rows = []
    for i in ids:
        image_id = f"img{i:010d}"
        rng = np.random.default_rng(seed ^ (i * 2654435761 % (1 << 63)))
        w = SIZES[i % len(SIZES)]
        h = SIZES[(i // 3) % len(SIZES)]
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if i % 10 == 7:
            fmt = "q6"
            buf = encode_q6(px)
            px = np.frombuffer(buf, np.uint8).reshape(h, w, 3)
        else:
            fmt, buf = "raw", px.tobytes()
        rows.append(
            {
                "image_id": image_id,
                "bytes": buf,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"caption of {image_id}: {_ADJ[i % 8]} {_NOUN[(i // 8) % 8]}",
                "_px": px,
                # integer-index placement (sql_img_cols twin) so a DuckDB
                # range() oracle reproduces it exactly
                "latitude": img_lat(i),
                "longitude": img_lon(i),
            }
        )
    df = pd.DataFrame(rows)
    ph = np.zeros(len(df), dtype=np.int64)
    for (h, w), idx in df.groupby(["h", "w"]).groups.items():
        pos = df.index.get_indexer(idx)
        ph[pos] = phash64_batch(np.stack([df["_px"].iloc[p] for p in pos]))
    df["phash"] = ph
    return df.drop(columns="_px")[
        ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
         "latitude", "longitude"]
    ]


def _make_row(i: int, seed: int) -> dict:
    return _make_batch([i], seed).iloc[0].to_dict()


def images_table(spark: SparkSession, n: int, seed: int = 42,
                 partitions: int | None = None) -> DataFrame:
    """Distributed deterministic image+caption table of n rows."""
    base = spark.range(0, n, 1, partitions or max(8, n // 50_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _make_batch([int(i) for i in b["id"]], seed)

    return base.mapInPandas(gen, schema=IMAGE_SCHEMA)


def images_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side twin for unit tests / oracles."""
    return _make_batch(list(range(n)), seed)


NEAR_DUP_IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string"
)


def _near_dup_batch(ids: list[int], seed: int) -> pd.DataFrame:
    """Deterministic 32x32 raw images where every index with i%5==3 is a
    NOISED TWIN of index i-1 (same base pixels, ~2% of pixels perturbed
    +-10 — measured phash hamming <=2 vs >=22 for independent pairs).
    Each row is derivable from its index alone (family pixels re-seeded
    from the family index), so workers never need the neighbor row and a
    DuckDB range() oracle can enumerate the exact expected pair set."""
    rows = []
    for i in ids:
        fam = i - 1 if i % 5 == 3 else i
        px = (
            np.random.default_rng(seed ^ (fam * 2654435761 % (1 << 63)))
            .integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        )
        if fam != i:  # twin: sparse deterministic noise keyed by OWN index
            nz = np.random.default_rng((seed + 1) ^ (i * 40503 % (1 << 61)))
            mask = nz.random((32, 32, 3)) < 0.02
            delta = nz.integers(-10, 11, size=(32, 32, 3))
            px = np.clip(px.astype(np.int64) + mask * delta, 0, 255).astype(
                np.uint8
            )
        rows.append(
            {
                "image_id": f"img{i:010d}",
                "bytes": px.tobytes(),
                "w": 32,
                "h": 32,
                "fmt": "raw",
                "caption": f"cap{i}",
            }
        )
    return pd.DataFrame(rows)


def near_dup_images_table(spark: SparkSession, n: int, seed: int = 42,
                          partitions: int | None = None) -> DataFrame:
    """Distributed near-dup image fixture (see _near_dup_batch)."""
    base = spark.range(0, n, 1, partitions or 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _near_dup_batch([int(i) for i in b["id"]], seed)

    return base.mapInPandas(gen, schema=NEAR_DUP_IMAGE_SCHEMA)


VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, fmt string"
)


def videos_table(spark: SparkSession, n: int, seed: int = 42,
                 partitions: int | None = None) -> DataFrame:
    """Deterministic multi-frame 'video' payloads: 1 + (i % 7) concatenated
    HxWx3 raw frames per row. Frame COUNT is index-derived arithmetic so a
    DuckDB range() oracle can verify sampling exactly (sql_video_cols)."""
    base = spark.range(0, n, 1, partitions or 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in (int(x) for x in b["id"]):
                rng = np.random.default_rng(seed ^ (i * 2654435761 % (1 << 63)))
                w = SIZES[i % len(SIZES)]
                h = SIZES[(i // 3) % len(SIZES)]
                nf = 1 + (i % 7)
                px = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
                rows.append(
                    {"video_id": f"vid{i:010d}", "bytes": px.tobytes(),
                     "w": w, "h": h, "fmt": "raw"}
                )
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=VIDEO_SCHEMA)


def sql_video_cols(i: str = "i") -> dict[str, str]:
    """DuckDB twins of the index-derived video columns."""
    return {
        "video_id": f"printf('vid%010d', {i})",
        "n_frames": f"CAST(1 + ({i} % 7) AS BIGINT)",
    }


AUDIO_SCHEMA = "audio_id string, bytes binary"
AUDIO_RATE = 16000


def audio_table(spark: SparkSession, n: int,
                partitions: int | None = None) -> DataFrame:
    """Deterministic mono int16 PCM payloads: row i is a constant-amplitude
    square wave (+A, -A alternating) with A = 1000 + (i*37) % 20000 and
    n_samples = 4000 * (1 + i % 8). RMS == peak == A and duration ==
    n_samples/16000 EXACTLY, all index-derived arithmetic — so a DuckDB
    range() oracle certifies the audio feature kernel end to end."""
    base = spark.range(0, n, 1, partitions or 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in (int(x) for x in b["id"]):
                amp = 1000 + (i * 37) % 20000
                ns = 4000 * (1 + i % 8)
                pcm = np.full(ns, amp, dtype=np.int16)
                pcm[1::2] *= -1
                rows.append({"audio_id": f"aud{i:010d}", "bytes": pcm.tobytes()})
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=AUDIO_SCHEMA)


def sql_audio_cols(i: str = "i") -> dict[str, str]:
    """DuckDB twins of the index-derived audio feature values."""
    amp = f"(1000 + ({i} * 37) % 20000)"
    ns = f"(4000 * (1 + {i} % 8))"
    return {
        "audio_id": f"printf('aud%010d', {i})",
        "duration_s": f"({ns} / {float(AUDIO_RATE)!r}e0)",
        "rms": f"CAST({amp} AS DOUBLE)",
        "peak": f"CAST({amp} AS BIGINT)",
    }


def polygon_rings(n_polys: int = 20, seed: int = 42,
                  half_width_scale: float = 1.0) -> list[tuple[str, list]]:
    """Seeded convex + star-concave polygon rings as plain Python
    (FIXTURES.md §4) — shared by the Spark table AND the DuckDB oracle
    (vertices inlined as literals), so both engines test the exact same
    geometry."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_polys):
        cx, cy = rng.uniform(-60, 60), rng.uniform(-150, 150)
        k = int(rng.integers(5, 40))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.5, 5.0, k) if i % 3 == 0 else np.full(k, rng.uniform(1, 5))
        rad = rad * half_width_scale
        out.append(
            (
                f"z{i:04d}",
                [
                    (float(cx + r * np.sin(a)), float(cy + r * np.cos(a)))
                    for a, r in zip(ang, rad)
                ],
            )
        )
    return out


def polygons_table(spark: SparkSession, n_polys: int = 20, seed: int = 42,
                   half_width_scale: float = 1.0) -> DataFrame:
    """Seeded convex + star-concave polygons (FIXTURES.md §4)."""
    rows = [
        {"poly_id": pid, "ring": [{"lat": a, "lon": b} for a, b in ring]}
        for pid, ring in polygon_rings(n_polys, seed, half_width_scale)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="poly_id string, ring array<struct<lat:double, lon:double>>",
    )


def holed_polygon_rings(n_polys: int = 6, seed: int = 42,
                        half_width_scale: float = 8.0
                        ) -> list[tuple[str, list[list]]]:
    """Seeded MULTI-RING polygons as plain Python: (pid, [ring, ...]).
    Every polygon carries a concentric hole at 40% radius; every 3rd also
    carries a second DISJOINT outer ring (multipolygon part) shifted east.
    Shared by the Spark table AND the DuckDB oracle (vertices inlined), so
    both engines test identical geometry under the even-odd rule."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_polys):
        cx, cy = rng.uniform(-55, 55), rng.uniform(-120, 120)
        k = int(rng.integers(5, 14))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(1.0, 3.0, k) * half_width_scale

        def ring_at(ox: float, oy: float, scale: float) -> list:
            return [
                (float(ox + r * scale * np.sin(a)),
                 float(oy + r * scale * np.cos(a)))
                for a, r in zip(ang, rad)
            ]

        rings = [ring_at(cx, cy, 1.0), ring_at(cx, cy, 0.4)]  # outer + hole
        if i % 3 == 2:  # multipolygon: second outer, disjoint (shift east)
            rings.append(ring_at(cx, cy + 3.0 * float(rad.max()), 0.7))
        out.append((f"h{i:04d}", rings))
    return out


def holed_polygons_table(spark: SparkSession, n_polys: int = 6,
                         seed: int = 42,
                         half_width_scale: float = 8.0) -> DataFrame:
    """Multi-ring polygon table: (poly_id, rings) per holed_polygon_rings."""
    rows = [
        {
            "poly_id": pid,
            "rings": [[{"lat": a, "lon": b} for a, b in ring]
                      for ring in rings],
        }
        for pid, rings in holed_polygon_rings(n_polys, seed, half_width_scale)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema=(
            "poly_id string, "
            "rings array<array<struct<lat:double, lon:double>>>"
        ),
    )
