"""Hierarchical spatial cells: vectorized numpy bit-interleave codec.

The cell scheme is the reference's 40-bit *binary geohash* generalized to a
parameterized even bit count (reference ``GeoSearch.scala:17`` uses
``GeoHash.withBitPrecision(lat, lon, 40).toBinaryString`` — longitude bit
first, ``value >= mid -> '1'``). A cell id at resolution ``bits`` is the
first ``bits`` bits of the interleaved (lon, lat) bisection path, packed
into an int64 (MSB-first). Resolution here == bit length, so
"H3/S2-style hierarchical cell at resolution r" == prefix truncation.

Golden-tested against the reference's unit vectors
(``src/test/scala/GeoSearch.scala:72``):
``(34.932603, -117.907324) -> 0100110110100001010011000111111011001001``.

All functions are vectorized numpy (no Python loops over rows) so they can
run inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

MAX_BITS = 52  # keep ids exact in float64 paths and far inside int64


def _check_bits(bits: int) -> None:
    if bits % 2 != 0 or not (2 <= bits <= MAX_BITS):
        raise ValueError(f"bits must be even and in [2, {MAX_BITS}], got {bits}")


# ---------------------------------------------------------------------------
# bit spreading / compaction (Morton order helpers), 32->64 bit safe
# ---------------------------------------------------------------------------

def part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so bit i moves to bit 2i."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of part1by1: collect even bits (bit 2i -> bit i)."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


# ---------------------------------------------------------------------------
# axis indices <-> coordinates
# ---------------------------------------------------------------------------

def lon_index(lon: np.ndarray, half_bits: int) -> np.ndarray:
    """Bisection index of lon with half_bits bits == floor-scale, clamped.

    Equivalent to the reference's per-bit bisection (value >= mid -> 1):
    the b-bit bisection path of x in [lo, hi) is floor((x-lo)/(hi-lo)*2^b).
    """
    n = np.int64(1) << np.int64(half_bits)
    idx = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n)
    return np.clip(idx, 0, float(n - 1)).astype(np.int64)


def lat_index(lat: np.ndarray, half_bits: int) -> np.ndarray:
    n = np.int64(1) << np.int64(half_bits)
    idx = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n)
    return np.clip(idx, 0, float(n - 1)).astype(np.int64)


def encode(lat: np.ndarray, lon: np.ndarray, bits: int = 40) -> np.ndarray:
    """Interleaved cell id at resolution `bits` (lon bit first, MSB-first).

    Returns int64. Bit (bits-1) is the first (longitude) bisection bit —
    matching the reference's binary-geohash string rendering.
    """
    _check_bits(bits)
    hb = bits // 2
    ix = lon_index(lon, hb).astype(np.uint64)
    iy = lat_index(lat, hb).astype(np.uint64)
    return ((part1by1(ix) << np.uint64(1)) | part1by1(iy)).astype(np.int64)


def decode_xy(cell: np.ndarray, bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lon_index, lat_index) at resolution bits."""
    _check_bits(bits)
    c = np.asarray(cell, dtype=np.int64).astype(np.uint64)
    ix = compact1by1(c >> np.uint64(1)).astype(np.int64)
    iy = compact1by1(c).astype(np.int64)
    return ix, iy


def encode_xy(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (
        (part1by1(np.asarray(ix, dtype=np.int64).astype(np.uint64)) << np.uint64(1))
        | part1by1(np.asarray(iy, dtype=np.int64).astype(np.uint64))
    ).astype(np.int64)


def to_binary_string(cell: int | np.ndarray, bits: int = 40):
    """Render cell id as the reference's '0'/'1' string (parity output)."""
    if np.isscalar(cell) or getattr(cell, "ndim", 0) == 0:
        return format(int(cell) & ((1 << bits) - 1), f"0{bits}b")
    return np.array([format(int(c) & ((1 << bits) - 1), f"0{bits}b") for c in cell])


def parent(cell: np.ndarray, bits: int, parent_bits: int) -> np.ndarray:
    """Truncate cell at `bits` to its ancestor at `parent_bits` (prefix)."""
    if parent_bits > bits:
        raise ValueError("parent_bits must be <= bits")
    return np.asarray(cell, dtype=np.int64) >> np.int64(bits - parent_bits)


def common_prefix_len(a: np.ndarray, b: np.ndarray, bits: int) -> np.ndarray:
    """Length of the common MSB-first bit prefix of two cell ids.

    Vectorized clz-of-xor; replaces the reference's char-by-char
    ``stringIntersect`` (``GeoSearch.scala:81-83``).
    """
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(
        np.uint64
    )
    # floor(log2(x)) + 1 == bit_length(x); exact via frexp for x < 2^53.
    nz = x != 0
    bl = np.zeros(x.shape, dtype=np.int64)
    if nz.any():
        _, e = np.frexp(x[nz].astype(np.float64))
        bl[nz] = e  # frexp exponent == bit_length for exact float64 ints
    return np.int64(bits) - bl


def common_prefix(cells: np.ndarray, bits: int) -> tuple[int, int]:
    """(prefix_value, prefix_len) shared by all cells — the reference's
    ``getIntersectedGeohash`` fold (``GeoSearch.scala:117-123``) over any
    number of corners."""
    c = np.asarray(cells, dtype=np.int64)
    plen = int(common_prefix_len(np.full_like(c, c[0]), c, bits).min())
    return (int(c[0]) >> (bits - plen)) if plen > 0 else 0, plen


def kring_xy(
    ix: np.ndarray, iy: np.ndarray, k: int, half_bits: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All grid cells within Chebyshev ring k of each (ix, iy).

    Longitude wraps (mod 2^half_bits); latitude clips (dedup at poles).
    Returns (row_index, nx, ny) flattened — row_index maps back to input.
    """
    n = np.int64(1) << np.int64(half_bits)
    d = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d, indexing="ij")
    dx, dy = dx.ravel(), dy.ravel()
    m = dx.size
    rows = np.repeat(np.arange(len(np.atleast_1d(ix)), dtype=np.int64), m)
    nx = (np.atleast_1d(ix)[:, None] + dx[None, :]) % n
    ny = np.clip(np.atleast_1d(iy)[:, None] + dy[None, :], 0, n - 1)
    nx, ny = nx.ravel(), ny.ravel()
    # dedup clipped duplicates per row
    key = rows * (n * n) + nx * n + ny
    _, keep = np.unique(key, return_index=True)
    keep.sort()
    return rows[keep], nx[keep], ny[keep]


def cell_bounds(cell: int, bits: int) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) of a cell — test helper."""
    ix, iy = decode_xy(np.array([cell]), bits)
    hb = bits // 2
    n = float(1 << hb)
    lon_min = float(ix[0]) / n * 360.0 - 180.0
    lat_min = float(iy[0]) / n * 180.0 - 90.0
    return lat_min, lat_min + 180.0 / n, lon_min, lon_min + 360.0 / n
