"""The reference's non-square 3D-Tiles tiling scheme, vectorized.

Semantics match ``nusamai/src/sink/cesiumtiles/tiling/scheme.rs:10-98``:
z0 = 1x1 world tile, z1 = 2x2, z>=2 = 2^z x 2^(z-1); near the poles tiles
widen by ``x_step`` so aspect ratios stay sane. The unit-test fixtures at
scheme.rs:122-259 are ported in tests/test_scheme3dt.py and are the contract.

All functions take scalar ``z`` and scalar-or-array ``x``/``y``/``lng``/``lat``.
"""

from __future__ import annotations

import numpy as np

Q = 525957.5361033019  # scheme.rs:92


def msb(d):
    """Position of the most significant bit (scheme.rs:6-8): msb(0)=0, msb(1)=1."""
    d = np.asarray(d, dtype=np.int64)
    out = np.zeros(d.shape, dtype=np.int64)
    nz = d > 0
    # d < 2^31 here; float64 log2 of an exact int is safely distinguishable
    # from the next integer at these magnitudes.
    out = np.where(nz, np.floor(np.log2(np.where(nz, d, 1))).astype(np.int64) + 1, 0)
    return out


def size_for_z(z: int):
    """(x_size, y_size) of the world grid at zoom z (scheme.rs:24-30)."""
    if z == 0:
        return 1, 1
    if z == 1:
        return 2, 2
    return 1 << z, 1 << (z - 1)


def x_step(z: int, y):
    """Tile-width multiple at (z, y) — wider near poles (scheme.rs:10-22)."""
    y = np.asarray(y, dtype=np.int64)
    if z in (0, 1):
        return np.ones(y.shape, dtype=np.int64)
    zz = 1 << z
    north = y < zz // 4
    m = np.where(north, msb(y), msb(zz // 2 - y - 1))
    # max(1, zz / (1 << m)) / 4 with integer division, exactly as the Rust
    return np.maximum(1, zz // (np.int64(1) << m)) // 4


def zxy_from_lng_lat(z: int, lng, lat):
    """Containing tile (z, x, y) for a point (scheme.rs:32-38).

    ``x`` is aligned down to the tile's x_step multiple. Boundary points
    (lat=-90, lng=180) clamp into the last valid row/column: the reference
    computes the same unclamped floor and would panic downstream
    (geometric_error's y-range assert); emitting the edge tile instead of
    panicking is the documented divergence.
    """
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x_size, y_size = size_for_z(z)
    y = np.floor((90.0 - lat) / 180.0 * y_size).astype(np.int64)
    y = np.clip(y, 0, y_size - 1)
    xs = x_step(z, y)
    x = np.floor((180.0 + lng) / 360.0 * x_size).astype(np.int64)
    x = np.clip(x, 0, x_size - 1)
    x = x - np.remainder(x, xs)  # np.remainder == rem_euclid for positive divisor
    return x, y


def calc_parent_zxy(z: int, x: int, y: int):
    """Parent tile (scheme.rs:40-47)."""
    if z == 0:
        raise ValueError("z=0 has no parent")
    if z == 1:
        return z - 1, 0, 0
    if z == 2:
        return z - 1, x // 2, y
    return z - 1, x // 2, y // 2


def y_slice_range(z: int, y):
    """(south, north) latitude bounds of tile row y (scheme.rs:49-55)."""
    _, y_size = size_for_z(z)
    y = np.asarray(y, dtype=np.float64)
    north = 90.0 - 180.0 * y / y_size
    south = 90.0 - 180.0 * (y + 1.0) / y_size
    return south, north


def x_slice_range(z: int, x, xs):
    """(west, east) longitude bounds of tile column x with step xs (scheme.rs:57-62)."""
    x_size, _ = size_for_z(z)
    x = np.asarray(x, dtype=np.float64)
    xs = np.asarray(xs, dtype=np.float64)
    west = -180.0 + 360.0 * x / x_size
    east = -180.0 + 360.0 * (x + xs) / x_size
    return west, east


def iter_y_slice(z: int, south: float, north: float) -> range:
    """Tile rows intersecting [south, north] (scheme.rs:64-71)."""
    _, y_size = size_for_z(z)
    north = min(max(north, -90.0), 90.0)
    south = min(max(south, -90.0), 90.0)
    y_north = int(np.floor((90.0 - north) / 180.0 * y_size))
    y_south = int(np.ceil((90.0 - south) / 180.0 * y_size))
    return range(y_north, y_south)


def iter_x_slice(z: int, y: int, west: float, east: float):
    """(x, xs) tile columns intersecting [west, east] at row y (scheme.rs:73-81)."""
    x_size, _ = size_for_z(z)
    x_west = int(np.floor((180.0 + west) / 360.0 * x_size))
    x_east = int(np.ceil((180.0 + east) / 360.0 * x_size))
    xs = int(x_step(z, y))
    # Python % is already floored (== rem_euclid) for a positive divisor
    start = x_west - (x_west % xs)
    stop = x_east - (x_east % xs)
    return [(x, xs) for x in range(start, stop, xs)]


def geometric_error(z: int, y):
    """Geometric error of tile (z, y) (scheme.rs:83-98)."""
    _, y_size = size_for_z(z)
    y = np.asarray(y, dtype=np.int64)
    if np.any(y >= y_size):
        raise ValueError("y out of range")
    if z < 2:
        return np.full(y.shape, 1e100, dtype=np.float64)
    zz = float(1 << z)
    error1 = Q / float(1 << (z - 2))
    lat = (1.0 - (y.astype(np.float64) + 0.5) * 4.0 / zz) * np.pi / 2.0
    error2 = np.cos(lat) * x_step(z, y).astype(np.float64) * error1
    return np.maximum(error1, error2)


def is_valid_zxy(z: int, x: int, y: int) -> bool:
    """Validity predicate (scheme.rs:104-110, test helper promoted to API)."""
    if z == 0:
        return x == 0 and y == 0
    if z == 1:
        return 0 <= x < 2 and 0 <= y < 2
    return x < (1 << z) and y < (1 << (z - 1)) and x % int(x_step(z, y)) == 0
