"""Web Mercator projection kernels, vectorized.

Semantics match the reference's ``nusamai-mvt/src/webmercator.rs:11-44``
(normalized [0,1]^2 variant and the meters variant, plus inverses). All
functions accept scalars or numpy arrays and return float64.
"""

from __future__ import annotations

import numpy as np

A = 6378137.0
CIRCUMFERENCE = A * 2.0 * np.pi


def lnglat_to_web_mercator(lng, lat):
    """(lng, lat) degrees -> normalized (mx, my) in [0,1]^2 (y grows south).

    Mirrors webmercator.rs:11-16.
    """
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = (lng + 180.0) / 360.0
    my = np.degrees(np.log(np.tan(np.radians(90.0 + lat) / 2.0)))
    my = (-my + 180.0) / 360.0
    return mx, my


def web_mercator_to_lnglat(mx, my):
    """Inverse of :func:`lnglat_to_web_mercator` (webmercator.rs:21-26)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lng = mx * 360.0 - 180.0
    lat = my * 360.0 - 180.0
    lat = -np.degrees(2.0 * np.arctan(np.exp(np.radians(lat))) - np.pi / 2.0)
    return lng, lat


def lnglat_to_web_mercator_meters(lng, lat):
    """(lng, lat) degrees -> Web Mercator meters (webmercator.rs:31-35)."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = lng / 360.0 * CIRCUMFERENCE
    my = np.log(np.tan(np.radians(90.0 + lat) / 2.0)) * A
    return mx, my


def web_mercator_meters_to_lnglat(mx, my):
    """Inverse of the meters variant (webmercator.rs:40-44)."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lng = mx / CIRCUMFERENCE * 360.0
    lat = np.degrees(2.0 * np.arctan(np.exp(my / A))) - 90.0
    return lng, lat


def zxy_from_lnglat_webmercator(z: int, lng, lat):
    """Standard square WebMercator tile (x, y) at zoom ``z`` for points.

    This is the square-scheme analogue used for MVT tiling
    (``sink/mvt/slice.rs:48-52`` normalizes to [0,1]^2 then multiplies by
    2^z); points exactly on the east/south edge clamp into the last tile.
    """
    mx, my = lnglat_to_web_mercator(lng, lat)
    n = 1 << z
    x = np.floor(mx * n).astype(np.int64)
    y = np.floor(my * n).astype(np.int64)
    x = np.clip(x, 0, n - 1)
    y = np.clip(y, 0, n - 1)
    return x, y


def quadkey_strings(x, y, z: int):
    """Bing-maps quadkeys for tile coords at zoom ``z`` — digit i (msb
    first) = 2*y_bit + x_bit, built via one contiguous (n, z) byte-matrix
    view (no per-row Python)."""
    import numpy as np

    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = len(x)
    digits = np.empty((n, z), dtype=np.uint8)
    for i in range(z):
        bit = z - 1 - i
        digits[:, i] = 48 + (((y >> bit) & 1) * 2 + ((x >> bit) & 1))
    return digits.reshape(n, z).view(f"S{z}").ravel().astype(f"U{z}")
