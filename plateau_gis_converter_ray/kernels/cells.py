"""H3/S2-style cell keys over lng/lat, vectorized.

No H3/S2 native lib exists in this container, so the engine uses a
Morton-interleaved quantized lng/lat cell id with the same *role*: a single
uint64 shuffle key that co-partitions points and polygons (SURVEY.md §7.3) and
supports ring expansion for kNN (``cell_ring``: the k-ring of neighbors, the
analogue of ``h3.k_ring``). Resolution ``res`` gives a 2^res x 2^res world
grid in equirectangular space.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v into even bit positions (Morton helper)."""
    v = v.astype(_U64)
    v &= _U64(0x00000000FFFFFFFF)
    v = (v | (v << _U64(16))) & _U64(0x0000FFFF0000FFFF)
    v = (v | (v << _U64(8))) & _U64(0x00FF00FF00FF00FF)
    v = (v | (v << _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _U64(2))) & _U64(0x3333333333333333)
    v = (v | (v << _U64(1))) & _U64(0x5555555555555555)
    return v


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave x (even bits) and y (odd bits) into one uint64."""
    return _part1by1(np.asarray(x)) | (_part1by1(np.asarray(y)) << _U64(1))


def cell_xy(lng, lat, res: int):
    """Integer grid coords of the cell containing (lng, lat) at ``res``."""
    n = 1 << res
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    cx = np.clip(np.floor((lng + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    cy = np.clip(np.floor((90.0 - lat) / 180.0 * n).astype(np.int64), 0, n - 1)
    return cx, cy


def cell_id(lng, lat, res: int) -> np.ndarray:
    """uint64 cell key: res in the top 6 bits, Morton(x, y) below."""
    cx, cy = cell_xy(lng, lat, res)
    return (_U64(res) << _U64(58)) | morton2(cx, cy)


def cell_ring(cx: int, cy: int, res: int, k: int = 1) -> list[tuple[int, int]]:
    """All cells within Chebyshev distance k (incl. center) — h3.k_ring analogue.

    x wraps around the antimeridian; y clamps at the poles.
    """
    n = 1 << res
    out = []
    for dy in range(-k, k + 1):
        yy = cy + dy
        if yy < 0 or yy >= n:
            continue
        for dx in range(-k, k + 1):
            out.append(((cx + dx) % n, yy))
    return out


def cell_id_from_xy(cx, cy, res: int) -> np.ndarray:
    return (_U64(res) << _U64(58)) | morton2(np.asarray(cx), np.asarray(cy))
