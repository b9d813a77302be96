"""geojson-vt-style polygon slicing kernels, vectorized per ring.

Ports the *math* of the reference's two clipper variants:

- :func:`slice_polygon_3dt` — degrees-space Y/X slab clipping against the
  non-square 3D-Tiles scheme, carrying [x, y, z, u, v] per vertex
  (``nusamai/src/sink/cesiumtiles/slice.rs:216-391``).
- :func:`slice_polygon_mvt` — normalized-WebMercator clipping with buffered
  slabs, emitting tile-local coords with degenerate-ring drops and winding
  reversal (``nusamai/src/sink/mvt/slice.rs:95-270``).

A polygon is a list of rings; each ring is an (N, D) float64 ndarray whose
column 0/1 are x/y and whose remaining columns (z, u, v, ...) are linearly
interpolated at slab crossings. Ring 0 is the exterior.

The per-edge case analysis (interpolate-at-k1 / at-k2 / passthrough, plus the
second crossing push) is vectorized: each edge contributes 0..2 output points
which are scatter-interleaved in edge order, reproducing the reference's fold
(slice.rs:252-298) exactly.
"""

from __future__ import annotations

import numpy as np

from . import scheme3dt
from .webmercator import lnglat_to_web_mercator

__all__ = [
    "signed_ring_area",
    "ring_area",
    "is_cw",
    "polygon_area",
    "clip_ring",
    "slice_polygon_3dt",
    "slice_polygon_mvt",
]


def signed_ring_area(ring: np.ndarray) -> float:
    """Shoelace signed area over the closed ring (linestring.rs:126-140)."""
    if len(ring) == 0:
        return 0.0
    x = ring[:, 0]
    y = ring[:, 1]
    x2 = np.roll(x, -1)
    y2 = np.roll(y, -1)
    return float(np.sum(x * y2 - y * x2) / 2.0)


def ring_area(ring: np.ndarray) -> float:
    return abs(signed_ring_area(ring))


def is_cw(ring: np.ndarray) -> bool:
    """Clockwise in y-down space == signed area < 0 (linestring.rs:116-118)."""
    return signed_ring_area(ring) < 0.0


def polygon_area(rings: list[np.ndarray]) -> float:
    """Exterior area minus hole areas (polygon.rs:118-125)."""
    if not rings:
        return 0.0
    area = ring_area(rings[0])
    for hole in rings[1:]:
        area -= ring_area(hole)
    return area


def clip_ring(ring: np.ndarray, axis: int, k1: float, k2: float) -> np.ndarray:
    """Clip one closed ring to the slab ``k1 <= coord[axis] <= k2``.

    Vectorized equivalent of the reference's fold over ``iter_closed``
    (cesiumtiles/slice.rs:252-298 and mvt/slice.rs:132-164): for each directed
    edge (a, b) emit, in order, (1) the entering-crossing or the passthrough
    vertex ``a``, then (2) the leaving-crossing if any.
    """
    n = len(ring)
    if n == 0:
        return ring
    a = ring
    b = np.roll(ring, -1, axis=0)
    av = a[:, axis]
    bv = b[:, axis]

    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (k1 - av) / (bv - av)
        t2 = (k2 - av) / (bv - av)

        # first push per edge: three mutually exclusive cases
        m1_lo = (av < k1) & (bv > k1)          # entering across k1
        m1_hi = (av > k2) & (bv < k2)          # entering across k2
        m1_in = (av >= k1) & (av <= k2)        # a inside slab: push a
        m1 = m1_lo | m1_hi | m1_in

        # second push per edge: leaving crossings
        m2_lo = (bv < k1) & (av > k1)
        m2_hi = (bv > k2) & (av < k2)
        m2 = m2_lo | m2_hi

        t_first = np.where(m1_lo, t1, t2)
        p_first = a + (b - a) * t_first[:, None]
        p_first[m1_lo, axis] = k1
        p_first[m1_hi, axis] = k2
        p_first = np.where(m1_in[:, None], a, p_first)

        t_second = np.where(m2_lo, t1, t2)
        p_second = a + (b - a) * t_second[:, None]
        p_second[m2_lo, axis] = k1
        p_second[m2_hi, axis] = k2

    c1 = m1.astype(np.int64)
    counts = c1 + m2
    total = int(counts.sum())
    out = np.empty((total, ring.shape[1]), dtype=np.float64)
    prefix = np.cumsum(counts) - counts
    out[prefix[m1]] = p_first[m1]
    out[(prefix + c1)[m2]] = p_second[m2]
    return out


def slice_polygon_3dt(zoom: int, rings: list[np.ndarray]):
    """Slice one polygon into non-square-scheme tiles at ``zoom``.

    Yields ``((z, x, y), clipped_rings)`` per intersected tile, exactly
    mirroring cesiumtiles/slice.rs:216-391 — including emitting a (possibly
    ring-degenerate) polygon for every (x-column, y-row) in the clipped
    bbox range, and the ``rem_euclid(1 << z)`` antimeridian x wrap.
    """
    if not rings or len(rings[0]) == 0:
        return
    ext = rings[0]
    min_y = float(ext[:, 1].min())
    max_y = float(ext[:, 1].max())
    y_range = scheme3dt.iter_y_slice(zoom, min_y, max_y)

    for yi in y_range:
        south, north = scheme3dt.y_slice_range(zoom, yi)
        k1, k2 = float(south), float(north)
        row_rings = [clip_ring(r, 1, k1, k2) if len(r) else r for r in rings]
        row_ext = row_rings[0]
        if len(row_ext) == 0:
            continue
        min_x = float(row_ext[:, 0].min())
        max_x = float(row_ext[:, 0].max())
        for xi, xs in scheme3dt.iter_x_slice(zoom, yi, min_x, max_x):
            west, east = scheme3dt.x_slice_range(zoom, xi, xs)
            key = (zoom, xi % (1 << zoom), yi)
            tile_rings = [
                clip_ring(r, 0, float(west), float(east)) if len(r) else r
                for r in row_rings
            ]
            yield key, tile_rings


def slice_polygon_mvt(
    zoom: int,
    extent: int,
    buffer: int,
    rings: list[np.ndarray],
    out: dict,
) -> None:
    """Slice one normalized-mercator polygon into square tiles at ``zoom``.

    ``out`` maps ``(z, x, y) -> list[(is_exterior, ring)]`` with tile-local
    coordinates in [0 - buf, 1 + buf] * extent... (coords are kept in
    normalized tile units; the encoder scales by ``extent``). Mirrors
    mvt/slice.rs:95-270: buffered slabs, closing-point removal, <3-point ring
    drop, winding reversal.
    """
    if not rings or len(rings[0]) == 0:
        return
    z_scale = float(1 << zoom)
    buf_width = buffer / extent

    ext = rings[0]
    min_y = float(ext[:, 1].min())
    max_y = float(ext[:, 1].max())
    y_lo = int(np.floor(min_y * z_scale))
    y_hi = int(np.ceil(max_y * z_scale))

    for yi in range(y_lo, y_hi):
        k1 = (yi - buf_width) / z_scale
        k2 = (yi + 1 + buf_width) / z_scale
        row_rings = [clip_ring(r, 1, k1, k2) if len(r) else r for r in rings]
        row_ext = row_rings[0]
        if len(row_ext) == 0:
            continue
        min_x = float(row_ext[:, 0].min())
        max_x = float(row_ext[:, 0].max())
        x_lo = int(np.floor(min_x * z_scale))
        x_hi = int(np.ceil(max_x * z_scale))
        for xi in range(x_lo, x_hi):
            xk1 = (xi - buf_width) / z_scale
            xk2 = (xi + 1 + buf_width) / z_scale
            key = (zoom, xi % (1 << zoom), yi)
            tile = out.setdefault(key, [])
            for ri, r in enumerate(row_rings):
                if len(r) == 0:
                    continue
                clipped = clip_ring(r, 0, xk1, xk2)
                # tile-local coords (mvt/slice.rs:240-247)
                local = clipped.copy()
                local[:, 0] = local[:, 0] * z_scale - xi
                local[:, 1] = local[:, 1] * z_scale - yi
                # remove closing point if present (mvt/slice.rs:249-253)
                if len(local) >= 2 and np.array_equal(local[0], local[-1]):
                    local = local[:-1]
                if len(local) < 3:
                    continue
                # reverse winding (mvt/slice.rs:260-261)
                local = local[::-1].copy()
                tile.append((ri == 0, local))


def convex_clip(subject: "np.ndarray", clip: "np.ndarray") -> "np.ndarray":
    """Sutherland–Hodgman clip of (convex or not) ``subject`` against a
    CONVEX ``clip`` ring — both (N, 2) float64, CCW, open. Returns the
    clipped ring ((M, 2), possibly empty). The general-polygon slicers in
    this module clip against AXIS-ALIGNED edges only (slice.rs parity);
    this kernel is the arbitrary-convex-window variant the polygon-overlay
    operator needs (intersection of two convex rings)."""
    import numpy as np

    out = subject
    k = len(clip)
    for i in range(k):
        if len(out) == 0:
            return out.reshape(0, 2)
        a = clip[i]
        b = clip[(i + 1) % k]
        ex, ey = b[0] - a[0], b[1] - a[1]
        # signed side of each vertex vs the (CCW) clip edge: >= 0 keeps
        side = ex * (out[:, 1] - a[1]) - ey * (out[:, 0] - a[0])
        nxt = np.roll(side, -1)
        pts = []
        for j in range(len(out)):
            p, q = out[j], out[(j + 1) % len(out)]
            if side[j] >= 0:
                pts.append(p)
            if (side[j] >= 0) != (nxt[j] >= 0):
                t = side[j] / (side[j] - nxt[j])
                pts.append(p + t * (q - p))
        out = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    return out


def clip_intersection_area(subject: "np.ndarray", clip: "np.ndarray") -> float:
    """Exact area of ``subject`` ∩ ``clip`` for a SIMPLE (possibly CONCAVE)
    ``clip`` ring — the general-polygon overlay the areal operators need.

    Sutherland–Hodgman against a concave clip window is NOT the polygon
    intersection (it clips to each edge's half-plane in sequence), so
    ``clip`` is decomposed into SIGNED fan triangles (v0, v_i, v_{i+1});
    each triangle is convex, so :func:`convex_clip` is exact on it, and the
    signed sum telescopes to the winding-number indicator of the simple
    ring: CCW triangles add area(subject ∩ T), CW triangles subtract it.
    ``subject`` may itself be concave (S–H of a concave subject against a
    convex window yields degenerate bridge edges whose shoelace
    contribution is zero, so the area is still exact). Both rings (N, 2)
    float64, open; ``clip`` in either orientation."""
    import numpy as np

    if len(subject) < 3 or len(clip) < 3:
        return 0.0
    v0 = clip[0]
    total = 0.0
    for i in range(1, len(clip) - 1):
        a, b = clip[i], clip[i + 1]
        cross = (a[0] - v0[0]) * (b[1] - v0[1]) - (a[1] - v0[1]) * (
            b[0] - v0[0]
        )
        if cross == 0.0:
            continue
        if cross > 0.0:
            tri = np.array([v0, a, b], dtype=np.float64)
            total += ring_area(convex_clip(subject, tri))
        else:
            tri = np.array([v0, b, a], dtype=np.float64)
            total -= ring_area(convex_clip(subject, tri))
    return abs(total) if abs(total) > 1e-15 else 0.0


def ring_area(ring: "np.ndarray") -> float:
    """Shoelace area of a CCW (N, 2) ring (0.0 for N < 3)."""
    import numpy as np

    if len(ring) < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return float(
        0.5 * np.abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    )
