"""Ear-clipping triangulation for arbitrary simple polygons with holes.

The reference triangulates every footprint with the ``earcut`` crate before
writing glb/PLY content (``nusamai/src/sink/cesiumtiles/mod.rs:20`` and
``nusamai/src/sink/ply/mod.rs:111-150``: geodetic -> geocentric ->
``project3d_to_2d`` -> ``Earcut::earcut``). This module re-derives that
capability from the published ear-clipping algorithm (linked-list ear
clipping with hole bridging — the approach of the public mapbox/earcut
family): no code is ported, but the API mirrors the crate's
(``earcut(coords, hole_indices)``, ``project3d_to_2d``) so the sinks can
call it the same way the reference does.

Complexity is O(n^2) worst case (no z-order acceleration) — building
footprints are tens-to-hundreds of vertices, far below where the spatial
index pays off; the per-tile work stays inside a ``map_groups`` task.
"""

from __future__ import annotations

import numpy as np

__all__ = ["earcut", "triangulate_rings", "project3d_to_2d", "ring_is_convex"]


class _Node:
    __slots__ = ("i", "x", "y", "prev", "next")

    def __init__(self, i: int, x: float, y: float):
        self.i = i
        self.x = x
        self.y = y
        self.prev: _Node | None = None
        self.next: _Node | None = None


def _insert_node(i: int, x: float, y: float, last: _Node | None) -> _Node:
    node = _Node(i, x, y)
    if last is None:
        node.prev = node
        node.next = node
    else:
        node.next = last.next
        node.prev = last
        last.next.prev = node
        last.next = node
    return node


def _remove_node(node: _Node) -> None:
    node.next.prev = node.prev
    node.prev.next = node.next


def _signed_area(coords: np.ndarray, start: int, end: int) -> float:
    x = coords[start:end, 0]
    y = coords[start:end, 1]
    return float(np.sum((np.roll(x, -1) - x) * (np.roll(y, -1) + y))) * -0.5


def _linked_list(coords: np.ndarray, start: int, end: int, clockwise: bool):
    """Create a circular doubly linked list from a ring in the given
    winding (skipping consecutive duplicate points)."""
    last = None
    if (_signed_area(coords, start, end) > 0) == (not clockwise):
        rng = range(start, end)
    else:
        rng = range(end - 1, start - 1, -1)
    for i in rng:
        x, y = float(coords[i, 0]), float(coords[i, 1])
        if last is not None and x == last.x and y == last.y:
            continue
        last = _insert_node(i, x, y, last)
    # drop a closing duplicate of the first point
    if last is not None and last.x == last.next.x and last.y == last.next.y:
        nxt = last.next
        _remove_node(last)
        last = nxt if nxt is not last else None
    return last


def _area2(ax, ay, bx, by, cx, cy) -> float:
    """Twice the signed triangle area (positive = counter-clockwise)."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _point_in_triangle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    """Point inside (or on the edge of) the CCW triangle abc."""
    return (
        _area2(ax, ay, bx, by, px, py) >= 0
        and _area2(bx, by, cx, cy, px, py) >= 0
        and _area2(cx, cy, ax, ay, px, py) >= 0
    )


def _is_ear(ear: _Node) -> bool:
    a, b, c = ear.prev, ear, ear.next
    if _area2(a.x, a.y, b.x, b.y, c.x, c.y) <= 0:
        return False  # reflex or degenerate corner
    p = c.next
    while p is not a:
        if (
            _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y)
            and _area2(p.prev.x, p.prev.y, p.x, p.y, p.next.x, p.next.y) < 0
        ):
            return False
        p = p.next
    return True


def _get_leftmost(start: _Node) -> _Node:
    p = start.next
    leftmost = start
    while p is not start:
        if p.x < leftmost.x or (p.x == leftmost.x and p.y < leftmost.y):
            leftmost = p
        p = p.next
    return leftmost


def _segments_intersect(p1, q1, p2, q2) -> bool:
    def on_seg(p, q, r):
        return (
            min(p.x, r.x) <= q.x <= max(p.x, r.x)
            and min(p.y, r.y) <= q.y <= max(p.y, r.y)
        )

    d1 = _area2(p2.x, p2.y, q2.x, q2.y, p1.x, p1.y)
    d2 = _area2(p2.x, p2.y, q2.x, q2.y, q1.x, q1.y)
    d3 = _area2(p1.x, p1.y, q1.x, q1.y, p2.x, p2.y)
    d4 = _area2(p1.x, p1.y, q1.x, q1.y, q2.x, q2.y)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True
    if d1 == 0 and on_seg(p2, p1, q2):
        return True
    if d2 == 0 and on_seg(p2, q1, q2):
        return True
    if d3 == 0 and on_seg(p1, p2, q1):
        return True
    if d4 == 0 and on_seg(p1, q2, q1):
        return True
    return False


def _valid_bridge(a: _Node, b: _Node) -> bool:
    """No outer edge crosses the candidate bridge a-b."""
    p = a.next
    while p is not a:
        if (
            p is not b and p.next is not b and p is not a.prev
            and p.i != a.i and p.next.i != a.i
        ):
            if _segments_intersect(a, b, p, p.next):
                return False
        p = p.next
    return True


def _find_hole_bridge(hole: _Node, outer: _Node) -> _Node | None:
    """Find an outer-ring vertex visible from the hole's leftmost vertex
    (ray cast toward -x, then the classic visibility refinement)."""
    p = outer
    hx, hy = hole.x, hole.y
    qx = -np.inf
    m: _Node | None = None
    # 1) edge of the outer ring the leftward ray from the hole point hits
    while True:
        if (p.y <= hy <= p.next.y or p.next.y <= hy <= p.y) and p.next.y != p.y:
            x = p.x + (hy - p.y) * (p.next.x - p.x) / (p.next.y - p.y)
            if x <= hx and x > qx:
                qx = x
                m = p if p.x < p.next.x else p.next
        p = p.next
        if p is outer:
            break
    if m is None:
        return None
    # 2) among reflex outer vertices inside the triangle (ray point, hit
    # point, candidate), take the one minimizing the angle to the ray
    stop = m
    mx, my = m.x, m.y
    tan_min = np.inf
    p = m
    while True:
        if (
            hx >= p.x >= mx and hx != p.x
            and _point_in_triangle(
                hx if hy < my else qx, hy,
                mx, my,
                qx if hy < my else hx, hy,
                p.x, p.y,
            )
        ):
            tan = abs(hy - p.y) / (hx - p.x)
            if (
                tan < tan_min or (tan == tan_min and p.x > m.x)
            ) and _valid_bridge(p, hole):
                m = p
                tan_min = tan
        p = p.next
        if p is stop:
            break
    return m


def _split_bridge(a: _Node, b: _Node) -> _Node:
    """Connect a and b with duplicate nodes, merging the two rings."""
    a2 = _Node(a.i, a.x, a.y)
    b2 = _Node(b.i, b.x, b.y)
    an, bp = a.next, b.prev
    a.next = b
    b.prev = a
    a2.next = an
    an.prev = a2
    b2.next = a2
    a2.prev = b2
    bp.next = b2
    b2.prev = bp
    return b2


def _eliminate_holes(coords: np.ndarray, hole_indices, outer: _Node) -> _Node:
    holes = []
    n = len(coords)
    for k, start in enumerate(hole_indices):
        end = hole_indices[k + 1] if k + 1 < len(hole_indices) else n
        ring = _linked_list(coords, int(start), int(end), clockwise=True)
        if ring is not None:
            holes.append(_get_leftmost(ring))
    holes.sort(key=lambda nd: (nd.x, nd.y))
    for hole in holes:
        bridge = _find_hole_bridge(hole, outer)
        if bridge is not None:
            outer = _split_bridge(bridge, hole)
    return outer


def earcut(coords: np.ndarray, hole_indices=None) -> np.ndarray:
    """Triangulate a polygon (outer ring CCW-normalized; holes merged via
    bridges). ``coords``: (n, 2) float array, outer ring first then holes;
    ``hole_indices``: start index of each hole ring. Returns flat uint32
    index triples into ``coords`` (CCW triangles)."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n < 3:
        return np.empty(0, dtype=np.uint32)
    outer_len = int(hole_indices[0]) if hole_indices else n
    node = _linked_list(coords, 0, outer_len, clockwise=False)
    if node is None:
        return np.empty(0, dtype=np.uint32)
    if hole_indices:
        node = _eliminate_holes(coords, list(hole_indices), node)

    triangles: list[int] = []
    stop = node
    while node.prev is not node and node.next is not node:
        if _is_ear(node):
            triangles += (node.prev.i, node.i, node.next.i)
            _remove_node(node)
            node = node.next
            stop = node
            continue
        node = node.next
        if node is stop:
            # no ear found in a full pass: clip the least-degenerate convex
            # corner to guarantee progress (handles collinear runs)
            p = node
            clipped = False
            while True:
                if _area2(p.prev.x, p.prev.y, p.x, p.y, p.next.x, p.next.y) > 0:
                    triangles += (p.prev.i, p.i, p.next.i)
                    _remove_node(p)
                    node = p.next
                    stop = node
                    clipped = True
                    break
                p = p.next
                if p is node:
                    break
            if not clipped:
                # fully degenerate remainder (all collinear): stop
                break
    return np.asarray(triangles, dtype=np.uint32)


def ring_is_convex(ring: np.ndarray) -> bool:
    """True when every corner turns the same way (vectorized cross test) —
    the fan-triangulation fast path used by the clip-rectangle tiles."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) < 4:
        return True
    a = ring
    b = np.roll(ring, -1, axis=0)
    c = np.roll(ring, -2, axis=0)
    cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    return bool((cross >= 0).all() or (cross <= 0).all())


def triangulate_rings(exterior: np.ndarray, holes=None) -> np.ndarray:
    """Triangulate one polygon; convex hole-free rings take the O(n) fan
    path, everything else ear-clips. Returns flat uint32 indices (outer
    ring vertices first, then hole vertices in order)."""
    exterior = np.asarray(exterior, dtype=np.float64)
    if not holes:
        if ring_is_convex(exterior):
            n = len(exterior)
            if n < 3:
                return np.empty(0, dtype=np.uint32)
            i = np.arange(1, n - 1, dtype=np.uint32)
            return np.stack(
                [np.zeros(n - 2, np.uint32), i, i + 1], axis=1
            ).reshape(-1)
        return earcut(exterior)
    coords = [exterior]
    hole_indices = []
    pos = len(exterior)
    for h in holes:
        hole_indices.append(pos)
        coords.append(np.asarray(h, dtype=np.float64))
        pos += len(h)
    return earcut(np.concatenate(coords), hole_indices)


def project3d_to_2d(coords3d: np.ndarray, num_outer: int) -> np.ndarray | None:
    """Project 3D polygon coords onto their best-fit plane (the crate's
    ``utils3d::project3d_to_2d`` role): Newell-method normal over the outer
    ring, then an orthonormal in-plane basis. Returns (n, 2) or None for a
    degenerate normal."""
    coords3d = np.asarray(coords3d, dtype=np.float64)
    outer = coords3d[:num_outer]
    nxt = np.roll(outer, -1, axis=0)
    normal = np.array(
        [
            np.sum((outer[:, 1] - nxt[:, 1]) * (outer[:, 2] + nxt[:, 2])),
            np.sum((outer[:, 2] - nxt[:, 2]) * (outer[:, 0] + nxt[:, 0])),
            np.sum((outer[:, 0] - nxt[:, 0]) * (outer[:, 1] + nxt[:, 1])),
        ]
    )
    norm = np.linalg.norm(normal)
    if norm == 0 or not np.isfinite(norm):
        return None
    normal /= norm
    # in-plane basis: u = any vector orthogonal to the normal
    ref = np.array([0.0, 0.0, 1.0]) if abs(normal[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(ref, normal)
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    return np.stack([coords3d @ u, coords3d @ v], axis=1)
