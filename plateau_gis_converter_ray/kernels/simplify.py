"""Douglas-Peucker polyline/ring simplification.

The reference's MVT path removes only duplicate/collinear points
(``sink/mvt/mod.rs:373-397``, pinned in ``sinks/mvt.py::simplify_ring``);
this kernel is the engine's tolerance-based generalization for low-zoom
tiles, where sub-pixel detail is pure payload cost. Classic DP with an
explicit stack (no recursion limits), the segment-distance scan
vectorized with numpy over each span.

Guarantees (pytest-pinned): endpoints survive; every dropped vertex lies
within ``eps`` of the simplified chain's generating segment; output is a
subsequence of the input; idempotent (simplifying the output changes
nothing).
"""

from __future__ import annotations

import numpy as np


def _span_farthest(pts: np.ndarray, i: int, j: int) -> tuple[int, float]:
    """(index, distance) of the vertex farthest from segment pts[i]-pts[j],
    scanning the open span (i, j) vectorized."""
    if j <= i + 1:
        return -1, 0.0
    seg = pts[j] - pts[i]
    mid = pts[i + 1 : j] - pts[i]
    L2 = float(seg @ seg)
    if L2 == 0.0:
        d = np.sqrt((mid * mid).sum(axis=1))
    else:
        # perpendicular distance to the infinite line through i-j (the
        # classic DP criterion), |cross| / |seg|
        cross = mid[:, 0] * seg[1] - mid[:, 1] * seg[0]
        d = np.abs(cross) / np.sqrt(L2)
    k = int(np.argmax(d))
    return i + 1 + k, float(d[k])


def dp_simplify(pts: np.ndarray, eps: float) -> np.ndarray:
    """Indices (sorted) of the kept vertices of polyline ``pts`` (n, 2)."""
    n = len(pts)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        k, d = _span_farthest(pts, i, j)
        if k >= 0 and d > eps:
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return np.nonzero(keep)[0].astype(np.int64)


def dp_simplify_ring(ring: np.ndarray, eps: float) -> np.ndarray:
    """Simplify a closed ring (first point NOT repeated): anchor at the
    two mutually-farthest-ish vertices (index 0 and the vertex farthest
    from it — deterministic), run DP on both halves, stitch. Returns kept
    indices; degenerate outputs (<3 vertices) fall back to the input."""
    n = len(ring)
    if n <= 4:
        return np.arange(n, dtype=np.int64)
    d0 = ring - ring[0]
    far = int(np.argmax((d0 * d0).sum(axis=1)))
    if far == 0:
        return np.arange(n, dtype=np.int64)
    a = dp_simplify(ring[: far + 1], eps)
    closed = np.concatenate([ring[far:], ring[:1]])
    b = dp_simplify(closed, eps)
    idx = np.unique(
        np.concatenate([a, (b + far) % n])
    ).astype(np.int64)
    if len(idx) < 3:
        return np.arange(n, dtype=np.int64)
    return idx


def max_deviation(pts: np.ndarray, kept: np.ndarray) -> float:
    """Largest distance from any dropped vertex to its covering simplified
    segment — the invariant checker for the DP guarantee."""
    worst = 0.0
    for a, b in zip(kept[:-1], kept[1:]):
        _, d = _span_farthest(pts, int(a), int(b))
        worst = max(worst, d)
    return worst
