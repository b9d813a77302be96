"""Point-in-polygon + a broadcastable spatial index.

The reference's feature→tile assignment is a spatial partition-join realized
by the slicing flat_map (SURVEY.md §2.5); the north rule additionally requires
an explicit PIP join against PLATEAU municipality/mesh polygons. This module
provides the vectorized ray-casting kernel and a uniform-grid index (the
STRtree stand-in: built once per actor, broadcast via ``ray.put``).

Even-odd ray casting, half-open edge rule [min_y, max_y): a point exactly on
the northern vertex of an edge does not cross, so shared edges between
adjacent polygons assign each point to exactly one polygon (no double count,
no gap) for polygons forming a planar partition — matching how the
reference's tile grid assigns every point to exactly one tile.
"""

from __future__ import annotations

import numpy as np

__all__ = ["points_in_ring", "points_in_polygon", "PolygonIndex"]


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd crossing test of many points vs one ring.

    ``ring`` is (N, 2) float64 (closed or open; closure implied). Returns a
    boolean array. Cost O(N_points * N_edges) via broadcasting in chunks.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ax = ring[:, 0]
    ay = ring[:, 1]
    bx = np.roll(ax, -1)
    by = np.roll(ay, -1)
    inside = np.zeros(px.shape, dtype=bool)
    # chunk over edges to bound the broadcast temp size
    n_pts = px.shape[0]
    edge_chunk = max(1, int(4_000_000 // max(n_pts, 1)) or 1)
    for s in range(0, len(ax), edge_chunk):
        e = slice(s, s + edge_chunk)
        cax, cay, cbx, cby = ax[e], ay[e], bx[e], by[e]
        # edge straddles the horizontal line through py (half-open rule)
        cond = (cay[None, :] > py[:, None]) != (cby[None, :] > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (cbx - cax)[None, :] * (py[:, None] - cay[None, :]) / (
                cby - cay
            )[None, :] + cax[None, :]
        cross = cond & (px[:, None] < xint)
        inside ^= (np.sum(cross, axis=1) % 2).astype(bool)
    return inside


def points_in_polygon(px, py, rings: list[np.ndarray]) -> np.ndarray:
    """Points inside polygon-with-holes: in exterior XOR in any hole."""
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside ^= points_in_ring(px, py, hole)
    return inside


class PolygonIndex:
    """Uniform-grid spatial index over a small polygon set (the STRtree role).

    Built once (per actor / broadcast once via ``ray.put``); ``query`` is
    vectorized: bbox-grid candidate lookup then exact ray-casting PIP.
    Polygons are dicts: {"id": any, "rings": [ndarray (N,2), ...]}.
    """

    def __init__(self, polygons: list[dict], nx: int = 64, ny: int = 64):
        self.polygons = polygons
        self.ids = [p["id"] for p in polygons]
        boxes = np.array(
            [
                [
                    p["rings"][0][:, 0].min(),
                    p["rings"][0][:, 1].min(),
                    p["rings"][0][:, 0].max(),
                    p["rings"][0][:, 1].max(),
                ]
                for p in polygons
            ],
            dtype=np.float64,
        ) if polygons else np.zeros((0, 4))
        self.boxes = boxes
        if len(boxes):
            self.x0 = float(boxes[:, 0].min())
            self.y0 = float(boxes[:, 1].min())
            self.x1 = float(boxes[:, 2].max())
            self.y1 = float(boxes[:, 3].max())
        else:
            self.x0 = self.y0 = 0.0
            self.x1 = self.y1 = 1.0
        self.nx = nx
        self.ny = ny
        self.dx = (self.x1 - self.x0) / nx or 1.0
        self.dy = (self.y1 - self.y0) / ny or 1.0
        self.grid: dict[tuple[int, int], list[int]] = {}
        for i, box in enumerate(boxes):
            cx0 = int((box[0] - self.x0) // self.dx)
            cy0 = int((box[1] - self.y0) // self.dy)
            cx1 = int((box[2] - self.x0) // self.dx)
            cy1 = int((box[3] - self.y0) // self.dy)
            for cx in range(max(cx0, 0), min(cx1, self.nx - 1) + 1):
                for cy in range(max(cy0, 0), min(cy1, self.ny - 1) + 1):
                    self.grid.setdefault((cx, cy), []).append(i)

    def assign(self, px, py, first_match: bool = True) -> np.ndarray:
        """Assign each point the index of a containing polygon, or -1.

        With ``first_match`` the lowest polygon index wins (deterministic).
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        result = np.full(len(px), -1, dtype=np.int64)
        if not self.polygons:
            return result
        # bbox prefilter per polygon (vectorized), then exact PIP on survivors
        for i, p in enumerate(self.polygons):
            box = self.boxes[i]
            cand = (
                (px >= box[0]) & (px <= box[2]) & (py >= box[1]) & (py <= box[3])
            )
            if first_match:
                cand &= result == -1
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = points_in_polygon(px[idx], py[idx], p["rings"])
            result[idx[hit]] = i
        return result
