"""3D-Tiles tileset assembly: the driver-side metadata reduce.

Ports the quadtree fold of ``sink/cesiumtiles/tiling/tree.rs:8-208``: tile
contents (1 row per written tile — small) fold into a quadtree keyed by
``calc_parent_zxy``, bounding regions bubble up (``update_boundary``,
tree.rs:71-97), and ``tileset.json`` is emitted with per-node
``geometric_error(z, y)`` and radian regions (tree.rs:139-155).

In the Ray pipeline this consumes the *aggregate* output (one row per tile),
never the payload — exactly the reference's `Mutex<Vec<TileContent>>` →
driver reduce, re-expressed as a small post-shuffle fold.
"""

from __future__ import annotations

import json
import math

from ..kernels.scheme3dt import calc_parent_zxy, geometric_error


class TileContent:
    def __init__(self, zxy, content_path="", min_lng=math.inf, max_lng=-math.inf,
                 min_lat=math.inf, max_lat=-math.inf,
                 min_height=math.inf, max_height=-math.inf):
        self.zxy = zxy
        self.content_path = content_path
        self.min_lng, self.max_lng = min_lng, max_lng
        self.min_lat, self.max_lat = min_lat, max_lat
        self.min_height, self.max_height = min_height, max_height


class _Tile:
    def __init__(self, zxy):
        self.zxy = zxy
        self.contents: list[TileContent] = []
        self.children: dict[tuple[int, int], _Tile] = {}
        self.min_lng = self.min_lat = self.min_height = math.inf
        self.max_lng = self.max_lat = self.max_height = -math.inf

    def update_boundary(self):
        for child in self.children.values():
            child.update_boundary()
            self.min_lng = min(self.min_lng, child.min_lng)
            self.max_lng = max(self.max_lng, child.max_lng)
            self.min_lat = min(self.min_lat, child.min_lat)
            self.max_lat = max(self.max_lat, child.max_lat)
            self.min_height = min(self.min_height, child.min_height)
            self.max_height = max(self.max_height, child.max_height)
        for c in self.contents:
            self.min_lng = min(self.min_lng, c.min_lng)
            self.max_lng = max(self.max_lng, c.max_lng)
            self.min_lat = min(self.min_lat, c.min_lat)
            self.max_lat = max(self.max_lat, c.max_lat)
            self.min_height = min(self.min_height, c.min_height)
            self.max_height = max(self.max_height, c.max_height)

    def to_tileset_tile(self) -> dict:
        # children in (00, 01, 10, 11) slot order like tree.rs:102-113
        children = [
            self.children[k].to_tileset_tile()
            for k in [(0, 0), (0, 1), (1, 0), (1, 1)]
            if k in self.children
        ]
        z, _x, y = self.zxy
        from ..kernels.scheme3dt import size_for_z

        y_clamped = min(y, size_for_z(z)[1] - 1)
        node: dict = {
            "geometricError": float(geometric_error(z, y_clamped)),
            "refine": "REPLACE",
            "boundingVolume": {
                "region": [
                    math.radians(self.min_lng),
                    math.radians(self.min_lat),
                    math.radians(self.max_lng),
                    math.radians(self.max_lat),
                    self.min_height,
                    self.max_height,
                ]
            },
        }
        if len(self.contents) == 1:
            node["content"] = {"uri": self.contents[0].content_path}
        elif len(self.contents) > 1:
            node["contents"] = [{"uri": c.content_path} for c in self.contents]
        if children:
            node["children"] = children
        return node


class TileTree:
    """Quadtree fold (tree.rs:166-208)."""

    def __init__(self):
        self.root = _Tile((0, 0, 0))

    def add_content(self, content: TileContent) -> None:
        self._get_node(content.zxy).contents.append(content)

    def _get_node(self, zxy) -> _Tile:
        z, x, y = zxy
        if z == 0:
            return self.root
        parent = self._get_node(calc_parent_zxy(z, x, y))
        slot = (x % 2, y % 2)
        node = parent.children.get(slot)
        if node is None:
            node = parent.children[slot] = _Tile(zxy)
        return node

    def into_tileset(self, geometric_error_root: float = 1e8) -> dict:
        self.root.update_boundary()
        return {
            "asset": {"version": "1.1"},
            "geometricError": geometric_error_root,
            "root": self.root.to_tileset_tile(),
        }


def tileset_from_aggregate(rows, out_path: str | None = None,
                           content_uri=lambda z, x, y: f"{z}/{x}/{y}.parquet") -> dict:
    """Fold flagship aggregate rows (dicts with zoom/tile_x/tile_y/bbox) into
    a tileset.json dict; optionally write it."""
    tree = TileTree()
    for r in rows:
        z, x, y = int(r["zoom"]), int(r["tile_x"]), int(r["tile_y"])
        tree.add_content(
            TileContent(
                (z, x, y),
                content_path=content_uri(z, x, y),
                min_lng=float(r["lng_min"]),
                max_lng=float(r["lng_max"]),
                min_lat=float(r["lat_min"]),
                max_lat=float(r["lat_max"]),
                min_height=float(r.get("h_min", 0.0)),
                max_height=float(r.get("h_max", 0.0)),
            )
        )
    ts = tree.into_tileset()
    if out_path:
        with open(out_path, "w") as f:
            json.dump(ts, f, separators=(",", ":"))
    return ts
