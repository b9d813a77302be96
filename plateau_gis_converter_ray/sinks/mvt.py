"""MVT tile encoding primitives (geometry commands + tag tables).

Semantics match the reference's encoder exactly:
- zigzag + MoveTo/LineTo/ClosePath command stream with collinear-duplicate
  drop (``nusamai-mvt/src/geometry.rs:10-75``);
- TagsEncoder: insertion-ordered key/value dedup tables
  (``nusamai-mvt/src/tag.rs:9-43``), with the same value-identity rules
  (f32 and f64 10.5 are distinct; i64>=0 folds to Uint like the From impls
  at tag.rs:113-130).

The full protobuf framing is out of scope for this container (no protoc);
``encode_tile_dict`` emits the deterministic dict form a pbf writer would
serialize — the Ray-side grouped-write plumbing is what matters at scale.
"""

from __future__ import annotations

import numpy as np

GEOM_MOVE_TO = 1
GEOM_LINE_TO = 2
GEOM_CLOSE_PATH = 7
_MOVE_TO_COUNT1 = 1 << 3 | GEOM_MOVE_TO
_CLOSE_PATH_COUNT1 = 1 << 3 | GEOM_CLOSE_PATH


def zigzag(v) -> np.ndarray:
    """i32 -> u32 zigzag (geometry.rs:73-75), vectorized."""
    v = np.asarray(v, dtype=np.int32)
    return ((v << 1) ^ (v >> 31)).astype(np.uint32)


class GeometryEncoder:
    """MVT geometry command-stream encoder (geometry.rs:17-63)."""

    def __init__(self):
        self.buf: list[int] = []
        self.prev_x = 0
        self.prev_y = 0

    def add_ring(self, ring) -> None:
        ring = np.asarray(ring, dtype=np.int64)
        if len(ring) == 0:
            return
        first_x, first_y = int(ring[0, 0]), int(ring[0, 1])
        dx, dy = first_x - self.prev_x, first_y - self.prev_y
        self.prev_x, self.prev_y = first_x, first_y
        self.buf.extend([_MOVE_TO_COUNT1, int(zigzag(dx)), int(zigzag(dy))])

        lineto_pos = len(self.buf)
        self.buf.append(GEOM_LINE_TO)  # patched with count below
        count = 0
        for x, y in ring[1:]:
            dx, dy = int(x) - self.prev_x, int(y) - self.prev_y
            self.prev_x, self.prev_y = int(x), int(y)
            if dx != 0 or dy != 0:
                self.buf.extend([int(zigzag(dx)), int(zigzag(dy))])
                count += 1
        self.buf[lineto_pos] = GEOM_LINE_TO | count << 3
        self.buf.append(_CLOSE_PATH_COUNT1)

    def into_list(self) -> list[int]:
        return self.buf


class TagsEncoder:
    """Insertion-ordered key/value dedup tables (tag.rs:9-43).

    Values are typed tuples ('string'|'float'|'double'|'int'|'uint'|'sint'|
    'bool', value); float/double identity is by bit pattern (tag.rs:50-54).
    """

    def __init__(self):
        self.keys: dict[str, int] = {}
        self.values: dict[tuple, int] = {}

    @staticmethod
    def value_of(v) -> tuple:
        """Python-typed value -> tagged tuple, mirroring the From impls
        (tag.rs:93-145): non-negative ints fold to Uint, negatives to SInt."""
        if isinstance(v, bool):
            return ("bool", v)
        if isinstance(v, str):
            return ("string", v)
        if isinstance(v, (int, np.integer)):
            return ("uint", int(v)) if v >= 0 else ("sint", int(v))
        if isinstance(v, np.float32):
            return ("float", np.float32(v).tobytes())
        if isinstance(v, (float, np.float64)):
            return ("double", np.float64(v).tobytes())
        raise TypeError(f"unsupported tag value {type(v)}")

    def add(self, key: str, value: tuple) -> tuple[int, int]:
        ki = self.keys.setdefault(key, len(self.keys))
        vi = self.values.setdefault(value, len(self.values))
        return ki, vi

    def into_keys_and_values(self):
        keys = list(self.keys)
        values = []
        for tag, raw in self.values:
            if tag == "float":
                values.append(("float", float(np.frombuffer(raw, np.float32)[0])))
            elif tag == "double":
                values.append(("double", float(np.frombuffer(raw, np.float64)[0])))
            else:
                values.append((tag, raw))
        return keys, values


def encode_tile_dict(tile_rings: list[tuple[bool, np.ndarray]], extent: int,
                     attrs: list[dict] | None = None) -> dict:
    """Encode one tile's rings (+ per-feature attrs) to the deterministic
    pre-protobuf dict: geometry command stream + tag tables + an
    insertion-ordered deduplicated vertex table with per-ring indices (the
    3D-Tiles writer's per-tile IndexSet vertex dedup,
    sink/cesiumtiles/mod.rs:312,382-397 — identical quantized points
    collapse to one table entry)."""
    genc = GeometryEncoder()
    vtable: dict[tuple[int, int], int] = {}
    ring_indices: list[list[int]] = []
    for _is_ext, ring in tile_rings:
        q = np.round(ring[:, :2] * extent).astype(np.int64)
        genc.add_ring(q)
        idxs = []
        for x, y in q.tolist():
            key = (x, y)
            vi = vtable.get(key)
            if vi is None:
                vi = vtable[key] = len(vtable)
            idxs.append(vi)
        ring_indices.append(idxs)
    tags = TagsEncoder()
    feature_tags = []
    for attr in attrs or []:
        ft = []
        for k, v in attr.items():
            ki, vi = tags.add(k, TagsEncoder.value_of(v))
            ft.extend([ki, vi])
        feature_tags.append(ft)
    keys, values = tags.into_keys_and_values()
    return {
        "extent": extent,
        "geometry": genc.into_list(),
        "keys": keys,
        "values": values,
        "feature_tags": feature_tags,
        "vertices": [list(k) for k in vtable],
        "ring_indices": ring_indices,
    }
