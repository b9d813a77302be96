"""Synthetic PLATEAU-analogue municipality / mesh polygons.

Two deterministic polygon sets over the Japan bbox [122, 146] x [24, 46]:

- :func:`mesh_polygons` — an nx x ny rectangular mesh (the Japan "standard
  regional mesh" analogue). Containment is pure range arithmetic, so the
  DuckDB oracle can reproduce the PIP join exactly in SQL.
- :func:`municipality_polygons` — irregular convex polygons around seeded
  centers (the PLATEAU municipality-boundary analogue) for the flagship
  pipeline's STRtree+ray-casting PIP; verified in pytest against the
  brute-force kernel, not SQL.

Both are small (<= a few thousand rows) broadcast sides: ``ray.put`` once,
``PolygonIndex`` built once per actor (SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np

from ..kernels.imagecodec import splitmix64

WEST, EAST = 122.0, 146.0
SOUTH, NORTH = 24.0, 46.0


def mesh_polygons(nx: int = 24, ny: int = 22) -> list[dict]:
    """Rectangular mesh cells: id 'mesh_{ix}_{iy}', rings closed CCW."""
    out = []
    dx = (EAST - WEST) / nx
    dy = (NORTH - SOUTH) / ny
    for ix in range(nx):
        for iy in range(ny):
            w = WEST + ix * dx
            s = SOUTH + iy * dy
            ring = np.array(
                [[w, s], [w + dx, s], [w + dx, s + dy], [w, s + dy]], dtype=np.float64
            )
            out.append({"id": f"mesh_{ix}_{iy}", "rings": [ring]})
    return out


def municipality_polygons(n: int = 48) -> list[dict]:
    """Irregular convex polygons (jittered octagons) around deterministic centers.

    Polygons may overlap; assignment is first-match by index (deterministic),
    mirroring that a point on a PLATEAU boundary belongs to exactly one
    municipality.
    """
    out = []
    for i in range(n):
        s = splitmix64(np.uint64(i) ^ np.uint64(0xBEEF))
        cx = WEST + float(s & np.uint64(0xFFFF)) / 65535.0 * (EAST - WEST)
        cy = SOUTH + float((s >> np.uint64(16)) & np.uint64(0xFFFF)) / 65535.0 * (
            NORTH - SOUTH
        )
        base_r = 0.5 + float((s >> np.uint64(32)) & np.uint64(0xFF)) / 255.0 * 2.0
        angles = np.linspace(0, 2 * np.pi, 9)[:-1]
        jitter = (
            splitmix64(np.arange(8, dtype=np.uint64) ^ np.uint64(i * 1000 + 7)).astype(
                np.float64
            )
            / 2.0**64
        )
        radii = base_r * (0.6 + 0.4 * jitter)
        ring = np.stack(
            [cx + radii * np.cos(angles), cy + radii * np.sin(angles)], axis=1
        )
        rings = [ring]
        # every 8th municipality gets a hole (an enclave — lakes/exclaves in
        # real PLATEAU boundaries; PIP must exclude points inside it)
        if i % 8 == 3:
            hole_r = radii.min() * 0.35
            hole = np.stack(
                [cx + hole_r * np.cos(angles), cy + hole_r * np.sin(angles)],
                axis=1,
            )
            rings.append(hole)
        out.append({"id": f"muni_{i:03d}", "rings": rings})
    return out
