"""Spatial join stages: broadcast PIP join + cell-keyed partition join.

The small side (PLATEAU municipality polygons — thousands, not billions) is
broadcast once via ``ray.put`` and each actor builds its ``PolygonIndex``
once in ``__init__`` (the STRtree role, SURVEY.md §2.8), exactly like the
reference shares its geoid grid via ``Arc`` across workers
(transformer/builder.rs:103,112-115). No shuffle for the join itself.

For a *large* polygon side the same kernel runs as a cell-keyed partition
join: key both sides by ``kernels.cells.cell_id``, co-partition with
``groupby(cell)``, and PIP within groups — the reference's
feature-to-tile-assignment pattern (SURVEY.md §2.5) generalized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.pip import PolygonIndex


class PIPAssign:
    """Actor-pool stage: assign each row the containing polygon id (or null).

    ``polygons_ref`` may be a ``ray.ObjectRef`` (broadcast) or a plain list
    (tests). The index is built once per actor.
    """

    def __init__(self, polygons_ref, lng_col: str = "lng", lat_col: str = "lat",
                 out_col: str = "muni_id"):
        try:
            import ray

            if isinstance(polygons_ref, ray.ObjectRef):
                polygons_ref = ray.get(polygons_ref)
        except Exception:
            pass
        self.index = PolygonIndex(polygons_ref)
        self.ids = np.array([p["id"] for p in polygons_ref], dtype=object)
        self.lng_col = lng_col
        self.lat_col = lat_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch.column(self.lng_col).to_numpy()
        lat = batch.column(self.lat_col).to_numpy()
        hit = self.index.assign(lng, lat)
        vals = np.where(hit >= 0, self.ids[np.clip(hit, 0, None)], None)
        return batch.append_column(self.out_col, pa.array(vals, pa.string()))


def mesh_assign_arith(batch: pa.Table, nx: int = 24, ny: int = 22) -> pa.Table:
    """Mesh-cell assignment by pure arithmetic (the SQL-reproducible join).

    Identical result to a PIP join against ``sources.municipalities
    .mesh_polygons(nx, ny)`` for interior points (the mesh partitions the
    bbox); the DuckDB oracle reproduces it with floor arithmetic.
    """
    from ..sources.municipalities import EAST, NORTH, SOUTH, WEST

    lng = batch.column("lng").to_numpy()
    lat = batch.column("lat").to_numpy()
    ix = np.clip(np.floor((lng - WEST) / (EAST - WEST) * nx), 0, nx - 1).astype(np.int64)
    iy = np.clip(np.floor((lat - SOUTH) / (NORTH - SOUTH) * ny), 0, ny - 1).astype(
        np.int64
    )
    # vectorized id synthesis: arrow binary_join_element_wise over the
    # stringified cell coords (no per-row Python)
    import pyarrow.compute as pc

    mesh_id = pc.binary_join_element_wise(
        "mesh_", pc.cast(pa.array(ix), pa.string()),
        "_", pc.cast(pa.array(iy), pa.string()), "",
    )
    return batch.append_column("mesh_id", mesh_id)
