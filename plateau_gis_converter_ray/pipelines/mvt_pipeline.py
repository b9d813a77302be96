"""End-to-end MVT pipeline: polygons -> slice -> tile shuffle -> z/x/y files.

The Ray-Data re-expression of the reference's MVT sink physical plan
(sink/mvt/mod.rs:121-478): slice(row-parallel flat_map) -> sort/groupby by
tile -> grouped encode+write with the detail-degradation retry. Here the
shuffle is a hash groupby on (zoom, x, y) instead of the external sort —
grouped-output contents are identical (ordering-free rewrite, SURVEY §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..kernels.clip import signed_ring_area, slice_polygon_mvt
from ..kernels.webmercator import lnglat_to_web_mercator


def slice_stage(min_zoom: int, max_zoom: int, extent: int, buffer_pixels: int):
    """Returns the map_batches body: polygon rows -> (tile, ring) rows.

    Applies the reference's preconditions: normalize to WebMercator
    (mvt/slice.rs:48-52), reject non-CW exteriors (:55-57), skip polygons
    smaller than 4 subpixels per zoom (:63-69).
    """
    ext_buffer = extent * buffer_pixels // 256

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pid, ring in zip(batch["pid"], batch["ring"]):
            arr = np.array([list(p) for p in ring], dtype=np.float64)
            mx, my = lnglat_to_web_mercator(arr[:, 0], arr[:, 1])
            merc = np.stack([mx, my], axis=1)
            if not signed_ring_area(merc) > 0:  # is_cw in y-down space
                merc = merc[::-1].copy()
            area = abs(signed_ring_area(merc))
            for zoom in range(min_zoom, max_zoom + 1):
                if area * float(4 ** (zoom + extent.bit_length() - 1)) < 4.0:
                    continue  # tiny-polygon skip (mvt/slice.rs:63-69)
                out: dict = {}
                slice_polygon_mvt(zoom, extent, ext_buffer, [merc], out)
                for (z, x, y), rings in out.items():
                    for is_ext, r in rings:
                        rows.append(
                            {
                                "pid": pid,
                                "zoom": z,
                                "tile_x": int(x),
                                "tile_y": int(y),
                                "is_exterior": bool(is_ext),
                                "ring_xy": r.reshape(-1).tolist(),
                            }
                        )
        return pd.DataFrame(
            rows,
            columns=["pid", "zoom", "tile_x", "tile_y", "is_exterior", "ring_xy"],
        )

    return run


def run_mvt_pipeline(polygons: list[dict], out_dir: str,
                     min_zoom: int = 6, max_zoom: int = 9,
                     extent: int = 1 << 12, buffer_pixels: int = 5,
                     debug_sidecar: bool = False):
    """polygons (id + lng/lat exterior ring) -> sliced -> written tiles.

    Returns the per-tile write report Dataset (tile key, n_features, detail,
    compressed size, skew flag).
    """
    import ray.data

    from ..sinks.grouped import write_tiles

    ds = ray.data.from_items(
        [{"pid": p["id"], "ring": p["rings"][0].tolist()} for p in polygons]
    )
    sliced = ds.map_batches(
        slice_stage(min_zoom, max_zoom, extent, buffer_pixels),
        batch_format="pandas",
    )
    return write_tiles(sliced, out_dir, extent=extent, debug_sidecar=debug_sidecar)
