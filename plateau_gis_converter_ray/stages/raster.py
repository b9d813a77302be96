"""Raster <-> vector clipping — the north rule's raster/vector bridge.

Each image row is treated as a georeferenced raster tile: its footprint is a
lng/lat box centered on the row's geocoded point with the row's deterministic
ground extent. The stage clips the (broadcast) municipality polygons against
each footprint and rasterizes the intersection onto the image's own pixel
grid — vectorized point-in-polygon over pixel centers — emitting per-row
coverage and masked-pixel statistics.

This is the actor-pool pattern again: polygon index built once per actor;
per-batch work is numpy-vectorized per row over pixel grids (<= 48x48).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.imagecodec import decode_image
from ..kernels.pip import PolygonIndex, points_in_polygon


def footprint_of(lng, lat, extent_m):
    """Half-extent degree box around the point (small-angle approximation:
    1 deg lat ~ 111.32 km; lng scaled by cos(lat))."""
    lat = np.asarray(lat, dtype=np.float64)
    half_deg_lat = np.asarray(extent_m, dtype=np.float64) / 2.0 / 111_320.0
    half_deg_lng = half_deg_lat / np.maximum(np.cos(np.radians(lat)), 1e-6)
    lng = np.asarray(lng, dtype=np.float64)
    return lng - half_deg_lng, lng + half_deg_lng, lat - half_deg_lat, lat + half_deg_lat


class RasterVectorClip:
    """Per-image polygon rasterization: coverage_pct + masked mean intensity.

    Output columns: image_id, muni_id (best-covering polygon or null),
    covered_pixels, total_pixels, masked_mean_c (mean gray of covered pixels
    x100 as int; -1 when uncovered).
    """

    def __init__(self, polygons_ref):
        try:
            import ray

            if isinstance(polygons_ref, ray.ObjectRef):
                polygons_ref = ray.get(polygons_ref)
        except Exception:
            pass
        self.polygons = polygons_ref
        self.index = PolygonIndex(polygons_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.geocode import geocode_hash, image_row_index

        idx = image_row_index(batch.column("image_id"))
        lng, lat = geocode_hash(idx)
        from ..pipelines.flagship import _extent_m

        ext = _extent_m(idx)
        w0, e0, s0, n0 = footprint_of(lng, lat, ext)

        from .decode import binary_views

        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = len(blobs)
        muni_out = np.empty(n, dtype=object)
        covered = np.zeros(n, dtype=np.int64)
        total = np.zeros(n, dtype=np.int64)
        masked_mean = np.full(n, -1, dtype=np.int64)

        boxes = self.index.boxes
        for i in range(n):
            w, h = int(ws[i]), int(hs[i])
            total[i] = w * h
            # candidate polygons whose bbox intersects the footprint
            cand = [
                j
                for j in range(len(boxes))
                if boxes[j][0] <= e0[i]
                and boxes[j][2] >= w0[i]
                and boxes[j][1] <= n0[i]
                and boxes[j][3] >= s0[i]
            ]
            if not cand:
                muni_out[i] = None
                continue
            # pixel-center grid of this raster tile (row 0 = north edge)
            px_lng = w0[i] + (np.arange(w) + 0.5) / w * (e0[i] - w0[i])
            px_lat = n0[i] - (np.arange(h) + 0.5) / h * (n0[i] - s0[i])
            gx = np.repeat(px_lng[None, :], h, axis=0).reshape(-1)
            gy = np.repeat(px_lat[:, None], w, axis=1).reshape(-1)
            best_j, best_cov = -1, 0
            best_mask = None
            for j in cand:
                mask = points_in_polygon(gx, gy, self.polygons[j]["rings"])
                c = int(mask.sum())
                if c > best_cov:
                    best_j, best_cov, best_mask = j, c, mask
            if best_j < 0:
                muni_out[i] = None
                continue
            muni_out[i] = self.polygons[best_j]["id"]
            covered[i] = best_cov
            px = decode_image(blobs[i], fmts[i], w, h)
            gray = px.astype(np.float64).mean(axis=2).reshape(-1)
            masked_mean[i] = int(round(float(gray[best_mask].mean()) * 100))

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "muni_id": pa.array(muni_out, pa.string()),
                "covered_pixels": pa.array(covered),
                "total_pixels": pa.array(total),
                "masked_mean_c": pa.array(masked_mean),
            }
        )
