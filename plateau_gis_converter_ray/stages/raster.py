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
        # per-polygon edge arrays (all rings concatenated) for the
        # box-crossing test, built once per actor
        self._edges = []
        for p in polygons_ref:
            segs = []
            for ring in p["rings"]:
                ax, ay = ring[:, 0], ring[:, 1]
                segs.append(
                    (ax, ay, np.roll(ax, -1), np.roll(ay, -1))
                )
            self._edges.append(tuple(np.concatenate(c) for c in zip(*segs)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.geocode import geocode_hash, image_row_index

        idx = image_row_index(batch.column("image_id"))
        lng, lat = geocode_hash(idx)
        from ..pipelines.flagship import _extent_m

        ext = _extent_m(idx)
        w0, e0, s0, n0 = footprint_of(lng, lat, ext)

        from .decode import binary_views, decode_group_stack

        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = np.asarray(batch.column("fmt").to_pylist(), dtype=object)

        n = len(blobs)
        muni_out = np.empty(n, dtype=object)
        muni_out[:] = None
        covered = np.zeros(n, dtype=np.int64)
        total = ws.astype(np.int64) * hs.astype(np.int64)
        masked_mean = np.full(n, -1, dtype=np.int64)

        if n:
            # candidate matrix (n, P): polygon bbox intersects footprint
            boxes = np.asarray(self.index.boxes, dtype=np.float64)
            cand = (
                (boxes[None, :, 0] <= e0[:, None])
                & (boxes[None, :, 2] >= w0[:, None])
                & (boxes[None, :, 1] <= n0[:, None])
                & (boxes[None, :, 3] >= s0[:, None])
            )
            self._clip_groups(
                blobs, fmts, ws, hs, w0, e0, s0, n0, cand,
                muni_out, covered, masked_mean, decode_group_stack,
            )

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "muni_id": pa.array(muni_out, pa.string()),
                "covered_pixels": pa.array(covered),
                "total_pixels": pa.array(total),
                "masked_mean_c": pa.array(masked_mean),
            }
        )

    def _clip_groups(self, blobs, fmts, ws, hs, w0, e0, s0, n0, cand,
                     muni_out, covered, masked_mean, decode_group_stack):
        """Vectorized per-(fmt, w, h) group clip: ONE batched PIP call per
        (group, polygon) over every candidate image's pixel grid at once,
        with best-coverage tracking replicating the old ascending-j scan
        exactly (strict ``>`` keeps the earliest polygon on coverage
        ties). The masked mean is an EXACT integer rational
        ``round(100 * S / (3 * covered))`` with ``S`` the int64 channel
        sum over covered pixels — deterministic under any summation
        order (r4 rewrite of the per-image Python loop; grid expressions
        are term-for-term identical so PIP bits cannot move)."""
        import pandas as pd

        fmt_codes, _ = pd.factorize(fmts)
        key = (
            (fmt_codes.astype(np.int64) << 44)
            | (ws.astype(np.int64) << 22)
            | hs.astype(np.int64)
        )
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        ends = np.r_[starts[1:], len(ks)]
        ids = np.asarray(self.index.ids, dtype=object)

        # batch-wide center/crossing tests: ONE PIP call per polygon over
        # all its candidate image centers (not one per (group, polygon))
        n_rows, n_poly = cand.shape
        inc = np.zeros((n_rows, n_poly), dtype=bool)
        crs = np.zeros((n_rows, n_poly), dtype=bool)
        cx, cy = (w0 + e0) / 2.0, (s0 + n0) / 2.0
        for j in range(n_poly):
            sel_all = np.flatnonzero(cand[:, j])
            if not len(sel_all):
                continue
            crs[sel_all, j] = self._box_crossings(
                j, w0[sel_all], e0[sel_all], s0[sel_all], n0[sel_all]
            )
            inc[sel_all, j] = points_in_polygon(
                cx[sel_all], cy[sel_all], self.polygons[j]["rings"]
            )
        for s_, e_ in zip(starts, ends):
            g = order[s_:e_]  # batch rows of this (fmt, w, h) group
            w, h = int(ws[g[0]]), int(hs[g[0]])
            fmt = fmts[g[0]]
            fx = (np.arange(w) + 0.5) / w
            fy = (np.arange(h) + 0.5) / h
            hw = h * w
            k = len(g)
            best_cov = np.zeros(k, dtype=np.int64)
            best_j = np.full(k, -1, dtype=np.int64)
            best_mask = np.zeros((k, hw), dtype=bool)
            best_full = np.zeros(k, dtype=bool)
            gcand = cand[g]  # (k, P)
            for j in np.flatnonzero(gcand.any(axis=0)):
                sel = np.flatnonzero(gcand[:, j])
                gi = g[sel]
                rings = self.polygons[j]["rings"]
                # exact shortcut: if NO edge crosses a footprint box, PIP
                # is constant over the box (parity of any in-box segment
                # can only flip at an edge crossing) — one center-point
                # test replaces the h*w grid. The crossing test is
                # conservative, so flagged boxes just take the grid path.
                cross = crs[gi, j]
                c = np.where(inc[gi, j], hw, 0).astype(np.int64)
                cri = np.flatnonzero(cross)
                mask_cr = None
                if len(cri):
                    gic = gi[cri]
                    # (s, h, w) pixel-center grids (row 0 = north edge)
                    gx = (
                        w0[gic][:, None, None]
                        + fx[None, None, :] * (e0 - w0)[gic][:, None, None]
                    )
                    gy = (
                        n0[gic][:, None, None]
                        - fy[None, :, None] * (n0 - s0)[gic][:, None, None]
                    )
                    gx = np.broadcast_to(gx, (len(gic), h, w)).reshape(-1)
                    gy = np.broadcast_to(gy, (len(gic), h, w)).reshape(-1)
                    mask_cr = points_in_polygon(gx, gy, rings).reshape(
                        len(gic), hw
                    )
                    c[cri] = mask_cr.sum(axis=1)
                upd = c > best_cov[sel]
                rows = sel[upd]
                best_cov[rows] = c[upd]
                best_j[rows] = j
                best_full[rows] = ~cross[upd]
                win_cr = upd & cross
                if win_cr.any():
                    take = np.searchsorted(cri, np.flatnonzero(win_cr))
                    best_mask[sel[win_cr]] = mask_cr[take]
            hit = np.flatnonzero(best_j >= 0)
            if not len(hit):
                continue
            muni_out[g[hit]] = ids[best_j[hit]]
            covered[g[hit]] = best_cov[hit]
            stack = decode_group_stack(blobs, list(g[hit]), fmt, w, h)
            ch = stack.reshape(len(hit), hw, 3).sum(axis=2, dtype=np.int64)
            # full-coverage winners sum every pixel (their best_mask row
            # may hold a stale losing mask — never read it)
            s_sum = np.where(
                best_full[hit],
                ch.sum(axis=1),
                (ch * best_mask[hit]).sum(axis=1),
            )
            masked_mean[g[hit]] = np.round(
                100.0 * s_sum / (3.0 * best_cov[hit])
            ).astype(np.int64)

    def _box_crossings(self, j, bw, be, bs, bn):
        """Conservative (box, polygon-j-edge) crossing test: a segment can
        intersect an axis-aligned box only if their bboxes overlap AND the
        box corners straddle the segment's infinite line. False ⇒ provably
        no crossing; True may be a near miss (grid path handles it)."""
        ax0, ay0, bx0, by0 = self._edges[j]
        n = len(bw)
        out = np.zeros(n, dtype=bool)
        # chunk over edges to bound the (boxes x edges) broadcast temps
        # (the kernels/pip.py precedent): real municipality boundaries
        # have thousands of vertices, synthetic octagons eight
        edge_chunk = max(1, int(4_000_000 // max(n, 1)))
        for s in range(0, len(ax0), edge_chunk):
            e = slice(s, s + edge_chunk)
            ax, ay, bx, by = ax0[e], ay0[e], bx0[e], by0[e]
            exm, exM = np.minimum(ax, bx), np.maximum(ax, bx)
            eym, eyM = np.minimum(ay, by), np.maximum(ay, by)
            ov = (
                (exm[None, :] <= be[:, None])
                & (exM[None, :] >= bw[:, None])
                & (eym[None, :] <= bn[:, None])
                & (eyM[None, :] >= bs[:, None])
            )
            dx, dy = (bx - ax)[None, :], (by - ay)[None, :]
            axn, ayn = ax[None, :], ay[None, :]
            f1 = dx * (bs[:, None] - ayn) - dy * (bw[:, None] - axn)
            f2 = dx * (bs[:, None] - ayn) - dy * (be[:, None] - axn)
            f3 = dx * (bn[:, None] - ayn) - dy * (bw[:, None] - axn)
            f4 = dx * (bn[:, None] - ayn) - dy * (be[:, None] - axn)
            fmin = np.minimum(np.minimum(f1, f2), np.minimum(f3, f4))
            fmax = np.maximum(np.maximum(f1, f2), np.maximum(f3, f4))
            out |= (ov & (fmin <= 0) & (fmax >= 0)).any(axis=1)
        return out
