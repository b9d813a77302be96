"""Raster terrain/overview operators over the image table.

The geospatial crossover for the binary image column: treat the red plane
as a DEM and compute Horn-method hillshade (the GDAL `gdaldem hillshade`
semantics — reference parity target is the raster half of the tier, not a
specific nusamai file), and build GeoTIFF-overview-style 2x reduced
pyramid levels with integer truncating block means.

Both stages follow the decode pipeline's scale contract
(`stages/decode.py`): zero-copy payload views, one (fmt, w, h) group
decode into a uint8 stack, every per-pixel kernel vectorized over the
whole stack, per-image OUTPUT rows only (bytes never leave the stage, so
nothing wide ever shuffles). Stateless -> task fns, no actor pool needed.

Determinism: the pyramid is pure integer arithmetic (2x2 sums, truncating
//4); hillshade is float but a fixed expression evaluated per pixel with
no cross-image or cross-batch reduction, so results are independent of
batch composition and bit-stable run to run. Both are pinned in pytest
against local per-image recomputes (tests/test_raster_ops.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .decode import binary_views, decode_group_stack

# GDAL hillshade defaults: sun azimuth 315 deg, altitude 45 deg, z=1, cell=1
_AZ = np.deg2rad(315.0)
_ALT = np.deg2rad(45.0)


def hillshade_u8(dem: np.ndarray) -> np.ndarray:
    """(g, h-2, w-2) uint8 Horn hillshade of a (g, h, w) uint8 DEM stack.

    Interior pixels only (the 1-px border has no full 3x3 neighborhood —
    GDAL pads; dropping the border keeps the kernel branch-free). All
    eight neighbor reads are views; the only full-size temporaries are
    the two int16 gradient planes and the float32 shade plane.
    """
    z = dem.astype(np.int16)
    tl = z[:, :-2, :-2]
    tc = z[:, :-2, 1:-1]
    tr = z[:, :-2, 2:]
    ml = z[:, 1:-1, :-2]
    mr = z[:, 1:-1, 2:]
    bl = z[:, 2:, :-2]
    bc = z[:, 2:, 1:-1]
    br = z[:, 2:, 2:]
    # Horn 1981 weighted differences; /8 folded into the atan argument
    gx = (tr + 2 * mr + br) - (tl + 2 * ml + bl)
    gy = (bl + 2 * bc + br) - (tl + 2 * tc + tr)
    gxf = gx.astype(np.float64) / 8.0
    gyf = gy.astype(np.float64) / 8.0
    # closed form of sin(alt)cos(slope) + cos(alt)sin(slope)cos(az-aspect)
    # with slope = atan|g|, aspect = atan2(gy, -gx): one rsqrt instead of
    # four transcendentals per pixel (the GDAL inner-loop identity)
    ca, sa = np.cos(_AZ), np.sin(_AZ)
    num = np.sin(_ALT) + np.cos(_ALT) * (ca * (-gxf) + sa * gyf)
    shade = num / np.sqrt(1.0 + gxf * gxf + gyf * gyf)
    return np.clip(np.rint(shade * 255.0), 0.0, 255.0).astype(np.uint8)


class HillshadeStats:
    """Per-image hillshade summary: mean/min/max of the shaded interior
    plus the fully-shadowed fraction, exact-int where the value is a
    count or sum of uint8 (hs_sum/n_px carried separately so any
    downstream regrouping can re-derive the mean without float re-sum)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = len(ids)
        hs_sum = np.empty(n, dtype=np.int64)
        hs_min = np.empty(n, dtype=np.int64)
        hs_max = np.empty(n, dtype=np.int64)
        n_px = np.empty(n, dtype=np.int64)
        n_shadow = np.empty(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            stack = decode_group_stack(blobs, rows, fmt, w, h)
            shade = hillshade_u8(stack[..., 0])
            rows_np = np.array(rows)
            hs_sum[rows_np] = shade.sum(axis=(1, 2), dtype=np.int64)
            hs_min[rows_np] = shade.min(axis=(1, 2))
            hs_max[rows_np] = shade.max(axis=(1, 2))
            n_px[rows_np] = shade.shape[1] * shade.shape[2]
            n_shadow[rows_np] = (shade == 0).sum(axis=(1, 2), dtype=np.int64)

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "hs_sum": pa.array(hs_sum),
                "n_px": pa.array(n_px),
                "hs_min": pa.array(hs_min),
                "hs_max": pa.array(hs_max),
                "n_shadow": pa.array(n_shadow),
            }
        )


def pyramid_reduce_u8(level: np.ndarray) -> np.ndarray:
    """One 2x overview reduction: truncating mean of each 2x2 block,
    per channel — pure integer, exact, (g, h, w, c) -> (g, h//2, w//2, c).
    Odd trailing rows/cols are dropped (GDAL 'nearest window' behavior
    for the synthetic even sizes never triggers this; kept defined)."""
    a = level[:, : level.shape[1] // 2 * 2, : level.shape[2] // 2 * 2]
    s = (
        a[:, 0::2, 0::2].astype(np.uint16)
        + a[:, 1::2, 0::2]
        + a[:, 0::2, 1::2]
        + a[:, 1::2, 1::2]
    )
    return (s // 4).astype(np.uint8)


class PyramidLevels:
    """GeoTIFF-overview-style pyramid: per image, levels 0..max_level of
    2x truncating block-mean reductions; one OUTPUT row per (image,
    level) carrying exact integer summaries (pixel sum + a position-
    weighted checksum that pins layout, not just histogram)."""

    def __init__(self, max_level: int = 3):
        self.max_level = max_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        out_id: list[str] = []
        out_lvl: list[int] = []
        out_w: list[int] = []
        out_h: list[int] = []
        out_sum: list[int] = []
        out_ck: list[int] = []

        groups: dict[tuple, list[int]] = {}
        for i in range(len(ids)):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            level = decode_group_stack(blobs, rows, fmt, w, h)
            for lvl in range(self.max_level + 1):
                g, lh, lw, _ = level.shape
                flat = level.reshape(g, -1).astype(np.int64)
                sums = flat.sum(axis=1)
                # position-weighted checksum: sum(v * (flat_pos + 1)) in
                # wrapping uint64 (deterministic, layout-sensitive)
                wvec = np.arange(1, flat.shape[1] + 1, dtype=np.uint64)
                cks = (flat.astype(np.uint64) * wvec[None, :]).sum(
                    axis=1, dtype=np.uint64
                ).view(np.int64)
                out_id.extend(ids[i] for i in rows)
                out_lvl.extend([lvl] * g)
                out_w.extend([lw] * g)
                out_h.extend([lh] * g)
                out_sum.extend(sums.tolist())
                out_ck.extend(cks.tolist())
                if lvl < self.max_level:
                    if min(level.shape[1] // 2, level.shape[2] // 2) < 1:
                        break
                    level = pyramid_reduce_u8(level)

        return pa.table(
            {
                "image_id": pa.array(out_id, pa.string()),
                "level": pa.array(out_lvl, pa.int64()),
                "w_l": pa.array(out_w, pa.int64()),
                "h_l": pa.array(out_h, pa.int64()),
                "px_sum": pa.array(out_sum, pa.int64()),
                "pos_ck": pa.array(out_ck, pa.int64()),
            }
        )


# D8 neighbor order (fixed tie-break): E, SE, S, SW, W, NW, N, NE
_D8 = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1))


def d8_flow_targets(dem: np.ndarray) -> np.ndarray:
    """(g, h, w) int64 within-image flat target per cell, -1 for pits.

    Max-drop D8: each cell flows to the neighbor with the largest
    strictly-positive elevation drop (plain drop, not drop/distance — the
    max-drop D8 variant; documented, and the scalar pin uses the same
    rule). Ties break on the fixed _D8 order (np.argmax first-occurrence).
    Out-of-image neighbors are padded at 255 so their drop is never
    positive: edges don't drain off the raster, they can be pits."""
    g, h, w = dem.shape
    z = np.full((g, h + 2, w + 2), 255, dtype=np.int16)
    z[:, 1:-1, 1:-1] = dem
    demi = z[:, 1:-1, 1:-1]
    # running max over a PACKED key: drop*8 + (7-k) fits int16 (drop in
    # [-255, 255]), the 8x term dominates so max picks the largest drop,
    # and among equal drops the larger (7-k) wins = the FIRST k in _D8
    # order — the whole 8-direction sweep is fused np.maximum, no masks
    best_key = np.full((g, h, w), np.int16(-(1 << 14)), dtype=np.int16)
    key = np.empty((g, h, w), dtype=np.int16)
    for k, (dy, dx) in enumerate(_D8):
        nb = z[:, 1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
        np.subtract(demi, nb, out=key)
        np.multiply(key, 8, out=key)
        np.add(key, 7 - k, out=key)
        np.maximum(best_key, key, out=best_key)
    best_drop = best_key >> 3  # arithmetic shift == floor div, exact here
    best_k = 7 - (best_key & 7)
    # flat within-image target = cell index + per-direction offset; the
    # padded border guarantees an out-of-image neighbor never wins with
    # a positive drop, so the offset is always in-bounds where kept
    off = np.array([dy * w + dx for dy, dx in _D8], dtype=np.int64)
    cell = np.arange(h * w, dtype=np.int64).reshape(1, h, w)
    tgt = cell + off[best_k]
    tgt[best_drop <= 0] = -1
    return tgt


def flow_accumulation_u8(dem: np.ndarray, tgt: np.ndarray = None) -> np.ndarray:
    """(g, h, w) int64 D8 flow accumulation (each cell contributes one
    unit routed strictly downhill to a pit).

    Elevation-banded topological sweep: flow only ever moves to a
    strictly lower cell, so processing distinct uint8 levels in
    descending order makes every cell's accumulation final before it is
    scattered into its target — at most 256 vectorized np.add.at passes
    over the WHOLE stack regardless of image count (the per-image longest
    flow path never serializes anything)."""
    g, h, w = dem.shape
    if tgt is None:
        tgt = d8_flow_targets(dem)
    demf = dem.reshape(-1)
    tgtf = tgt.reshape(-1)
    acc = np.ones(g * h * w, dtype=np.int64)
    # keep only flowing cells (pits receive but never scatter); ONE sort
    # by the packed (255 - elevation, global target) key orders levels
    # descending with targets ascending INSIDE each level, so the
    # per-level scatter is a buffered segmented reduceat + unique-index
    # add instead of unbuffered np.add.at
    flow = np.nonzero(tgtf >= 0)[0]
    if not len(flow):
        return acc.reshape(g, h, w)
    gtgt = tgtf[flow] + (flow // (h * w)) * (h * w)
    o = np.argsort(-demf[flow].astype(np.int16), kind="stable")
    flow = flow[o]
    gtgt = gtgt[o]
    vals = demf[flow]
    bounds = np.r_[0, np.nonzero(vals[1:] != vals[:-1])[0] + 1, len(vals)]
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        np.add.at(acc, gtgt[b0:b1], acc[flow[b0:b1]])
    return acc.reshape(g, h, w)


class FlowAccumulation:
    """Per-image D8 flow-accumulation summary over the red-plane DEM:
    pit count, max accumulation (the main channel's catchment size),
    drained total (sum of accumulation at pits — exactly h*w by mass
    conservation, carried as an auditable column), and a position-weighted
    accumulation checksum pinning the full grid, not just its histogram.

    Decode follows the stage scale contract (stages/decode.py): zero-copy
    payload views, (fmt, w, h) group-stack decode, per-image OUTPUT rows
    only — bytes never shuffle. Rows-only query (iterative algorithm, no
    SQL twin); pinned in pytest against a scalar per-cell recompute plus
    the conservation invariant."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = len(ids)
        n_pits = np.empty(n, dtype=np.int64)
        acc_max = np.empty(n, dtype=np.int64)
        drained = np.empty(n, dtype=np.int64)
        pos_ck = np.empty(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            dem = decode_group_stack(blobs, rows, fmt, w, h)[..., 0]
            tgt = d8_flow_targets(dem)
            acc = flow_accumulation_u8(dem, tgt)
            rows_np = np.array(rows)
            pits = tgt < 0
            n_pits[rows_np] = pits.sum(axis=(1, 2), dtype=np.int64)
            acc_max[rows_np] = acc.max(axis=(1, 2))
            drained[rows_np] = np.where(pits, acc, 0).sum(
                axis=(1, 2), dtype=np.int64
            )
            g = len(rows)
            wvec = np.arange(1, h * w + 1, dtype=np.uint64)
            pos_ck[rows_np] = (
                acc.reshape(g, -1).astype(np.uint64) * wvec[None, :]
            ).sum(axis=1, dtype=np.uint64).view(np.int64)

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "n_pits": pa.array(n_pits),
                "acc_max": pa.array(acc_max),
                "drained": pa.array(drained),
                "acc_ck": pa.array(pos_ck),
            }
        )


def watershed_labels(tgt: np.ndarray) -> np.ndarray:
    """(g, h, w) int64 basin label per cell: the within-image flat index
    of the pit the cell ultimately drains to (pits label themselves).

    Pointer doubling over the D8 target graph — ptr <- ptr[ptr] until
    fixpoint, <= log2(longest flow path) vectorized rounds across the
    whole stack; no per-image or per-path Python."""
    g, h, w = tgt.shape
    self_ix = np.arange(h * w, dtype=np.int64)[None, :]
    ptr = tgt.reshape(g, -1).copy()
    np.copyto(ptr, self_ix, where=ptr < 0)
    while True:
        nxt = np.take_along_axis(ptr, ptr, axis=1)
        if (nxt == ptr).all():
            return ptr.reshape(g, h, w)
        ptr = nxt


class WatershedStats:
    """Per-image watershed decomposition summary over the red-plane DEM:
    basin count (== pit count), largest-basin size, and a position-
    weighted label checksum pinning the full partition. Same decode
    scale contract as FlowAccumulation; rows-only (iterative algorithm),
    pinned in pytest against scalar pointer-following."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = len(ids)
        n_basins = np.empty(n, dtype=np.int64)
        max_basin = np.empty(n, dtype=np.int64)
        lab_ck = np.empty(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            dem = decode_group_stack(blobs, rows, fmt, w, h)[..., 0]
            tgt = d8_flow_targets(dem)
            lab = watershed_labels(tgt).reshape(len(rows), -1)
            rows_np = np.array(rows)
            g = len(rows)
            # global label ids -> one bincount -> per-image basin stats
            gl = (lab + (np.arange(g, dtype=np.int64) * (h * w))[:, None])
            counts = np.bincount(gl.reshape(-1), minlength=g * h * w)
            counts = counts.reshape(g, h * w)
            n_basins[rows_np] = (counts > 0).sum(axis=1)
            max_basin[rows_np] = counts.max(axis=1)
            wvec = np.arange(1, h * w + 1, dtype=np.uint64)
            lab_ck[rows_np] = (
                lab.astype(np.uint64) * wvec[None, :]
            ).sum(axis=1, dtype=np.uint64).view(np.int64)

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "n_basins": pa.array(n_basins),
                "max_basin": pa.array(max_basin),
                "lab_ck": pa.array(lab_ck),
            }
        )


class TerrainMetrics:
    """gdaldem TRI / TPI / roughness over the red-plane DEM: per interior
    pixel, TRI = mean |z - neighbor| over the 8 neighbors (Riley 1999 as
    gdaldem computes it: sum of absolute differences / 8), TPI = z - mean
    of neighbors, roughness = max(neighbor window) - min(neighbor window)
    including the center. Per-image exact-integer summaries: 8x-scaled
    TRI sum (exact — no /8 ever happens), 9x-scaled TPI sum, roughness
    sum/max, interior pixel count. Same decode scale contract as the
    other raster stages; zero exchanges. Rows-only; pinned in pytest
    against a scalar window recompute."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = len(ids)
        tri8_sum = np.empty(n, dtype=np.int64)
        tpi9_sum = np.empty(n, dtype=np.int64)
        rough_sum = np.empty(n, dtype=np.int64)
        rough_max = np.empty(n, dtype=np.int64)
        n_px = np.empty(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            dem = decode_group_stack(blobs, rows, fmt, w, h)[..., 0]
            z = dem.astype(np.int16)
            c = z[:, 1:-1, 1:-1]
            g = len(rows)
            tri = np.zeros((g, h - 2, w - 2), dtype=np.int64)
            tpi = np.zeros((g, h - 2, w - 2), dtype=np.int64)
            zmin = c.copy()
            zmax = c.copy()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    nb = z[:, 1 + dy: h - 1 + dy, 1 + dx: w - 1 + dx]
                    tri += np.abs(c - nb)
                    tpi += nb
                    np.minimum(zmin, nb, out=zmin)
                    np.maximum(zmax, nb, out=zmax)
            # TRI carried 8x-scaled (sum of |dz|), TPI 9x-scaled
            # (9*z - (z + sum(nb)) = 9*z - window sum): both exact ints
            tpi = 9 * c.astype(np.int64) - (tpi + c)
            rough = (zmax - zmin).astype(np.int64)
            rows_np = np.array(rows)
            tri8_sum[rows_np] = tri.sum(axis=(1, 2))
            tpi9_sum[rows_np] = tpi.sum(axis=(1, 2))
            rough_sum[rows_np] = rough.sum(axis=(1, 2))
            rough_max[rows_np] = rough.max(axis=(1, 2))
            n_px[rows_np] = (h - 2) * (w - 2)

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "tri8_sum": pa.array(tri8_sum),
                "tpi9_sum": pa.array(tpi9_sum),
                "rough_sum": pa.array(rough_sum),
                "rough_max": pa.array(rough_max),
                "n_px": pa.array(n_px),
            }
        )


def _r2_predecessors(h: int, w: int, oy: int, ox: int) -> np.ndarray:
    """(h*w,) int64 predecessor of every cell on the digital line back to
    the observer (oy, ox): one Bresenham-style step toward the observer
    along the cell's major axis (the R2/xdraw predecessor structure —
    Franklin & Ray 1994). The observer maps to itself. Pure geometry:
    computed ONCE per (h, w) group and shared by every image in the
    stack."""
    yy, xx = np.mgrid[0:h, 0:w]
    dy = yy - oy
    dx = xx - ox
    ady = np.abs(dy)
    adx = np.abs(dx)
    L = np.maximum(ady, adx)
    Ls = np.maximum(L, 1)
    # previous point on the line at parameter t = L-1 (rounded to the
    # nearest cell, ties toward the observer via floor of the exact
    # rational (L-1)*d/L + 1/2, computed in integers)
    py = oy + (2 * (L - 1) * dy + Ls) // (2 * Ls)
    px = ox + (2 * (L - 1) * dx + Ls) // (2 * Ls)
    pred = (py * w + px).reshape(-1)
    pred[(yy == oy).reshape(-1) & (xx == ox).reshape(-1)] = oy * w + ox
    return pred


def viewshed_u8(dem: np.ndarray, oy: int, ox: int) -> np.ndarray:
    """(g, h, w) bool visibility from the observer standing 1 unit above
    cell (oy, ox), R2 algorithm: process cells ring by ring (Chebyshev
    distance), each cell is visible iff its sight angle clears the
    running max angle along its predecessor line; the running max
    propagates ring to ring with pure gathers — vectorized over the whole
    stack, <= max(h, w) rounds. Angles compare as dz/dist in float64 with
    IDENTICAL arithmetic in the scalar pin (both sides compute the same
    two floats, so the compare is deterministic)."""
    g, h, w = dem.shape
    pred = _r2_predecessors(h, w, oy, ox)
    yy, xx = np.mgrid[0:h, 0:w]
    cheb = np.maximum(np.abs(yy - oy), np.abs(xx - ox)).reshape(-1)
    dist = np.sqrt(((yy - oy) ** 2 + (xx - ox) ** 2).reshape(-1))
    zo = dem.reshape(g, -1)[:, oy * w + ox].astype(np.float64) + 1.0
    ang = np.where(
        dist > 0,
        (dem.reshape(g, -1) - zo[:, None]) / np.maximum(dist, 1e-300),
        -np.inf,
    )
    # running max angle ALONG THE LINE UP TO (excluding) each cell
    maxang = np.full((g, h * w), -np.inf)
    vis = np.zeros((g, h * w), dtype=bool)
    vis[:, oy * w + ox] = True
    for r in range(1, int(cheb.max()) + 1):
        ring = np.nonzero(cheb == r)[0]
        p = pred[ring]
        m = np.maximum(maxang[:, p], ang[:, p])
        maxang[:, ring] = m
        vis[:, ring] = ang[:, ring] > m
    return vis.reshape(g, h, w)


class ViewshedStats:
    """Per-image viewshed summary from the center observer: visible-cell
    count, visible fraction of the far half (y < h//4), and a position-
    weighted visibility checksum. R2 ring sweep vectorized across the
    decode stack; zero exchanges. Rows-only; pinned in pytest against a
    scalar per-cell line walk using the same predecessor structure."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = len(ids)
        n_vis = np.empty(n, dtype=np.int64)
        far_vis = np.empty(n, dtype=np.int64)
        vis_ck = np.empty(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            dem = decode_group_stack(blobs, rows, fmt, w, h)[..., 0]
            vis = viewshed_u8(dem, h // 2, w // 2)
            rows_np = np.array(rows)
            g = len(rows)
            n_vis[rows_np] = vis.sum(axis=(1, 2), dtype=np.int64)
            far_vis[rows_np] = vis[:, : h // 4, :].sum(
                axis=(1, 2), dtype=np.int64
            )
            wvec = np.arange(1, h * w + 1, dtype=np.uint64)
            vis_ck[rows_np] = (
                vis.reshape(g, -1).astype(np.uint64) * wvec[None, :]
            ).sum(axis=1, dtype=np.uint64).view(np.int64)

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "n_visible": pa.array(n_vis),
                "far_visible": pa.array(far_vis),
                "vis_ck": pa.array(vis_ck),
            }
        )


# marching squares (midpoint rule), corner bits TL=1 TR=2 BR=4 BL=8:
# single-corner cases cut one diagonal (sqrt(2)/2) segment, opposite-edge
# pairs one straight (unit) segment, saddles (5, 10) two diagonals under
# the fixed "separate corners" convention — all counts pure integers
_MS_DIAG = np.array([0, 1, 1, 0, 1, 2, 0, 1, 1, 0, 2, 1, 0, 1, 1, 0],
                    dtype=np.int8)
_MS_STRAIGHT = np.array([0, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0],
                        dtype=np.int8)


class ContourSegments:
    """Marching-squares iso-contour extraction (raster -> vector lines) of
    the red-plane DEM at a fixed threshold — the contour sibling of
    `polygon_rasterize`'s vector -> raster burn. Per 2x2 cell the 16-case
    lookup yields integer diagonal/straight segment counts (saddles use
    the fixed separate-corners convention), so every output is an exact
    int64 and batch-composition-independent. Same decode scale contract
    as the other raster stages: group-stacked decode, one vectorized
    case-index computation per stack, zero exchanges. Rows-only; pinned
    in pytest against a scalar per-cell recompute."""

    def __init__(self, threshold: int = 128):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()

        n = len(ids)
        n_diag = np.empty(n, dtype=np.int64)
        n_straight = np.empty(n, dtype=np.int64)
        n_boundary = np.empty(n, dtype=np.int64)

        groups: dict[tuple, list[int]] = {}
        for i in range(n):
            groups.setdefault((fmts[i], int(ws[i]), int(hs[i])), []).append(i)
        for (fmt, w, h), rows in groups.items():
            dem = decode_group_stack(blobs, rows, fmt, w, h)[..., 0]
            gmask = dem > self.threshold
            case = (
                gmask[:, :-1, :-1].astype(np.uint8)
                + 2 * gmask[:, :-1, 1:]
                + 4 * gmask[:, 1:, 1:]
                + 8 * gmask[:, 1:, :-1]
            )
            rows_np = np.array(rows)
            d = _MS_DIAG[case]
            s = _MS_STRAIGHT[case]
            n_diag[rows_np] = d.sum(axis=(1, 2), dtype=np.int64)
            n_straight[rows_np] = s.sum(axis=(1, 2), dtype=np.int64)
            n_boundary[rows_np] = ((case != 0) & (case != 15)).sum(
                axis=(1, 2), dtype=np.int64
            )

        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "fmt": batch.column("fmt"),
                "n_diag": pa.array(n_diag),
                "n_straight": pa.array(n_straight),
                "n_boundary": pa.array(n_boundary),
            }
        )
