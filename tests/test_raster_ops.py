"""Raster terrain/overview operator pins.

- hillshade: the distributed stage equals a local per-image recompute
  (same Horn kernel on locally-decoded pixels), and analytic invariants:
  a CONSTANT dem shades to the flat-terrain value everywhere
  (sin(alt)*255 ~= 180 for alt=45), and a west-facing ramp lit from the
  NW is brighter than the flat value.
- pyramid: exact integer level arithmetic vs a local recompute; level-0
  pixel sum equals the raw decode sum; each level is (w/2, h/2) of the
  one before; the position checksum detects a layout flip the plain sum
  cannot.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from plateau_gis_converter_ray.kernels.imagecodec import decode_image
from plateau_gis_converter_ray.stages.raster_ops import (
    hillshade_u8,
    pyramid_reduce_u8,
)

FLAT_SHADE = int(np.clip(np.rint(np.sin(np.deg2rad(45.0)) * 255.0), 0, 255))


def _local_images(sf=0.001):
    from plateau_gis_converter_ray.sources.images import ensure_image_table

    path = ensure_image_table(sf)
    import os

    files = [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]
    t = pq.read_table(files, columns=["image_id", "bytes", "w", "h", "fmt"])
    return t.to_pylist()


def test_hillshade_invariants():
    # constant DEM -> flat-terrain shade everywhere
    dem = np.full((1, 16, 16), 97, dtype=np.uint8)
    hs = hillshade_u8(dem)
    assert (hs == FLAT_SHADE).all()
    # gentle unit ramp descending to the SE faces the NW sun -> brighter
    # than flat; its mirror faces away -> darker (directional response)
    yy, xx = np.mgrid[0:16, 0:16]
    toward = (30 - (xx + yy)).astype(np.uint8)[None]
    away = (xx + yy).astype(np.uint8)[None]
    assert hillshade_u8(toward).mean() > FLAT_SHADE
    assert hillshade_u8(away).mean() < FLAT_SHADE


def test_hillshade_stage_matches_local(ray_session):
    import __ray_entry__ as em

    got = (
        em.queries()["raster_hillshade"]("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("image_id")
    )
    rows = _local_images()
    assert len(got) == len(rows)
    for r in rows[:200]:
        px = decode_image(r["bytes"], r["fmt"], r["w"], r["h"])
        hs = hillshade_u8(px[None, ..., 0])[0]
        g = got.loc[r["image_id"]]
        assert int(g["hs_sum"]) == int(hs.sum(dtype=np.int64))
        assert int(g["hs_min"]) == int(hs.min())
        assert int(g["hs_max"]) == int(hs.max())
        assert int(g["n_px"]) == hs.size
        assert int(g["n_shadow"]) == int((hs == 0).sum())


def test_pyramid_stage_matches_local(ray_session):
    import __ray_entry__ as em

    got = em.queries()["raster_pyramid"]("/root/testdata/sf0.001").to_pandas()
    rows = _local_images()
    assert set(got["level"].unique()) == {0, 1, 2, 3}
    by = got.set_index(["image_id", "level"])
    for r in rows[:100]:
        level = decode_image(r["bytes"], r["fmt"], r["w"], r["h"])[None]
        for lvl in range(4):
            g = by.loc[(r["image_id"], lvl)]
            assert (int(g["h_l"]), int(g["w_l"])) == level.shape[1:3]
            flat = level.reshape(-1).astype(np.int64)
            assert int(g["px_sum"]) == int(flat.sum())
            w = np.arange(1, flat.size + 1, dtype=np.uint64)
            ck = int(
                (flat.astype(np.uint64) * w).sum(dtype=np.uint64).view(np.int64)
            )
            assert int(g["pos_ck"]) == ck
            level = pyramid_reduce_u8(level)


def test_pyramid_checksum_is_layout_sensitive():
    a = np.arange(64, dtype=np.uint8).reshape(1, 4, 4, 4)
    b = a[:, ::-1].copy()  # vertical flip: same histogram, same sum
    fa = a.reshape(1, -1).astype(np.uint64)
    fb = b.reshape(1, -1).astype(np.uint64)
    w = np.arange(1, fa.shape[1] + 1, dtype=np.uint64)
    assert fa.sum() == fb.sum()
    assert (fa * w).sum() != (fb * w).sum()


def test_pyramid_reduce_exact():
    x = np.array(
        [[[10, 20], [30, 41]]], dtype=np.uint8
    ).reshape(1, 2, 2, 1)
    r = pyramid_reduce_u8(x)
    assert r.shape == (1, 1, 1, 1)
    assert int(r[0, 0, 0, 0]) == (10 + 20 + 30 + 41) // 4


# ---------------------------------------------------------------------------
# D8 flow accumulation


def _scalar_flow_acc(dem: np.ndarray):
    """Scalar reference: per-cell D8 max-drop target, then recursive
    accumulation with memoization. Returns (tgt, acc) as (h, w) arrays."""
    from plateau_gis_converter_ray.stages.raster_ops import _D8

    h, w = dem.shape
    z = dem.astype(int)
    tgt = np.full((h, w), -1, dtype=np.int64)
    for i in range(h):
        for j in range(w):
            best_k, best_drop = None, 0
            for k, (dy, dx) in enumerate(_D8):
                ni, nj = i + dy, j + dx
                if 0 <= ni < h and 0 <= nj < w:
                    drop = z[i, j] - z[ni, nj]
                    if drop > best_drop:
                        best_k, best_drop = k, drop
            if best_k is not None:
                dy, dx = _D8[best_k]
                tgt[i, j] = (i + dy) * w + (j + dx)
    # accumulate by descending elevation (strictly-downhill flow makes
    # this a valid topological order)
    acc = np.ones(h * w, dtype=np.int64)
    for c in sorted(range(h * w), key=lambda c: -z[c // w, c % w]):
        t = tgt[c // w, c % w]
        if t >= 0:
            acc[t] += acc[c]
    return tgt, acc.reshape(h, w)


def test_flow_accumulation_matches_scalar():
    from plateau_gis_converter_ray.stages.raster_ops import (
        d8_flow_targets,
        flow_accumulation_u8,
    )

    rng = np.random.default_rng(29)
    # two images in one stack, including plateaus (repeat values) so the
    # strict-drop rule and band ordering are both exercised
    dem = rng.integers(0, 12, size=(2, 9, 11), dtype=np.uint8)
    tgt = d8_flow_targets(dem)
    acc = flow_accumulation_u8(dem)
    for g in range(2):
        st, sa = _scalar_flow_acc(dem[g])
        assert (tgt[g] == st).all()
        assert (acc[g] == sa).all()
        # mass conservation: every unit drains to some pit
        assert int(acc[g][st.reshape(9, 11) < 0].sum()) == 9 * 11


def test_flow_accumulation_ramp_channel():
    from plateau_gis_converter_ray.stages.raster_ops import (
        flow_accumulation_u8,
        d8_flow_targets,
    )

    # a V-valley: columns slope toward the center column, rows slope
    # south -> all flow converges into the center column and grows
    # monotonically downslope like a river channel
    h, w = 8, 7
    col = np.abs(np.arange(w) - w // 2)
    dem = (col[None, :] * 10 + (h - 1 - np.arange(h))[:, None]).astype(
        np.uint8
    )[None]
    acc = flow_accumulation_u8(dem)[0]
    center = acc[:, w // 2]
    assert (np.diff(center) > 0).all()  # strictly growing downslope
    assert center[-1] == h * w  # the outlet drains everything
    tgt = d8_flow_targets(dem)[0]
    assert (tgt.reshape(-1) < 0).sum() == 1  # single pit at the outlet


def test_flow_accumulation_stage(ray_session):
    import ray.data

    from plateau_gis_converter_ray.stages.raster_ops import FlowAccumulation

    rows = _local_images()
    import pyarrow as pa

    t = pa.Table.from_pylist(rows[:64])
    out = FlowAccumulation()(t)
    assert out.num_rows == 64
    wh = {(r["w"], r["h"]) for r in rows[:64]}
    drained = out.column("drained").to_numpy()
    ws = np.array([r["w"] for r in rows[:64]])
    hs = np.array([r["h"] for r in rows[:64]])
    assert (drained == ws * hs).all()
    assert (out.column("acc_max").to_numpy() >= 1).all()
    assert (out.column("n_pits").to_numpy() >= 1).all()


def test_watershed_matches_scalar_following():
    from plateau_gis_converter_ray.stages.raster_ops import (
        d8_flow_targets,
        watershed_labels,
    )

    rng = np.random.default_rng(31)
    dem = rng.integers(0, 10, size=(2, 8, 9), dtype=np.uint8)
    tgt = d8_flow_targets(dem)
    lab = watershed_labels(tgt)
    for g in range(2):
        t = tgt[g].reshape(-1)
        for c in range(t.size):
            p = c
            while t[p] >= 0:
                p = t[p]
            assert lab[g].reshape(-1)[c] == p, (g, c)


def test_watershed_stage_basins_equal_pits(ray_session):
    import pyarrow as pa

    from plateau_gis_converter_ray.stages.raster_ops import (
        FlowAccumulation,
        WatershedStats,
    )

    rows = _local_images()
    t = pa.Table.from_pylist(rows[:48])
    ws = WatershedStats()(t).to_pandas().set_index("image_id")
    fa = FlowAccumulation()(t).to_pandas().set_index("image_id")
    assert (ws["n_basins"] == fa.loc[ws.index, "n_pits"]).all()
    # the largest basin is at least as big as the largest accumulation
    # (acc_max counts the cells draining THROUGH one cell; its basin
    # contains all of them)
    assert (ws["max_basin"] >= fa.loc[ws.index, "acc_max"]).all()


def test_terrain_metrics_match_scalar():
    import pyarrow as pa

    from plateau_gis_converter_ray.stages.raster_ops import TerrainMetrics

    rows = _local_images()
    t = pa.Table.from_pylist(rows[:8])
    out = TerrainMetrics()(t).to_pandas().set_index("image_id")
    for r in rows[:3]:
        dem = decode_image(r["bytes"], r["fmt"], r["w"], r["h"])[..., 0]
        z = dem.astype(int)
        h, w = z.shape
        tri8 = tpi9 = rough_s = 0
        rough_m = 0
        for i in range(1, h - 1):
            for j in range(1, w - 1):
                nbs = [
                    z[i + dy, j + dx]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                    if (dy, dx) != (0, 0)
                ]
                tri8 += sum(abs(z[i, j] - v) for v in nbs)
                tpi9 += 9 * z[i, j] - (sum(nbs) + z[i, j])
                win = nbs + [z[i, j]]
                rg = max(win) - min(win)
                rough_s += rg
                rough_m = max(rough_m, rg)
        got = out.loc[r["image_id"]]
        assert got["tri8_sum"] == tri8
        assert got["tpi9_sum"] == tpi9
        assert got["rough_sum"] == rough_s
        assert got["rough_max"] == rough_m
        assert got["n_px"] == (h - 2) * (w - 2)


def _scalar_viewshed(dem: np.ndarray, oy: int, ox: int) -> np.ndarray:
    """Scalar R2: per cell, walk the predecessor chain to the observer
    tracking the max angle — same predecessor structure, same float ops."""
    from plateau_gis_converter_ray.stages.raster_ops import _r2_predecessors

    h, w = dem.shape
    pred = _r2_predecessors(h, w, oy, ox)
    zo = float(dem[oy, ox]) + 1.0
    vis = np.zeros((h, w), dtype=bool)
    vis[oy, ox] = True
    for c in range(h * w):
        if c == oy * w + ox:
            continue
        cy, cx = divmod(c, w)
        d = np.sqrt(float((cy - oy) ** 2 + (cx - ox) ** 2))
        a = (float(dem[cy, cx]) - zo) / d
        m = -np.inf
        p = pred[c]
        while p != oy * w + ox:
            py, px = divmod(p, w)
            pd = np.sqrt(float((py - oy) ** 2 + (px - ox) ** 2))
            m = max(m, (float(dem[py, px]) - zo) / pd)
            p = pred[p]
        vis[cy, cx] = a > m
    return vis


def test_viewshed_matches_scalar():
    from plateau_gis_converter_ray.stages.raster_ops import viewshed_u8

    rng = np.random.default_rng(37)
    dem = rng.integers(0, 40, size=(2, 12, 15), dtype=np.uint8)
    vis = viewshed_u8(dem, 6, 7)
    for g in range(2):
        ref = _scalar_viewshed(dem[g], 6, 7)
        assert (vis[g] == ref).all()


def test_viewshed_flat_and_wall():
    from plateau_gis_converter_ray.stages.raster_ops import viewshed_u8

    # flat terrain: observer at +1 sees everything
    flat = np.full((1, 9, 9), 100, dtype=np.uint8)
    assert viewshed_u8(flat, 4, 4).all()
    # a tall wall east of the observer shadows everything behind it
    walled = flat.copy()
    walled[0, :, 6] = 200
    vis = viewshed_u8(walled, 4, 4)[0]
    assert vis[:, :6].all()          # west side fully visible
    assert vis[4, 6] and not vis[4, 7] and not vis[4, 8]  # shadowed row
