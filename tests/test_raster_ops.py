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
