"""Texture-atlas packing pins.

- placements: every image placed exactly once; per size class the ranks
  are dense 0..n-1 in image-index order; every atlas except the last per
  class is FULL (capacity 64); slot arithmetic consistent.
- round-trip: cropping each slot back out of the assembled mosaic equals
  the independently-decoded source tile, byte for byte; empty tail slots
  are zero.
- broadcast and shuffle join plans assemble identical atlases.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

GRID = 8
CAP = GRID * GRID


@pytest.fixture(scope="module")
def image_files():
    from plateau_gis_converter_ray.sources.images import ensure_image_table

    path = ensure_image_table(0.001)
    return [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]


def _placements(image_files):
    import ray.data

    from plateau_gis_converter_ray.stages.atlas import atlas_placements

    meta = ray.data.read_parquet(image_files, columns=["image_id", "w", "h"])
    return atlas_placements(meta, grid=GRID, n_rows_hint=600).to_pandas()


def test_placements_dense_and_full(ray_session, image_files):
    pl = _placements(image_files)
    raw = pq.read_table(image_files, columns=["image_id", "w", "h"]).to_pandas()
    assert len(pl) == len(raw)
    assert pl["idx"].is_unique

    for (w, h), g in pl.groupby(["w", "h"]):
        g = g.sort_values("idx")
        rank = g["atlas_id"].to_numpy() * CAP + g["slot"].to_numpy()
        assert (rank == np.arange(len(g))).all(), (w, h)
        # every atlas but the last is full
        occ = g.groupby("atlas_id").size()
        assert (occ.iloc[:-1] == CAP).all()
        assert 1 <= occ.iloc[-1] <= CAP


def test_atlas_round_trip(ray_session, image_files):
    import ray.data

    from plateau_gis_converter_ray.kernels.imagecodec import decode_image
    from plateau_gis_converter_ray.stages.atlas import (
        assemble_atlases,
        atlas_placements,
    )

    meta = ray.data.read_parquet(image_files, columns=["image_id", "w", "h"])
    placements = atlas_placements(meta, grid=GRID, n_rows_hint=600)
    images = ray.data.read_parquet(
        image_files, columns=["image_id", "bytes", "fmt"]
    )
    atl = assemble_atlases(images, placements, grid=GRID).to_pandas()

    raw = pq.read_table(image_files).to_pylist()
    by_id = {r["image_id"]: r for r in raw}
    n_placed = 0
    for a in atl.itertuples():
        w, h = int(a.w), int(a.h)
        mosaic = np.frombuffer(a.atlas_bytes, dtype=np.uint8).reshape(
            GRID * h, GRID * w, 3
        )
        filled = np.zeros((GRID * h, GRID * w), dtype=bool)
        for slot, iid in zip(a.slots, a.image_ids):
            r, c = slot // GRID, slot % GRID
            crop = mosaic[r * h : (r + 1) * h, c * w : (c + 1) * w]
            src = by_id[iid]
            px = decode_image(src["bytes"], src["fmt"], src["w"], src["h"])
            assert (crop == px).all(), (iid, slot)
            filled[r * h : (r + 1) * h, c * w : (c + 1) * w] = True
            n_placed += 1
        assert (mosaic[~filled] == 0).all()
    assert n_placed == len(raw)


def test_placements_distributed_path_equals_fast_path(ray_session, image_files):
    """The size-gated driver fast path and the distributed histogram-rank
    path must place every image identically."""
    import pandas as pd
    import ray.data

    from plateau_gis_converter_ray.stages.atlas import atlas_placements

    def run(force):
        meta = ray.data.read_parquet(image_files, columns=["image_id", "w", "h"])
        return (
            atlas_placements(
                meta, grid=GRID, n_rows_hint=600, force_distributed=force
            )
            .to_pandas()
            .sort_values("idx")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(False), run(True))


def test_atlas_join_plans_agree(ray_session, image_files):
    import ray.data

    from plateau_gis_converter_ray.stages.atlas import (
        assemble_atlases,
        atlas_placements,
        atlas_summary,
    )

    def run(force):
        meta = ray.data.read_parquet(image_files, columns=["image_id", "w", "h"])
        placements = atlas_placements(meta, grid=GRID, n_rows_hint=600)
        images = ray.data.read_parquet(
            image_files, columns=["image_id", "bytes", "fmt"]
        )
        return (
            atlas_summary(assemble_atlases(images, placements, grid=GRID, force=force))
            .to_pandas()
            .sort_values(["w", "h", "atlas_id"])
            .reset_index(drop=True)
        )

    a = run("broadcast")
    b = run("shuffle")
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
