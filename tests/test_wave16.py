"""Wave 16 pins: Moran's I, ViT patch stats, int8 embedding quantization.

The oracle gate proves morans_i's SQL equality; these pins check the rest —
the patch reduceat sums against explicit per-image slicing, the quantizer
against a single-process numpy recompute, and Moran's I against a direct
dense-grid recompute of the textbook formula (independent of the
scatter-to-neighbors plan).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def image_files():
    from plateau_gis_converter_ray.sources.images import ensure_image_table

    path = ensure_image_table(0.001)
    return [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]


def test_image_patches_match_slicing(ray_session, image_files):
    import ray.data

    from plateau_gis_converter_ray.kernels.imagecodec import decode_image
    from plateau_gis_converter_ray.stages.decode import ImagePatches

    g = 4
    ds = ray.data.read_parquet(
        image_files, columns=["image_id", "bytes", "fmt", "w", "h"]
    )
    out = (
        ds.map_batches(ImagePatches(grid=g), batch_format="pyarrow",
                       batch_size=256)
        .to_pandas()
        .set_index(["image_id", "patch_row", "patch_col"])
    )
    raw = pq.read_table(image_files).to_pylist()
    assert len(out) == g * g * len(raw)
    for row in raw[:60]:
        px = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
        gray = px.sum(axis=2, dtype=np.int64)
        h, w = row["h"], row["w"]
        for pr in range(g):
            for pc in range(g):
                r0, r1 = (pr * h) // g, ((pr + 1) * h) // g
                c0, c1 = (pc * w) // g, ((pc + 1) * w) // g
                patch = gray[r0:r1, c0:c1]
                got = out.loc[(row["image_id"], pr, pc)]
                assert got["gray_sum"] == patch.sum()
                assert got["gray_sq_sum"] == (patch * patch).sum()
                assert got["n_px"] == patch.size
                assert got["patch_mean"] == pytest.approx(patch.mean())


def test_embed_int8_quantize_matches_serial(ray_session):
    import __ray_entry__ as entry

    res = entry.queries()["embed_int8_quantize"](SF_SMALL)
    emb = pd.read_parquet(SF_SMALL + "/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    max_abs = np.abs(mat).max(axis=0)
    scale = np.where(max_abs > 0, max_abs / 127.0, 1.0)
    codes = np.clip(np.round(mat / scale), -127, 127).astype(np.int64)
    err = np.abs(mat - codes * scale)

    res = res.sort_values("dim").reset_index(drop=True)
    assert len(res) == mat.shape[1]
    assert (res["n"].to_numpy() == mat.shape[0]).all()
    assert (res["scale"].to_numpy() == scale).all()  # max is order-free
    assert (res["code_sum"].to_numpy() == codes.sum(axis=0)).all()
    assert (
        res["n_sat"].to_numpy() == (np.abs(codes) == 127).sum(axis=0)
    ).all()
    assert (res["max_abs_err"].to_numpy() == err.max(axis=0)).all()
    # symmetric calibration saturates at least the per-dim argmax element
    assert (res["n_sat"].to_numpy() >= 1).all()


def test_morans_i_matches_dense_recompute(ray_session):
    import pyarrow as pa

    import __ray_entry__ as entry
    from plateau_gis_converter_ray.stages.geocode import add_lnglat_arith
    from plateau_gis_converter_ray.stages.tiles import assign_webmercator

    res = entry.queries()["morans_i"](SF_SMALL)
    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["event_id"])
    b = assign_webmercator(
        add_lnglat_arith(pa.Table.from_pandas(ev), "event_id"), 10
    )
    t = (
        pd.DataFrame(
            {"x": b.column("tile_x").to_numpy(),
             "y": b.column("tile_y").to_numpy()}
        )
        .groupby(["x", "y"], as_index=False)
        .size()
    )
    x = t["size"].to_numpy().astype(np.float64)
    n = len(t)
    xb = x.mean()
    coords = {(int(r.x), int(r.y)): i for i, r in enumerate(t.itertuples())}
    num = 0.0
    wsum = 0
    for (cx, cy), i in coords.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                j = coords.get((cx + dx, cy + dy))
                if j is not None:
                    num += (x[i] - xb) * (x[j] - xb)
                    wsum += 1
    den = ((x - xb) ** 2).sum()
    want = (n / wsum) * num / den
    assert int(res["n_tiles"][0]) == n
    assert int(res["w_pairs"][0]) == wsum
    assert float(res["morans_i"][0]) == pytest.approx(want, rel=1e-12)
    assert -1.5 <= float(res["morans_i"][0]) <= 1.5
