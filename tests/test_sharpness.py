"""Variance-of-Laplacian sharpness pins.

The stage's grouped stencil is compared against a naive per-image
recompute (independent code path: decode_image per row, explicit float
variance) — exact on the integer sums, allclose-tight on the float
variance; the blur classification matches the float threshold.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def image_files():
    from plateau_gis_converter_ray.sources.images import ensure_image_table

    path = ensure_image_table(0.001)
    return [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]


def _naive(row):
    from plateau_gis_converter_ray.kernels.imagecodec import decode_image

    px = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
    gray = px.sum(axis=2, dtype=np.int64)
    lap = (
        4 * gray[1:-1, 1:-1]
        - gray[:-2, 1:-1]
        - gray[2:, 1:-1]
        - gray[1:-1, :-2]
        - gray[1:-1, 2:]
    )
    return int(lap.sum()), int((lap * lap).sum()), lap.size, float(np.var(lap))


def test_sharpness_matches_naive(ray_session, image_files):
    import ray.data

    from plateau_gis_converter_ray.stages.decode import ImageSharpness

    ds = ray.data.read_parquet(
        image_files, columns=["image_id", "bytes", "fmt", "w", "h"]
    )
    out = (
        ds.map_batches(ImageSharpness(), batch_format="pyarrow", batch_size=256)
        .to_pandas()
        .set_index("image_id")
    )
    raw = pq.read_table(image_files).to_pylist()
    assert len(out) == len(raw)
    for row in raw[:200]:
        s1, s2, n, var = _naive(row)
        got = out.loc[row["image_id"]]
        assert int(got["lap_sum"]) == s1
        assert int(got["lap_sq_sum"]) == s2
        assert int(got["n_interior"]) == n
        assert np.isclose(got["sharpness"], var, rtol=1e-12)
        assert bool(got["is_blurry"]) == (got["sharpness"] < 100.0)


def test_sharpness_flat_image_is_blurry(ray_session):
    """A constant image has zero Laplacian variance everywhere."""
    import pyarrow as pa

    from plateau_gis_converter_ray.kernels.imagecodec import encode_image
    from plateau_gis_converter_ray.stages.decode import ImageSharpness

    px = np.full((16, 16, 3), 77, dtype=np.uint8)
    batch = pa.table(
        {
            "image_id": ["img_000000000000"],
            "bytes": [encode_image(px, "raw")],
            "fmt": ["raw"],
            "w": [16],
            "h": [16],
        }
    )
    out = ImageSharpness()(batch).to_pandas()
    assert out["lap_sum"].iloc[0] == 0
    assert out["lap_sq_sum"].iloc[0] == 0
    assert out["sharpness"].iloc[0] == 0.0
    assert bool(out["is_blurry"].iloc[0])


def _naive_equalize(row):
    from plateau_gis_converter_ray.kernels.imagecodec import decode_image

    px = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
    gray = px.sum(axis=2, dtype=np.int64).ravel()
    hist = np.bincount(gray, minlength=766)
    cdf = hist.cumsum()
    cdf_min = cdf[np.nonzero(hist)[0][0]]
    den = max(gray.size - cdf_min, 1)
    lut = np.clip((cdf - cdf_min) * 255 // den, 0, 255)
    eq = lut[gray]
    wts = (np.arange(gray.size, dtype=np.int64) % 251) + 1
    return int(gray.sum()), int(eq.sum()), int((eq * wts).sum())


def test_equalize_matches_naive(ray_session, image_files):
    import ray.data

    from plateau_gis_converter_ray.stages.decode import ImageEqualize

    ds = ray.data.read_parquet(
        image_files, columns=["image_id", "bytes", "fmt", "w", "h"]
    )
    out = (
        ds.map_batches(ImageEqualize(), batch_format="pyarrow", batch_size=256)
        .to_pandas()
        .set_index("image_id")
    )
    raw = pq.read_table(image_files).to_pylist()
    assert len(out) == len(raw)
    for row in raw[:150]:
        gs, es, ck = _naive_equalize(row)
        got = out.loc[row["image_id"]]
        assert int(got["gray_sum"]) == gs
        assert int(got["eq_sum"]) == es
        assert int(got["eq_checksum"]) == ck


def test_equalize_flat_image_maps_to_zero(ray_session):
    """A constant image equalizes to all-zero output (cdf==cdf_min)."""
    import pyarrow as pa

    from plateau_gis_converter_ray.kernels.imagecodec import encode_image
    from plateau_gis_converter_ray.stages.decode import ImageEqualize

    px = np.full((8, 8, 3), 123, dtype=np.uint8)
    batch = pa.table(
        {
            "image_id": ["img_000000000000"],
            "bytes": [encode_image(px, "raw")],
            "fmt": ["raw"],
            "w": [8],
            "h": [8],
        }
    )
    out = ImageEqualize()(batch).to_pandas()
    assert out["eq_sum"].iloc[0] == 0
    assert out["eq_checksum"].iloc[0] == 0
