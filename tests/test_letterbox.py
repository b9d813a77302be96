"""Letterbox/pillarbox margin-detection pins.

The stage's grouped all-channel border-run kernel is compared against a
naive per-image recompute (independent code path: decode_image per row,
explicit Python run scans), and against synthetic images with KNOWN bar
widths — including the degenerate full-constant frame and 'bar color
continues into content' cases where only full rows/columns count.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
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
    h, w = px.shape[0], px.shape[1]
    c00 = px[0, 0]
    c11 = px[-1, -1]

    def run(seq_of_planes, anchor):
        k = 0
        for plane in seq_of_planes:
            if not (plane == anchor).all():
                break
            k += 1
        return k

    top = run((px[i] for i in range(h)), c00)
    bottom = run((px[h - 1 - i] for i in range(h)), c11)
    left = run((px[:, j] for j in range(w)), c00)
    right = run((px[:, w - 1 - j] for j in range(w)), c11)
    return top, bottom, left, right


def test_letterbox_matches_naive(ray_session, image_files):
    import ray.data

    from plateau_gis_converter_ray.stages.decode import ImageLetterbox

    ds = ray.data.read_parquet(
        image_files, columns=["image_id", "bytes", "fmt", "w", "h"]
    )
    out = (
        ds.map_batches(ImageLetterbox(), batch_format="pyarrow", batch_size=256)
        .to_pandas()
        .set_index("image_id")
    )
    raw = pq.read_table(image_files).to_pylist()
    assert len(out) == len(raw)
    for row in raw[:200]:
        t, b, le, r = _naive(row)
        got = out.loc[row["image_id"]]
        assert int(got["margin_top"]) == t
        assert int(got["margin_bottom"]) == b
        assert int(got["margin_left"]) == le
        assert int(got["margin_right"]) == r
        assert bool(got["is_letterboxed"]) == (t > 0 or b > 0 or le > 0 or r > 0)


def _mk_batch(images):
    from plateau_gis_converter_ray.kernels.imagecodec import encode_image

    return pa.table(
        {
            "image_id": [f"img_{i:012d}" for i in range(len(images))],
            "bytes": [encode_image(px, "raw") for px in images],
            "fmt": ["raw"] * len(images),
            "w": [px.shape[1] for px in images],
            "h": [px.shape[0] for px in images],
        }
    )


def test_letterbox_known_bars(ray_session):
    from plateau_gis_converter_ray.stages.decode import ImageLetterbox

    rng = np.random.default_rng(7)

    def noise(h, w):
        # Content that can never read as a bar: force adjacent-pixel
        # inequality in every row/column head so no accidental runs.
        px = rng.integers(1, 255, size=(h, w, 3), dtype=np.uint8)
        px[::2, ::2, 0] = 1
        px[1::2, ::2, 0] = 2
        px[::2, 1::2, 0] = 3
        return px

    # 1) classic letterbox: 3 black rows top, 5 bottom
    a = noise(32, 24)
    a[:3] = 0
    a[-5:] = 0
    # 2) pillarbox: 4 white cols left, 2 right
    b = noise(20, 30)
    b[:, :4] = 255
    b[:, -2:] = 255
    # 3) no bars at all
    c = noise(16, 16)
    # 4) full constant frame: margins == h / w
    d = np.full((12, 18, 3), 9, dtype=np.uint8)
    # 5) different bar colors top vs bottom (anchors differ)
    e = noise(24, 16)
    e[:2] = 0
    e[-3:] = 255
    # 6) bar color appears inside content but never as a FULL row
    f = noise(24, 24)
    f[:4] = 0
    f[10, :10] = 0  # partial black row — must not extend the margin

    batch = _mk_batch([a, b, c, d, e, f])
    out = ImageLetterbox()(batch).to_pandas()
    got = [
        (
            int(r.margin_top),
            int(r.margin_bottom),
            int(r.margin_left),
            int(r.margin_right),
            bool(r.is_letterboxed),
        )
        for r in out.itertuples()
    ]
    assert got[0] == (3, 5, 0, 0, True)
    assert got[1] == (0, 0, 4, 2, True)
    assert got[2] == (0, 0, 0, 0, False)
    assert got[3] == (12, 12, 18, 18, True)
    assert got[4] == (2, 3, 0, 0, True)
    assert got[5] == (4, 0, 0, 0, True)
