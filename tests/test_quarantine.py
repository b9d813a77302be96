"""Poison-row quarantine decode: exact routing, conservation, stat parity."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _image_batch(sf=0.001):
    import glob

    from plateau_gis_converter_ray.sources.images import ensure_image_table

    path = ensure_image_table(sf)
    import pyarrow.parquet as pq

    t = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{path}/*.parquet"))]
    )
    return t


def test_quarantine_routes_and_conserves(ray_session):
    from plateau_gis_converter_ray.stages.decode import (
        ImageDecodeStats,
        QuarantiningDecode,
    )

    t = _image_batch()
    n = t.num_rows
    # corrupt three specific rows three ways
    blobs = t.column("bytes").to_pylist()
    fmts = t.column("fmt").to_pylist()
    blobs[0] = blobs[0][: len(blobs[0]) // 2]
    fmts[1] = "jxl"
    blobs[2] = b"\x00"
    # a ppm losing fewer bytes than its header length: the header parses,
    # only the header-aware length check can catch it (review finding)
    ppm_rows = [i for i, f in enumerate(fmts) if f == "ppm"]
    ppm_cut = None
    if len(ppm_rows) > 3:
        ppm_cut = ppm_rows[3]
        blobs[ppm_cut] = blobs[ppm_cut][:-5]
    t2 = (
        t.drop_columns(["bytes", "fmt"])
        .append_column("bytes", pa.array(blobs, pa.binary()))
        .append_column("fmt", pa.array(fmts, pa.string()))
    )
    out = QuarantiningDecode()(t2)
    assert out.num_rows == n  # conservation
    reasons = out.column("quarantine_reason").to_pylist()
    bad = [r for r in reasons if r]
    assert len(bad) == (4 if ppm_cut is not None else 3)
    assert "unknown_fmt" in bad

    # good rows: identical stats to the clean decode of the same rows
    clean = ImageDecodeStats()(t).to_pandas()
    got = out.to_pandas()
    if ppm_cut is not None:
        cut_id = t.column("image_id")[ppm_cut].as_py()
        assert got.loc[got["image_id"] == cut_id, "quarantine_reason"].iloc[0] == "truncated"
    good = got[got["quarantine_reason"] == ""].set_index("image_id")
    clean = clean.set_index("image_id")
    common = good.index
    for col in ["phash_decoded", "mean_r", "mean_g", "mean_b"]:
        assert np.array_equal(
            good.loc[common, col].to_numpy(), clean.loc[common, col].to_numpy()
        ), col


def test_quarantine_query_counts(ray_session):
    """The registry query's per-reason totals match the deterministic
    corruption spec (splitmix64(phash) % 16 -> 0: truncate, 1: unknown)."""
    import importlib.util
    import sys

    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location("e", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    res = (
        m.queries()["image_decode_quarantine"]("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("reason")
    )
    from plateau_gis_converter_ray.kernels.imagecodec import splitmix64

    t = _image_batch()
    ph = t.column("phash").to_numpy()
    with np.errstate(over="ignore"):
        h = splitmix64(ph.view(np.uint64)) % np.uint64(16)
    n_trunc = int((h == 0).sum())
    n_unknown = int((h == 1).sum())
    n_ok = t.num_rows - n_trunc - n_unknown
    assert int(res.loc["unknown_fmt", "n"]) == n_unknown
    bad_total = int(res.drop(index="ok")["n"].sum())
    assert bad_total == n_trunc + n_unknown
    assert int(res.loc["ok", "n"]) == n_ok
    # every surviving row keeps the PSNR invariant
    assert int(res.loc["ok", "psnr_ok"]) == n_ok


def test_image_augment_matches_local_and_invariants(ray_session):
    """Augment stage == local per-image recompute; analytic invariants:
    flips preserve channel means exactly; brightness shifts the mean by
    the saturating-add expectation; crop dims are 8-multiples."""
    import numpy as np
    import pandas as pd

    import __ray_entry__ as entry
    from plateau_gis_converter_ray.kernels.imagecodec import (
        block_means_u8,
        decode_image,
        phash64_batch,
    )
    from plateau_gis_converter_ray.sources.images import ensure_image_table
    from plateau_gis_converter_ray.stages.augment import _augment_stack

    got = (
        entry.queries()["image_augment"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["image_id", "aug"])
        .reset_index(drop=True)
    )
    path = ensure_image_table(0.001)
    import glob

    raw = pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(f"{path}/*.parquet"))]
    ).set_index("image_id")
    base_means = {}
    sample = got["image_id"].unique()[:40]
    for iid in sample:
        r = raw.loc[iid]
        px = decode_image(r["bytes"], r["fmt"], int(r["w"]), int(r["h"]))
        base_means[iid] = px.reshape(-1, 3).mean(axis=0)
        for aug in ("hflip", "vflip", "crop75", "bright16"):
            a = np.ascontiguousarray(_augment_stack(px[None], aug))
            row = got[(got["image_id"] == iid) & (got["aug"] == aug)].iloc[0]
            m = a.reshape(1, -1, 3).mean(axis=1)[0]
            assert np.allclose(
                [row["mean_r"], row["mean_g"], row["mean_b"]], m
            )
            assert row["phash_aug"] == int(
                phash64_batch(block_means_u8(a))[0]
            )
            assert row["out_w"] % 8 == 0 and row["out_h"] % 8 == 0
    # flips preserve means bit-for-bit (same multiset of pixels)
    for iid in sample:
        for aug in ("hflip", "vflip"):
            row = got[(got["image_id"] == iid) & (got["aug"] == aug)].iloc[0]
            assert np.allclose(
                [row["mean_r"], row["mean_g"], row["mean_b"]],
                base_means[iid],
            )
