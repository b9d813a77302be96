"""Wave-9 operators: tile-grid neighbor smoothing (3x3 stencil exchange),
NDCG@k retrieval eval, zlib compression-ratio quality signal. The oracle
twins (tile_neighbor_smooth, ndcg_at_k) are additionally gated by
tools/check_queries.py; these tests pin local recomputes / invariants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _pdf(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_tile_neighbor_smooth_matches_local(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import (
        q_tile_neighbor_smooth,
        q_tile_wm_z12,
    )

    got = (
        _pdf(q_tile_neighbor_smooth(SF_SMALL))
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )

    # local recompute of the 3x3 windows from the z10 tile counts
    # (derive z10 from the same geocode arithmetic the query uses)
    from plateau_gis_converter_ray.stages.geocode import geocode_arith
    from plateau_gis_converter_ray.kernels.webmercator import (
        zxy_from_lnglat_webmercator,
    )
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{SF_SMALL}/events.parquet", columns=["event_id"])
    lng, lat = geocode_arith(ev.column("event_id").to_numpy())
    x, y = zxy_from_lnglat_webmercator(10, lng, lat)
    cnt = (
        pd.DataFrame({"x": x, "y": y})
        .groupby(["x", "y"])
        .size()
        .to_dict()
    )
    want = []
    for (tx, ty), n in sorted(cnt.items()):
        sm = sum(
            cnt.get((tx + dx, ty + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        want.append((tx, ty, n, sm))
    want = pd.DataFrame(want, columns=["tile_x", "tile_y", "n", "smooth_n"])

    assert len(got) == len(want)
    for c in ["tile_x", "tile_y", "n", "smooth_n"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy())
    # the stencil genuinely aggregates: some tile has neighbors
    assert (got["smooth_n"] > got["n"]).any()


def test_ndcg_invariants(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_ndcg_at_k

    got = _pdf(q_ndcg_at_k(SF_SMALL)).sort_values("qid")
    assert list(got["qid"]) == [1, 2, 3, 5]
    # the query doc itself contains its own terms -> idcg > 0
    assert (got["idcg_e9"] > 0).all()
    # dcg <= idcg by definition of the ideal ranking; ndcg in [0, 1e6]
    assert (got["dcg_e9"] <= got["idcg_e9"]).all()
    assert (got["ndcg_e6"] >= 0).all() and (got["ndcg_e6"] <= 1_000_000).all()
    # exact integer relationship
    np.testing.assert_array_equal(
        got["ndcg_e6"].to_numpy(),
        got["dcg_e9"].to_numpy() * 1_000_000 // got["idcg_e9"].to_numpy(),
    )


def test_compression_ratio_matches_zlib(ray_session):
    import zlib

    from plateau_gis_converter_ray.pipelines.queries import q_compression_ratio

    got = (
        _pdf(q_compression_ratio(SF_SMALL))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pyarrow.parquet as pq

    docs = (
        pq.read_table(f"{SF_SMALL}/documents.parquet",
                      columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(docs)
    raw = docs["text"].str.encode("utf-8")
    want_raw = raw.str.len().to_numpy(np.int64)
    want_comp = np.array(
        [len(zlib.compress(t, 6)) for t in raw], np.int64
    )
    np.testing.assert_array_equal(got["raw_len"].to_numpy(), want_raw)
    np.testing.assert_array_equal(got["comp_len"].to_numpy(), want_comp)
    ratio = want_comp * 1_000_000 // np.maximum(want_raw, 1)
    np.testing.assert_array_equal(got["ratio_e6"].to_numpy(), ratio)
    np.testing.assert_array_equal(
        got["keep"].to_numpy(), (ratio >= 250_000) & (ratio <= 800_000)
    )
    # the signal separates: ratios are not all identical
    assert got["ratio_e6"].nunique() > 1


def test_negative_sampling_pushdown_equals_join_plan(ray_session):
    """The size-gated semi-join pushdown (broadcast candidate pk set,
    flag via searchsorted) must emit EXACTLY the distinct-pos + shuffle
    left-join fallback's rows — both paths forced."""
    from plateau_gis_converter_ray.pipelines.queries import (
        q_negative_sampling,
    )

    cols = ["user_id", "slot", "cand_part", "is_positive"]
    fast = (
        _pdf(q_negative_sampling(SF_SMALL, fast=True))[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    slow = (
        _pdf(q_negative_sampling(SF_SMALL, fast=False))[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        fast.astype("int64"), slow.astype("int64")
    )
    assert fast["is_positive"].sum() > 0  # the flag actually fires
