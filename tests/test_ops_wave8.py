"""Wave-8 operators: sequence packing, k-anonymity audit, hard-negative
mining. Each pinned against a driver-local pandas/numpy recompute (the
oracle twins are additionally gated by tools/check_queries.py).

- pack_sequences: exact equality with the sequential concat-and-split
  recompute (global prefix sum, window spans, offsets); conservation
  invariants (every token slot accounted for, windows contiguous).
- k_anonymity: equality with a pandas groupby recompute; the k threshold
  genuinely bites (at least one group at risk at sf0.001, not all).
- hard_negatives: equality with the O(anchors x corpus) brute force; no
  returned negative shares its anchor's label; composite-key packing is
  lossless (dist2 and vec_id round-trip).
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


def test_pack_sequences_matches_sequential(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_pack_sequences

    ctx = 512
    out = (
        _pdf(q_pack_sequences(SF_SMALL, ctx=ctx))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(SF_SMALL + "/documents.parquet").sort_values("doc_id")
    n_tok = np.maximum((docs["n_chars"].to_numpy() + 3) // 4, 1)
    cum_before = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    assert (out["n_tok"].to_numpy() == n_tok).all()
    assert (out["first_window"].to_numpy() == cum_before // ctx).all()
    assert (
        out["last_window"].to_numpy() == (cum_before + n_tok - 1) // ctx
    ).all()
    assert (
        out["win_offset"].to_numpy() == cum_before % ctx
    ).all()
    # conservation: spans cover the whole stream and are non-decreasing
    assert out["first_window"].iloc[0] == 0
    assert (out["n_windows"] >= 1).all()
    fw, lw = out["first_window"].to_numpy(), out["last_window"].to_numpy()
    assert (fw[1:] >= fw[:-1]).all()
    # consecutive docs touch adjacent-or-same windows (no gap in the stream)
    assert (fw[1:] - lw[:-1] <= 1).all()
    assert lw[-1] == (n_tok.sum() - 1) // ctx


def test_pack_sequences_bucket_count_invariant(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_pack_sequences

    # a bucket count that doesn't divide n_docs evenly still partitions
    # [0, n_docs) exactly: same result as the default
    a = (
        _pdf(q_pack_sequences(SF_SMALL, n_buckets=7))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        _pdf(q_pack_sequences(SF_SMALL))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_k_anonymity_matches_pandas(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_k_anonymity

    k = 5
    out = (
        _pdf(q_k_anonymity(SF_SMALL, k=k))
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    cust = pd.read_parquet(SF_SMALL + "/customer.parquet")
    cust["bal_band"] = np.floor(cust["c_acctbal"] / 1000.0).astype(np.int64)
    g = (
        cust.groupby(["c_nationkey", "c_mktsegment", "bal_band"])
        .size()
        .rename("n")
        .reset_index()
    )
    exp = (
        g.groupby("c_nationkey")
        .apply(
            lambda d: pd.Series(
                {
                    "groups_at_risk": int((d["n"] < k).sum()),
                    "rows_at_risk": int(d.loc[d["n"] < k, "n"].sum()),
                    "n_groups": len(d),
                    "n_rows": int(d["n"].sum()),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    for c in ["groups_at_risk", "rows_at_risk", "n_groups", "n_rows"]:
        assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c
    # the threshold bites at sf0.001 (sparse QI tuples: 150 customers)
    assert out["groups_at_risk"].sum() > 0
    # non-vacuous split needs enough rows per tuple — check at sf0.01
    med = _pdf(q_k_anonymity("/root/testdata/sf0.01", k=k))
    assert med["groups_at_risk"].sum() > 0
    assert med["groups_at_risk"].sum() < med["n_groups"].sum()


def test_hard_negatives_matches_brute(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_hard_negatives
    from plateau_gis_converter_ray.stages.knn import quantize

    m = 64
    out = (
        _pdf(q_hard_negatives(SF_SMALL, n_anchors=m))
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(SF_SMALL + "/embeddings.parquet").sort_values("vec_id")
    V = quantize(np.stack(emb["embedding"].to_numpy()))
    lab = emb["label"].to_numpy().astype(np.int64)
    vid = emb["vec_id"].to_numpy().astype(np.int64)
    A, a_lab, a_ids = V[:m], lab[:m], vid[:m]
    d = (
        (A * A).sum(axis=1)[:, None]
        + (V * V).sum(axis=1)[None, :]
        - 2 * (A @ V.T)
    )
    big = np.iinfo(np.int64).max
    d = np.where(a_lab[:, None] == lab[None, :], big, d)
    # brute tie-break: (dist2, vec_id) lexicographic
    order = np.lexsort((vid[None, :].repeat(m, 0), d), axis=1)[:, 0]
    assert len(out) == m
    assert (out["vec_id"].to_numpy() == a_ids).all()
    assert (out["hard_negative"].to_numpy() == vid[order]).all()
    assert (
        out["dist2_q"].to_numpy() == d[np.arange(m), order]
    ).all()
    # label separation: no negative shares its anchor's label
    lab_of = dict(zip(vid, lab))
    neg_lab = np.array([lab_of[i] for i in out["hard_negative"]])
    assert (neg_lab != a_lab).all()
