"""Persistent IVF-PQ index: build/skip resume contract, scan pruning,
cached-search == composed-search bit equality, fingerprint invalidation."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def index_root(tmp_path, monkeypatch):
    import plateau_gis_converter_ray.stages.ann_index as ai

    root = str(tmp_path / "ann")
    monkeypatch.setattr(ai, "INDEX_ROOT", root)
    return root


def _mtimes(root: str) -> dict:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


def test_build_then_skip_untouched(ray_session, index_root):
    from plateau_gis_converter_ray.stages.ann_index import ivfpq_index_build

    r1 = ivfpq_index_build(SF)
    assert r1["built"] is True
    assert os.path.exists(os.path.join(r1["index_dir"], "meta.json"))
    # one bucket=<b> dir per coarse centroid, each with codes
    buckets = sorted(os.listdir(os.path.join(r1["index_dir"], "codes")))
    assert len(buckets) == 8 and all(b.startswith("bucket=") for b in buckets)
    assert sum(r for _, r in r1["buckets"]) == 500  # every vector coded once

    before = _mtimes(r1["index_dir"])
    r2 = ivfpq_index_build(SF)
    assert r2["built"] is False
    assert r2["index_dir"] == r1["index_dir"]
    assert r2["buckets"] == r1["buckets"]
    assert _mtimes(r1["index_dir"]) == before  # nothing rewritten

    # manifest carries per-bucket lineage + metrics (north-rule contract)
    with open(os.path.join(r1["index_dir"], "manifest.jsonl")) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == 8
    assert all(r["lineage"]["fingerprint"] for r in recs)
    assert all("elapsed_s" in r["metrics"] for r in recs)


def test_cached_search_equals_composed(ray_session, index_root):
    from plateau_gis_converter_ray.pipelines.queries import (
        q_ivfpq_ann_search,
        q_ivfpq_search_cached,
    )

    cached = (
        q_ivfpq_search_cached(SF).to_pandas()
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    composed = (
        q_ivfpq_ann_search(SF).to_pandas()
        .sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(cached, composed)


def test_search_reads_only_probed_buckets(ray_session, index_root):
    """Scan pruning is real: delete the un-probed bucket partitions and the
    cached search result must be unchanged."""
    from plateau_gis_converter_ray.stages.ann_index import (
        ivfpq_index_build,
        ivfpq_search_cached,
        load_index_meta,
    )
    from plateau_gis_converter_ray.stages.knn import quantize

    res = ivfpq_index_build(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    head = emb.head(2)
    queries = {
        "qid": head["vec_id"].to_numpy(),
        "vecs": np.stack(head["embedding"].to_numpy()),
    }
    full = ivfpq_search_cached(res["index_dir"], queries, topk=5, nprobe=2)
    full = full.to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)

    meta = load_index_meta(res["index_dir"])
    coarse = meta["coarse_np"]
    qv = quantize(queries["vecs"])
    qd2 = (
        (qv * qv).sum(1)[:, None] - 2 * (qv @ coarse.T)
        + (coarse * coarse).sum(1)[None, :]
    )
    probed = set(np.argsort(qd2, axis=1, kind="stable")[:, :2].ravel().tolist())
    assert len(probed) < 8  # the prune is non-trivial for this query set
    for b in range(8):
        if b not in probed:
            shutil.rmtree(os.path.join(res["index_dir"], "codes", f"bucket={b}"))

    pruned = ivfpq_search_cached(res["index_dir"], queries, topk=5, nprobe=2)
    pruned = pruned.to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(pruned, full)
    shutil.rmtree(res["index_dir"])  # invalidated layout: don't leak to other tests


def test_fingerprint_change_rebuilds(ray_session, index_root, tmp_path):
    """A changed corpus hashes to a NEW index dir (no stale aliasing); an
    explicit index_dir with a stale fingerprint is rebuilt, not reused."""
    from plateau_gis_converter_ray.stages.ann_index import ivfpq_index_build

    # copy the sf dir so we can touch the embeddings file
    sf2 = tmp_path / "sfcopy"
    sf2.mkdir()
    shutil.copy(f"{SF}/embeddings.parquet", sf2 / "embeddings.parquet")
    r1 = ivfpq_index_build(str(sf2))
    assert r1["built"] is True

    os.utime(sf2 / "embeddings.parquet")  # new mtime = new fingerprint
    r2 = ivfpq_index_build(str(sf2))
    assert r2["built"] is True  # rebuilt
    assert r2["index_dir"] != r1["index_dir"]

    # explicit index_dir: stale generation is replaced, not mixed
    fixed = str(tmp_path / "fixed_index")
    r3 = ivfpq_index_build(str(sf2), index_dir=fixed)
    assert r3["built"] is True
    os.utime(sf2 / "embeddings.parquet")
    r4 = ivfpq_index_build(str(sf2), index_dir=fixed)
    assert r4["built"] is True
    assert r4["buckets"] == r3["buckets"]


def test_ann_rerank_exact_over_shortlist(ray_session, index_root):
    """Two-stage retrieval: the rerank stage's output must equal the exact
    integer-L2 brute force restricted to the SAME cached-index shortlist,
    with (d2, vec_id) tie order, and be deterministic run-to-run."""
    import numpy as np
    import pandas as pd

    from plateau_gis_converter_ray.pipelines.queries import q_ann_rerank
    from plateau_gis_converter_ray.stages.knn import quantize

    a = q_ann_rerank(SF).sort_values(["qid", "rank"]).reset_index(drop=True)
    b = q_ann_rerank(SF).sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # deterministic

    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    v = quantize(np.stack(emb["embedding"].to_numpy()))
    vid = emb["vec_id"].to_numpy()
    for qid, grp in a.groupby("qid"):
        grp = grp.sort_values("rank")
        d2 = grp["exact_d2"].to_numpy()
        assert (np.diff(d2) >= 0).all()  # sound ordering
        # exact_d2 matches the true integer L2 for every reported pair
        q = v[np.searchsorted(vid, qid)]
        rows = np.searchsorted(vid, grp["ann_id"].to_numpy())
        true_d2 = ((v[rows] - q[None, :]) ** 2).sum(axis=1)
        assert (true_d2 == d2).all()
        # the query itself survives rerank as its own top hit
        assert grp["ann_id"].iloc[0] == qid and d2[0] == 0
