"""PageRank checkpoint/resume: rounds persist, restart skips them."""

import os

import pandas as pd


def test_pagerank_checkpoint_resume(ray_session, tmp_path):
    from plateau_gis_converter_ray.pipelines.queries import q_pagerank_dupgraph

    sf = "/root/testdata/sf0.001"
    ck = str(tmp_path / "pr_ckpt")
    # force the distributed path; run 3 rounds with checkpoints
    a = (
        q_pagerank_dupgraph(sf, iters=3, local_max_edges=0, checkpoint_dir=ck)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for k in (1, 2, 3):
        assert os.path.exists(os.path.join(ck, f"round={k}", "_OK")), k
    mtimes = {
        k: os.path.getmtime(os.path.join(ck, f"round={k}", "_OK"))
        for k in (1, 2, 3)
    }

    # resume to 5 rounds: rounds 1-3 must NOT recompute
    b = (
        q_pagerank_dupgraph(sf, iters=5, local_max_edges=0, checkpoint_dir=ck)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for k in (1, 2, 3):
        assert os.path.getmtime(os.path.join(ck, f"round={k}", "_OK")) == mtimes[k]
    assert os.path.exists(os.path.join(ck, "round=5", "_OK"))

    # and the resumed result == a fresh uncheckpointed 5-round run
    fresh = (
        q_pagerank_dupgraph(sf, iters=5, local_max_edges=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(b, fresh)

    # 3-round prefix agrees with the driver fast path at 3 iters
    fast = (
        q_pagerank_dupgraph(sf, iters=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, fast)
