"""Distributed BPE == pure-Python reference, on toy and real corpora."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_bpe_toy_matches_reference(ray_session):
    import ray.data

    from plateau_gis_converter_ray.stages.bpe import (
        bpe_train_ds,
        bpe_train_reference,
    )

    texts = [
        "the cat sat on the mat",
        "the bat and the cat",
        "low lower lowest",
        "newer newest new",
    ] * 3
    ds = ray.data.from_items([{"text": t} for t in texts])
    got = bpe_train_ds(ds, n_merges=6)
    exp = bpe_train_reference(texts, n_merges=6)
    pd.testing.assert_frame_equal(got, exp)


def test_bpe_documents_matches_reference(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_bpe_merges
    from plateau_gis_converter_ray.stages.bpe import bpe_train_reference

    got = q_bpe_merges(SF, n_merges=5)
    texts = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].tolist()
    exp = bpe_train_reference(texts, n_merges=5)
    pd.testing.assert_frame_equal(got, exp)
    # merges are a valid tokenizer: counts non-increasing is NOT guaranteed
    # by BPE, but every count must be >= 1 and pairs distinct
    assert got["cnt"].ge(1).all()
    assert not got.duplicated(["left", "right"]).any()


def test_bpe_encode_stats_matches_reference(ray_session):
    """The distributed encode pass == a pure-Python per-doc tokenizer."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from plateau_gis_converter_ray.pipelines.queries import (
        q_bpe_encode_stats,
    )
    from plateau_gis_converter_ray.stages.bpe import bpe_train_reference

    sf = "/root/testdata/sf0.001"
    got = (
        q_bpe_encode_stats(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    dids = t.column("doc_id").to_pylist()
    merges = bpe_train_reference(texts, n_merges=8)
    pairs = list(zip(merges["left"], merges["right"]))

    def encode(word):
        r = list(word) + ["</w>"]
        for left, right in pairs:
            out, i = [], 0
            while i < len(r):
                if i + 1 < len(r) and r[i] == left and r[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(r[i])
                    i += 1
            r = out
        return len(r)

    rows = []
    for d, txt in zip(dids, texts):
        ws = [w for w in txt.split(" ") if w]
        rows.append(
            {
                "doc_id": d,
                "n_words": len(ws),
                "n_sym0": sum(len(w) + 1 for w in ws),
                "n_bpe": sum(encode(w) for w in ws),
            }
        )
    want = pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64)
    )
    # merges actually compress: strictly fewer tokens than raw symbols
    assert (got["n_bpe"] < got["n_sym0"]).any()
    assert (got["n_bpe"] >= got["n_words"]).all()


def test_train_distributed_rounds_equal_driver_fast_path(ray_session):
    """Size-gated hybrid: local_max_vocab=0 forces the distributed merge
    rounds, which must produce the identical merge table."""
    import pandas as pd

    from plateau_gis_converter_ray.sources.tables import read_table
    from plateau_gis_converter_ray.stages.bpe import bpe_train_ds

    ds = read_table("/root/testdata/sf0.001", "documents", ["doc_id", "text"])
    fast = bpe_train_ds(ds, n_merges=4)
    dist = bpe_train_ds(ds, n_merges=4, local_max_vocab=0)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), dist.reset_index(drop=True)
    )
