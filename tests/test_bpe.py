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
