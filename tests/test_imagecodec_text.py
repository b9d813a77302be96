"""Image codec determinism + PSNR invariant; text kernels."""

import numpy as np

from plateau_gis_converter_ray.kernels.imagecodec import (
    decode_image,
    encode_image,
    phash64,
    phash64_batch,
    psnr,
    splitmix64,
    synth_pixels,
)
from plateau_gis_converter_ray.kernels.text import (
    char_ngram_hashes,
    fingerprint64,
    hamming64,
    jaccard,
    langid,
    lsh_band_keys,
    minhash_signature,
    quality_stats,
    simhash64,
    token_count_bpeish,
    token_count_ws,
)


def test_splitmix_deterministic():
    a = splitmix64(np.arange(10, dtype=np.uint64))
    b = splitmix64(np.arange(10, dtype=np.uint64))
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 10


def test_codec_roundtrip_lossless():
    for fmt in ("raw", "ppm", "rle"):
        px = synth_pixels(1234, 32, 48)
        data = encode_image(px, fmt)
        out = decode_image(data, fmt, 32, 48)
        np.testing.assert_array_equal(px, out)
        assert psnr(px, out) == float("inf")


def test_codec_lossy_psnr_gate():
    px = synth_pixels(99, 64, 64)
    out = decode_image(encode_image(px, "quant"), "quant", 64, 64)
    p = psnr(px, out)
    assert 40.0 <= p < float("inf")


def test_phash_stable_and_batch_matches():
    px1 = synth_pixels(7, 32, 32)
    px2 = synth_pixels(8, 32, 32)
    h1 = phash64(px1)
    assert h1 == phash64(synth_pixels(7, 32, 32))
    assert h1 != phash64(px2)
    # batch path agrees with scalar path (same exact block-mean kernel)
    from plateau_gis_converter_ray.kernels.imagecodec import block_means_u8

    def small(p):
        return block_means_u8(p[None])[0]
    batch = phash64_batch(np.stack([small(px1), small(px2)]))
    assert int(batch[0]) == h1
    assert int(batch[1]) == phash64(px2)


def test_ngram_minhash_jaccard():
    t1 = "the quick brown fox jumps over the lazy dog"
    t2 = "the quick brown fox jumped over the lazy dog"
    t3 = "completely different content with other words"
    h1, h2, h3 = (char_ngram_hashes(t) for t in (t1, t2, t3))
    assert jaccard(h1, h2) > 0.6
    assert jaccard(h1, h3) < 0.1
    s1, s2, s3 = (minhash_signature(h) for h in (h1, h2, h3))
    est12 = (s1 == s2).mean()
    est13 = (s1 == s3).mean()
    assert est12 > est13
    # LSH: near-dups share at least one band bucket, far docs none
    b1, b2, b3 = (lsh_band_keys(s) for s in (s1, s2, s3))
    assert len(np.intersect1d(b1, b2)) >= 1
    assert len(np.intersect1d(b1, b3)) == 0


def test_simhash_hamming():
    t1 = "the quick brown fox jumps over the lazy dog"
    t2 = "the quick brown fox jumped over the lazy dog"
    t3 = "完全に異なる日本語のテキストです"
    d12 = int(hamming64(simhash64(t1), simhash64(t2)))
    d13 = int(hamming64(simhash64(t1), simhash64(t3)))
    assert d12 < d13
    assert int(hamming64(simhash64(t1), simhash64(t1))) == 0


def test_token_counts_quality_langid():
    t = "Hello world, this is a test of the tokenizer 123!"
    assert token_count_ws(t) == 10
    assert token_count_bpeish(t) > token_count_ws(t)
    q = quality_stats(t)
    assert q["n_tokens"] == 10
    assert 0 < q["alpha_ratio"] < 1
    assert q["stopword_ratio"] > 0
    assert langid("the cat sat on the mat and it is happy") == "en"
    assert langid("der Hund ist nicht auf der Couch und das ist gut") == "de"
    assert langid("これは日本語のテキストです") == "ja"


def test_fingerprint_deterministic():
    t = "some document text " * 20
    assert fingerprint64(t) == fingerprint64(t)
    assert fingerprint64(t) != fingerprint64(t + "x" * 50)


def test_simhash_batch_matches_scalar_including_oversized():
    """Chunked batch SimHash is bit-identical to the scalar kernel, incl. a
    doc larger than the internal token chunk and empty docs at boundaries."""
    from plateau_gis_converter_ray.kernels.text import simhash64, simhash64_batch

    big = " ".join(f"word{i}" for i in range(120_000))
    texts = ["the quick fox", "", big, "small", big + " tail", "a b"]
    batch = simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert int(batch[i]) == simhash64(t), i


def test_langquality_vectorized_equals_kernels():
    import pandas as pd

    from plateau_gis_converter_ray.kernels.text import langid, quality_stats
    from plateau_gis_converter_ray.stages.text import LangQuality

    docs = [
        "the quick brown fox and the lazy dog in the yard for fun",
        "der die das und ist nicht ein mit auf zu",
        "le chat est dans la maison pour que les enfants",
        "el perro y la casa es un lugar en madrid por que",
        "これは日本語のテキストです。漢字も含まれています。",
        "", "12345 67890 !!!", "theory android franchise",
        "x_the_y the-ory the", "UPPER THE AND OF CASE",
        "mixed 日本 short", "a b c d e f",
    ]
    out = LangQuality()(pd.DataFrame({"text": docs}))
    for i, t in enumerate(docs):
        q = quality_stats(t)
        assert out["lang_pred"].iloc[i] == langid(t), repr(t)
        for f in ["alpha_ratio", "stopword_ratio", "mean_word_len"]:
            assert abs(out[f].iloc[i] - q[f]) < 1e-12, (f, repr(t))


def test_chunk_documents_all_empty_batch(ray_session):
    """Review r4: a batch of only EMPTY documents still emits one empty
    chunk per doc (no IndexError on the zero-codepoint flat buffer)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from plateau_gis_converter_ray.pipelines.queries import q_chunk_documents
    import plateau_gis_converter_ray.pipelines.queries as qmod

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["", ""], pa.string()),
            "n_chars": pa.array([0, 0], pa.int64()),
        }
    )
    # route _read to the in-memory table for this call
    orig = qmod._read
    try:
        qmod._read = lambda sf, t, cols=None, filter=None: ray.data.from_arrow(tbl)
        out = q_chunk_documents("unused").to_pandas()
    finally:
        qmod._read = orig
    assert len(out) == 2
    assert (out["chunk_len"] == 0).all() and (out["first_char"] == "").all()


def test_tfidf_doc_similarity_matches_local(ray_session):
    """Distributed hashed tf-idf cosine top-k == a local numpy recompute
    (same kernel, same idf table, same (sim, doc_id) tie order) and the
    query doc is always its own top hit."""
    import numpy as np
    import pandas as pd

    from plateau_gis_converter_ray.pipelines.queries import (
        _hashed_tf,
        q_tfidf_doc_similarity,
    )

    got = (
        q_tfidf_doc_similarity("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    again = (
        q_tfidf_doc_similarity("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)  # deterministic

    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    ).sort_values("doc_id").reset_index(drop=True)
    tf = _hashed_tf(list(docs["text"]), 256)
    df = (tf > 0).sum(axis=0)
    idf = np.log(len(docs) / np.maximum(df, 1))
    v = tf * idf[None, :]
    vn = v / np.maximum(np.linalg.norm(v, axis=1), 1e-300)[:, None]
    did = docs["doc_id"].to_numpy()
    for qid, grp in got.groupby("qid"):
        qrow = np.flatnonzero(did == qid)[0]
        sim = np.floor(vn[qrow] @ vn.T * 1e9).astype(np.int64)
        order = np.lexsort((did, -sim))[:3]
        exp = did[order]
        assert (grp.sort_values("rank")["doc_id"].to_numpy() == exp).all()
        assert grp.sort_values("rank")["doc_id"].iloc[0] == qid
