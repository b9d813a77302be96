"""Incremental IVF-PQ index maintenance (stages/ann_index.py::
ivfpq_index_append): appended search == in-memory ADC over the union
corpus with the SAME codebooks (no retraining), replayed appends are
exact no-ops (ledger + untouched mtimes), and the appended rows are
reachable from the cached search path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _build_private(tmp_path):
    from plateau_gis_converter_ray.stages.ann_index import ivfpq_index_build

    root = os.path.join(str(tmp_path), "idx")
    return ivfpq_index_build(SF_SMALL, index_dir=root)


def _delta_ds():
    import pyarrow as pa
    import ray.data

    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF_SMALL}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vid = t.column("vec_id").to_numpy()
    keep = vid % 7 == 3
    t = t.filter(pa.array(keep))
    t = pa.table(
        {
            "vec_id": pa.array(t.column("vec_id").to_numpy() + 10_000_000),
            "embedding": t.column("embedding"),
        }
    )
    return ray.data.from_arrow(t), int(keep.sum())


def test_append_search_equals_union_adc(ray_session, tmp_path):
    from plateau_gis_converter_ray.pipelines.queries import _ann_query_head
    from plateau_gis_converter_ray.sources.tables import read_table
    from plateau_gis_converter_ray.stages.ann_index import (
        _input_fingerprint,
        ivfpq_index_append,
        ivfpq_search_cached,
        load_index_meta,
    )
    from plateau_gis_converter_ray.stages.pq import (
        ivfpq_adc_search,
        ivfpq_encode,
    )

    res = _build_private(tmp_path)
    fp = _input_fingerprint(f"{SF_SMALL}/embeddings.parquet")
    delta, n_delta = _delta_ds()
    out = ivfpq_index_append(res["index_dir"], delta, "t1", fp)
    assert out["appended"] and out["rows"] == n_delta
    meta = load_index_meta(res["index_dir"])
    assert sum(r for _, r in meta["buckets"]) == sum(
        r for _, r in res["buckets"]
    ) + n_delta

    q = _ann_query_head(SF_SMALL)
    got = (
        ivfpq_search_cached(res["index_dir"], q, topk=10, nprobe=4)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )

    # expected: encode base + delta with the SAME loaded codebooks, run
    # the shared ADC kernel in one pass (bit-exact: integer ADC)
    base = read_table(SF_SMALL, "embeddings", ["vec_id", "embedding"])
    delta2, _ = _delta_ds()
    union = base.union(delta2)
    codes = ivfpq_encode(union, meta["coarse_np"], meta["books_np"])
    want = (
        ivfpq_adc_search(codes, meta["coarse_np"], meta["books_np"], q,
                         topk=10, nprobe=4)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64")
    )
    # the grown index must actually serve appended ids somewhere in a
    # wider search (sanity that the delta is reachable, not just counted)
    wide = ivfpq_search_cached(
        res["index_dir"], q, topk=50, nprobe=len(meta["coarse_np"])
    ).to_pandas()
    assert (wide["ann_id"] >= 10_000_000).any()


def test_append_replay_is_noop(ray_session, tmp_path):
    from plateau_gis_converter_ray.stages.ann_index import (
        _input_fingerprint,
        ivfpq_index_append,
    )

    res = _build_private(tmp_path)
    fp = _input_fingerprint(f"{SF_SMALL}/embeddings.parquet")
    delta, _ = _delta_ds()
    first = ivfpq_index_append(res["index_dir"], delta, "t1", fp)
    assert first["appended"]

    def mtimes():
        out = {}
        codes = os.path.join(res["index_dir"], "codes")
        for d in sorted(os.listdir(codes)):
            for f in sorted(os.listdir(os.path.join(codes, d))):
                p = os.path.join(codes, d, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = mtimes()
    delta2, _ = _delta_ds()
    second = ivfpq_index_append(res["index_dir"], delta2, "t1", fp)
    assert not second["appended"] and second["rows"] == 0
    assert mtimes() == before  # nothing rewritten
    # a DIFFERENT tag is a new append, not a replay
    delta3, n = _delta_ds()
    third = ivfpq_index_append(res["index_dir"], delta3, "t2", fp)
    assert third["appended"] and third["rows"] == n
