"""Keyed upsert sink: merge semantics, bucket pruning, idempotent resume."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa


def _mkds(df):
    import ray.data

    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    )


def test_upsert_merge_and_resume(ray_session, tmp_path):
    from plateau_gis_converter_ray.sinks.upsert import read_keyed_table, upsert

    base = str(tmp_path / "keyed")
    os.makedirs(base, exist_ok=True)

    first = pd.DataFrame(
        {"k": np.arange(100, dtype=np.int64),
         "v": np.arange(100, dtype=np.int64) * 10,
         "seq": np.zeros(100, dtype=np.int64)}
    )
    upsert(base, _mkds(first), key="k", n_buckets=8)
    got = read_keyed_table(base).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, first.sort_values("k").reset_index(drop=True))

    # update 10 existing keys (two conflicting seqs: highest wins) + 5 new
    upd = pd.DataFrame(
        {"k": np.concatenate([np.arange(10), np.arange(10), np.arange(200, 205)]).astype(np.int64),
         "v": np.concatenate([np.full(10, -1), np.full(10, -2), np.full(5, 7)]).astype(np.int64),
         "seq": np.concatenate([np.full(10, 1), np.full(10, 2), np.full(5, 1)]).astype(np.int64)}
    )
    # snapshot untouched-bucket mtimes: upsert must not rewrite them
    from plateau_gis_converter_ray.sinks.upsert import _bucket_of, _bucket_path

    touched_buckets = set(_bucket_of(upd["k"].to_numpy(), 8).tolist())
    untouched = [
        _bucket_path(base, b) for b in range(8)
        if b not in touched_buckets and os.path.exists(_bucket_path(base, b))
    ]
    mtimes = {p: os.path.getmtime(p) for p in untouched}

    upsert(base, _mkds(upd), key="k", n_buckets=8)
    got = read_keyed_table(base).to_pandas().sort_values("k").reset_index(drop=True)
    exp = first.copy()
    exp.loc[exp.k < 10, "v"] = -2
    exp.loc[exp.k < 10, "seq"] = 2
    exp = pd.concat(
        [exp, pd.DataFrame({"k": np.arange(200, 205, dtype=np.int64),
                            "v": np.full(5, 7, dtype=np.int64),
                            "seq": np.full(5, 1, dtype=np.int64)})],
        ignore_index=True,
    ).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "seq"]], exp)

    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m, "untouched bucket was rewritten"

    # idempotent resume: re-applying the same updates changes nothing
    upsert(base, _mkds(upd), key="k", n_buckets=8)
    again = read_keyed_table(base).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(again[["k", "v", "seq"]], exp)

    # a stale .tmp from a killed run is ignored and then cleaned by the next
    # upsert of that bucket
    some_bucket = sorted(touched_buckets)[0]
    stale = _bucket_path(base, some_bucket) + ".tmp"
    with open(stale, "wb") as fh:
        fh.write(b"garbage")
    got2 = read_keyed_table(base).to_pandas()
    assert len(got2) == len(exp)
    upsert(base, _mkds(upd), key="k", n_buckets=8)
    assert not os.path.exists(stale) or os.path.getsize(stale) != 7


def test_incremental_view_maintenance(ray_session, tmp_path):
    """mode='sum': chunked partial aggregates upserted one at a time equal
    the one-shot batch aggregate — incremental view maintenance."""
    from plateau_gis_converter_ray.sinks.upsert import read_keyed_table, upsert

    base = str(tmp_path / "ivm")
    os.makedirs(base, exist_ok=True)

    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "user_id", "value"],
    )
    ev["value_c"] = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    ev["n"] = np.int64(1)
    # three arbitrary chunks by event id
    for lo, hi in ((0, 300), (300, 700), (700, 10**9)):
        chunk = ev[(ev.event_id >= lo) & (ev.event_id < hi)]
        part = (
            chunk.groupby("user_id", as_index=False)
            .agg(n=("n", "sum"), sum_value_c=("value_c", "sum"))
        )
        upsert(base, _mkds(part), key="user_id", n_buckets=8, mode="sum")

    got = (
        read_keyed_table(base).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    exp = (
        ev.groupby("user_id", as_index=False)
        .agg(n=("n", "sum"), sum_value_c=("value_c", "sum"))
        .sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "n", "sum_value_c"]], exp
    )


def test_ivm_chunk_exactly_once(ray_session, tmp_path):
    """mode='sum' + chunk_id: re-applying a chunk is a per-bucket no-op
    (the chunk ledger travels atomically in the parquet metadata)."""
    from plateau_gis_converter_ray.sinks.upsert import read_keyed_table, upsert

    base = str(tmp_path / "ivm2")
    os.makedirs(base, exist_ok=True)
    part = pd.DataFrame(
        {"k": np.arange(20, dtype=np.int64), "n": np.ones(20, dtype=np.int64)}
    )
    upsert(base, _mkds(part), key="k", n_buckets=4, mode="sum", chunk_id="c0")
    upsert(base, _mkds(part), key="k", n_buckets=4, mode="sum", chunk_id="c0")
    got = read_keyed_table(base).to_pandas()
    assert got["n"].eq(1).all()  # replay did not double-count
    upsert(base, _mkds(part), key="k", n_buckets=4, mode="sum", chunk_id="c1")
    got = read_keyed_table(base).to_pandas()
    assert got["n"].eq(2).all()  # a new chunk applies exactly once


def test_sum_into_ledgered_bucket_without_chunk_id_raises(ray_session, tmp_path):
    """ADVICE r3: a mode='sum' upsert into a ledgered bucket without a
    chunk_id must raise — silently erasing applied_chunks would let a
    chunk replay double-count."""
    import pandas as pd
    import pytest
    import ray
    import ray.data

    from plateau_gis_converter_ray.sinks.upsert import upsert

    base = str(tmp_path / "ivm")
    upd = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    upsert(base, upd, key="k", n_buckets=2, mode="sum", chunk_id="c1")
    with pytest.raises(ray.exceptions.RayTaskError, match="applied_chunks"):
        upsert(base, upd, key="k", n_buckets=2, mode="sum", chunk_id=None)


def test_replace_preserves_chunk_ledger(ray_session, tmp_path):
    """A replace rewrite of a ledgered bucket carries the ledger through,
    so a later replay of an applied chunk still no-ops."""
    import pandas as pd
    import ray.data

    from plateau_gis_converter_ray.sinks.upsert import read_keyed_table, upsert

    base = str(tmp_path / "ivm2")
    upd = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    upsert(base, upd, key="k", n_buckets=1, mode="sum", chunk_id="c1")
    rep = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "v": [99], "seq": [5]})
    )
    upsert(base, rep, key="k", n_buckets=1, mode="replace")
    # replaying c1 after the replace must still be a no-op
    upsert(base, upd, key="k", n_buckets=1, mode="sum", chunk_id="c1")
    got = read_keyed_table(base).to_pandas().sort_values("k")
    assert got[got["k"] == 2]["v"].iloc[0] == 20  # not 40
