"""Incremental flagship (IVM) pins: chunk-at-a-time upsert == one-shot
batch aggregate; replaying a chunk changes nothing (exactly-once via the
per-bucket applied_chunks ledger)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _counts(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("k").reset_index(drop=True)


def test_incremental_equals_batch_and_replay_is_noop(ray_session, tmp_path):
    import os

    from plateau_gis_converter_ray.pipelines.flagship import (
        run_flagship_incremental,
        tile_aggregate_ds,
    )
    from plateau_gis_converter_ray.sinks.upsert import read_keyed_table, upsert
    from plateau_gis_converter_ray.sources.images import ensure_image_table

    out = str(tmp_path / "ivm")
    res = run_flagship_incremental(sf=0.01, out_dir=out, n_chunks=3)
    inc = _counts(res["table"].to_pandas())
    assert len(inc) > 0

    table_dir = ensure_image_table(0.01)
    files = sorted(
        os.path.join(table_dir, f)
        for f in os.listdir(table_dir)
        if f.endswith(".parquet")
    )
    def mid_of(s: pd.Series) -> np.ndarray:
        return s.map(
            lambda u: int(u[5:]) if u.startswith("muni_") else -1
        ).to_numpy()

    batch = tile_aggregate_ds(files).to_pandas()
    batch["k"] = (
        batch["tile_id"].to_numpy() * 64 + mid_of(batch["muni_id"]) + 1
    )
    want = _counts(
        batch.groupby("k", as_index=False)["n_assignments"].sum()
    )
    assert inc["k"].tolist() == want["k"].tolist()
    assert inc["n_assignments"].tolist() == want["n_assignments"].tolist()

    # replay chunk 1: ledger makes every touched bucket a no-op
    def pack(b: pa.Table) -> pa.Table:
        d = b.column("muni_id").combine_chunks().dictionary_encode()
        vals = np.array(
            [int(u[5:]) if u.startswith("muni_") else -1
             for u in d.dictionary.to_pylist()],
            dtype=np.int64,
        )
        mid = vals[d.indices.to_numpy(zero_copy_only=False)]
        return pa.table(
            {
                "k": pa.array(b.column("tile_id").to_numpy() * 64 + mid + 1),
                "n_assignments": b.column("n_assignments"),
            }
        )

    chunk1 = files[1::3]
    upd = tile_aggregate_ds(chunk1).map_batches(pack, batch_format="pyarrow")
    upsert(out, upd, key="k", n_buckets=32, mode="sum", chunk_id="chunk0001")
    again = _counts(read_keyed_table(out).to_pandas())
    assert again["n_assignments"].tolist() == inc["n_assignments"].tolist()

    # a genuinely NEW chunk id with the same rows doubles those keys
    upsert(out, upd, key="k", n_buckets=32, mode="sum", chunk_id="extra")
    boosted = _counts(read_keyed_table(out).to_pandas())
    assert boosted["n_assignments"].sum() > again["n_assignments"].sum()


def test_rerun_skips_all_chunks(ray_session, tmp_path):
    """A second run over the same out_dir consults the chunk manifest and
    recomputes NOTHING (touched_per_chunk empty, table identical)."""
    from plateau_gis_converter_ray.pipelines.flagship import (
        run_flagship_incremental,
    )

    out = str(tmp_path / "ivm2")
    r1 = run_flagship_incremental(sf=0.01, out_dir=out, n_chunks=3)
    t1 = _counts(r1["table"].to_pandas())
    assert len(r1["touched_per_chunk"]) == 3
    r2 = run_flagship_incremental(sf=0.01, out_dir=out, n_chunks=3)
    assert r2["touched_per_chunk"] == []
    t2 = _counts(r2["table"].to_pandas())
    assert t1["n_assignments"].tolist() == t2["n_assignments"].tolist()

def test_stale_manifest_fingerprint_detected(ray_session, tmp_path):
    """If the applied-chunk fingerprints in chunks.json no longer match
    the current file set (regenerated/extended fixture), the run must
    REFUSE to continue rather than let chunk ids silently cover a
    different file subset (r4 ADVICE)."""
    import json

    import pytest

    from plateau_gis_converter_ray.pipelines.flagship import (
        run_flagship_incremental,
    )

    out = str(tmp_path / "ivm3")
    run_flagship_incremental(sf=0.01, out_dir=out, n_chunks=3)
    mpath = f"{out}/chunks.json"
    with open(mpath) as f:
        m = json.load(f)
    assert set(m["fingerprints"]) == set(m["applied"])
    # corrupt one applied fingerprint == "the file set changed"
    m["fingerprints"][m["applied"][0]] = "0" * 16
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(RuntimeError, match="input file set changed"):
        run_flagship_incremental(sf=0.01, out_dir=out, n_chunks=3)
    # a legacy manifest with NO fingerprints is a format upgrade, not a
    # divergence: the run wipes the (deterministically rebuildable)
    # table and rebuilds from scratch
    with open(mpath, "w") as f:
        json.dump({"applied": m["applied"]}, f)
    r = run_flagship_incremental(sf=0.01, out_dir=out, n_chunks=3)
    assert len(r["touched_per_chunk"]) == 3  # full rebuild happened
    with open(mpath) as f:
        assert set(json.load(f)["fingerprints"]) == set(m["applied"])
