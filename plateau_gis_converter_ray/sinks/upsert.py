"""Keyed upsert (merge-on-write compaction) over a hash-bucketed parquet
table — the Delta/Iceberg-style maintained-table sink.

Layout: ``dir/bucket=BBBB/data.parquet``, one file per key-hash bucket.
``upsert`` routes update rows to their bucket with a vectorized hash, then
merges each touched bucket AGAINST ITS EXISTING FILE inside a
``groupby(bucket).map_groups`` task (updates win over base rows; within
the update set the highest ``seq`` wins, ties on later position are
impossible because (key, seq) is deduped deterministically). Untouched
buckets are never read or written — an upsert of u rows into a 10^12-row
table costs O(u + touched-bucket bytes), not a table rewrite.

Crash safety / resume: each bucket file is written to ``.tmp`` then
atomically renamed, and the merge is idempotent (deterministic bytes from
(base, updates)), so a killed run is simply re-run — finished buckets
rewrite to identical content, half-written ``.tmp`` files are ignored by
readers and overwritten. No coordination state beyond the filesystem.

Scale note: n_buckets is the parallelism and file-size lever (pick
buckets so base_bytes / n_buckets ~ a row group); the bucket hash is the
same splitmix64 used across the repo, so repeated upserts co-locate keys
stably and readers can prune by bucket.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    from ..kernels.imagecodec import splitmix64

    with np.errstate(over="ignore"):
        h = splitmix64(keys.astype(np.uint64))
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _bucket_path(base_dir: str, b: int) -> str:
    return os.path.join(base_dir, f"bucket={b:05d}", "data.parquet")


def upsert(base_dir: str, updates, key: str, n_buckets: int = 64,
           mode: str = "replace", chunk_id: str | None = None):
    """Merge ``updates`` into the keyed table at ``base_dir``.

    ``mode="replace"`` (default): updates carry a ``seq`` column; the
    highest seq per key wins and replaces the base row. Idempotent by
    construction (re-applying is a deterministic rewrite).
    ``mode="sum"``: every non-key numeric column ADDS on key collision —
    incremental view maintenance (a chunk's partial aggregates fold into
    the maintained table, so applying chunks one at a time equals the
    one-shot batch aggregate; pytest-pinned). Addition is NOT naturally
    idempotent, so pass a ``chunk_id``: each bucket file carries the set
    of applied chunk ids in its parquet key-value metadata — atomic with
    the data — and a bucket that already holds the id skips the merge.
    A crash mid-chunk (some buckets applied) therefore resumes exactly:
    re-running the same chunk tops up only the unapplied buckets.
    Returns the number of touched buckets."""

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch.column(key).to_numpy(), n_buckets)
        return batch.append_column("_bucket", pa.array(b))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        path = _bucket_path(base_dir, b)
        chunks_meta = None
        if mode == "sum":
            upd = g.drop(columns=["_bucket"])
            applied = set()
            base = None
            if os.path.exists(path):
                t = pq.read_table(path)
                md = t.schema.metadata or {}
                applied = set(
                    md.get(b"applied_chunks", b"").decode().split(",")
                ) - {""}
                if chunk_id is not None and chunk_id in applied:
                    return pd.DataFrame({"bucket": [b], "rows": [t.num_rows]})
                if applied and chunk_id is None:
                    # silently dropping the ledger would let a later replay
                    # of an already-applied chunk double-count (ADVICE r3)
                    raise ValueError(
                        f"bucket {b} carries an applied_chunks ledger; "
                        "mode='sum' upserts into it must pass chunk_id"
                    )
                base = t.to_pandas()
            if base is not None:
                upd = pd.concat([base, upd], ignore_index=True)
            out = upd.groupby(key, as_index=False).sum()
            if chunk_id is not None:
                chunks_meta = ",".join(sorted(applied | {chunk_id}))
        else:
            upd = (
                g.drop(columns=["_bucket"])
                .sort_values([key, "seq"], kind="stable")
                .drop_duplicates(key, keep="last")
            )
            if os.path.exists(path):
                t = pq.read_table(path)
                md = t.schema.metadata or {}
                prior = md.get(b"applied_chunks", b"").decode()
                if prior:
                    # a replace rewrite must not erase the additive ledger
                    chunks_meta = prior
                base = t.to_pandas()
                keep = base[~base[key].isin(upd[key])]
                out = pd.concat([keep, upd], ignore_index=True)
            else:
                out = upd
        out = out.sort_values(key, kind="stable").reset_index(drop=True)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        t_out = pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            {b"applied_chunks": chunks_meta.encode()} if chunks_meta else None
        )
        pq.write_table(t_out, tmp)
        os.replace(tmp, path)  # atomic publish (data + chunk ledger together)
        return pd.DataFrame({"bucket": [b], "rows": [len(out)]})

    touched = (
        updates.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )
    return touched.count()


def read_keyed_table(base_dir: str):
    """Dataset over every bucket file (readers ignore .tmp leftovers)."""
    import ray.data

    files = []
    for d in sorted(os.listdir(base_dir)):
        p = os.path.join(base_dir, d, "data.parquet")
        if d.startswith("bucket=") and os.path.exists(p):
            files.append(p)
    # partitioning=None: the bucket id is layout, not data — don't let hive
    # inference resurrect it as a column
    return ray.data.read_parquet(files, partitioning=None)
