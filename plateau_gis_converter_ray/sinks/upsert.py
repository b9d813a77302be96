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
           mode: str = "replace"):
    """Merge ``updates`` into the keyed table at ``base_dir``.

    ``mode="replace"`` (default): updates carry a ``seq`` column; the
    highest seq per key wins and replaces the base row.
    ``mode="sum"``: every non-key numeric column ADDS on key collision —
    incremental view maintenance (a chunk's partial aggregates fold into
    the maintained table, so applying chunks one at a time equals the
    one-shot batch aggregate; pytest-pinned). Returns touched buckets."""

    def with_bucket(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch.column(key).to_numpy(), n_buckets)
        return batch.append_column("_bucket", pa.array(b))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        path = _bucket_path(base_dir, b)
        if mode == "sum":
            upd = g.drop(columns=["_bucket"])
            if os.path.exists(path):
                base = pq.read_table(path).to_pandas()
                upd = pd.concat([base, upd], ignore_index=True)
            out = upd.groupby(key, as_index=False).sum()
        else:
            upd = (
                g.drop(columns=["_bucket"])
                .sort_values([key, "seq"], kind="stable")
                .drop_duplicates(key, keep="last")
            )
            if os.path.exists(path):
                base = pq.read_table(path).to_pandas()
                keep = base[~base[key].isin(upd[key])]
                out = pd.concat([keep, upd], ignore_index=True)
            else:
                out = upd
        out = out.sort_values(key, kind="stable").reset_index(drop=True)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None),
            tmp,
        )
        os.replace(tmp, path)  # atomic publish
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
