"""Persistent IVF-PQ index — build once, search many (the FAISS workflow).

The composed ``ivfpq_ann_search`` query re-trains, re-encodes and probes in
one job; that is the right *build test* but the wrong steady-state shape —
a production ANN corpus is encoded once and served read-only. This module
splits the two:

- :func:`ivfpq_index_build` trains the coarse quantizer + PQ codebooks
  (bounded deterministic sample, stages/pq.py contract), encodes the corpus,
  and writes a **bucket-partitioned parquet index layout**::

      {index_dir}/codes/bucket=<b>/part.parquet   (vec_id, bucket, code)
      {index_dir}/manifest.jsonl                   per-bucket lineage+metrics
      {index_dir}/meta.json                        coarse+books+config+input
                                                   fingerprint (written LAST,
                                                   atomically = completion
                                                   marker)

  Buckets are written via ``atomic_write_dir`` (state/manifest.py); commit
  records are returned to the **driver**, which appends the manifest — no
  worker-side manifest writes, so the layout is multi-node-safe as long as
  ``index_dir`` is on shared storage (same contract as any parquet sink).
  The index dir name embeds a digest of the input fingerprint + config, so
  a changed corpus can never alias a stale index; a complete index
  (``meta.json`` present, fingerprint match) is **skipped entirely** on
  rebuild — the resume contract.

- :func:`ivfpq_search_cached` loads the tiny ``meta.json`` (coarse
  centroids + codebooks: a few hundred KB at any corpus size), computes the
  union of probed buckets across the query batch, and reads ONLY those
  bucket partitions — the nprobe/n_coarse byte-pruning happens *at the
  scan*, not after a full read. The ADC search itself is the shared
  ``ivfpq_adc_search`` kernel, so cached search is bit-identical to the
  composed query (pytest-pinned).

Scale: at 10^12 vectors the codes layout is 16 bytes/vector ≈ 16 TB spread
over n_coarse bucket dirs with many part files each; search touches
nprobe/n_coarse of it and the meta stays O(n_coarse·dim + n_sub·k·d_sub).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa

from ..state.manifest import PartitionManifest, atomic_write_dir

INDEX_ROOT = os.environ.get("GRAFT_ANN_INDEX_ROOT", "/tmp/plateau_ray_ann")


def _input_fingerprint(path: str) -> list[list]:
    """(name, size, mtime_ns) per parquet file — the lineage key."""
    if os.path.isdir(path):
        names = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        paths = [os.path.join(path, n) for n in names]
    else:
        paths = [path]
    out = []
    for p in paths:
        st = os.stat(p)
        out.append([os.path.basename(p), st.st_size, st.st_mtime_ns])
    return out


def index_dir_for(embeddings_path: str, config: dict) -> str:
    """Deterministic index location: digest(input fingerprint + config).
    A changed corpus or config hashes to a NEW directory — stale index
    data can never be read by mistake."""
    key = json.dumps(
        {
            "input": os.path.realpath(embeddings_path),
            "fingerprint": _input_fingerprint(embeddings_path),
            "config": config,
        },
        sort_keys=True,
        separators=(",", ":"),
    )
    digest = hashlib.sha256(key.encode()).hexdigest()[:16]
    return os.path.join(INDEX_ROOT, f"ivfpq_{digest}")


def ivfpq_index_build(
    sf_dir: str,
    dim: int = 64,
    n_coarse: int = 8,
    n_sub: int = 16,
    k: int = 256,
    sample_mod: int | None = None,
    index_dir: str | None = None,
) -> dict:
    """Build (or resume-skip) the persistent IVF-PQ index for
    ``{sf_dir}/embeddings.parquet``.

    Returns ``{"index_dir", "built": bool, "buckets": [(bucket, rows)]}``.
    ``built=False`` means a complete index with a matching input
    fingerprint + config was found and NOTHING was recomputed or rewritten
    (bucket-file mtimes untouched — pytest-pinned).
    """
    from ..sources.tables import read_table
    from .pq import ivfpq_build, ivfpq_encode

    emb_path = f"{sf_dir}/embeddings.parquet"
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    if sample_mod is None:
        n = ds.count()  # scan-rooted: O(1) parquet metadata
        sample_mod = max(1, n // 4096)
    config = {
        "dim": dim,
        "n_coarse": n_coarse,
        "n_sub": n_sub,
        "k": k,
        "sample_mod": sample_mod,
        # bumped when trainer numerics change (r4: vectorized Lloyd step)
        # so a persisted index from older code rebuilds instead of serving
        # codebooks the composed path can no longer reproduce
        "version": 2,
    }
    root = index_dir or index_dir_for(emb_path, config)
    meta_path = os.path.join(root, "meta.json")
    fingerprint = _input_fingerprint(emb_path)

    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["config"] == config and meta["fingerprint"] == fingerprint:
            return {
                "index_dir": root,
                "built": False,
                "buckets": [tuple(b) for b in meta["buckets"]],
            }
        # fingerprint/config mismatch on an explicit index_dir: rebuild
        # loudly into a fresh layout rather than mixing generations
        import shutil

        shutil.rmtree(root)

    t0 = time.perf_counter()
    coarse, books = ivfpq_build(
        ds, dim=dim, n_coarse=n_coarse, n_sub=n_sub, k=k,
        sample_mod=sample_mod,
    )
    codes = ivfpq_encode(ds, coarse, books)

    codes_root = os.path.join(root, "codes")

    def write_bucket(group: "pa.Table | object") -> "object":
        import pandas as pd
        import pyarrow.parquet as pq

        if hasattr(group, "to_pandas"):  # map_groups may hand pandas already
            df = group.to_pandas()
        else:
            df = group
        b = int(df["bucket"].iloc[0])
        df = df.sort_values("vec_id").reset_index(drop=True)
        final = os.path.join(codes_root, f"bucket={b}")
        # metadata-free schema: the pandas blob would otherwise resurface
        # on read and defeat Ray's block-schema dedup (sources/tables.py)
        tbl = pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

        def write(tmp: str) -> None:
            pq.write_table(tbl, os.path.join(tmp, "part-0.parquet"))

        t_b = time.perf_counter()
        atomic_write_dir(final, write)
        from .treeagg import clean_arrow

        # commit record back to the DRIVER (no worker-side manifest append:
        # multi-node safe; see ADVICE r3 on compact.py)
        return clean_arrow(pd.DataFrame(
            {
                "bucket": [b],
                "rows": [len(df)],
                "checksum": [int(np.bitwise_xor.reduce(
                    df["vec_id"].to_numpy().astype(np.uint64)
                ))],
                "elapsed": [time.perf_counter() - t_b],
            }
        ))

    commits = (
        codes.groupby("bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("bucket")
    )
    manifest = PartitionManifest(root, {"config": config})
    for rec in commits.itertuples(index=False):  # n_coarse rows: tiny
        manifest.commit_partition(
            f"bucket={int(rec.bucket)}",
            rows=int(rec.rows),
            checksum=int(rec.checksum),
            lineage={"fingerprint": fingerprint, "config": config},
            metrics={"elapsed_s": round(float(rec.elapsed), 4)},
        )
    meta = {
        "config": config,
        "fingerprint": fingerprint,
        "coarse": coarse.tolist(),
        "books_shape": list(books.shape),
        "books": books.ravel().tolist(),
        "buckets": [
            [int(r.bucket), int(r.rows)] for r in commits.itertuples(index=False)
        ],
        "build_elapsed_s": round(time.perf_counter() - t0, 4),
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)  # atomic completion marker, written LAST
    return {
        "index_dir": root,
        "built": True,
        "buckets": [(int(r.bucket), int(r.rows)) for r in commits.itertuples(index=False)],
    }


def load_index_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    meta["coarse_np"] = np.asarray(meta["coarse"], dtype=np.int64)
    meta["books_np"] = np.asarray(meta["books"], dtype=np.int64).reshape(
        meta["books_shape"]
    )
    return meta


def ivfpq_search_cached(
    index_dir: str, queries: dict, topk: int = 10, nprobe: int = 4
):
    """Read-only ADC search over a built index: load the tiny meta, prune
    to the union of probed bucket partitions AT THE SCAN, then run the
    shared ``ivfpq_adc_search`` kernel (bit-identical to the composed
    query — same centroids, same codes, same tie rules)."""
    import ray.data

    from .knn import quantize
    from .pq import ivfpq_adc_search

    meta = load_index_meta(index_dir)
    coarse = meta["coarse_np"]
    books = meta["books_np"]
    n_coarse = len(coarse)
    nprobe_eff = min(nprobe, n_coarse)

    qv = quantize(np.asarray(queries["vecs"]))
    qd2 = (
        (qv * qv).sum(axis=1)[:, None]
        - 2 * (qv @ coarse.T)
        + (coarse * coarse).sum(axis=1)[None, :]
    )
    probe = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe_eff]
    needed = sorted(set(int(b) for b in probe.ravel()))
    paths = []
    for b in needed:
        bdir = os.path.join(index_dir, "codes", f"bucket={b}")
        if os.path.isdir(bdir):
            # glob every shard: at scale a bucket holds many part files
            paths.extend(
                os.path.join(bdir, f)
                for f in sorted(os.listdir(bdir))
                if f.endswith(".parquet")
            )
    if not paths:
        # every probed bucket is empty on this corpus (skewed Lloyd can
        # leave coarse cells unpopulated): zero candidates, typed schema
        import pandas as pd

        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "qid": np.array([], dtype=np.int64),
                    "ann_id": np.array([], dtype=np.int64),
                    "adc_dist": np.array([], dtype=np.int64),
                    "rank": np.array([], dtype=np.int64),
                }
            )
        )
    codes_ds = ray.data.read_parquet(paths)
    return ivfpq_adc_search(codes_ds, coarse, books, queries, topk=topk,
                            nprobe=nprobe)


def _append_id(fingerprint: list, tag: str) -> str:
    return hashlib.sha256(
        json.dumps({"fp": fingerprint, "tag": tag}, sort_keys=True).encode()
    ).hexdigest()[:16]


def ivfpq_index_append(
    index_dir: str, delta_ds, tag: str, delta_fingerprint: list
) -> dict:
    """Incremental index maintenance (FAISS ``index.add``): encode new
    vectors with the EXISTING codebooks — no retraining — and land them
    as additional part files inside the existing bucket partitions.

    Exactly-once by ledger: the append id (digest of the delta
    fingerprint + tag) is recorded in ``meta.json``; a replayed append is
    a NO-OP touching no file. Crash-window safe: part files are written
    tmp + os.replace under DETERMINISTIC names
    (``part-a<append_id>.parquet``), so a replay after a crash before the
    meta update rewrites identical bytes instead of duplicating rows; the
    meta rewrite is the atomic commit point (written LAST). Commit
    records return to the DRIVER (no worker-side manifest appends).

    Returns {"appended": bool, "rows": n, "buckets": [(bucket, rows)]}.
    """
    import pandas as pd
    import pyarrow.parquet as pq

    from .pq import ivfpq_encode
    from .treeagg import clean_arrow

    meta = load_index_meta(index_dir)
    aid = _append_id(delta_fingerprint, tag)
    if aid in meta.get("appends", []):
        return {"appended": False, "rows": 0,
                "buckets": [tuple(b) for b in meta["buckets"]]}

    coarse = meta["coarse_np"]
    books = meta["books_np"]
    codes = ivfpq_encode(delta_ds, coarse, books)
    codes_root = os.path.join(index_dir, "codes")

    def write_delta(group):
        df = group.to_pandas() if hasattr(group, "to_pandas") else group
        b = int(df["bucket"].iloc[0])
        df = df.sort_values("vec_id").reset_index(drop=True)
        bdir = os.path.join(codes_root, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        tbl = pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)
        final = os.path.join(bdir, f"part-a{aid}.parquet")
        tmp = final + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)  # atomic, idempotent under replay
        return clean_arrow(pd.DataFrame({"bucket": [b], "rows": [len(df)]}))

    commits = (
        codes.groupby("bucket")
        .map_groups(write_delta, batch_format="pandas")
        .to_pandas()
        .sort_values("bucket")
    )
    manifest = PartitionManifest(index_dir, {"append": aid})
    by_bucket = {int(r.bucket): int(r.rows) for r in commits.itertuples(index=False)}
    for b, rows in by_bucket.items():
        manifest.commit_partition(
            f"bucket={b}/part-a{aid}",
            rows=rows,
            checksum=0,
            lineage={"append_id": aid, "fingerprint": delta_fingerprint},
            metrics={},
        )
    # meta rewrite = the commit point: bucket row counts updated, append
    # ledgered. Parts become search-visible as they land (each is
    # individually atomic and carries CORRECT rows, so early visibility
    # is a freshness wart, not corruption); a crash before this rewrite
    # is healed by replay, which rewrites identical bytes under the same
    # deterministic names — never duplicates
    buckets = {int(b): int(r) for b, r in meta["buckets"]}
    for b, rows in by_bucket.items():
        buckets[b] = buckets.get(b, 0) + rows
    meta_out = {k: v for k, v in meta.items()
                if k not in ("coarse_np", "books_np")}
    meta_out["buckets"] = sorted([b, r] for b, r in buckets.items())
    meta_out["appends"] = meta.get("appends", []) + [aid]
    meta_path = os.path.join(index_dir, "meta.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta_out, f)
    os.replace(tmp, meta_path)
    return {
        "appended": True,
        "rows": int(commits["rows"].sum()),
        "buckets": sorted(buckets.items()),
    }
