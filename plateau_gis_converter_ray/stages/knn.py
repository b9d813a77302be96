"""Similarity search: brute-force kNN baseline + cell/IVF-bucketed variants.

- :class:`EmbedKNN` — batched matmul of each Arrow batch against a broadcast
  query matrix (`ray.put` once, read per actor in ``__init__``): the
  brute-force baseline. O(rows x queries x dim) flops, zero shuffle.
- :func:`knn_points_cellring` — point kNN via cell-key ring expansion
  (H3 k_ring analogue, kernels.cells.cell_ring): candidates from the
  neighbor cells of the query's cell only — the scale path that avoids the
  full cross product.
- :class:`IVFIndexKNN` — IVF-style: queries assigned to coarse centroids;
  rows probe only their centroid bucket (documented approximation).

Integer-quantized distance (``QUANT``) keeps results bit-identical to the
DuckDB oracle (no float accumulation-order ambiguity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

QUANT = 100.0  # embedding quantization: round(e * QUANT) -> int64


def quantize(vecs: np.ndarray) -> np.ndarray:
    return np.round(vecs.astype(np.float64) * QUANT).astype(np.int64)


class EmbedKNN:
    """Top-1 nearest query by integer-quantized squared Euclidean distance."""

    def __init__(self, queries_ref):
        try:
            import ray

            if isinstance(queries_ref, ray.ObjectRef):
                queries_ref = ray.get(queries_ref)
        except Exception:
            pass
        self.qids = np.asarray(queries_ref["qid"], dtype=np.int64)
        self.qvecs = quantize(np.asarray(queries_ref["vecs"]))  # (m, d)
        self.q_sq = (self.qvecs * self.qvecs).sum(axis=1)  # (m,)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False))
        v = quantize(emb)  # (n, d)
        v_sq = (v * v).sum(axis=1)
        # dist2 = |v|^2 - 2 v.q + |q|^2 — all int64, exact
        dots = v @ self.qvecs.T  # (n, m)
        dist2 = v_sq[:, None] - 2 * dots + self.q_sq[None, :]
        best = np.argmin(dist2, axis=1)  # first (lowest qid) wins ties
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "nearest_qid": pa.array(self.qids[best]),
                "dist2_q": pa.array(dist2[np.arange(len(best)), best]),
            }
        )


def embedding_near_dup_pairs(sf_dir: str, dist2_threshold: int):
    """All pairs with quantized dist2 < threshold — O(n^2) verify done as a
    broadcast self-join (right side `ray.put` once), exact + deterministic."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    all_pd = ds.to_pandas()
    ids = all_pd["vec_id"].to_numpy().astype(np.int64)
    vecs = quantize(np.stack(all_pd["embedding"].to_numpy()))
    ref = ray.put({"ids": ids, "vecs": vecs})

    class PairFinder:
        def __init__(self, ref, threshold):
            data = ray.get(ref) if hasattr(ref, "hex") else ref
            self.ids = data["ids"]
            self.vecs = data["vecs"]
            self.v_sq = (self.vecs * self.vecs).sum(axis=1)
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False))
            a_ids = batch.column("vec_id").to_numpy().astype(np.int64)
            v = quantize(emb)
            v_sq = (v * v).sum(axis=1)
            dist2 = v_sq[:, None] - 2 * (v @ self.vecs.T) + self.v_sq[None, :]
            ai, bj = np.nonzero(
                (dist2 < self.threshold) & (a_ids[:, None] < self.ids[None, :])
            )
            return pa.table(
                {
                    "vec_a": pa.array(a_ids[ai]),
                    "vec_b": pa.array(self.ids[bj]),
                    "dist2_q": pa.array(dist2[ai, bj]),
                }
            )

    return ds.map_batches(
        PairFinder,
        fn_constructor_args=(ref, dist2_threshold),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    )


def knn_points_brute(sf_dir: str, n_queries: int = 16):
    """For each event point, the nearest of ``n_queries`` fixed query points.

    Query points are arithmetic in qid (SQL-reproducible); distance is pure
    double arithmetic (same expression both sides -> identical IEEE bits).
    """
    import ray.data

    from .geocode import add_lnglat_arith

    qids = np.arange(n_queries, dtype=np.int64)
    qx = 122.0 + (qids * 17) % 24
    qy = 24.0 + (qids * 13) % 22

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    ds = ds.map_batches(
        lambda b: add_lnglat_arith(b, "event_id"), batch_format="pyarrow"
    )

    def nearest(batch: pa.Table) -> pa.Table:
        lng = batch.column("lng").to_numpy()
        lat = batch.column("lat").to_numpy()
        d2 = (lng[:, None] - qx[None, :]) ** 2 + (lat[:, None] - qy[None, :]) ** 2
        best = np.argmin(d2, axis=1)  # ties -> lowest qid, matches SQL order
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "nearest_qid": pa.array(qids[best]),
            }
        )

    return ds.map_batches(nearest, batch_format="pyarrow")


def knn_points_cellring(sf_dir: str, n_queries: int = 16, res: int = 6):
    """Same result as :func:`knn_points_brute` via cell-ring candidate pruning.

    Vectorized k-level batching (no per-row Python loop): the whole batch
    advances ring radius k together; at each level only still-active points
    rescan, a candidate query enters at level k when its cell lies within
    Chebyshev distance k of the point's cell, and a point finishes when its
    best candidate is STRICTLY closer than anything a farther ring could
    hold ((k * min cell size)^2). Strict inequality + one more ring on exact
    ties keeps the tie-break identical to brute force / the SQL oracle
    (globally lowest qid at equal distance). At 16 queries the candidate
    mask is a (batch, m) matrix; at 10^6 queries the same level-stepping
    runs per cell bucket.
    """
    import ray.data

    from ..kernels.cells import cell_xy
    from .geocode import add_lnglat_arith

    qids = np.arange(n_queries, dtype=np.int64)
    qx = 122.0 + (qids * 17) % 24
    qy = 24.0 + (qids * 13) % 22
    n = 1 << res
    cell_w = 360.0 / n
    cell_h = 180.0 / n
    qcx, qcy = cell_xy(qx, qy, res)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    ds = ds.map_batches(
        lambda b: add_lnglat_arith(b, "event_id"), batch_format="pyarrow"
    )

    def nearest(batch: pa.Table) -> pa.Table:
        lng = batch.column("lng").to_numpy()
        lat = batch.column("lat").to_numpy()
        nb = len(lng)
        cx, cy = cell_xy(lng, lat, res)
        # Chebyshev cell distance point-cell -> query-cell (x wraps)
        dx = np.abs(cx[:, None] - qcx[None, :])
        dx = np.minimum(dx, n - dx)
        dy = np.abs(cy[:, None] - qcy[None, :])
        chev = np.maximum(dx, dy)  # (nb, m)
        d2 = (lng[:, None] - qx[None, :]) ** 2 + (lat[:, None] - qy[None, :]) ** 2
        out = np.full(nb, -1, dtype=np.int64)
        active = np.ones(nb, dtype=bool)
        k = 1
        while active.any():
            rows = np.nonzero(active)[0]
            masked = np.where(chev[rows] <= k, d2[rows], np.inf)
            j = np.argmin(masked, axis=1)  # ties -> lowest qid among explored
            bd = masked[np.arange(len(rows)), j]
            edge = (k * min(cell_w, cell_h)) ** 2
            # strictly-closer bound; at k >= n every query is a candidate so
            # the masked argmin IS brute force and ties resolve identically
            done = (bd < edge) | (k >= n)
            out[rows[done]] = qids[j[done]]
            active[rows[done]] = False
            k += 1
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "nearest_qid": pa.array(out),
            }
        )

    return ds.map_batches(nearest, batch_format="pyarrow")


def _lloyd_centroids(vecs: np.ndarray, k: int, iters: int = 2) -> np.ndarray:
    """Deterministic coarse quantizer: seed with the first k vectors, run a
    fixed number of Lloyd iterations (no RNG — stable across processes)."""
    centroids = vecs[:k].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_self_knn(sf_dir: str, n_centroids: int = 8, nprobe: int = 6):
    """IVF-bucketed approximate nearest-neighbor within the embedding table.

    Scale path for similarity search (SURVEY build brief): a coarse quantizer
    partitions vectors into buckets; each vector searches only its nearest
    ``nprobe`` buckets instead of the full table. The bucket lists are the
    broadcast side; recall vs brute force is pinned in tests.

    The synthetic embeddings are weakly clustered (max pairwise cosine
    ~0.46), so high recall needs a wide probe: defaults (8 centroids,
    nprobe=6) measure recall@1 ~0.93 vs brute force; tighter probes trade
    recall for compute (16/6 -> 0.77). Tests pin the default recall >= 0.9.

    Output: (vec_id, ann_id, dist2_q) — the approximate nearest *other*
    vector by quantized squared distance (ties -> lowest id).
    """
    import ray
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    all_pd = ds.to_pandas().sort_values("vec_id")
    ids = all_pd["vec_id"].to_numpy().astype(np.int64)
    vecs = quantize(np.stack(all_pd["embedding"].to_numpy()))
    centroids = _lloyd_centroids(vecs.astype(np.float64), n_centroids)
    d2c = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    bucket_of = d2c.argmin(axis=1)
    buckets = {c: np.nonzero(bucket_of == c)[0] for c in range(n_centroids)}
    ref = ray.put(
        {"ids": ids, "vecs": vecs, "centroids": centroids, "buckets": buckets}
    )

    class IVFSearch:
        def __init__(self, r, nprobe):
            data = ray.get(r) if hasattr(r, "hex") else r
            self.ids = data["ids"]
            self.vecs = data["vecs"]
            self.centroids = data["centroids"]
            self.buckets = data["buckets"]
            self.nprobe = nprobe

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False))
            q_ids = batch.column("vec_id").to_numpy().astype(np.int64)
            v = quantize(emb).astype(np.float64)
            d2c = ((v[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
            probe = np.argsort(d2c, axis=1)[:, : self.nprobe]
            out_id = np.empty(len(v), dtype=np.int64)
            out_d2 = np.empty(len(v), dtype=np.int64)
            vq = quantize(emb)
            for i in range(len(v)):
                cand = np.concatenate([self.buckets[c] for c in probe[i]])
                cand_ids = self.ids[cand]
                mask = cand_ids != q_ids[i]
                cand = cand[mask]
                cand_ids = cand_ids[mask]
                if len(cand) == 0:
                    out_id[i] = -1
                    out_d2[i] = -1
                    continue
                diff = self.vecs[cand] - vq[i][None, :]
                d2 = (diff * diff).sum(axis=1)
                order = np.lexsort((cand_ids, d2))
                j = order[0]
                out_id[i] = cand_ids[j]
                out_d2[i] = d2[j]
            return pa.table(
                {
                    "vec_id": pa.array(q_ids),
                    "ann_id": pa.array(out_id),
                    "dist2_q": pa.array(out_d2),
                }
            )

    return ds.map_batches(
        IVFSearch,
        fn_constructor_args=(ref, nprobe),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )


def brute_self_knn_pd(sf_dir: str) -> "pd.DataFrame":
    """Exact self-kNN (driver-side, test oracle for IVF recall)."""
    import ray.data

    all_pd = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = all_pd["vec_id"].to_numpy().astype(np.int64)
    v = quantize(np.stack(all_pd["embedding"].to_numpy()))
    v_sq = (v * v).sum(axis=1)
    d2 = v_sq[:, None] - 2 * (v @ v.T) + v_sq[None, :]
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    best = d2.argmin(axis=1)
    return pd.DataFrame(
        {"vec_id": ids, "nn_id": ids[best], "dist2_q": d2[np.arange(len(ids)), best]}
    )
