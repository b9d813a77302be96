"""Count-min sketch heavy hitters: sketch -> candidates -> exact recount.

The classic phi-heavy-hitters flow for a key domain too wide to groupby
exactly (10^12 rows over ~10^9 keys would be an all-to-all exchange on
every key):

1. **Sketch pass** — each batch folds its keys into a tiny ``d x w``
   count-min sketch (Cormode-Muthukrishnan 2005). The sketch is LINEAR,
   so per-batch partials merge by elementwise sum — expressed here as a
   ``(slot, cnt)`` combiner feeding :func:`tree_group_agg`; nothing wide
   ever moves (the merged sketch is ``d*w`` rows regardless of input).
2. **Candidate pass** — per-batch LOCAL distinct keys are probed against
   the merged sketch (broadcast once via ``ray.put``-style task-closure
   capture of a few-KB numpy array). CMS only ever OVERestimates, so
   ``est >= T`` keys are a guaranteed superset of the true heavy set —
   no false negatives, and the candidate stream is tiny because heavy
   keys are rare.
3. **Exact recount** — rows are filtered to the candidate set (vectorized
   ``np.isin`` membership against the small broadcast set) and recounted
   exactly; the final ``n >= T`` filter makes the OUTPUT exact — sketch
   error only costs a few extra candidates in the recount, never a wrong
   row.

Hashing is multiply-shift over uint64 with natural wraparound
(``h_i(k) = ((k * A_i + B_i) mod 2^64) >> (64 - log2 w)``), vectorized per
batch; the ``A_i`` are fixed odd constants so every worker, every round,
and the pytest pin agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# fixed odd multipliers / offsets for the d=4 multiply-shift rows
_CMS_A = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)
_CMS_B = np.array(
    [0x85EBCA6B0F4A7C15, 0x2545F4914F6CDD1D, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53],
    dtype=np.uint64,
)
CMS_D = 4
CMS_LOG2_W = 12
CMS_W = 1 << CMS_LOG2_W


def cms_hash(keys: np.ndarray) -> np.ndarray:
    """(d, n) slot indices for int64 ``keys`` (multiply-shift, wraps)."""
    k = keys.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        mixed = k[None, :] * _CMS_A[:, None] + _CMS_B[:, None]
    return (mixed >> np.uint64(64 - CMS_LOG2_W)).astype(np.int64)


def sketch_partial(keys: np.ndarray) -> pa.Table:
    """One batch's sketch as (slot, cnt) rows (slot = row*w + h)."""
    h = cms_hash(keys)
    out_slots = []
    out_cnts = []
    for i in range(CMS_D):
        cnt = np.bincount(h[i], minlength=CMS_W)
        nz = np.nonzero(cnt)[0]
        out_slots.append(nz + i * CMS_W)
        out_cnts.append(cnt[nz].astype(np.int64))
    return pa.table(
        {
            "slot": pa.array(np.concatenate(out_slots)),
            "cnt": pa.array(np.concatenate(out_cnts)),
        }
    )


def merged_sketch_np(slot_cnt: pd.DataFrame) -> np.ndarray:
    """(d, w) int64 sketch from the merged (slot, cnt) table."""
    sk = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    sk[slot_cnt["slot"].to_numpy()] = slot_cnt["cnt"].to_numpy()
    return sk.reshape(CMS_D, CMS_W)


def cms_estimate(sketch: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates (the row-wise min) for int64 ``keys``."""
    h = cms_hash(keys)
    est = sketch[0, h[0]]
    for i in range(1, CMS_D):
        est = np.minimum(est, sketch[i, h[i]])
    return est


def heavy_hitters(ds, key_col: str, threshold: int):
    """Exact keys with count >= ``threshold`` via the 3-pass CMS flow.

    ``ds`` must stream batches containing ``key_col`` (int64). Returns a
    Dataset of (key_col, n) with EXACT counts — the sketch prunes, the
    recount decides.
    """
    from .treeagg import tree_group_agg

    def part(batch: pa.Table) -> pa.Table:
        return sketch_partial(batch.column(key_col).to_numpy())

    merged = tree_group_agg(
        ds.map_batches(part, batch_format="pyarrow"),
        ["slot"],
        {"cnt": ("cnt", "sum")},
    ).to_pandas()
    sketch = merged_sketch_np(merged)

    def candidates(batch: pa.Table) -> pa.Table:
        keys = np.unique(batch.column(key_col).to_numpy())
        est = cms_estimate(sketch, keys)
        return pa.table({key_col: pa.array(keys[est >= threshold])})

    cand = (
        tree_group_agg(
            ds.map_batches(candidates, batch_format="pyarrow"),
            [key_col],
            {"n": (None, "count")},
        )
        .to_pandas()[key_col]
        .to_numpy()
    )
    cand_sorted = np.sort(cand)

    def recount(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy()
        pos = np.searchsorted(cand_sorted, keys)
        pos_c = np.minimum(pos, max(len(cand_sorted) - 1, 0))
        hit = (
            cand_sorted[pos_c] == keys
            if len(cand_sorted)
            else np.zeros(len(keys), bool)
        )
        return pa.table({key_col: pa.array(keys[hit])})

    counts = tree_group_agg(
        ds.map_batches(recount, batch_format="pyarrow"),
        [key_col],
        {"n": (None, "count")},
    )

    def final(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy()
        return batch.filter(pa.array(n >= threshold))

    return counts.map_batches(final, batch_format="pyarrow")
