"""Combiner + log-depth tree-merge group-aggregate (shared helper).

The engine's answer to Ray's ``groupby().aggregate()`` fixed overhead for
exact integer/min/max aggregates: a per-batch pandas combiner collapses each
block to one row per key BEFORE any exchange, then a few repartition+merge
levels reduce the (already small) partials. Exactness holds because every op
is order-free (sum of ints / min / max / count). Used by the flagship and
the heavy registry queries (see BASELINE.md "groupby fixed cost" note).
"""

from __future__ import annotations

import pandas as pd


def clean_arrow(df: pd.DataFrame):
    """pandas -> metadata-free Arrow table.

    Ray's own pandas->Arrow block conversion attaches the ``pandas``
    schema-metadata blob, which makes ``hash(pa.Schema)`` raise and
    defeats Ray's block-schema dedup in every downstream shuffle
    (HashShuffleAggregator / reduce warnings, r2 bench tail). Combiners
    that feed an exchange convert explicitly and strip the metadata.
    """
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
        None
    )


def tree_group_agg(ds, group_cols: list[str], agg_spec: dict, levels=(8, 1)):
    """``agg_spec``: out_col -> (src_col, op) with op in sum|min|max|count."""
    first = {}
    again = {}
    for out, (col, op) in agg_spec.items():
        if op == "count":
            first[out] = (col if col else group_cols[0], "size")
            again[out] = (out, "sum")
        else:
            first[out] = (col, op)
            again[out] = (out, "sum" if op == "sum" else op)

    def partial(df: pd.DataFrame):
        return clean_arrow(
            df.groupby(group_cols, as_index=False).agg(
                **{k: v for k, v in first.items()}
            )
        )

    def merge(df: pd.DataFrame):
        return clean_arrow(
            df.groupby(group_cols, as_index=False).agg(
                **{k: v for k, v in again.items()}
            )
        )

    ds = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    for fan in levels:
        ds = ds.repartition(fan).map_batches(
            merge, batch_format="pandas", batch_size=None
        )
    return ds


def tree_custom_agg(ds, partial, merge, levels=(8, 1)):
    """Combiner tree with CUSTOM partial/merge steps (same shape as
    :func:`tree_group_agg`, for aggregates the op-table can't express —
    lexicographic arg-min/arg-max, bounded top-k partials, extreme-point
    reductions). ``partial`` collapses one input batch; ``merge``
    re-collapses concatenated partials and must be order-free and
    idempotent on its own output. Both take a pandas DataFrame and return
    a metadata-free Arrow table (:func:`clean_arrow`)."""
    ds = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    for fan in levels:
        ds = ds.repartition(fan).map_batches(
            merge, batch_format="pandas", batch_size=None
        )
    return ds


def grouped_distinct(ds, cols: list[str], n_groups: int = 128):
    """Parallel exact DISTINCT on integer ``cols``.

    The agg tree's serial fan-1 final merge is the right shape for
    BOUNDED aggregate outputs, but a distinct whose output is fact-sized
    (near-dup pair sets, CC edge frontiers) would funnel every row
    through one task. Here each block dedups locally, then a
    hash-grouped exchange co-locates equal keys and the reduce is ONE
    vectorized ``drop_duplicates`` per hash group — fully parallel at
    every level. Row order is not defined (set semantics).
    """
    import numpy as np

    def local(df: pd.DataFrame):
        out = df[cols].drop_duplicates(cols)
        h = np.zeros(len(out), dtype=np.int64)
        for c in cols:
            h = h * 1_000_003 + out[c].to_numpy().astype(np.int64)
        return clean_arrow(out.assign(_g=h % n_groups))

    def reduce(df: pd.DataFrame):
        return clean_arrow(df[cols].drop_duplicates(cols))

    return (
        ds.map_batches(local, batch_format="pandas", batch_size=None)
        .groupby("_g")
        .map_groups(reduce, batch_format="pandas")
    )


def grouped_group_agg(ds, group_cols: list[str], agg_spec: dict,
                      n_groups: int = 64):
    """tree_group_agg for FACT-SIZED key spaces.

    Same per-block combiner, but the merge is a coarse-hash groupby whose
    reduce handles ALL of a hash group's keys in one vectorized pass —
    the output lands in up to ``n_groups`` parallel blocks instead of the
    tree's single final block, and no task ever sees the whole key space.
    Use this when |distinct keys| grows with the data (content hashes,
    (doc, term) pairs, near-dup pair sets); keep ``tree_group_agg`` for
    BOUNDED aggregates, where the tree's repartitions are cheaper than a
    sort exchange. ``agg_spec`` format matches tree_group_agg."""
    import numpy as np
    import pandas as pd

    first = {}
    again = {}
    for out, (col, op) in agg_spec.items():
        if op == "count":
            first[out] = (col if col else group_cols[0], "size")
            again[out] = (out, "sum")
        else:
            first[out] = (col, op)
            again[out] = (out, "sum" if op == "sum" else op)

    def _ghash(df: pd.DataFrame) -> np.ndarray:
        h = np.zeros(len(df), dtype=np.uint64)
        for c in group_cols:
            col = df[c]
            if col.dtype.kind in "iu":
                v = col.to_numpy().astype(np.uint64)
            else:
                v = pd.util.hash_pandas_object(col, index=False).to_numpy()
            with np.errstate(over="ignore"):
                h = h * np.uint64(1_000_003) + v
        return (h % np.uint64(n_groups)).astype(np.int64)

    def partial(df: pd.DataFrame):
        out = df.groupby(group_cols, as_index=False).agg(
            **{k: v for k, v in first.items()}
        )
        return clean_arrow(out.assign(_g=_ghash(out)))

    def merge(df: pd.DataFrame):
        out = df.groupby(group_cols, as_index=False).agg(
            **{k: v for k, v in again.items()}
        )
        return clean_arrow(out)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_g")
        .map_groups(merge, batch_format="pandas")
    )
