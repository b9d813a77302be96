"""Combiner + log-depth tree-merge group-aggregate (shared helper).

The engine's answer to Ray's ``groupby().aggregate()`` fixed overhead for
exact integer/min/max aggregates: a per-batch PURE-ARROW combiner collapses
each block to one row per key BEFORE any exchange (``pa.Table.group_by`` —
the C++ hash-aggregate kernel, zero pandas round-trips; r4 verdict item #1),
then a few repartition+merge levels reduce the (already small) partials.
Exactness holds because every op is order-free (sum of ints / min / max /
count). Used by the flagship and the heavy registry queries (see BASELINE.md
"groupby fixed cost" note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def clean_arrow(df: pd.DataFrame):
    """pandas -> metadata-free Arrow table.

    Ray's own pandas->Arrow block conversion attaches the ``pandas``
    schema-metadata blob, which makes ``hash(pa.Schema)`` raise and
    defeats Ray's block-schema dedup in every downstream shuffle
    (HashShuffleAggregator / reduce warnings, r2 bench tail). Combiners
    that feed an exchange convert explicitly and strip the metadata.
    """
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
        None
    )


def _drop_null_keys(t: pa.Table, group_cols: list[str]) -> pa.Table:
    """Match pandas-groupby ``dropna=True``: rows with a null group key are
    excluded (Arrow's hash-aggregate would keep them as a null group).
    Metadata-only check first — the filter kernel never runs on the
    (overwhelmingly common) null-free path."""
    if all(t.column(c).null_count == 0 for c in group_cols):
        return t
    mask = pc.is_valid(t.column(group_cols[0]))
    for c in group_cols[1:]:
        mask = pc.and_(mask, pc.is_valid(t.column(c)))
    return t.filter(mask)


def _arrow_group_agg(
    t: pa.Table, group_cols: list[str], aggs: list, out_names: list[str]
) -> pa.Table:
    """One Arrow hash-aggregate pass. ``aggs`` is the pyarrow spec
    (``(src_col, fn)`` / ``([], "count_all")``); ``out_names`` renames the
    aggregate outputs POSITIONALLY (pyarrow emits key columns first, then
    aggregates in spec order — duplicate default names are fine)."""
    t = _drop_null_keys(t, group_cols)
    r = t.group_by(group_cols).aggregate(aggs)
    r = r.rename_columns(list(group_cols) + out_names)
    return r.select(group_cols + out_names).replace_schema_metadata(None)


def _spec_plans(group_cols: list[str], agg_spec: dict):
    """agg_spec {out: (src_col, op)} -> (first_aggs, again_aggs, out_names).

    ``op`` in sum|min|max|count. count = group SIZE (pandas ``"size"``
    semantics: rows, not non-null values) -> Arrow ``count_all``; the
    re-merge of a count partial is a sum."""
    first, again, outs = [], [], []
    for out, (col, op) in agg_spec.items():
        outs.append(out)
        if op == "count":
            first.append(([], "count_all"))
            again.append((out, "sum"))
        else:
            first.append((col, op))
            again.append((out, "sum" if op == "sum" else op))
    return first, again, outs


def tree_group_agg(ds, group_cols: list[str], agg_spec: dict, levels=(8, 1)):
    """``agg_spec``: out_col -> (src_col, op) with op in sum|min|max|count."""
    first, again, outs = _spec_plans(group_cols, agg_spec)

    def partial(t: pa.Table) -> pa.Table:
        return _arrow_group_agg(t, group_cols, first, outs)

    def merge(t: pa.Table) -> pa.Table:
        return _arrow_group_agg(t, group_cols, again, outs)

    ds = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    for fan in levels:
        ds = ds.repartition(fan).map_batches(
            merge, batch_format="pyarrow", batch_size=None
        )
    return ds


def tree_custom_agg(ds, partial, merge, levels=(8, 1)):
    """Combiner tree with CUSTOM partial/merge steps (same shape as
    :func:`tree_group_agg`, for aggregates the op-table can't express —
    lexicographic arg-min/arg-max, bounded top-k partials, extreme-point
    reductions). ``partial`` collapses one input batch; ``merge``
    re-collapses concatenated partials and must be order-free and
    idempotent on its own output. Both take a pandas DataFrame and return
    a metadata-free Arrow table (:func:`clean_arrow`). This variant keeps
    the pandas batch format BY CONTRACT (callers' partials are written
    against it); the op-table paths above are pure Arrow."""
    ds = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    for fan in levels:
        ds = ds.repartition(fan).map_batches(
            merge, batch_format="pandas", batch_size=None
        )
    return ds


def _col_hash(t: pa.Table, cols: list[str], n_groups: int) -> np.ndarray:
    """Deterministic per-row partition hash over ``cols`` (int64 output in
    [0, n_groups)). Integer columns hash via a numpy polynomial roll;
    string/float/other columns via pandas' vectorized siphash on the ONE
    column (no whole-table pandas round-trip). Only co-location matters —
    the reduce re-groups exactly by value — so collisions are benign."""
    h = np.zeros(len(t), dtype=np.uint64)
    for c in cols:
        col = t.column(c)
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            v = pd.util.hash_pandas_object(
                col.to_pandas(), index=False
            ).to_numpy()
        with np.errstate(over="ignore"):
            h = h * np.uint64(1_000_003) + v
    return (h % np.uint64(n_groups)).astype(np.int64)


def grouped_distinct(ds, cols: list[str], n_groups: int = 128):
    """Parallel exact DISTINCT on ``cols``.

    The agg tree's serial fan-1 final merge is the right shape for
    BOUNDED aggregate outputs, but a distinct whose output is fact-sized
    (near-dup pair sets, CC edge frontiers) would funnel every row
    through one task. Here each block dedups locally (Arrow hash-group
    with no aggregates == DISTINCT), then a hash-grouped exchange
    co-locates equal keys and the reduce is ONE more hash-group per hash
    group — fully parallel at every level. Row order is not defined (set
    semantics).
    """

    def local(t: pa.Table) -> pa.Table:
        out = _drop_null_keys(t.select(cols), cols).group_by(cols).aggregate([])
        return out.append_column(
            "_g", pa.array(_col_hash(out, cols, n_groups))
        ).replace_schema_metadata(None)

    def reduce(t: pa.Table) -> pa.Table:
        return (
            t.select(cols).group_by(cols).aggregate([]).replace_schema_metadata(None)
        )

    return (
        ds.map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("_g")
        .map_groups(reduce, batch_format="pyarrow")
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
    first, again, outs = _spec_plans(group_cols, agg_spec)

    def partial(t: pa.Table) -> pa.Table:
        out = _arrow_group_agg(t, group_cols, first, outs)
        return out.append_column(
            "_g", pa.array(_col_hash(out, group_cols, n_groups))
        ).replace_schema_metadata(None)

    def merge(t: pa.Table) -> pa.Table:
        return _arrow_group_agg(t, group_cols, again, outs)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_g")
        .map_groups(merge, batch_format="pyarrow")
    )
