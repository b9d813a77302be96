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

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_cols, as_index=False).agg(
            **{k: v for k, v in first.items()}
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_cols, as_index=False).agg(
            **{k: v for k, v in again.items()}
        )

    ds = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    for fan in levels:
        ds = ds.repartition(fan).map_batches(
            merge, batch_format="pandas", batch_size=None
        )
    return ds
