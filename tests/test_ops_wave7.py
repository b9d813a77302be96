"""TPC-H completion wave 2 (Q9/Q12/Q20 shapes): planner-vs-shuffle
equality and semantic pins for the adapted queries.

- product_profit: profit really mixes revenue and cost (some group is
  negative or the global sum differs from pure revenue — a cost of zero
  would pass the oracle trivially only if the SQL dropped the term too).
- shipmode_priority: high + low == total year-2000 join rows, and both
  priority classes are represented (non-vacuous split).
- promo_part_suppliers: every returned pair-share is genuinely above the
  fair share — recomputed from the raw parquet with pandas.
- all three: the planner's broadcast plan == the forced shuffle plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _pdf(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _norm(df: pd.DataFrame, keys) -> pd.DataFrame:
    return df.sort_values(keys).reset_index(drop=True)[sorted(df.columns)]


def test_tpch_wave7_force_equal(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import (
        q_product_profit,
        q_promo_part_suppliers,
        q_shipmode_priority,
    )

    for fn, keys in [
        (q_product_profit, ["n_name", "o_year"]),
        (q_shipmode_priority, ["l_linestatus"]),
        (q_promo_part_suppliers, ["s_suppkey"]),
    ]:
        a = _norm(_pdf(fn(SF_SMALL, force=None)), keys)
        b = _norm(_pdf(fn(SF_SMALL, force="shuffle")), keys)
        pd.testing.assert_frame_equal(a, b)


def test_product_profit_cost_term_bites(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_product_profit

    out = _pdf(q_product_profit(SF_SMALL))
    assert len(out) > 0
    li = pd.read_parquet(SF_SMALL + "/lineitem.parquet")
    part = pd.read_parquet(SF_SMALL + "/part.parquet")
    red = part[part["p_name"].str.startswith("red")]
    j = li.merge(red, left_on="l_partkey", right_on="p_partkey")
    assert len(j) > 0
    rev = np.round(
        j["l_extendedprice"].to_numpy() * (1 - j["l_discount"].to_numpy()) * 10000
    ).astype(np.int64)
    cost = (
        np.round(j["p_retailprice"].to_numpy() * 100).astype(np.int64)
        * np.round(j["l_quantity"].to_numpy()).astype(np.int64)
        * 100
    )
    assert int(out["profit_s"].sum()) == int((rev - cost).sum())
    assert int(cost.sum()) != 0  # the cost term actually participates


def test_shipmode_priority_partition(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_shipmode_priority

    out = _pdf(q_shipmode_priority(SF_SMALL))
    li = pd.read_parquet(
        SF_SMALL + "/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    n_year = int(
        (
            (li["l_shipdate"] >= pd.Timestamp("2000-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("2001-01-01"))
        ).sum()
    )
    assert int(out["high_line_count"].sum() + out["low_line_count"].sum()) == n_year
    assert int(out["high_line_count"].sum()) > 0
    assert int(out["low_line_count"].sum()) > 0


def test_promo_part_suppliers_over_share(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import (
        q_promo_part_suppliers,
    )

    out = _pdf(q_promo_part_suppliers(SF_SMALL)).set_index("s_suppkey")
    assert len(out) > 0
    li = pd.read_parquet(
        SF_SMALL + "/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )
    part = pd.read_parquet(SF_SMALL + "/part.parquet", columns=["p_partkey", "p_name"])
    hot = set(part.loc[part["p_name"].str.startswith("hot"), "p_partkey"])
    sel = li[li["l_partkey"].isin(hot)].copy()
    sel["q"] = np.round(sel["l_quantity"]).astype(np.int64)
    sp = sel.groupby(["l_suppkey", "l_partkey"])["q"].sum().reset_index()
    pt = sp.groupby("l_partkey").agg(tq=("q", "sum"), ns=("q", "size")).reset_index()
    m = sp.merge(pt, on="l_partkey")
    over = m[2 * m["q"] * m["ns"] > 3 * m["tq"]]
    exp = over.groupby("l_suppkey").agg(
        n_over_parts=("q", "size"), over_qty=("q", "sum")
    )
    assert set(out.index) == set(exp.index)
    for k in exp.index:
        assert int(out.loc[k, "n_over_parts"]) == int(exp.loc[k, "n_over_parts"])
        assert int(out.loc[k, "over_qty"]) == int(exp.loc[k, "over_qty"])
