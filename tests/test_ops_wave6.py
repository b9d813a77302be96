"""TPC-H completion wave (Q6/Q10/Q13/Q17/Q19 shapes): brute-force pins and
planner-vs-shuffle equality for the new oracle-gated queries.

- revenue_forecast: exact vs a pandas recompute of the integer-percent
  discount predicate (and the predicate is non-empty — a vacuous filter
  would pass the oracle trivially).
- returned_items / order_count_distribution / small_qty_revenue /
  disjunctive_revenue: the planner's broadcast plan == the forced shuffle
  plan bit-for-bit (the auto_join contract).
- order_count_distribution: the k=0 bucket exists and equals the
  customers_without_orders count (the LEFT OUTER join keeps the zero tail).
- small_qty_revenue: the integer compare 10*q*c < 2*s equals the float
  0.2*avg predicate on this data (the exactness claim in the docstring).
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


def test_revenue_forecast_brute_force(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_revenue_forecast

    out = _pdf(q_revenue_forecast(SF_SMALL))
    li = pd.read_parquet(
        SF_SMALL + "/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
    )
    m = (
        (li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))
        & np.round(li["l_discount"] * 100).astype(np.int64).between(5, 7)
        & (np.round(li["l_quantity"]).astype(np.int64) < 24)
    )
    sel = li[m]
    assert len(sel) > 0  # the predicate actually selects rows
    rev = int(
        np.round(
            sel["l_extendedprice"].to_numpy() * sel["l_discount"].to_numpy() * 10000
        ).astype(np.int64).sum()
    )
    assert int(out["n"].iloc[0]) == len(sel)
    assert int(out["revenue_s"].iloc[0]) == rev


def test_tpch_wave_force_equal(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import (
        q_disjunctive_revenue,
        q_order_count_distribution,
        q_returned_items,
        q_small_qty_revenue,
    )

    for fn, keys in [
        (q_returned_items, ["c_custkey"]),
        (q_order_count_distribution, ["c_count"]),
        (q_small_qty_revenue, ["n"]),
        (q_disjunctive_revenue, ["arm"]),
    ]:
        a = _norm(_pdf(fn(SF_SMALL, force=None)), keys)
        b = _norm(_pdf(fn(SF_SMALL, force="shuffle")), keys)
        pd.testing.assert_frame_equal(a, b)


def test_order_count_distribution_keeps_zero_bucket(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import (
        q_order_count_distribution,
    )

    import tempfile

    # at sf0.001 every customer has orders, so synthesize a fixture with an
    # orphan tail: 10 customers, only 6 ever order
    with tempfile.TemporaryDirectory() as d:
        cust = pd.DataFrame({"c_custkey": np.arange(1, 11, dtype=np.int64)})
        orders = pd.DataFrame(
            {
                "o_custkey": np.repeat(
                    np.arange(1, 7, dtype=np.int64), [1, 2, 3, 1, 2, 3]
                )
            }
        )
        cust.to_parquet(d + "/customer.parquet")
        orders.to_parquet(d + "/orders.parquet")

        out = _pdf(q_order_count_distribution(d)).set_index("c_count")
        assert int(out.loc[0, "custdist"]) == 4  # customers 7..10
        assert int(out.loc[1, "custdist"]) == 2  # keys 1 and 4
        assert int(out.loc[2, "custdist"]) == 2
        assert int(out.loc[3, "custdist"]) == 2
        assert int(out["custdist"].sum()) == len(cust)

    # and on the real fixture: conservation across buckets
    out = _pdf(q_order_count_distribution(SF_SMALL))
    n_cust = len(
        pd.read_parquet(SF_SMALL + "/customer.parquet", columns=["c_custkey"])
    )
    assert int(out["custdist"].sum()) == n_cust


def test_small_qty_integer_predicate_equals_float(ray_session):
    li = pd.read_parquet(
        SF_SMALL + "/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )
    part = pd.read_parquet(
        SF_SMALL + "/part.parquet", columns=["p_partkey", "p_brand"]
    )
    keys = set(part.loc[part["p_brand"] == "Brand#12", "p_partkey"])
    g = li[li["l_partkey"].isin(keys)]
    q = np.round(g["l_quantity"]).astype(np.int64)
    stats = pd.DataFrame({"l_partkey": g["l_partkey"], "q": q}).groupby(
        "l_partkey"
    )["q"].agg(["sum", "count"])

    j = pd.DataFrame({"l_partkey": li["l_partkey"],
                      "q": np.round(li["l_quantity"]).astype(np.int64)}).merge(
        stats, left_on="l_partkey", right_index=True
    )
    int_mask = 10 * j["q"] * j["count"] < 2 * j["sum"]
    float_mask = j["q"] < 0.2 * (j["sum"] / j["count"])
    assert int_mask.equals(float_mask)
    assert int(int_mask.sum()) > 0


def test_disjunctive_revenue_three_arms(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_disjunctive_revenue

    out = _pdf(q_disjunctive_revenue(SF_SMALL))
    # every arm present maps to its brand
    want = {0: "Brand#12", 1: "Brand#23", 2: "Brand#5"}
    for _, r in out.iterrows():
        assert want[int(r["arm"])] == r["p_brand"]
    assert (out["n"] > 0).all()
