"""auto_join planner: strategy choice + broadcast == shuffle results."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _norm(df, keys):
    return (
        df.sort_values(keys)
        .reset_index(drop=True)
        .reindex(sorted(df.columns), axis=1)
    )


def test_auto_join_broadcast_equals_shuffle(ray_session):
    from plateau_gis_converter_ray.sources.tables import read_table
    from plateau_gis_converter_ray.stages.joins import auto_join

    for how in ("inner", "left_outer"):
        res = {}
        for force in ("broadcast", "shuffle"):
            orders = read_table(SF, "orders", ["o_orderkey", "o_custkey"])
            cust = read_table(SF, "customer", ["c_custkey", "c_mktsegment"])
            res[force] = _norm(
                auto_join(
                    orders, cust, on=("o_custkey",), right_on=("c_custkey",),
                    how=how, force=force,
                ).to_pandas(),
                ["o_orderkey"],
            )
        pd.testing.assert_frame_equal(res["broadcast"], res["shuffle"])


def test_auto_join_left_outer_int_payload(ray_session):
    """Broadcast left_outer must keep integer build columns as nullable
    ints on unmatched rows (not float64 NaN), matching the shuffle plan."""
    import pyarrow as pa
    import ray.data

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, 3], pa.int64()),
                  "payload": pa.array([10, 30], pa.int64())})
    )
    from plateau_gis_converter_ray.stages.joins import auto_join

    res = {}
    for force in ("broadcast", "shuffle"):
        res[force] = _norm(
            auto_join(left, right, on=("k",), right_on=("rk",),
                      how="left_outer", force=force).to_pandas(),
            ["k"],
        )
    a, b = res["broadcast"], res["shuffle"]
    assert a["payload"].isna().sum() == 1 == b["payload"].isna().sum()
    assert list(a["k"]) == list(b["k"])
    assert a["payload"].dropna().astype("int64").tolist() ==         b["payload"].dropna().astype("int64").tolist()
    # the ARROW schema (what downstream operators see) must agree between
    # plans: nullable int64, never a float64 promotion on the broadcast path
    schemas = {}
    for force in ("broadcast", "shuffle"):
        schemas[force] = auto_join(
            left, right, on=("k",), right_on=("rk",),
            how="left_outer", force=force,
        ).schema()
    sa = {f: str(t) for f, t in zip(schemas["broadcast"].names,
                                    schemas["broadcast"].types)}
    sb = {f: str(t) for f, t in zip(schemas["shuffle"].names,
                                    schemas["shuffle"].types)}
    assert sa == sb, (sa, sb)
    assert sa["payload"] == "int64", sa


def test_auto_join_strategy_choice(ray_session):
    from plateau_gis_converter_ray.sources.tables import read_table
    from plateau_gis_converter_ray.stages.joins import _scan_rooted_size

    cust = read_table(SF, "customer", ["c_custkey", "c_mktsegment"])
    # scan-rooted: free metadata size, no execution
    est = _scan_rooted_size(cust)
    assert est is not None and 0 < est < (64 << 20)
    # transformed plan: planner must refuse to measure (returns None)
    mapped = cust.map_batches(lambda b: b, batch_format="pyarrow")
    assert _scan_rooted_size(mapped) is None


def test_auto_join_hint_overrides(ray_session):
    """A size hint above the limit forces the shuffle plan even for a tiny
    scan-rooted side (and the result is still correct)."""
    from plateau_gis_converter_ray.sources.tables import read_table
    from plateau_gis_converter_ray.stages.joins import auto_join

    orders = read_table(SF, "orders", ["o_orderkey", "o_custkey"])
    cust = read_table(SF, "customer", ["c_custkey", "c_mktsegment"])
    out = auto_join(
        orders, cust, on=("o_custkey",), right_on=("c_custkey",),
        right_size_hint=1 << 40,
    ).to_pandas()
    exp = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]).merge(
        pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]),
        left_on="o_custkey", right_on="c_custkey",
    )
    assert len(out) == len(exp)
    assert np.array_equal(
        np.sort(out["o_orderkey"].to_numpy()), np.sort(exp["o_orderkey"].to_numpy())
    )


def test_planner_routed_queries_force_equal(ray_session):
    """nation_revenue / top_orders / customers_without_orders: the planner's
    broadcast plan == the forced shuffle plan, bit-for-bit."""
    from plateau_gis_converter_ray.pipelines.queries import (
        q_customers_without_orders,
        q_nation_revenue,
        q_top_orders,
    )

    for fn, keys in [
        (q_nation_revenue, ["n_name"]),
        (q_top_orders, ["o_orderkey"]),
        (q_customers_without_orders, ["c_custkey"]),
    ]:
        a = _norm(fn(SF, force=None).to_pandas(), keys)
        b = _norm(fn(SF, force="shuffle").to_pandas(), keys)
        pd.testing.assert_frame_equal(a, b)


def test_broadcast_overlapping_nonkey_columns_raise(ray_session):
    """ADVICE r3: overlapping non-key columns would get pandas _x/_y
    suffixes under the broadcast merge and a duplicate-field schema under
    Ray's shuffle join - auto_join fails loudly at planning time instead
    of silently diverging."""
    import pandas as pd
    import pytest
    import ray.data

    from plateau_gis_converter_ray.stages.joins import auto_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    )
    right = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2], "v": [100, 200]})
    )
    with pytest.raises(ValueError, match="share non-key columns"):
        auto_join(left, right, on=("k",), how="inner", right_size_hint=64)


def test_broadcast_semi_oversize_keys_fall_back(ray_session):
    """The semi/anti key-set path enforces the same 4x runtime memory
    budget as the build path."""
    import pandas as pd
    import ray.data

    from plateau_gis_converter_ray.stages.joins import auto_join

    left = ray.data.from_pandas(pd.DataFrame({"k": list(range(50))}))
    right = ray.data.from_pandas(
        pd.DataFrame({"k": [str(i) * 200 for i in range(50)]})
    )
    left_s = left.map_batches(
        lambda b: pd.DataFrame({"k": b["k"].astype(str)}),
        batch_format="pandas",
    )
    # hint says tiny, runtime key set is ~10KB >> 4x limit of 256B ->
    # must fall back to the shuffle semi join and still be correct
    j = auto_join(left_s, right, on=("k",), how="left_semi",
                  right_size_hint=1, broadcast_limit_bytes=64).to_pandas()
    assert len(j) == 0  # no overlap between "7" and "777...7"
