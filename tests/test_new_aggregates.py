"""Round-3 aggregate wave: rollup, salted skew join, pivot, exact quantiles."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_f64_sortkey_total_order():
    from plateau_gis_converter_ray.pipelines.queries import _f64_sortkey

    v = np.array(
        [-1e300, -3.5, -0.0, 0.0, 1e-308, 2.25, 327.53, 1e300], dtype=np.float64
    )
    key = _f64_sortkey(v)
    # strictly ascending except the -0.0/0.0 pair (equal floats, adjacent keys)
    assert np.all(np.diff(key.astype(object)) >= 0)
    shuffled = v[[5, 0, 3, 7, 1, 6, 2, 4]]
    assert np.array_equal(
        shuffled[np.argsort(_f64_sortkey(shuffled), kind="stable")],
        np.sort(shuffled),
    )


def test_exact_quantiles_matches_numpy(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_exact_quantiles

    got = q_exact_quantiles(SF)
    vals = np.sort(
        pd.read_parquet(f"{SF}/events.parquet", columns=["value"])["value"].to_numpy()
    )
    n = len(vals)
    for name, (num, den) in zip(
        ["p25", "p50", "p75", "p95"], [(1, 4), (1, 2), (3, 4), (19, 20)]
    ):
        k = (num * n + den - 1) // den  # ceil(p*n), 1-based
        assert got[name][0] == vals[k - 1], name


def test_salted_join_equals_unsalted(ray_session):
    """The salted plan == plain pandas join+groupby, for several salt counts."""
    from plateau_gis_converter_ray.pipelines.queries import q_salted_join_skew

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "value"])
    cu = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ev["ck"] = np.where(ev.user_id % 5 == 0, 0, ev.user_id % 100)
    ev["value_c"] = np.round(ev.value * 100).astype(np.int64)
    exp = (
        ev.merge(cu, left_on="ck", right_on="c_custkey")
        .groupby("c_nationkey", as_index=False)
        .agg(n=("value_c", "size"), sum_value_c=("value_c", "sum"))
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    for salts in (1, 8):
        got = (
            q_salted_join_skew(SF, salts=salts)
            .to_pandas()[["c_nationkey", "n", "sum_value_c"]]
            .sort_values("c_nationkey")
            .reset_index(drop=True)
            .astype(exp.dtypes.to_dict())
        )
        pd.testing.assert_frame_equal(got, exp)


def test_rollup_grains_consistent(ray_session):
    """Subtotal and grand-total rows equal the sum of their finer grains."""
    from plateau_gis_converter_ray.pipelines.queries import q_rollup_revenue

    df = q_rollup_revenue(SF).to_pandas()
    fine = df[(df.yr != -1)]
    sub = df[(df.yr == -1) & (df.status != "ALL")]
    grand = df[df.status == "ALL"]
    assert len(grand) == 1
    assert grand["n"].iloc[0] == fine["n"].sum()
    assert grand["sum_price_c"].iloc[0] == fine["sum_price_c"].sum()
    per_status = fine.groupby("status")["n"].sum()
    for _, r in sub.iterrows():
        assert r["n"] == per_status[r["status"]]
