"""Per-group HLL: estimate within the p=12 error envelope of exact."""

import pandas as pd


def test_approx_distinct_by_type(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import (
        q_approx_distinct_by_type,
    )

    sf = "/root/testdata/sf0.01"
    got = q_approx_distinct_by_type(sf).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "user_id"])
    exact = ev.groupby("event_type")["user_id"].nunique()
    assert set(got.index) == set(exact.index)
    for et in exact.index:
        e, a = int(exact[et]), int(got.loc[et, "approx_users"])
        assert abs(a - e) <= max(4, 0.1 * e), (et, a, e)
