"""Wave 15 pins: CMS heavy hitters, pointer-doubling closure, sequence ops.

The oracle gate (tools/check_queries.py) proves SQL equality at three
scales; these pins check the parts the SQL compare can't see — the sketch's
no-false-negative guarantee, the doubling recurrence against a scalar walk,
and the segmented last-touch pointer against a brute-force scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL


def _lehmer_parent(k: int) -> int:
    return ((k % 2147483648) * 48271 % 2147483647) % k


def scalar_depth(k: int) -> int:
    d = 0
    while k != 0:
        k = _lehmer_parent(k)
        d += 1
    return d


def test_cms_estimate_never_underestimates():
    from plateau_gis_converter_ray.stages.cms import (
        cms_estimate,
        merged_sketch_np,
        sketch_partial,
    )

    rng = np.random.RandomState(7)
    keys = rng.randint(0, 500, size=20000).astype(np.int64)
    # build the merged sketch from two "batches" to exercise linearity
    halves = [sketch_partial(keys[:9000]), sketch_partial(keys[9000:])]
    merged = (
        pd.concat([h.to_pandas() for h in halves])
        .groupby("slot", as_index=False)["cnt"]
        .sum()
    )
    sketch = merged_sketch_np(merged)
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(sketch, uniq)
    assert (est >= true).all()  # CMS overestimates, never under
    assert sketch[0].sum() == len(keys)  # each row folds every key once


def test_heavy_hitters_cms_exact(ray_session):
    import __ray_entry__ as entry

    res = entry.queries()["heavy_hitters_cms"](SF_SMALL).to_pandas()
    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["user_id"])
    true = ev.groupby("user_id").size()
    heavy = true[true >= 80]
    assert sorted(res["user_id"]) == sorted(heavy.index)
    got = dict(zip(res["user_id"], res["n"]))
    assert all(got[u] == c for u, c in heavy.items())


def test_bom_explode_matches_scalar_walk(ray_session):
    import __ray_entry__ as entry

    res = entry.queries()["bom_explode"](SF_SMALL).to_pandas()
    assert len(res) == 200
    for k in [0, 1, 2, 7, 63, 100, 199]:
        got = int(res.loc[res["p_partkey"] == k, "depth"].iloc[0])
        assert got == scalar_depth(k), k


def test_attribution_credit_vs_bruteforce(ray_session):
    import __ray_entry__ as entry

    res = entry.queries()["attribution_credit"](SF_SMALL).to_pandas()
    ev = pd.read_parquet(SF_SMALL + "/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="stable"
    )
    rows = []
    for _, g in ev.groupby("user_id"):
        et = g["event_type"].to_numpy(dtype=object)
        vc = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        last = None
        for i in range(len(g)):
            if et[i] == "purchase":
                rows.append((last or "direct", vc[i]))
            if et[i] in ("click", "view"):
                last = et[i]
    brute = (
        pd.DataFrame(rows, columns=["channel", "vc"])
        .groupby("channel")
        .agg(n=("vc", "size"), s=("vc", "sum"))
    )
    got = res.set_index("channel")
    assert sorted(got.index) == sorted(brute.index)
    for ch in brute.index:
        assert got.loc[ch, "n"] == brute.loc[ch, "n"]
        assert got.loc[ch, "sum_value_c"] == brute.loc[ch, "s"]


def test_transition_matrix_row_sums(ray_session):
    import __ray_entry__ as entry

    res = entry.queries()["transition_matrix"](SF_SMALL).to_pandas()
    ev = pd.read_parquet(SF_SMALL + "/events.parquet")
    n_events = len(ev)
    n_users = ev["user_id"].nunique()
    # every event except each user's last contributes exactly one pair
    assert res["n"].sum() == n_events - n_users
    assert (res["n"] > 0).all()


def test_sliding_distinct_is_trailing_union(ray_session):
    import __ray_entry__ as entry

    res = entry.queries()["sliding_distinct_users"](SF_SMALL).to_pandas()
    ev = pd.read_parquet(SF_SMALL + "/events.parquet")
    h = (ev["ts"].astype("int64") // 3_600_000_000).to_numpy()
    uh = pd.DataFrame({"u": ev["user_id"], "h": h}).drop_duplicates()
    by_h = uh.groupby("h")["u"].agg(set)
    got = dict(zip(res["win_end_s"] // 3600, res["n_users"]))
    for wh in list(by_h.index)[:5]:
        want = set()
        for b in (wh, wh - 1, wh - 2):
            want |= by_h.get(b, set())
        assert got[wh] == len(want)
