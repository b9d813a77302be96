"""Wave 17 pins: k-core peel parity, Gi* stencil, image entropy.

k_core and getis_ord_hotspots are oracle-gated at three scales by
tools/check_queries.py; these pins cover what SQL can't — the distributed
peel path's parity with the driver fast path, fixpoint-within-budget, and
the entropy stage against a per-image recompute.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def image_files():
    from plateau_gis_converter_ray.sources.images import ensure_image_table

    path = ensure_image_table(0.001)
    return [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]


def _to_pandas(res):
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def test_k_core_distributed_equals_fast_path(ray_session):
    import plateau_gis_converter_ray.pipelines.queries as q

    fast = _to_pandas(q.q_k_core(SF_SMALL)).sort_values("part_id")
    q._KCORE_FORCE_DISTRIBUTED = True
    try:
        dist = _to_pandas(q.q_k_core(SF_SMALL)).sort_values("part_id")
    finally:
        q._KCORE_FORCE_DISTRIBUTED = False
    assert (fast["part_id"].to_numpy() == dist["part_id"].to_numpy()).all()
    assert (fast["core_deg"].to_numpy() == dist["core_deg"].to_numpy()).all()


def test_k_core_is_true_core_at_fixpoint(ray_session):
    """Within the 16-round budget the peel reaches fixpoint at the tested
    scales, so the result is the TRUE 3-core: every surviving node has
    core degree >= 3, and a brute-force peel over the raw pair list
    agrees (independent recompute from the lineitem parquet)."""
    import duckdb

    import plateau_gis_converter_ray.pipelines.queries as q

    res = _to_pandas(q.q_k_core(SF_SMALL))
    if len(res):
        assert (res["core_deg"].to_numpy() >= 3).all()

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    )
    e = con.sql(
        """WITH b AS (SELECT DISTINCT l_orderkey ok, l_partkey pk
                      FROM lineitem)
           SELECT a.pk u, c.pk v FROM b a JOIN b c
           ON a.ok = c.ok AND a.pk < c.pk GROUP BY 1, 2
           HAVING COUNT(*) >= 2"""
    ).df()
    s = np.concatenate([e["u"].to_numpy(), e["v"].to_numpy()])
    d = np.concatenate([e["v"].to_numpy(), e["u"].to_numpy()])
    rounds = 0
    while len(s):
        nodes, cnt = np.unique(s, return_counts=True)
        keep = set(nodes[cnt >= 3].tolist())
        m = np.fromiter(
            ((a in keep and b in keep) for a, b in zip(s, d)), bool, len(s)
        )
        if m.all():
            break
        s, d = s[m], d[m]
        rounds += 1
    assert rounds <= 16  # fixpoint within the operator's round budget
    nodes, cnt = (
        np.unique(s, return_counts=True) if len(s)
        else (np.array([], np.int64), np.array([], np.int64))
    )
    got = dict(zip(res["part_id"], res["core_deg"]))
    assert got == dict(zip(nodes.tolist(), cnt.tolist()))


def test_image_entropy_matches_naive(ray_session, image_files):
    import ray.data

    from plateau_gis_converter_ray.kernels.imagecodec import decode_image
    from plateau_gis_converter_ray.stages.decode import ImageEntropy

    ds = ray.data.read_parquet(
        image_files, columns=["image_id", "bytes", "fmt", "w", "h"]
    )
    out = (
        ds.map_batches(ImageEntropy(), batch_format="pyarrow",
                       batch_size=256)
        .to_pandas()
        .set_index("image_id")
    )
    raw = pq.read_table(image_files).to_pylist()
    assert len(out) == len(raw)
    for row in raw[:80]:
        px = decode_image(row["bytes"], row["fmt"], row["w"], row["h"])
        gray = px.sum(axis=2, dtype=np.int64)
        hist = np.bincount(gray.ravel(), minlength=766)
        p = hist / float(gray.size)
        want = float(np.where(hist > 0, -p * np.log(p), 0.0).sum())
        got = out.loc[row["image_id"]]
        assert got["entropy_nats"] == want  # same fixed bin-order reduction
        assert got["n_levels"] == int((hist > 0).sum())
        assert got["n_px"] == gray.size
    # entropy separates the population: not all images flagged one way
    assert 0.0 < out["entropy_nats"].min() < out["entropy_nats"].max()


def test_getis_ord_matches_dense_recompute(ray_session):
    import pyarrow as pa

    import __ray_entry__ as entry
    from plateau_gis_converter_ray.stages.geocode import add_lnglat_arith
    from plateau_gis_converter_ray.stages.tiles import assign_webmercator

    res = _to_pandas(
        entry.queries()["getis_ord_hotspots"](SF_SMALL)
    ).set_index(["tile_x", "tile_y"])
    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["event_id"])
    b = assign_webmercator(
        add_lnglat_arith(pa.Table.from_pandas(ev), "event_id"), 10
    )
    t = (
        pd.DataFrame(
            {"x": b.column("tile_x").to_numpy(),
             "y": b.column("tile_y").to_numpy()}
        )
        .groupby(["x", "y"], as_index=False)
        .size()
    )
    cnt = {(int(r.x), int(r.y)): int(r.size) for r in t.itertuples()}
    x = np.array(list(cnt.values()), np.float64)
    nn = float(len(x))
    xb = x.mean()
    sd = np.sqrt((x * x).mean() - xb * xb)
    assert len(res) == len(cnt)
    for (cx, cy), n in list(cnt.items())[:50]:
        s9 = m = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                v = cnt.get((cx + dx, cy + dy))
                if v is not None:
                    s9 += v
                    m += 1
        want = (s9 - xb * m) / (
            sd * np.sqrt((nn * m - m * m) / (nn - 1.0))
        )
        got = res.loc[(cx, cy)]
        assert got["n"] == n
        assert got["gi_z"] == pytest.approx(want, rel=1e-12)
