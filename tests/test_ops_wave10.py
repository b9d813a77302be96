"""Wave-10 operators: vector overlay (segment-intersection join), DBSCAN,
CDC diff, gap-fill resample, JSONL source.

The oracle-gated members (seg_intersect_join, grouped_regression,
snapshot_cdc_diff, ts_ffill_resample, jsonl_source_stats) are additionally
covered by tools/check_queries.py; here we pin the rows-only DBSCAN against
an O(n^2) brute reference and unit-test the overlay kernels on handcrafted
geometry (crossing vs touching vs collinear, cell-boundary dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.conftest import SF_SMALL


def _pairs_from_table(t: pa.Table) -> set[tuple[int, int]]:
    return set(
        zip(t.column("a_seg").to_pylist(), t.column("b_seg").to_pylist())
    )


class TestCellPairsKernel:
    def _run(self, a_rows, b_rows):
        from plateau_gis_converter_ray.stages.overlay import _cell_pairs

        rows = []
        for sid, (x1, y1, x2, y2) in a_rows:
            rows.append((sid, 0, x1, y1, x2, y2))
        for sid, (x1, y1, x2, y2) in b_rows:
            rows.append((sid, 1, x1, y1, x2, y2))
        g = pd.DataFrame(
            rows, columns=["seg_id", "side", "x1", "y1", "x2", "y2"]
        ).astype(np.int64)
        return _pairs_from_table(_cell_pairs(g))

    def test_proper_crossing(self):
        out = self._run(
            [(1, (0, 0, 10, 10))], [(2, (0, 10, 10, 0))]
        )
        assert out == {(1, 2)}

    def test_touching_endpoint_excluded(self):
        # B ends exactly ON A — strict straddle test excludes contact
        out = self._run([(1, (0, 0, 10, 10))], [(2, (5, 5, 20, 0))])
        assert out == set()

    def test_collinear_overlap_excluded(self):
        out = self._run([(1, (0, 0, 10, 0))], [(2, (5, 0, 15, 0))])
        assert out == set()

    def test_disjoint_bbox_pruned(self):
        out = self._run([(1, (0, 0, 10, 10))], [(2, (100, 100, 110, 90))])
        assert out == set()

    def test_same_side_never_paired(self):
        out = self._run(
            [(1, (0, 0, 10, 10)), (3, (0, 10, 10, 0))], []
        )
        assert out == set()


class TestSegIntersectJoin:
    def test_matches_brute_force(self, ray_session):
        """Distributed grid-blocked join == O(n^2) brute straddle test."""
        from plateau_gis_converter_ray.stages.overlay import (
            seg_intersect_join,
        )

        df = seg_intersect_join(SF_SMALL).to_pandas()
        got = set(zip(df["a_seg"].astype(int), df["b_seg"].astype(int)))
        # brute reference straight from the parquet
        import pyarrow.parquet as pq

        ev = (
            pq.read_table(
                SF_SMALL + "/events.parquet",
                columns=["event_id", "user_id", "ts"],
            )
            .to_pandas()
            .sort_values(["user_id", "ts", "event_id"], kind="stable")
        )
        u = ev["user_id"].to_numpy()
        eid = ev["event_id"].to_numpy()
        x = (eid * 9973) % 240000
        y = (eid * 7919) % 220000
        same = u[1:] == u[:-1]
        i = np.nonzero(same)[0]
        keep = (np.abs(x[i + 1] - x[i]) <= 30000) & (
            np.abs(y[i + 1] - y[i]) <= 30000
        )
        i = i[keep]
        segs = pd.DataFrame(
            {
                "seg_id": eid[i],
                "side": u[i] % 2,
                "x1": x[i],
                "y1": y[i],
                "x2": x[i + 1],
                "y2": y[i + 1],
            }
        )
        a = segs[segs["side"] == 0]
        b = segs[segs["side"] == 1]
        expect = set()
        for _, ra in a.iterrows():
            for _, rb in b.iterrows():
                d1 = (rb.x2 - rb.x1) * (ra.y1 - rb.y1) - (rb.y2 - rb.y1) * (
                    ra.x1 - rb.x1
                )
                d2 = (rb.x2 - rb.x1) * (ra.y2 - rb.y1) - (rb.y2 - rb.y1) * (
                    ra.x2 - rb.x1
                )
                d3 = (ra.x2 - ra.x1) * (rb.y1 - ra.y1) - (ra.y2 - ra.y1) * (
                    rb.x1 - ra.x1
                )
                d4 = (ra.x2 - ra.x1) * (rb.y2 - ra.y1) - (ra.y2 - ra.y1) * (
                    rb.x2 - ra.x1
                )
                if ((d1 > 0) != (d2 > 0)) and d1 != 0 and d2 != 0 and (
                    (d3 > 0) != (d4 > 0)
                ) and d3 != 0 and d4 != 0:
                    expect.add((int(ra.seg_id), int(rb.seg_id)))
        assert got == expect and len(expect) > 0


class TestMmrRerank:
    def test_greedy_trace_checks_out(self, ray_session):
        """Re-derive every greedy MMR step from the emitted shortlist."""
        import pyarrow.dataset as pads

        from plateau_gis_converter_ray.pipelines.queries import (
            _read,
            q_mmr_rerank,
        )
        from plateau_gis_converter_ray.stages.knn import quantize

        out = q_mmr_rerank(SF_SMALL)
        assert set(out.columns) == {"qid", "ann_id", "exact_d2", "mmr_rank"}
        cand_ids = np.unique(out["ann_id"].to_numpy())
        cand = (
            _read(
                SF_SMALL, "embeddings", ["vec_id", "embedding"],
                filter=pads.field("vec_id").isin(cand_ids.tolist()),
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        cv = quantize(np.stack(cand["embedding"].to_numpy()))
        cid = cand["vec_id"].to_numpy()
        n_checked = 0
        for qid, g in out.groupby("qid"):
            g = g.sort_values("ann_id").reset_index(drop=True)
            ids = g["ann_id"].to_numpy()
            d2q = g["exact_d2"].to_numpy()
            x = cv[np.searchsorted(cid, ids)]
            dcc = ((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2)
            sel = g[g["mmr_rank"] >= 0].sort_values("mmr_rank")
            assert list(sel["mmr_rank"]) == list(range(len(sel)))
            chosen: list[int] = []
            for _, row in sel.iterrows():
                pos = {int(i): k for k, i in enumerate(ids)}
                scores = {}
                for i in ids:
                    k = pos[int(i)]
                    if int(i) in chosen:
                        continue
                    if not chosen:
                        s = -d2q[k]
                    else:
                        s = -d2q[k] + min(
                            dcc[k, pos[c]] for c in chosen
                        )
                    scores[int(i)] = s
                best_val = max(scores.values())
                best_id = min(i for i, s in scores.items() if s == best_val)
                assert int(row["ann_id"]) == best_id
                chosen.append(best_id)
                n_checked += 1
        assert n_checked > 0


class TestDbscan:
    def test_matches_brute(self, ray_session):
        from plateau_gis_converter_ray.stages.overlay import (
            dbscan_brute,
            dbscan_points,
        )

        res = (
            dbscan_points(SF_SMALL)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        ids = np.arange(1000)
        x = (ids * 9973) % 240000
        y = (ids * 7919) % 220000
        pts = np.stack([x, y], 1).astype(np.int64)
        eps = max(
            200, int(np.sqrt(5.0 * 240000 * 220000 / (np.pi * 1000)))
        )
        lab = dbscan_brute(pts, ids, eps, 4)
        expect = pd.Series(lab).sort_index()
        assert len(res) == 1000
        assert (res["event_id"].to_numpy() == expect.index.to_numpy()).all()
        assert (res["cluster_id"].to_numpy() == expect.to_numpy()).all()
        # the fixture exercises all three point roles
        assert (res["cluster_id"] == -1).any()
        core_like = res[res["cluster_id"] >= 0]
        assert core_like["cluster_id"].nunique() > 10
