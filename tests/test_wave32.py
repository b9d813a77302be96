"""Waves 32-40 pins: discrete-Fréchet / symmetric-Hausdorff track joins
vs scalar max-min / minimax-DP recomputes, chi-square contingency
contributions, user set-Jaccard mask grouping, Mann-Whitney U rank sums,
Theil-Sen median-slope selection, hourly autocorrelation, and the exact
integer Kolmogorov-Smirnov statistic.

All but frechet_pairs are also oracle-gated at three scales by
tools/check_queries.py; frechet_pairs is rows-only (the DP is not
SQL-expressible) so the brute pin here is its exactness authority.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import SF_SMALL


def _to_pandas(res):
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


class TestFrechetPairs:
    def test_matches_scalar_dp(self, ray_session):
        from plateau_gis_converter_ray.stages.trajectory import (
            DTW_CELL,
            DTW_L,
            _xy,
            frechet_brute,
            track_frechet_pairs,
        )

        out = track_frechet_pairs(SF_SMALL).to_pandas()
        assert len(out) > 0

        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_id", "user_id", "ts"]
        ).to_pandas()
        ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
        ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        tracks = {}
        for uid, g in ev.groupby("user_id"):
            if len(g) < DTW_L:
                continue
            eid = g["event_id"].to_numpy()[:DTW_L]
            x, y = _xy(eid)
            tracks[int(uid)] = np.stack([x, y], axis=1)
        expected = {}
        cells = {}
        for uid, t in tracks.items():
            cells.setdefault(
                (t[0, 0] // DTW_CELL, t[0, 1] // DTW_CELL), []
            ).append(uid)
        for members in cells.values():
            members = sorted(members)
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, b = members[i], members[j]
                    expected[(a, b)] = frechet_brute(tracks[a], tracks[b])
        got = {
            (int(r.user_a), int(r.user_b)): int(r.frechet_d2)
            for r in out.itertuples()
        }
        assert got == expected

    def test_kernel_identity_offset_and_leq_dtw(self):
        from plateau_gis_converter_ray.stages.trajectory import (
            DTW_L,
            dtw_pairs_cell,
            frechet_brute,
            frechet_pairs_cell,
        )

        base = np.arange(DTW_L, dtype=np.int64) * 10
        rows = []
        for uid, (dx, dy) in [(1, (0, 0)), (2, (0, 0)), (3, (3, 4))]:
            row = {"user_id": uid}
            for j in range(DTW_L):
                row[f"x{j}"] = int(base[j] + dx)
                row[f"y{j}"] = int(dy)
            rows.append(row)
        g = pd.DataFrame(rows)
        fr = {
            (int(r.user_a), int(r.user_b)): int(r.frechet_d2)
            for r in frechet_pairs_cell(g).to_pandas().itertuples()
        }
        # identical tracks -> 0; constant (3,4) offset -> max single-step
        # cost 25 (the leash never needs to span more than the offset)
        assert fr[(1, 2)] == 0
        assert fr[(1, 3)] == 25
        a = np.stack([base, np.zeros(DTW_L, dtype=np.int64)], axis=1)
        b = np.stack(
            [base + 3, np.full(DTW_L, 4, dtype=np.int64)], axis=1
        )
        assert frechet_brute(a, b) == 25
        # Fréchet (minimax) <= DTW (additive) on every pair
        dt = {
            (int(r.user_a), int(r.user_b)): int(r.dtw_d2)
            for r in dtw_pairs_cell(g).to_pandas().itertuples()
        }
        for k, v in fr.items():
            assert v <= dt[k]


class TestChiSquareCells:
    def test_matches_single_machine(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = (
            _to_pandas(q.q_chi_square_cells(SF_SMALL))
            .sort_values(["event_type", "hr"])
            .reset_index(drop=True)
        )
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "ts"]
        ).to_pandas()
        us = ev["ts"].astype("datetime64[us]").astype(np.int64)
        ev["hr"] = (us // 3_600_000_000) % 24
        key_got = list(zip(got["event_type"], got["hr"].astype(int)))
        base = (
            ev.groupby(["event_type", "hr"], as_index=False)
            .size()
            .rename(columns={"size": "obs"})
        )
        n2 = int(base["obs"].sum())
        base["rt"] = base.groupby("event_type")["obs"].transform("sum")
        base["ct"] = base.groupby("hr")["obs"].transform("sum")
        exp = {}
        for r in base.itertuples():
            dd = float(n2 * r.obs - r.rt * r.ct)
            exp[(r.event_type, int(r.hr))] = (
                (dd * dd)
                / ((float(n2) * float(r.rt)) * float(r.ct)),
                int(r.obs),
            )
        assert len(key_got) == len(exp)
        for k, chi2, o in zip(
            key_got, got["chi2_cell"].to_numpy(), got["obs"].to_numpy()
        ):
            assert exp[k][1] == int(o)
            assert exp[k][0] == float(chi2)  # bit-identical

    def test_contributions_sum_is_chisq_statistic(self, ray_session):
        """Sanity: summing the per-cell contributions reproduces the
        textbook chi-square statistic sum((O-E)^2/E) within float noise."""
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_chi_square_cells(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "ts"]
        ).to_pandas()
        us = ev["ts"].astype("datetime64[us]").astype(np.int64)
        ev["hr"] = (us // 3_600_000_000) % 24
        base = (
            ev.groupby(["event_type", "hr"], as_index=False)
            .size()
            .rename(columns={"size": "obs"})
        )
        n = base["obs"].sum()
        base["rt"] = base.groupby("event_type")["obs"].transform("sum")
        base["ct"] = base.groupby("hr")["obs"].transform("sum")
        e = base["rt"] * base["ct"] / n
        stat = (((base["obs"] - e) ** 2) / e).sum()
        assert np.isclose(got["chi2_cell"].sum(), stat, rtol=1e-9)


class TestUserSetJaccard:
    def test_matches_brute_pairs(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_user_set_jaccard(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet",
            columns=["user_id", "event_type", "value"],
        ).to_pandas()
        vc = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
        hv = ev[vc >= 15000]
        sets = {
            int(u): frozenset(g["event_type"])
            for u, g in hv.groupby("user_id")
        }
        names = sorted({t for s in sets.values() for t in s})
        code = {t: i for i, t in enumerate(names)}
        masks = {}
        for u, s in sets.items():
            m = sum(1 << code[t] for t in s)
            masks[m] = masks.get(m, 0) + 1
        exp = {}
        keys = sorted(masks)
        for i, a in enumerate(keys):
            for b in keys[i:]:
                inter = bin(a & b).count("1")
                uni = bin(a | b).count("1")
                pairs = (
                    masks[a] * (masks[a] - 1) // 2
                    if a == b
                    else masks[a] * masks[b]
                )
                if 2 * inter >= uni and uni > 0 and pairs >= 1:
                    exp[(a, b)] = (inter, uni, pairs)
        got_d = {
            (int(r.mask_a), int(r.mask_b)): (
                int(r.inter),
                int(r.uni),
                int(r.user_pairs),
            )
            for r in got.itertuples()
        }
        assert got_d == exp
        assert len(exp) > 0


class TestMannWhitneyU:
    def test_matches_scipy_style_brute(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_mann_whitney_u(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        vc = np.minimum(
            np.round(ev["value"].to_numpy() * 100).astype(np.int64), 50000
        )
        ev["vb"] = vc
        types = sorted(ev["event_type"].unique())
        exp = {}
        for i, ta in enumerate(types):
            for tb in types[i + 1 :]:
                a = ev.loc[ev["event_type"] == ta, "vb"].to_numpy()
                b = ev.loc[ev["event_type"] == tb, "vb"].to_numpy()
                allv = np.concatenate([a, b])
                order = np.argsort(allv, kind="stable")
                ranks = np.empty(len(allv), dtype=np.float64)
                sv = allv[order]
                # average ranks with ties (1-based)
                r = np.arange(1, len(sv) + 1, dtype=np.float64)
                uniq, start = np.unique(sv, return_index=True)
                end = np.r_[start[1:], len(sv)]
                for s, e in zip(start, end):
                    r[s:e] = (s + 1 + e) / 2.0
                ranks[order] = r
                r_a = ranks[: len(a)].sum()
                u_a = r_a - len(a) * (len(a) + 1) / 2.0
                exp[(ta, tb)] = (len(a), len(b), int(round(2 * u_a)))
        for row in got.itertuples():
            e = exp[(row.type_a, row.type_b)]
            assert (int(row.n_a), int(row.n_b), int(row.u2_a)) == e
        assert len(got) == len(exp) > 0

    def test_u_sums_to_product(self, ray_session):
        """U_a + U_b = n_a * n_b (rank-sum identity) for every pair."""
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_mann_whitney_u(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        vc = np.minimum(
            np.round(ev["value"].to_numpy() * 100).astype(np.int64), 50000
        )
        ev["vb"] = vc
        for row in got.itertuples():
            a = ev.loc[ev["event_type"] == row.type_a, "vb"].to_numpy()
            b = ev.loc[ev["event_type"] == row.type_b, "vb"].to_numpy()
            # recompute 2*U_b symmetrically and check the identity
            allv = np.concatenate([b, a])
            sv = np.sort(allv)
            cum = {}
            vals, cnts = np.unique(sv, return_counts=True)
            before = np.r_[0, np.cumsum(cnts)[:-1]]
            cnt_map = dict(zip(vals, zip(before, cnts)))
            r2b = 0
            bv, bc = np.unique(b, return_counts=True)
            av, ac = np.unique(a, return_counts=True)
            amap = dict(zip(av, ac))
            for v, c in zip(bv, bc):
                cb4, ctot = cnt_map[v]
                r2b += int(c) * (2 * int(cb4) + int(ctot) + 1)
            u2b = r2b - len(b) * (len(b) + 1)
            assert int(row.u2_a) + u2b == 2 * len(a) * len(b)


class TestTheilSenTrend:
    def test_matches_brute_median_selection(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_theil_sen_trend(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "ts"]
        ).to_pandas()
        us = ev["ts"].astype("datetime64[us]").astype(np.int64)
        ev["hr"] = us // 3_600_000_000
        for row in got.itertuples():
            g = (
                ev[ev["event_type"] == row.event_type]
                .groupby("hr")
                .size()
                .sort_index()
            )
            h = g.index.to_numpy().astype(np.int64)
            c = g.to_numpy().astype(np.int64)
            slopes = []
            for i in range(len(h)):
                for j in range(i + 1, len(h)):
                    slopes.append((c[j] - c[i]) / (h[j] - h[i]))
            slopes.sort()
            m = len(slopes)
            assert int(row.n_pairs) == m
            assert float(row.slope_lo) == slopes[(m - 1) // 2]
            assert float(row.slope_hi) == slopes[m // 2]


class TestAcfHourly:
    def test_matches_numpy_float_recompute(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_acf_hourly(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "ts"]
        ).to_pandas()
        us = ev["ts"].astype("datetime64[us]").astype(np.int64)
        ev["hr"] = us // 3_600_000_000
        h0, h1 = int(ev["hr"].min()), int(ev["hr"].max())
        H = h1 - h0 + 1
        for row in got.itertuples():
            g = ev[ev["event_type"] == row.event_type].groupby("hr").size()
            x = np.zeros(H)
            x[g.index.to_numpy() - h0] = g.to_numpy()
            xc = x - x.mean()
            k = int(row.lag)
            want = (xc[:-k] * xc[k:]).sum() / (xc * xc).sum()
            assert int(row.n_hours) == H
            assert np.isclose(float(row.acf), want, rtol=1e-9)
        # lag-1 autocorrelation of an hourly-seasonal series is positive
        assert (got[got["lag"] == 1]["acf"] > -1).all()


class TestHausdorffPairs:
    def test_matches_brute_max_of_mins(self, ray_session):
        from plateau_gis_converter_ray.stages.trajectory import (
            DTW_CELL,
            DTW_L,
            _xy,
            track_hausdorff_pairs,
        )

        out = track_hausdorff_pairs(SF_SMALL).to_pandas()
        assert len(out) > 0
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_id", "user_id", "ts"]
        ).to_pandas()
        ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
        ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        tracks = {}
        for uid, g in ev.groupby("user_id"):
            if len(g) < DTW_L:
                continue
            eid = g["event_id"].to_numpy()[:DTW_L]
            x, y = _xy(eid)
            tracks[int(uid)] = np.stack([x, y], axis=1)
        cells = {}
        for uid, t in tracks.items():
            cells.setdefault(
                (t[0, 0] // DTW_CELL, t[0, 1] // DTW_CELL), []
            ).append(uid)
        expected = {}
        for members in cells.values():
            members = sorted(members)
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, b = tracks[members[i]], tracks[members[j]]
                    d2 = (
                        (a[:, None, :] - b[None, :, :]).astype(np.int64) ** 2
                    ).sum(axis=2)
                    h = max(d2.min(axis=1).max(), d2.min(axis=0).max())
                    expected[(members[i], members[j])] = int(h)
        got = {
            (int(r.user_a), int(r.user_b)): int(r.hausdorff_d2)
            for r in out.itertuples()
        }
        assert got == expected

    def test_hausdorff_leq_frechet(self, ray_session):
        """Hausdorff <= discrete Fréchet on every co-celled pair (the
        Fréchet coupling is one particular correspondence)."""
        from plateau_gis_converter_ray.stages.trajectory import (
            track_frechet_pairs,
            track_hausdorff_pairs,
        )

        h = {
            (int(r.user_a), int(r.user_b)): int(r.hausdorff_d2)
            for r in track_hausdorff_pairs(SF_SMALL)
            .to_pandas()
            .itertuples()
        }
        f = {
            (int(r.user_a), int(r.user_b)): int(r.frechet_d2)
            for r in track_frechet_pairs(SF_SMALL).to_pandas().itertuples()
        }
        assert set(h) == set(f) and len(h) > 0
        for k in h:
            assert h[k] <= f[k]


class TestKsStatistic:
    def test_matches_brute_ecdf(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_ks_statistic(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        ev["vb"] = np.minimum(
            np.round(ev["value"].to_numpy() * 100).astype(np.int64), 50000
        )
        for row in got.itertuples():
            a = np.sort(ev.loc[ev["event_type"] == row.type_a, "vb"])
            b = np.sort(ev.loc[ev["event_type"] == row.type_b, "vb"])
            vals = np.union1d(a, b)
            cca = np.searchsorted(a, vals, side="right")
            ccb = np.searchsorted(b, vals, side="right")
            ks = np.abs(len(b) * cca - len(a) * ccb).max()
            assert (int(row.n_a), int(row.n_b)) == (len(a), len(b))
            assert int(row.ks_num) == int(ks)
            # classic float KS D agrees
            d = ks / (len(a) * len(b))
            ecdf_d = np.abs(cca / len(a) - ccb / len(b)).max()
            assert np.isclose(d, ecdf_d, rtol=1e-12)


class TestWasserstein1d:
    def test_matches_scipy_style_brute(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_wasserstein_1d(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        ev["vb"] = np.minimum(
            np.round(ev["value"].to_numpy() * 100).astype(np.int64), 50000
        )
        assert len(got) > 0
        for row in got.itertuples():
            a = np.sort(ev.loc[ev["event_type"] == row.type_a, "vb"])
            b = np.sort(ev.loc[ev["event_type"] == row.type_b, "vb"])
            # brute: integrate |ECDF_a - ECDF_b| over the value axis
            vals = np.union1d(a, b)
            cca = np.searchsorted(a, vals, side="right")
            ccb = np.searchsorted(b, vals, side="right")
            w1 = int(
                (
                    np.abs(
                        len(b) * cca[:-1].astype(object)
                        - len(a) * ccb[:-1].astype(object)
                    )
                    * np.diff(vals).astype(object)
                ).sum()
            )
            assert int(row.w1_num) == w1
            # float cross-check vs the classic mean-of-quantile-diffs form
            # (valid when n_a == n_b)
            if len(a) == len(b):
                brute = np.abs(a - b).sum() * len(a)
                assert w1 == int(brute)


class TestRunsTest:
    def test_matches_single_machine_sequence(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_runs_test(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet",
            columns=["event_type", "event_id", "ts", "value"],
        ).to_pandas()
        ev["vb"] = np.minimum(
            np.round(ev["value"].to_numpy() * 100).astype(np.int64), 50000
        )
        ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
        assert len(got) == ev["event_type"].nunique()
        for row in got.itertuples():
            g = ev[ev["event_type"] == row.event_type].sort_values(
                ["us", "event_id"], kind="stable"
            )
            v = np.sort(g["vb"].to_numpy())
            med = int(v[(len(v) + 1) // 2 - 1])
            sg = np.sign(g["vb"].to_numpy() - med)
            sg = sg[sg != 0]
            runs = 1 + int((sg[1:] != sg[:-1]).sum())
            assert int(row.runs) == runs
            assert int(row.n_pos) == int((sg > 0).sum())
            assert int(row.n_neg) == int((sg < 0).sum())


class TestStlSeasonal:
    def test_matches_numpy_recompute_and_zero_mean(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_stl_seasonal(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "ts"]
        ).to_pandas()
        us = ev["ts"].astype("datetime64[us]").astype(np.int64)
        ev["hr"] = us // 3_600_000_000
        h0, h1 = int(ev["hr"].min()), int(ev["hr"].max())
        H = h1 - h0 + 1
        for t, gg in ev.groupby("event_type"):
            x = np.zeros(H, dtype=np.int64)
            cnt = gg.groupby("hr").size()
            x[cnt.index.to_numpy() - h0] = cnt.to_numpy()
            sub = got[got["event_type"] == t]
            total = 0
            for row in sub.itertuples():
                hh = int(row.hh)
                want_num, want_n = 0, 0
                for ti in range(12, H - 12):
                    if (ti + h0) % 24 != hh:
                        continue
                    wsum = int(x[ti - 12 : ti + 13].sum())
                    want_num += 25 * int(x[ti]) - wsum
                    want_n += 1
                assert (int(row.seas_num), int(row.n_obs)) == (
                    want_num,
                    want_n,
                )
                total += int(row.seas_num)
            # detrended residuals roughly cancel across the 24 phases:
            # the sum over ALL interior t of (25*x_t - wsum_t) is small
            # relative to 25 * series mass
            assert abs(total) <= 25 * int(x.sum())


class TestLocalMoransI:
    def test_matches_single_machine_and_sums_to_global(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q
        from plateau_gis_converter_ray.stages.geocode import add_lnglat_arith
        from plateau_gis_converter_ray.stages.tiles import assign_webmercator
        import pyarrow as pa

        got = _to_pandas(q.q_local_morans_i(SF_SMALL)).sort_values(
            ["tile_x", "tile_y"]
        )
        ev = pq.read_table(f"{SF_SMALL}/events.parquet", columns=["event_id"])
        t = assign_webmercator(add_lnglat_arith(ev, "event_id"), 10)
        df = t.to_pandas()
        cnt = (
            df.groupby(["tile_x", "tile_y"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        pos = {
            (int(r.tile_x), int(r.tile_y)): int(r.n) for r in cnt.itertuples()
        }
        nt = len(pos)
        s1 = sum(pos.values())
        s2 = sum(v * v for v in pos.values())
        den = nt * nt * s2 - nt * s1 * s1
        exp = {}
        for (x, y), n in pos.items():
            s = d = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == dy == 0:
                        continue
                    v = pos.get((x + dx, y + dy))
                    if v is not None:
                        s += v
                        d += 1
            z = nt * n - s1
            lag = nt * s - d * s1
            exp[(x, y)] = (n, d, z * lag, (float(z * lag) * float(nt)) / float(den))
        assert len(got) == len(exp)
        for r in got.itertuples():
            e = exp[(int(r.tile_x), int(r.tile_y))]
            assert (int(r.n), int(r.deg), int(r.li_num)) == e[:3]
            assert float(r.li) == e[3]
        # LISA decomposition: sum of local Moran's == global I * W
        gm = _to_pandas(q.q_morans_i(SF_SMALL))
        w = int(gm["w_pairs"][0])
        assert np.isclose(
            got["li"].sum(), float(gm["morans_i"][0]) * w, rtol=1e-9
        )


class TestXcfHourly:
    def test_matches_numpy_and_lag0_symmetry(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_xcf_hourly(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "ts"]
        ).to_pandas()
        us = ev["ts"].astype("datetime64[us]").astype(np.int64)
        ev["hr"] = us // 3_600_000_000
        h0, h1 = int(ev["hr"].min()), int(ev["hr"].max())
        H = h1 - h0 + 1
        series = {}
        for t, g in ev.groupby("event_type"):
            x = np.zeros(H)
            cnt = g.groupby("hr").size()
            x[cnt.index.to_numpy() - h0] = cnt.to_numpy()
            series[t] = x - x.mean()
        for row in got.itertuples():
            za, zb = series[row.type_a], series[row.type_b]
            k = int(row.lag)
            want = (za[: H - k] * zb[k:]).sum() / np.sqrt(
                (za * za).sum() * (zb * zb).sum()
            )
            assert np.isclose(float(row.xcf), want, rtol=1e-9)
            assert -1.0001 <= float(row.xcf) <= 1.0001
        # every unordered pair x 4 lags present
        T = ev["event_type"].nunique()
        assert len(got) == T * (T - 1) // 2 * 4


class TestLocationQuotient:
    def test_matches_brute_recompute(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q
        from plateau_gis_converter_ray.stages.geocode import add_lnglat_arith
        from plateau_gis_converter_ray.stages.spatial_join import (
            mesh_assign_arith,
        )

        got = _to_pandas(q.q_location_quotient(SF_SMALL))
        assert len(got) > 0
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_id", "event_type"]
        )
        df = mesh_assign_arith(
            add_lnglat_arith(ev, "event_id")
        ).to_pandas()
        cnt = (
            df.groupby(["mesh_id", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n_mt"})
        )
        n = int(cnt["n_mt"].sum())
        n_m = cnt.groupby("mesh_id")["n_mt"].transform("sum")
        n_t = cnt.groupby("event_type")["n_mt"].transform("sum")
        exp = {
            (r.mesh_id, r.event_type): (
                int(r.n_mt),
                int(r.n_mt) * n,
                int(nm) * int(ntp),
            )
            for r, nm, ntp in zip(cnt.itertuples(), n_m, n_t)
        }
        assert len(got) == len(exp)
        for r in got.itertuples():
            e = exp[(r.mesh_id, r.event_type)]
            assert (int(r.n_mt), int(r.lq_num), int(r.lq_den)) == e
            assert float(r.lq) == float(e[1]) / float(e[2])
        # identity: within each mesh, sum_t n_mt/n_m == 1 exactly ->
        # sum_t lq_num * n_t == n * n_m * ... reduced: sum of the exact
        # fractions (n_t/n)*LQ equals 1; check in Fractions
        from fractions import Fraction

        for mesh, g in got.groupby("mesh_id"):
            # (n_t/n) * LQ_mt reduces to n_mt/n_m, so the type-share
            # weighted mean of LQ within every mesh is exactly 1
            nm = int(g["n_mt"].sum())
            tot = sum(Fraction(int(r.n_mt), nm) for r in g.itertuples())
            assert tot == 1


class TestRipleyKPairs:
    def test_matches_brute_all_pairs(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_ripley_k_pairs(SF_SMALL)).sort_values("r")
        ev = pq.read_table(f"{SF_SMALL}/events.parquet", columns=["event_id"])
        eid = ev.column("event_id").to_numpy()
        x = (eid * 9973) % 240000
        y = (eid * 7919) % 220000
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        d2 = dx * dx + dy * dy
        iu = np.triu_indices(len(eid), k=1)
        d2u = d2[iu]
        for row in got.itertuples():
            r = int(row.r)
            assert int(row.pairs) == int((d2u <= r * r).sum())
            assert int(row.n) == len(eid)
        # monotone in r
        p = got["pairs"].to_numpy()
        assert (np.diff(p) >= 0).all()


class TestTukeyOutliers:
    def test_matches_brute_selection(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_tukey_outliers(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        ev["vb"] = np.minimum(
            np.round(ev["value"].to_numpy() * 100).astype(np.int64), 50000
        )
        assert len(got) == ev["event_type"].nunique()
        for row in got.itertuples():
            v = np.sort(ev.loc[ev["event_type"] == row.event_type, "vb"])
            n = len(v)
            q1 = int(v[max(1, (n + 1) // 4) - 1])
            q3 = int(v[min(n, 3 * (n + 1) // 4) - 1])
            iqr = q3 - q1
            n_low = int((4 * v < 4 * q1 - 6 * iqr).sum())
            n_high = int((4 * v > 4 * q3 + 6 * iqr).sum())
            assert (
                int(row.n), int(row.q1), int(row.q3),
                int(row.n_low), int(row.n_high),
            ) == (n, q1, q3, n_low, n_high)
            assert q1 <= q3


class TestImageIntegralBlocks:
    def test_sat_corner_algebra_matches_direct_sums(self, ray_session):
        import os

        import pyarrow.parquet as pq2

        from plateau_gis_converter_ray.sources.images import (
            ensure_image_table,
        )
        from plateau_gis_converter_ray.stages.decode import (
            ImageIntegralBlocks,
            binary_views,
            decode_group_stack,
        )

        path = ensure_image_table(0.001)
        f = sorted(
            os.path.join(path, x)
            for x in os.listdir(path)
            if x.endswith(".parquet")
        )[0]
        batch = pq2.read_table(
            f, columns=["image_id", "bytes", "fmt", "w", "h"]
        ).slice(0, 64)
        out = ImageIntegralBlocks()(batch).to_pandas()
        blobs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        fmts = batch.column("fmt").to_pylist()
        for i in range(batch.num_rows):
            w, h = int(ws[i]), int(hs[i])
            stack = decode_group_stack(blobs, [i], fmts[i], w, h)
            gray = stack[0].sum(axis=2, dtype=np.int64)
            hm, wm = h // 2, w // 2
            want = (
                int(gray[:hm, :wm].sum()),
                int(gray[:hm, wm:].sum()),
                int(gray[hm:, :wm].sum()),
                int(gray[hm:, wm:].sum()),
                int(gray.sum()),
            )
            r = out.iloc[i]
            assert (
                int(r.q00), int(r.q01), int(r.q10), int(r.q11), int(r.total)
            ) == want
            assert want[0] + want[1] + want[2] + want[3] == want[4]


class TestLexicalDiversity:
    def test_simpson_matches_brute(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_simpson_diversity(SF_SMALL))
        docs = pq.read_table(
            f"{SF_SMALL}/documents.parquet", columns=["lang", "text"]
        ).to_pandas()
        assert len(got) == docs["lang"].nunique()
        for row in got.itertuples():
            toks = []
            for t in docs.loc[docs["lang"] == row.lang, "text"]:
                toks.extend(w for w in t.split(" ") if w)
            from collections import Counter

            c = Counter(toks)
            n = len(toks)
            rep = sum(v * (v - 1) for v in c.values())
            assert (int(row.n_tok), int(row.n_terms), int(row.rep_num)) == (
                n, len(c), rep,
            )
            assert float(row.simpson) == rep / (n * (n - 1))
            assert 0.0 <= float(row.simpson) <= 1.0

    def test_chao1_matches_brute_and_lower_bound(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_chao1_richness(SF_SMALL))
        docs = pq.read_table(
            f"{SF_SMALL}/documents.parquet", columns=["lang", "text"]
        ).to_pandas()
        from collections import Counter

        for row in got.itertuples():
            toks = []
            for t in docs.loc[docs["lang"] == row.lang, "text"]:
                toks.extend(w for w in t.split(" ") if w)
            c = Counter(toks)
            s = len(c)
            f1 = sum(1 for v in c.values() if v == 1)
            f2 = sum(1 for v in c.values() if v == 2)
            assert (int(row.s_obs), int(row.f1), int(row.f2)) == (s, f1, f2)
            want = (2 * s * (f2 + 1) + f1 * (f1 - 1)) / (2 * (f2 + 1))
            assert float(row.chao1) == want
            # Chao1 never estimates fewer species than observed
            assert float(row.chao1) >= s


class TestHhiBenford:
    def test_hhi_matches_brute_and_bounds(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q
        from plateau_gis_converter_ray.stages.geocode import add_lnglat_arith
        from plateau_gis_converter_ray.stages.spatial_join import (
            mesh_assign_arith,
        )

        got = _to_pandas(q.q_hhi_concentration(SF_SMALL))
        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_id", "event_type"]
        )
        df = mesh_assign_arith(add_lnglat_arith(ev, "event_id")).to_pandas()
        cnt = df.groupby(["mesh_id", "event_type"]).size()
        for row in got.itertuples():
            g = cnt[row.mesh_id]
            num = int((g**2).sum())
            nm = int(g.sum())
            assert (int(row.n_m), int(row.n_types), int(row.hhi_num)) == (
                nm, len(g), num,
            )
            assert float(row.hhi) == num / (nm * nm)
            # 1/k <= HHI <= 1
            assert 1.0 / len(g) - 1e-12 <= float(row.hhi) <= 1.0

    def test_benford_matches_string_digits(self, ray_session):
        import plateau_gis_converter_ray.pipelines.queries as q

        got = _to_pandas(q.q_benford_digits(SF_SMALL))
        o = pq.read_table(
            f"{SF_SMALL}/orders.parquet", columns=["o_totalprice"]
        ).to_pandas()
        vc = np.abs(
            np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
        )
        vc = vc[vc > 0]
        digs = np.array([int(str(v)[0]) for v in vc])
        from collections import Counter

        c = Counter(digs.tolist())
        assert len(got) == len(c)
        for row in got.itertuples():
            assert int(row.n) == c[int(row.digit)]
            assert int(row.n_total) == len(vc)
