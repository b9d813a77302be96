"""Wave-13 mobility operators: dwell detection, OD matrix, coverage-gap
anti-join, hex binning.

All four are oracle-gated (tools/check_queries.py); here we pin structural
invariants a SQL hash-compare cannot express: dwell runs are maximal and
contiguous, OD trips reconcile with the session count, coverage gaps are
the exact complement of the corridor membership on a point sample, and hex
assignment is the true two-lattice Voronoi argmin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import SF_SMALL


def _events() -> pd.DataFrame:
    ev = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    x = (ev["event_id"].to_numpy() * 9973) % 240000
    y = (ev["event_id"].to_numpy() * 7919) % 220000
    ev["cx"] = x // 60000
    ev["cy"] = y // 55000
    return ev.sort_values(["user_id", "us", "event_id"], kind="stable")


class TestDwellSegments:
    def test_runs_maximal_and_counts_reconcile(self, ray_session):
        from plateau_gis_converter_ray.stages.trajectory import dwell_segments

        out = dwell_segments(SF_SMALL).to_pandas()
        assert (out["n_pts"] >= 2).all()
        assert (out["end_us"] >= out["start_us"]).all()

        # scalar recompute of run segmentation per user
        ev = _events()
        total = 0
        for _, g in ev.groupby("user_id"):
            cx = g["cx"].to_numpy()
            cy = g["cy"].to_numpy()
            brk = np.r_[True, (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])]
            run = np.cumsum(brk) - 1
            total += int((np.bincount(run) >= 2).sum())
        assert len(out) == total

    def test_no_adjacent_same_cell_rows(self, ray_session):
        # maximality: two kept runs of the same (user, cell) cannot touch —
        # every kept run is separated in time by at least one other-cell
        # point, so start_us of the next run exceeds end_us of the prior
        from plateau_gis_converter_ray.stages.trajectory import dwell_segments

        out = dwell_segments(SF_SMALL).to_pandas()
        s = out.sort_values(["user_id", "start_us"], kind="stable")
        same_user = s["user_id"].to_numpy()[1:] == s["user_id"].to_numpy()[:-1]
        assert (
            s["start_us"].to_numpy()[1:][same_user]
            > s["end_us"].to_numpy()[:-1][same_user]
        ).all()


class TestOdMatrix:
    def test_trips_equal_sessions(self, ray_session):
        from plateau_gis_converter_ray.stages.trajectory import od_matrix

        out = od_matrix(SF_SMALL).to_pandas()
        ev = _events()
        gap = 30 * 60 * 1_000_000
        n_sessions = 0
        for _, g in ev.groupby("user_id"):
            us = g["us"].to_numpy()
            n_sessions += 1 + int((np.diff(us) > gap).sum())
        assert int(out["n_trips"].sum()) == n_sessions
        assert (out["n_trips"] >= 1).all()


class TestCoverageGap:
    def test_complement_of_corridor_membership(self, ray_session):
        from plateau_gis_converter_ray.stages.trajectory import (
            ROAD_USERS,
            _xy,
            build_road_segments,
            coverage_gap_points,
        )

        out = coverage_gap_points(SF_SMALL).to_pandas().set_index("event_id")
        assert (out["d2"] > 9_000_000).all()

        ev = _events()
        road_ev = ev[ev["user_id"] < ROAD_USERS].rename(
            columns={"us": "ts_us"}
        )
        seg = build_road_segments(road_ev).head(64)
        pts = ev[(ev["user_id"] >= ROAD_USERS) & (ev["event_id"] % 4 == 0)]
        rng = np.random.default_rng(13)
        sample = rng.choice(pts["event_id"].to_numpy(), size=60, replace=False)
        for eid in sample:
            px, py = _xy(np.array([eid], dtype=np.int64))
            px, py = int(px[0]), int(py[0])
            d2min = None
            for _, r in seg.iterrows():
                pm, po = (px, py) if r["axis"] == 0 else (py, px)
                clamp = max(r["lo"] - pm, pm - r["hi"], 0)
                d2 = clamp * clamp + (po - r["c"]) ** 2
                d2min = d2 if d2min is None else min(d2min, d2)
            if d2min > 9_000_000:
                assert out.loc[eid, "d2"] == d2min, eid
            else:
                assert eid not in out.index, eid


class TestHexBin:
    def test_assignment_is_two_lattice_argmin(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import (
            q_hex_bin_counts,
        )

        out = q_hex_bin_counts(SF_SMALL).to_pandas()
        ev = _events()
        assert int(out["n"].sum()) == len(ev)

        # scalar recompute on a sample: nearest of the two staggered
        # lattice centers, tie -> primary lattice
        rng = np.random.default_rng(17)
        sample = rng.choice(ev["event_id"].to_numpy(), size=200, replace=False)
        counts = out.set_index(["hx", "hy"])["n"]
        for eid in sample:
            x = int((eid * 9973) % 240000)
            y = int((eid * 7919) % 220000)
            ca = (((x + 20000) // 40000) * 40000,
                  ((y + 18000) // 36000) * 36000)
            cb = ((x // 40000) * 40000 + 20000,
                  (y // 36000) * 36000 + 18000)
            d2a = (x - ca[0]) ** 2 + (y - ca[1]) ** 2
            d2b = (x - cb[0]) ** 2 + (y - cb[1]) ** 2
            pick = ca if d2a <= d2b else cb
            # the picked center must exist in the output bins
            assert pick in counts.index, (eid, pick)
            # and the hex radius bound holds: no point farther than half
            # the lattice diagonal from its picked center
            assert min(d2a, d2b) <= (20000 ** 2 + 18000 ** 2), eid


class TestAudioVad:
    def test_matches_scalar(self):
        import pyarrow as pa

        from plateau_gis_converter_ray.stages.av import (
            AudioVadSegments,
            fake_pcm_decode,
            synth_av_table,
        )

        t = synth_av_table(48, "audio")
        out = AudioVadSegments()(t).to_pandas().set_index("clip_id")
        views = t.column("payload").to_pylist()
        ns = t.column("n_samples").to_numpy()
        fl, tq = 160, 349_600
        for i in range(0, 48, 7):
            pcm = fake_pcm_decode(views[i], int(ns[i]), 7)
            nw = int(ns[i]) // fl
            act = []
            for k in range(nw):
                e = int((pcm[k * fl:(k + 1) * fl].astype(np.int64) ** 2).sum())
                act.append(e * (1 << 10) >= tq * (1 << 20) * fl)
            segs, cur, longest = 0, 0, 0
            for a in act:
                if a:
                    cur += 1
                    if cur == 1:
                        segs += 1
                    longest = max(longest, cur)
                else:
                    cur = 0
            got = out.loc[i]
            assert got["n_windows"] == nw
            assert got["n_active"] == sum(act)
            assert got["n_segments"] == segs
            assert got["longest_seg"] == longest
        # the threshold must split the population (not all-on / all-off)
        assert 0 < out["n_active"].sum() < out["n_windows"].sum()


class TestVideoSceneCuts:
    def test_matches_scalar(self):
        from plateau_gis_converter_ray.stages.av import (
            VideoSceneCuts,
            fake_frame_decode,
            synth_av_table,
        )

        t = synth_av_table(24, "video")
        out = VideoSceneCuts()(t).to_pandas().set_index("video_id")
        views = t.column("payload").to_pylist()
        ws = t.column("w").to_numpy()
        hs = t.column("h").to_numpy()
        nfs = t.column("n_frames").to_numpy()
        for i in range(0, 24, 5):
            w, h, nf = int(ws[i]), int(hs[i]), int(nfs[i])
            pl = fake_frame_decode(views[i], nf, w, h, 11)
            fs = pl.reshape(nf, -1).sum(axis=1).astype(np.int64)
            full = 255 * w * h
            d = np.abs(np.diff(fs))
            got = out.loc[i]
            assert got["n_cuts"] == int((d * 1000 > 40 * full).sum())
            assert got["max_jump_pm"] == int(d.max()) * 1000 // full
            assert got["mean_luma_c"] == int(fs.sum()) * 100 // (nf * w * h)
