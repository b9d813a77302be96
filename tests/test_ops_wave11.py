"""Wave-11 operators: rectilinear map-matching, DTW track join, weighted
SSSP, raster blob labeling, interval coverage, tile pyramid.

Oracle-gated members (interval_coverage, tile_pyramid_rollup,
snap_to_roads, sssp_weighted) are additionally covered by
tools/check_queries.py; here we pin snap_to_roads against a brute
exact-integer argmin, track_dtw_pairs against a scalar DP, sssp's
distributed rounds against its driver fast path, and RasterBlobCount
against a scalar BFS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.conftest import SF_SMALL


class TestSnapToRoads:
    def test_matches_brute_force(self, ray_session):
        import pyarrow.parquet as pq

        from plateau_gis_converter_ray.stages.trajectory import (
            ROAD_USERS,
            _xy,
            build_road_segments,
            snap_to_roads,
        )

        out = snap_to_roads(SF_SMALL).to_pandas()
        assert len(out) > 0

        ev = pq.read_table(
            f"{SF_SMALL}/events.parquet", columns=["event_id", "user_id", "ts"]
        ).to_pandas()
        ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
        seg = build_road_segments(ev[ev["user_id"] < ROAD_USERS])

        pts = ev[(ev["user_id"] >= ROAD_USERS) & (ev["event_id"] % 4 == 0)]
        assert set(out["event_id"]) == set(pts["event_id"])

        got = out.set_index("event_id")
        rng = np.random.default_rng(7)
        sample = rng.choice(pts["event_id"].to_numpy(), size=50, replace=False)
        for eid in sample:
            px, py = _xy(np.array([eid]))
            px, py = int(px[0]), int(py[0])
            best = None
            for _, r in seg.iterrows():
                pm, po = (px, py) if r["axis"] == 0 else (py, px)
                clamp = max(r["lo"] - pm, pm - r["hi"], 0)
                d2 = clamp * clamp + (po - r["c"]) ** 2
                key = (d2, r["sid"])
                if best is None or key < best:
                    best = key
            assert got.loc[eid, "d2"] == best[0], eid
            assert got.loc[eid, "road_seg"] == best[1], eid

    def test_snap_kernel_clamp_cases(self):
        from plateau_gis_converter_ray.stages.trajectory import (
            snap_points_block,
        )

        # one horizontal segment x in [100, 200] at y = 50, one vertical
        # x = 300, y in [0, 100]; probe points hit interior / end / corner
        roads = {
            "sid": np.array([10, 11], dtype=np.int64),
            "axis": np.array([0, 1], dtype=np.int64),
            "lo": np.array([100, 0], dtype=np.int64),
            "hi": np.array([200, 100], dtype=np.int64),
            "c": np.array([50, 300], dtype=np.int64),
        }
        # geocoded points are derived from event_id; craft ids whose
        # geocode lands where we want by probing the formula directly
        from plateau_gis_converter_ray.stages.trajectory import _xy

        eids = np.arange(2000, dtype=np.int64)
        x, y = _xy(eids)
        batch = pa.table({"event_id": pa.array(eids)})
        out = snap_points_block(batch, roads)
        d2 = out.column("d2").to_numpy()
        sid = out.column("road_seg").to_numpy()
        for i in range(0, 2000, 211):
            px, py = int(x[i]), int(y[i])
            cands = []
            for s, ax, lo, hi, c in zip(
                roads["sid"], roads["axis"], roads["lo"], roads["hi"],
                roads["c"],
            ):
                pm, po = (px, py) if ax == 0 else (py, px)
                clamp = max(lo - pm, pm - hi, 0)
                cands.append((clamp * clamp + (po - c) ** 2, s))
            bd, bs = min(cands)
            assert d2[i] == bd and sid[i] == bs


class TestTrackDtwPairs:
    def test_matches_scalar_dp(self, ray_session):
        import pyarrow.parquet as pq

        from plateau_gis_converter_ray.stages.trajectory import (
            DTW_CELL,
            DTW_L,
            _xy,
            dtw_brute,
            track_dtw_pairs,
        )

        out = track_dtw_pairs(SF_SMALL).to_pandas()
        assert len(out) > 0

        # rebuild tracks + candidate pairs independently
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
                    expected[(a, b)] = dtw_brute(tracks[a], tracks[b])
        got = {
            (int(r.user_a), int(r.user_b)): int(r.dtw_d2)
            for r in out.itertuples()
        }
        assert got == expected

    def test_dp_kernel_identity_and_shift(self):
        from plateau_gis_converter_ray.stages.trajectory import (
            DTW_L,
            dtw_brute,
            dtw_pairs_cell,
        )

        # identical tracks -> DTW 0; constant-offset track -> L * d2
        base = np.arange(DTW_L, dtype=np.int64) * 10
        rows = []
        for uid, (dx, dy) in [(1, (0, 0)), (2, (0, 0)), (3, (3, 4))]:
            row = {"user_id": uid}
            for j in range(DTW_L):
                row[f"x{j}"] = int(base[j] + dx)
                row[f"y{j}"] = int(dy)
            rows.append(row)
        g = pd.DataFrame(rows)
        out = dtw_pairs_cell(g).to_pandas()
        got = {
            (int(r.user_a), int(r.user_b)): int(r.dtw_d2)
            for r in out.itertuples()
        }
        assert got[(1, 2)] == 0
        a = np.stack([base, np.zeros(DTW_L, dtype=np.int64)], axis=1)
        b = np.stack([base + 3, np.full(DTW_L, 4, dtype=np.int64)], axis=1)
        assert got[(1, 3)] == dtw_brute(a, b)
        assert got[(2, 3)] == got[(1, 3)]


class TestSsspWeighted:
    def test_distributed_rounds_equal_fast_path(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import (
            q_sssp_weighted,
        )

        fast = q_sssp_weighted(SF_SMALL).to_pandas()
        dist = q_sssp_weighted(SF_SMALL, local_max_edges=0).to_pandas()
        f = fast.sort_values("doc_id").reset_index(drop=True)
        d = dist.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(f, d, check_dtype=False)
        # seeds at 0; some node reached with a positive weighted distance
        assert (f["dist"] == 0).any()
        assert (f["dist"] > 0).any()


class TestRasterBlobCount:
    def test_matches_scalar_bfs(self, ray_session):
        import ray.data

        from plateau_gis_converter_ray.kernels.imagecodec import decode_image
        from plateau_gis_converter_ray.sources.images import (
            ensure_image_table,
        )
        from plateau_gis_converter_ray.stages.decode import (
            RasterBlobCount,
            binary_views,
            blob_count_brute,
        )

        path = ensure_image_table(0.001)
        ds = ray.data.read_parquet(
            path, columns=["image_id", "bytes", "fmt", "w", "h"]
        )
        out = (
            ds.map_batches(
                RasterBlobCount(), batch_format="pyarrow", batch_size=1024
            )
            .to_pandas()
            .set_index("image_id")
        )
        assert (out["n_blobs"] >= 1).any()

        raw = ds.limit(40).to_pandas()
        for _, r in raw.iterrows():
            img = decode_image(
                memoryview(r["bytes"]), r["fmt"], int(r["w"]), int(r["h"])
            )
            nb, fgpx, mb = blob_count_brute(img)
            got = out.loc[r["image_id"]]
            assert int(got["n_blobs"]) == nb, r["image_id"]
            assert int(got["fg_px"]) == fgpx, r["image_id"]
            assert int(got["max_blob"]) == mb, r["image_id"]

    def test_run_sweep_snake(self):
        # a snake-shaped single component must still converge to one label
        from plateau_gis_converter_ray.stages.decode import RasterBlobCount

        h = w = 9
        img = np.zeros((h, w, 3), dtype=np.uint8)
        for r in range(0, h, 2):
            img[r, :, :] = 255
        for r in range(1, h, 2):
            col = w - 1 if (r // 2) % 2 == 0 else 0
            img[r, col, :] = 255
        from plateau_gis_converter_ray.kernels.imagecodec import encode_image

        blob = encode_image(img, "ppm")
        batch = pa.table(
            {
                "image_id": pa.array(["snake"]),
                "bytes": pa.array([blob], pa.binary()),
                "fmt": pa.array(["ppm"]),
                "w": pa.array([w], pa.int64()),
                "h": pa.array([h], pa.int64()),
            }
        )
        out = RasterBlobCount()(batch)
        assert out.column("n_blobs").to_pylist() == [1]
        from plateau_gis_converter_ray.stages.decode import blob_count_brute

        nb, fgpx, mb = blob_count_brute(img)
        assert nb == 1
        assert out.column("fg_px").to_pylist() == [fgpx]
        assert out.column("max_blob").to_pylist() == [mb]


class TestIntervalCoverage:
    def test_single_user_handmade(self):
        # overlap, containment, island breaks; the oracle compare in
        # check_queries covers the full pipeline — this pins the segmented
        # cummax sweep's island detection on a handmade frame
        g = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2],
                "s": [0, 5, 30, 100, 200],
                "e": [10, 20, 40, 150, 210],
                "bk": [1, 1, 1, 2, 2],
            }
        )
        base = g["s"].min()
        s0 = g["s"].to_numpy() - base
        e0 = g["e"].to_numpy() - base
        u = g["user_id"].to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        code = np.cumsum(new_user) - 1
        span = int(e0.max()) + 1
        cm = np.maximum.accumulate(e0 + code * span) - code * span
        prev_cm = np.r_[np.int64(-1), cm[:-1]]
        start = new_user | (s0 > prev_cm)
        assert list(np.cumsum(start)) == [1, 1, 2, 3, 4]


class TestTileDissolveRegions:
    def test_distributed_cc_equals_driver_path(self, ray_session):
        from plateau_gis_converter_ray.pipelines.queries import (
            q_tile_dissolve_regions,
        )

        fast = q_tile_dissolve_regions(SF_SMALL).to_pandas()
        dist = q_tile_dissolve_regions(
            SF_SMALL, local_max_edges=0
        ).to_pandas()
        f = fast.sort_values("tid").reset_index(drop=True)
        d = dist.sort_values("tid").reset_index(drop=True)
        pd.testing.assert_frame_equal(f, d, check_dtype=False)
        # some multi-cell region exists and singletons keep their own id
        sizes = f.groupby("region").size()
        assert (sizes > 1).any()
        singles = sizes[sizes == 1].index
        assert set(singles) <= set(f["tid"])
