"""Wave 18 pins: geofence transition semantics, CUSUM two-phase parity,
SSIM stage vs a scalar per-window recompute.

geofence_transitions and cusum_changepoint are oracle-gated at three
scales by tools/check_queries.py; these pins cover the parts SQL can't —
the distributed-prefix construction and the image SSIM math.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL


def _to_pandas(res):
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def test_cusum_matches_single_machine_recompute(ray_session):
    """The bucketed two-phase prefix (per-(type, hour) offsets + in-bucket
    cumsum) must equal a plain single-array recompute of argmax
    |n*cum_k - k*tot| per type with earliest-k ties."""
    import plateau_gis_converter_ray.pipelines.queries as q

    got = _to_pandas(q.q_cusum_changepoint(SF_SMALL)).sort_values(
        "event_type"
    )

    ev = pd.read_parquet(
        SF_SMALL + "/events.parquet",
        columns=["event_id", "event_type", "ts", "value"],
    )
    ev["vc"] = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    ev["us"] = ev["ts"].astype("int64")
    want = []
    for t, g in ev.groupby("event_type"):
        g = g.sort_values(["us", "event_id"], kind="stable")
        vc = g["vc"].to_numpy()
        n, tot = len(vc), int(vc.sum())
        k = np.arange(1, n + 1, dtype=np.int64)
        dev = np.abs(n * np.cumsum(vc) - k * tot)
        i = np.lexsort((k, -dev))[0]
        want.append((t, int(k[i]), int(dev[i])))
    want = pd.DataFrame(want, columns=["event_type", "k", "dev_n"])
    assert got["k"].tolist() == want["k"].tolist()
    assert got["dev_n"].tolist() == want["dev_n"].tolist()


def test_geofence_transitions_conservation(ray_session):
    """Flow conservation on transitions: for every user sequence the
    number of entries into a region differs from exits by at most 1, so
    summed over users |entries(r) - exits(r)| <= n_users. Also: no
    self-transitions by construction."""
    import plateau_gis_converter_ray.pipelines.queries as q

    tr = _to_pandas(q.q_geofence_transitions(SF_SMALL))
    assert (tr["from_region"] != tr["to_region"]).all()
    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["user_id"])
    n_users = ev["user_id"].nunique()
    for r in (1, 2, 3):
        entries = int(tr.loc[tr["to_region"] == r, "n"].sum())
        exits = int(tr.loc[tr["from_region"] == r, "n"].sum())
        assert abs(entries - exits) <= n_users


def test_ssim_stage_vs_scalar_recompute(ray_session):
    """ImageSSIM's vectorized window statistics == a plain per-window
    scalar loop; lossless fmts pin at exactly 1e6 ppm."""
    import pyarrow.parquet as pq

    from plateau_gis_converter_ray.kernels.imagecodec import (
        decode_image,
        synth_pixels,
    )
    from plateau_gis_converter_ray.sources.images import (
        ensure_image_table,
        source_index,
    )
    from plateau_gis_converter_ray.stages.decode import ImageSSIM

    path = ensure_image_table(0.001)
    f = sorted(p for p in os.listdir(path) if p.endswith(".parquet"))[0]
    t = pq.read_table(
        os.path.join(path, f), columns=["image_id", "bytes", "fmt", "w", "h"]
    ).slice(0, 64)
    out = ImageSSIM()(t).to_pandas()

    def scalar_ssim(x, y, win=8):
        h, w = x.shape
        vals = []
        for r in range(h // win):
            for c in range(w // win):
                a = x[r * win : (r + 1) * win, c * win : (c + 1) * win]
                b = y[r * win : (r + 1) * win, c * win : (c + 1) * win]
                mx, my = a.mean(), b.mean()
                vx, vy = a.var(), b.var()
                cov = (a * b).mean() - mx * my
                c1, c2 = (0.01 * 255.0) ** 2, (0.03 * 255.0) ** 2
                vals.append(
                    ((2 * mx * my + c1) * (2 * cov + c2))
                    / ((mx * mx + my * my + c1) * (vx + vy + c2))
                )
        return float(np.mean(vals))

    df = t.to_pandas()
    for i in range(0, len(df), 11):
        row = df.iloc[i]
        dec = decode_image(
            row["bytes"], row["fmt"], int(row["w"]), int(row["h"])
        )
        src = int(source_index(int(row["image_id"][4:])))
        ref = synth_pixels(src, int(row["w"]), int(row["h"]))
        gx = dec.sum(axis=2, dtype=np.int64) / 3.0
        gy = ref.sum(axis=2, dtype=np.int64) / 3.0
        want = int(np.round(scalar_ssim(gx, gy) * 1e6))
        got = int(out.iloc[i]["ssim_ppm"])
        assert abs(got - want) <= 1  # float assoc. differs; ppm-rounded

    lossless = out[out["fmt"].isin(["raw", "ppm", "rle"])]
    assert len(lossless) and (lossless["ssim_ppm"] == 1_000_000).all()
    lossy = out[~out["fmt"].isin(["raw", "ppm", "rle"])]
    if len(lossy):
        assert (lossy["ssim_ppm"] < 1_000_000).all()
        assert (lossy["ssim_ppm"] > 500_000).all()


def test_image_ssim_query_rows(ray_session):
    import __ray_entry__ as entry

    res = _to_pandas(entry.queries()["image_ssim"](SF_SMALL))
    assert set(res.columns) == {"fmt", "n", "n_perfect", "ppm_sum", "ppm_min"}
    assert res["n"].sum() > 0
    loss = res[res["fmt"].isin(["raw", "ppm", "rle"])]
    assert (loss["n_perfect"] == loss["n"]).all()


def test_polygon_rasterize_vs_dense_brute(ray_session):
    """The bbox-windowed burn == a dense global-grid brute recompute
    (counts AND bboxes), holes excluded correctly for the enclave polys."""
    import plateau_gis_converter_ray.pipelines.queries as q
    from plateau_gis_converter_ray.kernels.pip import points_in_polygon
    from plateau_gis_converter_ray.sources.municipalities import (
        EAST,
        NORTH,
        SOUTH,
        WEST,
        municipality_polygons,
    )

    got = (
        _to_pandas(q.q_polygon_rasterize(SF_SMALL))
        .sort_values("pid")
        .reset_index(drop=True)
    )
    CELL = 0.05
    # pad 64 cells (3.2 deg) past the Japan bbox: polygons near the edge
    # overhang it (max radius ~2.5 deg) and the burn is bbox-windowed,
    # not clipped to the bbox
    PAD = 64
    nx = int(round((EAST - WEST) / CELL))
    ny = int(round((NORTH - SOUTH) / CELL))
    gx, gy = np.meshgrid(
        np.arange(-PAD, nx + PAD, dtype=np.int64),
        np.arange(-PAD, ny + PAD, dtype=np.int64),
        indexing="ij",
    )
    cx = WEST + (gx.ravel() + 0.5) * CELL
    cy = SOUTH + (gy.ravel() + 0.5) * CELL
    polys = municipality_polygons()
    holed = 0
    for pid, p in enumerate(polys):
        inside = points_in_polygon(cx, cy, p["rings"])
        n = int(inside.sum())
        row = got[got["pid"] == pid]
        if n == 0:
            assert len(row) == 0  # fully off-grid or sub-cell: no burn
            continue
        assert int(row["n_cells"].iloc[0]) == n
        assert int(row["ix_min"].iloc[0]) == int(gx.ravel()[inside].min())
        assert int(row["ix_max"].iloc[0]) == int(gx.ravel()[inside].max())
        assert int(row["iy_min"].iloc[0]) == int(gy.ravel()[inside].min())
        assert int(row["iy_max"].iloc[0]) == int(gy.ravel()[inside].max())
        if len(p["rings"]) > 1:
            # the hole genuinely removes cells vs outer-ring-only
            outer_only = int(points_in_polygon(cx, cy, p["rings"][:1]).sum())
            assert n < outer_only
            holed += 1
    assert holed >= 1


def test_contour_segments_vs_scalar(ray_session):
    """ContourSegments' vectorized case table == a scalar per-2x2-cell
    marching-squares walk, including the saddle convention."""
    import pyarrow.parquet as pq

    from plateau_gis_converter_ray.kernels.imagecodec import decode_image
    from plateau_gis_converter_ray.sources.images import ensure_image_table
    from plateau_gis_converter_ray.stages.raster_ops import ContourSegments

    path = ensure_image_table(0.001)
    f = sorted(p for p in os.listdir(path) if p.endswith(".parquet"))[0]
    t = pq.read_table(
        os.path.join(path, f), columns=["image_id", "bytes", "fmt", "w", "h"]
    ).slice(0, 24)
    out = ContourSegments()(t).to_pandas()
    df = t.to_pandas()

    DIAG = [0, 1, 1, 0, 1, 2, 0, 1, 1, 0, 2, 1, 0, 1, 1, 0]
    STR = [0, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0]
    for i in range(0, len(df), 7):
        row = df.iloc[i]
        dem = decode_image(
            row["bytes"], row["fmt"], int(row["w"]), int(row["h"])
        )[..., 0]
        g = dem > 128
        nd = ns = nb = 0
        for y in range(dem.shape[0] - 1):
            for x in range(dem.shape[1] - 1):
                c = (
                    int(g[y, x])
                    + 2 * int(g[y, x + 1])
                    + 4 * int(g[y + 1, x + 1])
                    + 8 * int(g[y + 1, x])
                )
                nd += DIAG[c]
                ns += STR[c]
                nb += int(c not in (0, 15))
        assert int(out.iloc[i]["n_diag"]) == nd
        assert int(out.iloc[i]["n_straight"]) == ns
        assert int(out.iloc[i]["n_boundary"]) == nb
    # contours exist somewhere in the sample
    assert out["n_boundary"].sum() > 0


def test_hmm_map_match_vs_scalar_viterbi(ray_session):
    """The batch-wide integer Viterbi == a scalar per-track DP with the
    same candidate sets, tie-breaks included; and the HMM path cost never
    beats per-point independent snapping on emissions alone."""
    import plateau_gis_converter_ray.pipelines.queries as q
    from plateau_gis_converter_ray.stages.trajectory import (
        HMM_C,
        HMM_L,
        HMM_TRANS_DIV,
        ROAD_USERS,
        _hmm_candidates,
        _xy,
        build_road_segments,
    )

    got = (
        _to_pandas(q.q_hmm_map_match(SF_SMALL))
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0

    ev = pd.read_parquet(
        SF_SMALL + "/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    ev["ts_us"] = ev["ts"].astype("int64")
    roads_df = build_road_segments(ev[ev["user_id"] < ROAD_USERS])
    roads = {k: roads_df[k].to_numpy() for k in
             ("sid", "axis", "lo", "hi", "c")}

    pts = ev[ev["user_id"] >= ROAD_USERS].sort_values(
        ["user_id", "ts_us", "event_id"], kind="stable"
    )
    checked = 0
    for uid, g in pts.groupby("user_id"):
        if len(g) < HMM_L or checked >= 6:
            continue
        eid = g["event_id"].to_numpy()[:HMM_L]
        x, y = _xy(eid)
        # scalar Viterbi
        cands = [
            _hmm_candidates(x[t : t + 1], y[t : t + 1], roads)
            for t in range(HMM_L)
        ]
        cost = list(cands[0][1][0])
        back = [[0] * HMM_C for _ in range(HMM_L)]
        for t in range(1, HMM_L):
            newc = []
            for j in range(HMM_C):
                best, bi = None, 0
                for i in range(HMM_C):
                    dmx = int(cands[t - 1][2][0][i]) - int(cands[t][2][0][j])
                    dmy = int(cands[t - 1][3][0][i]) - int(cands[t][3][0][j])
                    tr = (dmx * dmx + dmy * dmy) // HMM_TRANS_DIV
                    v = cost[i] + tr
                    if best is None or v < best:
                        best, bi = v, i
                newc.append(best + int(cands[t][1][0][j]))
                back[t][j] = bi
            cost = newc
        end = int(np.argmin(cost))
        total = cost[end]
        s = end
        path = [0] * HMM_L
        for t in range(HMM_L - 1, -1, -1):
            path[t] = int(cands[t][0][0][s])
            s = back[t][s]
        row = got[got["user_id"] == uid].iloc[0]
        assert int(row["path_cost"]) == int(total)
        assert int(row["end_seg"]) == path[-1]
        assert int(row["n_distinct_segs"]) == len(set(path))
        # sanity: HMM cost >= sum of best emissions (transitions >= 0)
        emis_min = sum(int(cands[t][1][0].min()) for t in range(HMM_L))
        assert int(row["path_cost"]) >= emis_min
        checked += 1
    assert checked >= 3


def test_poly_overlap_area_vs_fraction_exact_and_grid(ray_session):
    """clip_intersection_area float areas == a Fraction-exact signed
    fan-triangle overlay recompute (to float tolerance) — the general
    algorithm, correct for the ~10/48 CONCAVE jittered-octagon rings
    (r4 ADVICE) — and each pair area agrees with a dense PIP-grid
    estimate within grid resolution."""
    from fractions import Fraction

    import plateau_gis_converter_ray.pipelines.queries as q
    from plateau_gis_converter_ray.kernels.pip import points_in_polygon
    from plateau_gis_converter_ray.sources.municipalities import (
        municipality_polygons,
    )

    got = _to_pandas(q.q_poly_overlap_area(SF_SMALL))
    assert len(got) > 0
    polys = municipality_polygons()

    def frac_clip(subject, clip):
        out = [(Fraction(float(x)), Fraction(float(y))) for x, y in subject]
        k = len(clip)
        for i in range(k):
            if not out:
                return []
            ax, ay = Fraction(float(clip[i][0])), Fraction(float(clip[i][1]))
            bx, by = (
                Fraction(float(clip[(i + 1) % k][0])),
                Fraction(float(clip[(i + 1) % k][1])),
            )
            ex, ey = bx - ax, by - ay
            side = [ex * (p[1] - ay) - ey * (p[0] - ax) for p in out]
            pts = []
            for j in range(len(out)):
                p, qq = out[j], out[(j + 1) % len(out)]
                s0, s1 = side[j], side[(j + 1) % len(out)]
                if s0 >= 0:
                    pts.append(p)
                if (s0 >= 0) != (s1 >= 0):
                    t = s0 / (s0 - s1)
                    pts.append(
                        (p[0] + t * (qq[0] - p[0]), p[1] + t * (qq[1] - p[1]))
                    )
            out = pts
        return out

    def frac_area(ring):
        if len(ring) < 3:
            return Fraction(0)
        s = Fraction(0)
        for i in range(len(ring)):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % len(ring)]
            s += x0 * y1 - x1 * y0
        return abs(s) / 2

    def frac_isect(subject, clip):
        """Fraction-exact signed fan-triangle overlay (general simple
        clip ring; each fan triangle is convex so frac_clip is exact)."""
        if len(subject) < 3 or len(clip) < 3:
            return Fraction(0)
        v0 = (Fraction(float(clip[0][0])), Fraction(float(clip[0][1])))
        total = Fraction(0)
        for i in range(1, len(clip) - 1):
            a = (Fraction(float(clip[i][0])), Fraction(float(clip[i][1])))
            b = (
                Fraction(float(clip[i + 1][0])),
                Fraction(float(clip[i + 1][1])),
            )
            cross = (a[0] - v0[0]) * (b[1] - v0[1]) - (a[1] - v0[1]) * (
                b[0] - v0[0]
            )
            if cross == 0:
                continue
            tri = [v0, a, b] if cross > 0 else [v0, b, a]
            part = frac_area(frac_clip(subject, tri))
            total += part if cross > 0 else -part
        return abs(total)

    checked = 0
    for row in got.itertuples():
        if checked >= 8:
            break
        ra = polys[int(row.pid_a)]["rings"]
        rb = polys[int(row.pid_b)]["rings"]
        want = frac_isect(ra[0], rb[0])
        if len(ra) > 1:
            want -= frac_isect(ra[1], rb[0])
        if len(rb) > 1:
            want -= frac_isect(ra[0], rb[1])
        if len(ra) > 1 and len(rb) > 1:
            want += frac_isect(ra[1], rb[1])
        assert abs(float(row.area) - float(want)) < 1e-9 * max(
            1.0, float(want)
        )
        # independent grid sanity: PIP-in-both cell count x cell area
        cell = 0.01
        x0 = min(ra[0][:, 0].min(), rb[0][:, 0].min()) - cell
        x1 = max(ra[0][:, 0].max(), rb[0][:, 0].max()) + cell
        y0 = min(ra[0][:, 1].min(), rb[0][:, 1].min()) - cell
        y1 = max(ra[0][:, 1].max(), rb[0][:, 1].max()) + cell
        gx, gy = np.meshgrid(
            np.arange(x0, x1, cell), np.arange(y0, y1, cell), indexing="ij"
        )
        inside = points_in_polygon(
            gx.ravel() + cell / 2, gy.ravel() + cell / 2, ra
        ) & points_in_polygon(gx.ravel() + cell / 2, gy.ravel() + cell / 2, rb)
        est = inside.sum() * cell * cell
        assert abs(est - float(row.area)) < 0.15 * max(0.02, float(row.area))
        checked += 1
    assert checked >= 3


def test_areal_interpolation_scalar_recompute(ray_session):
    """Weights in (0, 1]; per-mesh weight sums <= 1 + overlap slack is NOT
    guaranteed (municipalities overlap), but each (pid, mesh) weight must
    equal the scalar clip recompute, and a municipality's interpolated
    count must equal the scalar dot product of its weights with the exact
    per-mesh counts."""
    import duckdb

    import plateau_gis_converter_ray.pipelines.queries as q
    from plateau_gis_converter_ray.kernels.clip import clip_intersection_area
    from plateau_gis_converter_ray.sources.municipalities import (
        EAST,
        NORTH,
        SOUTH,
        WEST,
        municipality_polygons,
    )

    got = _to_pandas(q.q_areal_interpolation(SF_SMALL))
    assert len(got) > 0
    assert (got["interp_count"] >= 0).all()
    assert (got["n_cells"] >= 1).all()

    # exact per-mesh counts via the registered oracle arithmetic
    con = duckdb.connect()
    lng, lat = q._geo_sql("event_id")
    counts = con.sql(f"""
      WITH pts AS (SELECT {lng} AS lng, {lat} AS lat
                   FROM read_parquet('{SF_SMALL}/events.parquet'))
      SELECT 'mesh_' ||
        CAST(LEAST(CAST(FLOOR((lng - 122.0) / 24.0 * 24) AS BIGINT), 23)
          AS VARCHAR) || '_' ||
        CAST(LEAST(CAST(FLOOR((lat - 24.0) / 22.0 * 22) AS BIGINT), 21)
          AS VARCHAR) AS mesh_id, COUNT(*) AS n
      FROM pts GROUP BY 1
    """).df()
    cmap = dict(zip(counts["mesh_id"], counts["n"]))

    polys = municipality_polygons()
    dx, dy = (EAST - WEST) / 24, (NORTH - SOUTH) / 22
    for pid in [0, 3, 7, 11]:
        rings = polys[pid]["rings"]
        outer = rings[0]
        want = 0.0
        ncells = 0
        ix0 = max(0, int(np.floor((outer[:, 0].min() - WEST) / dx)))
        ix1 = min(23, int(np.floor((outer[:, 0].max() - WEST) / dx)))
        iy0 = max(0, int(np.floor((outer[:, 1].min() - SOUTH) / dy)))
        iy1 = min(21, int(np.floor((outer[:, 1].max() - SOUTH) / dy)))
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                w0, s0 = WEST + ix * dx, SOUTH + iy * dy
                rect = np.array([[w0, s0], [w0 + dx, s0],
                                 [w0 + dx, s0 + dy], [w0, s0 + dy]])
                a = clip_intersection_area(rect, outer)
                if len(rings) > 1:
                    a -= clip_intersection_area(rect, rings[1])
                if a > 1e-12:
                    # fan-triangle float sums overshoot a fully-contained
                    # cell by O(1e-12) relative; 1e-9 slack absorbs it
                    assert 0.0 < a / (dx * dy) <= 1.0 + 1e-9
                    mid = f"mesh_{ix}_{iy}"
                    if mid in cmap:
                        want += cmap[mid] * (a / (dx * dy))
                        ncells += 1
        row = got[got["pid"] == pid]
        if ncells == 0:
            continue
        assert len(row) == 1
        assert abs(float(row["interp_count"].iloc[0]) - want) < 1e-6 * max(
            1.0, want
        )


def test_polygon_compactness_scalar(ray_session):
    """Metrics == scalar recompute; compactness in (0, 1] for simple
    polygons (without holes), lower when a hole adds perimeter."""
    import plateau_gis_converter_ray.pipelines.queries as q
    from plateau_gis_converter_ray.sources.municipalities import (
        municipality_polygons,
    )

    got = (
        _to_pandas(q.q_polygon_compactness(SF_SMALL))
        .sort_values("pid")
        .reset_index(drop=True)
    )
    polys = municipality_polygons()
    assert len(got) == len(polys)
    for pid in [0, 3, 5, 11, 19]:
        rings = polys[pid]["rings"]
        area = 0.0
        per = 0.0
        for ri, r in enumerate(rings):
            x, y = r[:, 0], r[:, 1]
            a = 0.5 * abs(
                float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            )
            area += a if ri == 0 else -a
            per += float(
                np.sqrt(((r - np.roll(r, -1, axis=0)) ** 2).sum(axis=1)).sum()
            )
        row = got.iloc[pid]
        assert abs(float(row["area"]) - area) < 1e-9 * max(1.0, area)
        assert abs(float(row["perimeter"]) - per) < 1e-9 * max(1.0, per)
        assert int(row["n_vertices"]) == sum(len(r) for r in rings)
    simple = got[got["n_vertices"] == 8]
    assert ((simple["polsby_popper"] > 0) & (simple["polsby_popper"] <= 1.0)).all()
    holed = got[got["n_vertices"] > 8]
    assert len(holed) >= 1
    assert holed["polsby_popper"].max() < simple["polsby_popper"].max()


def test_ann_recall_eval_matches_local_truth(ray_session):
    """The distributed exact side == the local _exact_topk recompute;
    recall bounds hold (self-hit guarantees n_hit >= 1; mean >= 0.4 as
    the pq recall pin)."""
    import plateau_gis_converter_ray.pipelines.queries as q
    from plateau_gis_converter_ray.stages.knn import quantize

    got = _to_pandas(q.q_ann_recall_eval(SF_SMALL)).sort_values("qid")
    assert len(got) == 8
    assert (got["n_hit"] >= 1).all()          # self-hit always recalled
    assert got["n_hit"].mean() >= 4.0         # recall@10 mean >= 0.4
    assert (got["recall_pct"] == got["n_hit"] * 10).all()

    emb = pd.read_parquet(
        SF_SMALL + "/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_values("vec_id").reset_index(drop=True)
    v = quantize(np.stack(emb["embedding"].to_numpy()))
    vid = emb["vec_id"].to_numpy()
    qv = v[:8]
    d2 = (v * v).sum(1)[None, :] - 2 * (qv @ v.T) + (qv * qv).sum(1)[:, None]
    from plateau_gis_converter_ray.stages.ann_index import (
        ivfpq_index_build,
        ivfpq_search_cached,
    )

    res = ivfpq_index_build(SF_SMALL)
    ann = ivfpq_search_cached(
        res["index_dir"],
        {"qid": vid[:8], "vecs": np.stack(emb["embedding"].to_numpy()[:8])},
        topk=10, nprobe=4,
    )
    ann_df = ann.to_pandas() if hasattr(ann, "to_pandas") else ann
    for i in range(8):
        order = np.lexsort((vid, d2[i]))[:10]
        truth = set(vid[order].tolist())
        hits = len(
            truth
            & set(ann_df.loc[ann_df["qid"] == vid[i], "ann_id"].tolist())
        )
        row = got[got["qid"] == vid[i]]
        assert int(row["n_hit"].iloc[0]) == hits


def test_nearest_neighbor_dist_tail_path_equals_ring(ray_session):
    """Shrinking the grid cell (cell_scale=0.3) forces most sample points
    through the broadcast brute TAIL; the result must be identical to the
    default ring-dominant path (both exact)."""
    from plateau_gis_converter_ray.stages.knn import nearest_neighbor_dist

    a = (
        _to_pandas(nearest_neighbor_dist(SF_SMALL))
        .sort_values("event_id").reset_index(drop=True)
    )
    b = (
        _to_pandas(nearest_neighbor_dist(SF_SMALL, cell_scale=0.3))
        .sort_values("event_id").reset_index(drop=True)
    )
    assert a["event_id"].tolist() == b["event_id"].tolist()
    assert a["nn_id"].tolist() == b["nn_id"].tolist()
    assert a["d2"].tolist() == b["d2"].tolist()
    assert (a["d2"] > 0).all()


def test_kmv_estimates_within_bound(ray_session):
    """KMV distinct/Jaccard estimates vs exact n-gram sets: relative
    error within the ~3/sqrt(k) bound (k=256 -> ~19%, assert 25%);
    below-k sketches are EXACT."""
    import duckdb

    import plateau_gis_converter_ray.pipelines.queries as q
    from plateau_gis_converter_ray.kernels.text import char_ngram_hashes
    from plateau_gis_converter_ray.stages.sketch import (
        kmv_distinct_estimate,
        kmv_merge,
        kmv_partial_batch,
    )

    got = _to_pandas(q.q_kmv_source_overlap(SF_SMALL))
    assert len(got) > 0

    docs = pd.read_parquet(
        SF_SMALL + "/documents.parquet", columns=["source", "text"]
    )
    exact = {
        s: set(
            np.concatenate(
                [np.unique(char_ngram_hashes(t, 8)) for t in g["text"]]
            ).tolist()
        )
        for s, g in docs.groupby("source")
    }
    checked = 0
    for row in got.itertuples():
        if checked >= 12:
            break
        ea, eb = exact[row.source_a], exact[row.source_b]
        for est, true in (
            (row.d_est_a, len(ea)),
            (row.d_est_b, len(eb)),
        ):
            assert abs(est - true) <= 0.25 * true + 2
        true_j = len(ea & eb) / len(ea | eb)
        assert abs(row.jaccard_est - true_j) <= 0.12
        assert abs(row.intersect_est - len(ea & eb)) <= (
            0.25 * len(ea | eb) + 4
        )
        checked += 1
    assert checked >= 6

    # below-k exactness: a tiny synthetic corpus (< 256 distinct grams)
    sk = kmv_merge(kmv_partial_batch(["abcdefghij"], n=8))
    assert kmv_distinct_estimate(sk) == len(sk) == 3


def test_knn_dist_k4_tail_path_equals_ring(ray_session):
    """Shrinking the cell forces the brute tail for the top-4 variant;
    results must be identical (both exact), and rank-1 rows must equal
    nearest_neighbor_dist's output."""
    from plateau_gis_converter_ray.stages.knn import (
        knn_dist_topk,
        nearest_neighbor_dist,
    )

    a = (
        _to_pandas(knn_dist_topk(SF_SMALL, k=4))
        .sort_values(["event_id", "rank"]).reset_index(drop=True)
    )
    b = (
        _to_pandas(knn_dist_topk(SF_SMALL, k=4, cell_scale=0.3))
        .sort_values(["event_id", "rank"]).reset_index(drop=True)
    )
    for c in ("event_id", "rank", "nn_id", "d2"):
        assert a[c].tolist() == b[c].tolist()
    nn1 = (
        _to_pandas(nearest_neighbor_dist(SF_SMALL))
        .sort_values("event_id").reset_index(drop=True)
    )
    r1 = a[a["rank"] == 1].sort_values("event_id").reset_index(drop=True)
    assert r1["nn_id"].tolist() == nn1["nn_id"].tolist()
    assert r1["d2"].tolist() == nn1["d2"].tolist()
    # k-distance is monotone in rank per point
    assert (a.groupby("event_id")["d2"].diff().dropna() >= 0).all()


def test_lof_vs_brute_full_matrix(ray_session):
    """LOF (squared-distance variant) == a brute full-distance-matrix
    recompute for every sampled point; scores near 1 for uniform-density
    points by construction of the variant."""
    import plateau_gis_converter_ray.pipelines.queries as q

    got = (
        _to_pandas(q.q_lof_outliers(SF_SMALL))
        .sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) > 0

    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["event_id"])
    eid = np.sort(ev["event_id"].to_numpy())
    x = (eid * 9973) % 240000
    y = (eid * 7919) % 220000
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    K = 4
    order = np.lexsort((np.broadcast_to(eid, d2.shape), d2), axis=1)[:, :K]
    kdist = np.take_along_axis(d2, order, axis=1)[:, -1]
    idx_of = {int(e): i for i, e in enumerate(eid)}

    def reach_sum(i):
        nb = order[i]
        return int(np.maximum(d2[i, nb], kdist[nb]).sum()), K

    def lrd(i):
        s, m = reach_sum(i)
        return m / s

    for row in got.itertuples():
        i = idx_of[int(row.event_id)]
        assert int(row.kdist2) == int(kdist[i])
        want = float(np.mean([lrd(j) for j in order[i]]) / lrd(i))
        assert abs(float(row.lof) - want) < 1e-9 * max(1.0, want)
    assert got["lof"].median() < 3.0  # uniform-ish density -> LOF ~ 1


def test_cusum_overflow_guard_trips(ray_session, tmp_path):
    """2*n*sum(|vc|) >= 2^63 must raise OverflowError BEFORE any int64
    product wraps (r4 ADVICE): the dev statistic wouldn't fit the
    declared BIGINT output either."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import plateau_gis_converter_ray.pipelines.queries as q

    d = tmp_path / "sfov"
    d.mkdir()
    big = 5.0e16  # cents = 5e18; 2*n*sum(|vc|) = 2*2*1e19 >> 2^63
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "event_type": pa.array(["a", "a"]),
                "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
                "value": pa.array([big, big], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    with pytest.raises(OverflowError, match="cusum_changepoint"):
        _to_pandas(q.q_cusum_changepoint(str(d)))


def test_lof_driver_row_limit_guard(ray_session):
    """The LOF composition's driver-side tables are measured against
    driver_row_limit (r4 verdict item #4): an absurdly small limit must
    raise instead of materializing, and the default limit reproduces the
    normal result."""
    from plateau_gis_converter_ray.stages.knn import lof_scores

    with pytest.raises(RuntimeError, match="driver_row_limit"):
        lof_scores(SF_SMALL, driver_row_limit=3)
    out = _to_pandas(lof_scores(SF_SMALL))
    assert len(out) > 0 and {"event_id", "kdist2", "lof"} <= set(out.columns)
