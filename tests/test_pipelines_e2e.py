"""End-to-end pipeline tests (Ray session, sf0.001) — the sink.rs:77-139
analogue: run every major pipeline to completion and check invariants."""

import os
import shutil

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__

    return importlib.reload(__ray_entry__)


def _pd(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def test_entry_smoke(entrymod):
    ds = entrymod.entry()
    df = _pd(ds)
    assert len(df) > 0
    assert {"tile_id", "muni_id", "n_assignments"} <= set(df.columns)


def test_oracle_keys_subset(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_query_vs_duckdb_sample(entrymod):
    """Driver-style compare for a fast representative subset."""
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in ["tile_3dt_z7", "pip_mesh", "pricing_summary", "dedup_exact", "embed_knn"]:
        ray_df = _pd(qs[name](SF))
        sql_df = con.sql(oracles[name]).df()
        assert len(ray_df) == len(sql_df), name
        a = ray_df[sorted(ray_df.columns)].sort_values(
            sorted(ray_df.columns)).reset_index(drop=True)
        b = sql_df[sorted(sql_df.columns)].sort_values(
            sorted(sql_df.columns)).reset_index(drop=True)
        for c in a.columns:
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), (name, c)


def test_knn_cellring_equals_brute(entrymod):
    qs = entrymod.queries()
    brute = _pd(qs["knn_points"](SF)).sort_values("event_id").reset_index(drop=True)
    ring = _pd(qs["knn_points_cellring"](SF)).sort_values("event_id").reset_index(drop=True)
    assert (brute["nearest_qid"].to_numpy() == ring["nearest_qid"].to_numpy()).all()


def test_pip_index_equals_bruteforce(ray_session):
    """PolygonIndex.assign == direct points_in_polygon scan."""
    from plateau_gis_converter_ray.kernels.pip import PolygonIndex, points_in_polygon
    from plateau_gis_converter_ray.sources.municipalities import municipality_polygons
    from plateau_gis_converter_ray.stages.geocode import geocode_hash

    polys = municipality_polygons()
    idx = PolygonIndex(polys)
    lng, lat = geocode_hash(np.arange(2000))
    got = idx.assign(lng, lat)
    want = np.full(len(lng), -1, dtype=np.int64)
    for i, p in enumerate(polys):
        inside = points_in_polygon(lng, lat, p["rings"]) & (want == -1)
        want[inside] = i
    np.testing.assert_array_equal(got, want)


def test_image_table_deterministic(ray_session, tmp_path):
    """Row N is identical regardless of table scale (pure function of index)."""
    from plateau_gis_converter_ray.sources.images import make_rows

    a = make_rows(np.array([5, 17, 123]))
    b = make_rows(np.arange(200))
    for i, idx in enumerate([5, 17, 123]):
        row_a = {c: a.column(c)[i].as_py() for c in a.column_names}
        row_b = {c: b.column(c)[idx].as_py() for c in b.column_names}
        assert row_a == row_b


def test_decode_invariants(ray_session):
    """BASELINE invariant: caption equality + PSNR>=40 + phash on lossless."""
    import pyarrow as pa

    from plateau_gis_converter_ray.sources.images import caption_for, make_rows
    from plateau_gis_converter_ray.stages.decode import ImageDecodeStats

    batch = make_rows(np.arange(64))
    out = ImageDecodeStats()(batch)
    psnr = out.column("psnr_db").to_numpy()
    assert (psnr >= 40.0).all()
    fmts = out.column("fmt").to_pylist()
    match = out.column("phash").to_numpy() == out.column("phash_decoded").to_numpy()
    for i, f in enumerate(fmts):
        if f in ("raw", "ppm", "rle"):
            assert match[i]
    caps = out.column("caption").to_pylist()
    assert caps == [caption_for(i) for i in range(64)]


def test_flagship_resume(ray_session, tmp_path):
    """Killed-run resume: second invocation skips committed chunks."""
    import json

    from plateau_gis_converter_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "flag")
    r1 = run_flagship(sf=0.001, out_dir=out, n_chunks=2)
    manifest = os.path.join(out, "manifest.jsonl")
    with open(manifest) as f:
        lines1 = [json.loads(x) for x in f if x.strip()]
    assert len(lines1) >= 1
    r2 = run_flagship(sf=0.001, out_dir=out, n_chunks=2)
    assert r2["assignments"] == 0  # nothing recomputed
    with open(manifest) as f:
        lines2 = [json.loads(x) for x in f if x.strip()]
    assert lines1 == lines2


def test_mvt_pipeline_e2e(ray_session, tmp_path):
    """polygons -> mvt slice -> tile shuffle -> z/x/y files (sink.rs e2e role)."""
    import json
    import os

    from plateau_gis_converter_ray.pipelines.mvt_pipeline import run_mvt_pipeline
    from plateau_gis_converter_ray.sources.municipalities import municipality_polygons

    polys = municipality_polygons(16)
    out = str(tmp_path / "mvt")
    report = run_mvt_pipeline(
        polys, out, min_zoom=6, max_zoom=8, debug_sidecar=True
    ).to_pandas()
    assert len(report) > 10
    assert (report["detail"] <= 12).all()
    # every reported tile has a written payload with a decodable command stream
    r = report.iloc[0]
    path = os.path.join(out, str(r["zoom"]), str(r["tile_x"]), f"{r['tile_y']}.json")
    with open(path) as f:
        tile = json.load(f)
    assert tile["geometry"][0] == 9  # starts with MoveTo(1)
    assert tile["extent"] == 1 << int(r["detail"])


def test_flagship_writes_tileset(ray_session, tmp_path):
    import json

    from plateau_gis_converter_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "flag_ts")
    res = run_flagship(sf=0.001, out_dir=out, n_chunks=2)
    with open(res["tileset"]) as f:
        ts = json.load(f)
    assert ts["asset"]["version"] == "1.1"
    region = ts["root"]["boundingVolume"]["region"]
    # Japan bbox in radians
    import math
    assert math.radians(122.0) <= region[0] <= region[2] <= math.radians(146.01)


def test_planted_duplicates(ray_session):
    """FIXTURES.md §1: ~10% of rows are bit-exact duplicates of idx-1 with
    distinct captions; the phash dedup finds exactly those groups."""
    from plateau_gis_converter_ray.sources.images import make_rows, source_index

    batch = make_rows(np.arange(100))
    blobs = batch.column("bytes").to_pylist()
    hashes = batch.column("phash").to_pylist()
    caps = batch.column("caption").to_pylist()
    for i in range(100):
        src = int(source_index(i))
        if src != i:
            assert blobs[i] == blobs[src]
            assert hashes[i] == hashes[src]
            assert caps[i] != caps[src]
    dup_rows = sum(1 for i in range(100) if int(source_index(i)) != i)
    assert dup_rows == 10


def test_hole_polygon_pip(ray_session):
    """Points inside a municipality's hole are NOT assigned to it."""
    from plateau_gis_converter_ray.kernels.pip import points_in_polygon
    from plateau_gis_converter_ray.sources.municipalities import municipality_polygons

    polys = municipality_polygons()
    holed = [p for p in polys if len(p["rings"]) > 1]
    assert len(holed) >= 4
    p = holed[0]
    # centroid of the hole is inside exterior but outside the polygon
    hole_c = p["rings"][1].mean(axis=0)
    inside = points_in_polygon(
        np.array([hole_c[0]]), np.array([hole_c[1]]), p["rings"]
    )
    assert not inside[0]
    in_ext_only = points_in_polygon(
        np.array([hole_c[0]]), np.array([hole_c[1]]), [p["rings"][0]]
    )
    assert in_ext_only[0]


def test_flagship_golden_counts(ray_session, tmp_path):
    """Golden-count pin (the load_examples.rs:107-135 pattern): exact counts
    and a content hash of the flagship result at sf0.001, so any future
    change to tiling/join/geocode semantics is caught as a diff, not noise.
    (Recompute intentionally if semantics change: generator v3, pipeline v3.)"""
    import hashlib

    from plateau_gis_converter_ray.pipelines.flagship import (
        flagship_result_ds,
        run_flagship,
    )

    res = run_flagship(sf=0.001, out_dir=str(tmp_path / "golden"), n_chunks=2)
    assert res["assignments"] == 1720
    df = flagship_result_ds(res["out_dir"]).to_pandas()
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True)
    assert len(df) == 1211
    assert int(df["tile_id"].sum()) == 11856403911
    assert df["muni_id"].nunique() == 40
    assert df["zoom"].value_counts().sort_index().to_dict() == {
        7: 69, 8: 105, 9: 148, 10: 190, 11: 228, 12: 471,
    }
    h = hashlib.sha256()
    h.update(df["tile_id"].to_numpy().tobytes())
    h.update(df["n_assignments"].to_numpy().tobytes())
    h.update("".join(df["muni_id"]).encode())
    assert h.hexdigest()[:16] == "efab57ea2bc6009b"


def test_corpus_dedup_writer_resume(ray_session, tmp_path):
    """Partial run (shard cap) -> resumed run completes the rest without
    rewriting finished shards; third run writes nothing; the union equals
    the kept set exactly once."""
    import os

    from plateau_gis_converter_ray.pipelines.corpus import (
        read_corpus,
        write_corpus_dedup,
    )
    from plateau_gis_converter_ray.pipelines.queries import q_corpus_dedup

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus")

    r1 = write_corpus_dedup(sf, out, n_shards=8, max_shards=3)
    assert r1["written"] == 3
    mtimes = {
        d: os.path.getmtime(os.path.join(out, d, "part.parquet"))
        for d in os.listdir(out)
        if d.startswith("part=")
    }
    assert len(mtimes) == 3

    r2 = write_corpus_dedup(sf, out, n_shards=8)
    assert r2["written"] == 5 and r2["skipped"] == 3
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "part.parquet")) == m

    r3 = write_corpus_dedup(sf, out, n_shards=8)
    assert r3["written"] == 0 and r3["skipped"] == 8

    got = read_corpus(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    labels = q_corpus_dedup(sf).to_pandas()
    kept = set(labels.loc[labels["kept"] == 1, "doc_id"])
    assert set(got["doc_id"]) == kept
    assert got["doc_id"].is_unique
    # manifest carries lineage + metrics for every shard
    import json

    recs = [
        json.loads(line)
        for line in open(os.path.join(out, "manifest.jsonl"))
        if line.strip()
    ]
    assert len(recs) == 8
    assert all(r["lineage"]["stage_chain"] for r in recs)
    assert all(r["metrics"]["elapsed_s"] >= 0 for r in recs)


def test_corpus_dedup_empty_shards_converge(ray_session, tmp_path):
    """Shards owning no surviving docs commit as empty, so resume is a
    no-op instead of re-running the pair pipeline forever (review fix)."""
    from plateau_gis_converter_ray.pipelines.corpus import write_corpus_dedup

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus_sparse")
    # doc_id < 500 at sf0.001, so shards 500..1023 own nothing
    r1 = write_corpus_dedup(sf, out, n_shards=1024)
    assert r1["written"] + r1["written_empty"] + r1["skipped"] == 1024
    assert r1["written_empty"] >= 1024 - 500
    r2 = write_corpus_dedup(sf, out, n_shards=1024)
    assert r2["written"] == 0 and r2["written_empty"] == 0
    assert r2["skipped"] == 1024
