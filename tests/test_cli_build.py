"""Requirements-driven assembly + CLI lifecycle (main.rs:111-292 analogue)."""

import json
import subprocess
import sys

import pytest

from plateau_gis_converter_ray.pipelines.build import (
    BUILTIN_SINKS,
    DataRequirements,
    Parameter,
    build_transform_chain,
)


def test_chain_order_follows_builder():
    """Chain order is fixed like NusamaiTransformBuilder (builder.rs:106-187):
    projection -> geomstats -> rename -> lod -> jsonify -> dots -> tiles."""
    req = DataRequirements(
        output_crs="lnglat",
        geom_stats_col="heights",
        rename_rules={"*:a": "b"},
        lod_filter="highest",
        jsonify=True,
        dot_notation=True,
        tile_scheme="3dt",
    )
    names = [n for n, _ in build_transform_chain(req)]
    assert names == [
        "projection", "geom_stats", "rename", "lod_filter", "jsonify", "dots", "tiles",
    ]


def test_sink_registry_and_params():
    assert set(BUILTIN_SINKS) >= {"parquet", "grouped", "tiles", "noop"}
    g = BUILTIN_SINKS["grouped"]
    with pytest.raises(ValueError):
        g.validate_params({})  # group_by required
    with pytest.raises(ValueError):
        g.validate_params({"group_by": "x", "bogus": 1})  # unknown param
    p = g.validate_params({"group_by": "lang"})
    assert p == {"group_by": "lang", "format": "jsonl"}
    with pytest.raises(ValueError):
        Parameter("n", "integer").validate("notint")


def test_requirements_drive_chain():
    # sink's declared needs materialize as stages (sink/mod.rs:53-82 pattern)
    req = BUILTIN_SINKS["tiles"].make_requirements({"min_zoom": 8, "max_zoom": 10})
    chain = build_transform_chain(req)
    tiles = dict(chain)["tiles"]
    assert tiles == {"scheme": "3dt", "min_zoom": 8, "max_zoom": 10}
    assert not any(n == "jsonify" for n, _ in chain)
    req2 = BUILTIN_SINKS["grouped"].make_requirements({"group_by": "x"})
    assert any(n == "jsonify" for n, _ in build_transform_chain(req2))


def test_cli_black_box(tmp_path):
    """CLI smoke (the assert_cmd analogue, main.rs:294-314): separate process
    so the CLI owns its own Ray session."""
    out = subprocess.run(
        [sys.executable, "-m", "plateau_gis_converter_ray", "convert",
         "/root/testdata/sf0.001/nation.parquet", str(tmp_path / "o"),
         "--sink", "noop", "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["result"]["num_rows"] == 25

    bad = subprocess.run(
        [sys.executable, "-m", "plateau_gis_converter_ray", "convert",
         "x", "y", "--sink", "nope"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert bad.returncode == 2
    assert "unknown sink" in bad.stderr


def test_cli_tiles_sink_e2e(tmp_path):
    """CLI drive of the tiles sink on a lng/lat table: fanout + z/x/y files."""
    import os

    import pandas as pd

    inp = str(tmp_path / "pts.parquet")
    pd.DataFrame(
        {
            "fid": range(20),
            "lng": [135.0 + i * 0.4 for i in range(20)],
            "lat": [34.0 + (i % 5) * 0.3 for i in range(20)],
            "ring_xy": [[0.2, 0.2, 0.8, 0.2, 0.8, 0.8] for _ in range(20)],
        }
    ).to_parquet(inp, index=False)
    out = str(tmp_path / "tiles")
    r = subprocess.run(
        [sys.executable, "-m", "plateau_gis_converter_ray", "convert", inp, out,
         "--sink", "tiles", "--param", "min_zoom=5", "--param", "max_zoom=5",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["result"]["rows"] >= 1
    # a z/x/y payload exists on disk (pbf only; json sidecar is opt-in)
    found = list((tmp_path / "tiles").rglob("*.pbf"))
    assert found
    assert not list((tmp_path / "tiles").rglob("*.json"))


def test_cli_3dtiles_sink_e2e(tmp_path):
    """CLI drive of the glb 3dtiles sink: fanout + z/x/y.glb files."""
    import pandas as pd

    inp = str(tmp_path / "pts.parquet")
    pd.DataFrame(
        {
            "pid": [f"p{i}" for i in range(12)],
            "lng": [135.0 + i * 0.4 for i in range(12)],
            "lat": [34.0 + (i % 4) * 0.3 for i in range(12)],
            "ring_xy": [[0.2, 0.2, 0.8, 0.2, 0.8, 0.8, 0.2, 0.8] for _ in range(12)],
        }
    ).to_parquet(inp, index=False)
    out = str(tmp_path / "t3")
    r = subprocess.run(
        [sys.executable, "-m", "plateau_gis_converter_ray", "convert", inp, out,
         "--sink", "3dtiles", "--param", "min_zoom=5", "--param", "max_zoom=5",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    found = list((tmp_path / "t3").rglob("*.glb"))
    assert found
    from plateau_gis_converter_ray.sinks.glb import read_glb

    with open(found[0], "rb") as f:
        gltf, _bin = read_glb(f.read())
    assert gltf["asset"]["version"] == "2.0"


def test_cli_shapefile_sink_e2e(tmp_path):
    """CLI drive of the shapefile sink: one PolygonZ set per typename."""
    import pandas as pd

    inp = str(tmp_path / "feat.parquet")
    pd.DataFrame(
        {
            "typename": ["bldg:Building"] * 3 + ["tran:Road"] * 2,
            "measuredHeightAboveGround": [10.0, 11.0, 12.0, 1.0, 2.0],
            "rings_xyz": [[0, 0, 1, 1, 0, 1, 1, 1, 1, 0, 1, 1]] * 5,
        }
    ).to_parquet(inp, index=False)
    out = str(tmp_path / "shp")
    r = subprocess.run(
        [sys.executable, "-m", "plateau_gis_converter_ray", "convert", inp, out,
         "--sink", "shapefile", "--param", "type_col=typename",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    from plateau_gis_converter_ray.sinks.shapefile import read_polygonz_shp

    back = read_polygonz_shp(str(tmp_path / "shp" / "bldg_Building"))
    assert len(back["shapes"]) == 3 and back["shape_type"] == 15


def test_cli_archive_sink_e2e(tmp_path):
    """CLI drive of the Hilbert-sorted archive sink: one .prta file with
    decodable pbf payloads retrievable by tile id."""
    import pandas as pd

    inp = str(tmp_path / "pts.parquet")
    pd.DataFrame(
        {
            "fid": range(16),
            "lng": [135.0 + i * 0.7 for i in range(16)],
            "lat": [34.0 + (i % 4) * 0.5 for i in range(16)],
            "ring_xy": [[0.2, 0.2, 0.8, 0.2, 0.8, 0.8, 0.2, 0.8]] * 16,
        }
    ).to_parquet(inp, index=False)
    out = str(tmp_path / "arch")
    r = subprocess.run(
        [sys.executable, "-m", "plateau_gis_converter_ray", "convert", inp, out,
         "--sink", "archive", "--param", "min_zoom=5", "--param", "max_zoom=5",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["result"]["n_entries"] >= 1
    import numpy as np

    from plateau_gis_converter_ray.sinks.archive import TileArchiveReader
    from plateau_gis_converter_ray.sinks.pbf import decode_tile_pbf

    rd = TileArchiveReader(str(tmp_path / "arch" / "tiles.prta"))
    assert (np.diff(rd.tile_ids) > 0).all()
    d = decode_tile_pbf(rd.get(int(rd.tile_ids[0])))
    assert d["layers"][0]["version"] == 2


def test_cli_ply_sink_e2e(tmp_path):
    """CLI drive of the PLY sink on a triangle table."""
    import pandas as pd

    inp = str(tmp_path / "tri.parquet")
    pd.DataFrame(
        {"tri_xyz": [[0, 0, 0, 2, 0, 0, 0, 2, 0],
                     [2, 0, 0, 2, 2, 0, 0, 2, 0]]}
    ).to_parquet(inp, index=False)
    out = str(tmp_path / "ply")
    r = subprocess.run(
        [sys.executable, "-m", "plateau_gis_converter_ray", "convert", inp, out,
         "--sink", "ply", "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["result"]["n_verts"] == 4 and rec["result"]["n_faces"] == 2

    from plateau_gis_converter_ray.sinks.ply import read_ply

    back = read_ply(str(tmp_path / "ply" / "output.ply"))
    assert len(back["vertices"]) == 4


def test_reference_user_journey_3dtiles(tmp_path):
    """A reference user's full path on this engine: lng/lat features ->
    sink-derived transform chain (rename + tiles fanout) -> glb tiles with
    metadata property tables -> tileset.json assembly over the results."""
    import pandas as pd

    inp = str(tmp_path / "city.parquet")
    pd.DataFrame(
        {
            "pid": [f"bldg_{i}" for i in range(30)],
            "lng": [139.5 + (i % 6) * 0.05 for i in range(30)],
            "lat": [35.5 + (i // 6) * 0.04 for i in range(30)],
            "ring_xy": [[0.2, 0.2, 0.8, 0.2, 0.8, 0.8, 0.2, 0.8]] * 30,
        }
    ).to_parquet(inp, index=False)
    out = str(tmp_path / "out3dt")
    r = subprocess.run(
        [sys.executable, "-m", "plateau_gis_converter_ray", "convert", inp, out,
         "--sink", "3dtiles", "--param", "min_zoom=6", "--param", "max_zoom=7",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    assert r.returncode == 0, r.stderr[-800:]

    # every emitted glb parses; metadata property tables carry the pids
    import glob as globmod

    from plateau_gis_converter_ray.sinks.glb import read_glb
    from plateau_gis_converter_ray.sinks.tileset import tileset_from_aggregate

    files = globmod.glob(f"{out}/*/*/*.glb")
    assert files
    total_feats = 0
    rows = []
    for p in sorted(files):
        with open(p, "rb") as f:
            gltf, _bin = read_glb(f.read())
        (pt,) = gltf["extensions"]["EXT_structural_metadata"]["propertyTables"]
        total_feats += pt["count"]
        z, x, y = (int(v) for v in p[len(out) + 1:-4].split("/"))
        rows.append({"zoom": z, "tile_x": x, "tile_y": y,
                     "lng_min": 139.5, "lng_max": 139.8,
                     "lat_min": 35.5, "lat_max": 35.7})
    # max_zoom fanout puts every feature in exactly one z=7 tile (points
    # only appear at max zoom per the geometric-error rule)
    assert total_feats == 30
    ts = tileset_from_aggregate(rows, str(tmp_path / "tileset.json"))
    assert ts["root"]["geometricError"] > 0
    assert (tmp_path / "tileset.json").exists()


def test_cli_query_listing_and_unknown():
    """`query` with no name lists every registry entry with its gate;
    an unknown name exits 2 (no Ray session started either way)."""
    import io
    from contextlib import redirect_stdout

    from plateau_gis_converter_ray.__main__ import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["query"])
    assert rc == 0
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) >= 65
    assert any("[oracle]" in ln for ln in lines)
    assert any("[rows]" in ln for ln in lines)

    import contextlib
    err = io.StringIO()
    with redirect_stdout(io.StringIO()), contextlib.redirect_stderr(err):
        rc = main(["query", "no_such_query"])
    assert rc == 2


def test_cli_implicit_sink_e2e(tmp_path):
    """CLI drive of the implicit-quadtree sink: webmercator keying, one
    distinct-tile combiner, .subtree blobs + root tileset.json with the
    implicitTiling descriptor; rerun resume-skips on the row-count
    fingerprint."""
    import pandas as pd

    inp = str(tmp_path / "pts.parquet")
    pd.DataFrame(
        {
            "fid": range(24),
            "lng": [135.0 + (i % 6) * 0.4 for i in range(24)],
            "lat": [34.0 + (i % 4) * 0.3 for i in range(24)],
        }
    ).to_parquet(inp, index=False)
    out = str(tmp_path / "imp")
    cmd = [sys.executable, "-m", "plateau_gis_converter_ray", "convert",
           inp, out, "--sink", "implicit", "--param", "max_zoom=10",
           "--num-cpus", "2"]
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd="/root/repo", timeout=180
    )
    assert r.returncode == 0, r.stderr[-800:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["result"]["built"] is True
    assert len(rec["result"]["subtrees"]) >= 1
    subs = list((tmp_path / "imp" / "subtrees").glob("*.subtree"))
    assert subs
    ts = json.loads((tmp_path / "imp" / "tileset.json").read_text())
    it = ts["root"]["implicitTiling"]
    assert it["subdivisionScheme"] == "QUADTREE"
    assert it["availableLevels"] == 11

    r2 = subprocess.run(
        cmd, capture_output=True, text=True, cwd="/root/repo", timeout=180
    )
    assert r2.returncode == 0, r2.stderr[-800:]
    rec2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rec2["result"]["built"] is False
