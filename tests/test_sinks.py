"""Sink-layer tests: fixtures from nusamai-mvt geometry.rs:82-90 and
tag.rs:152-228; quadtree assembly semantics from tiling/tree.rs."""

import math

import numpy as np

from plateau_gis_converter_ray.sinks.mvt import (
    GeometryEncoder,
    TagsEncoder,
    encode_tile_dict,
    zigzag,
)
from plateau_gis_converter_ray.sinks.tileset import (
    TileContent,
    TileTree,
    tileset_from_aggregate,
)


def test_zigzag_fixture():
    # geometry.rs:82-90
    cases = [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4), (4096, 8192), (-4096, 8191)]
    for v, expected in cases:
        assert int(zigzag(v)) == expected, v


def test_geometry_encoder():
    enc = GeometryEncoder()
    enc.add_ring(np.array([[2, 2], [6, 2], [6, 6], [2, 6]]))
    buf = enc.into_list()
    # MoveTo(1 pt): cmd 9, zz(2), zz(2); LineTo(3): cmd (3<<3)|2=26; Close: 15
    assert buf[0] == 9
    assert buf[1] == int(zigzag(2)) and buf[2] == int(zigzag(2))
    assert buf[3] == (3 << 3) | 2
    assert buf[-1] == 15
    # duplicate-point drop (geometry.rs:53)
    enc2 = GeometryEncoder()
    enc2.add_ring(np.array([[0, 0], [4, 0], [4, 0], [4, 4], [0, 4]]))
    assert enc2.into_list()[3] == (3 << 3) | 2  # dup collapsed -> 3 linetos


def test_tags_encoder_fixture():
    # tag.rs:152-228
    e = TagsEncoder()
    V = TagsEncoder.value_of
    assert e.add("k0", V("v0")) == (0, 0)
    assert e.add("k0", V("v0")) == (0, 0)
    assert e.add("k1", V("v0")) == (1, 0)
    assert e.add("k1", V("v1")) == (1, 1)
    assert e.add("k0", V("v0")) == (0, 0)
    assert e.add("k0", V("v2")) == (0, 2)
    assert e.add("k1", V("v2")) == (1, 2)
    assert e.add("k2", V("v0")) == (2, 0)
    assert e.add("k1", V("v1")) == (1, 1)
    assert e.add("k1", V(10)) == (1, 3)          # i32 10 -> Uint
    assert e.add("k2", V(10.5)) == (2, 4)        # f64 -> Double
    assert e.add("k3", V(10)) == (3, 3)          # u32 10 -> same Uint
    assert e.add("k3", V(-10)) == (3, 5)         # -> SInt
    assert e.add("k3", V(True)) == (3, 6)
    assert e.add("k3", V(1)) == (3, 7)
    assert e.add("k2", V(np.float32(10.5))) == (2, 8)  # f32 distinct from f64
    assert e.add("k4", V(10.5)) == (4, 4)
    assert e.add("k3", V(-10)) == (3, 5)
    assert e.add("k3", V(10)) == (3, 3)
    keys, values = e.into_keys_and_values()
    assert keys == ["k0", "k1", "k2", "k3", "k4"]
    assert values[:4] == [
        ("string", "v0"), ("string", "v1"), ("string", "v2"), ("uint", 10),
    ]
    assert values[4] == ("double", 10.5)
    assert values[5] == ("sint", -10)
    assert values[6] == ("bool", True)
    assert values[7] == ("uint", 1)
    assert values[8] == ("float", 10.5)


def test_encode_tile_dict():
    rings = [(True, np.array([[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9]]))]
    tile = encode_tile_dict(rings, 1 << 12, attrs=[{"name": "a", "height": 3}])
    assert tile["extent"] == 4096
    assert tile["geometry"][0] == 9
    assert tile["keys"] == ["name", "height"]
    assert tile["feature_tags"] == [[0, 0, 1, 1]]


def test_tile_tree_assembly():
    tree = TileTree()
    tree.add_content(TileContent((3, 2, 1), "3/2/1.bin", 10, 20, 30, 40, 0, 5))
    tree.add_content(TileContent((3, 4, 1), "3/4/1.bin", 21, 25, 30, 42, 0, 9))
    ts = tree.into_tileset()
    root = ts["root"]
    # bbox bubbles to the root (tree.rs:71-97)
    assert root["boundingVolume"]["region"][0] == math.radians(10)
    assert root["boundingVolume"]["region"][2] == math.radians(25)
    assert root["boundingVolume"]["region"][5] == 9
    # z=3 contents hang under z0->z1->z2->z3 chain
    def depth_of(node, d=0):
        kids = node.get("children", [])
        return d if not kids else max(depth_of(k, d + 1) for k in kids)
    assert depth_of(root) == 3
    assert root["geometricError"] == 1e100  # z=0 (scheme.rs:89-90)


def test_tileset_from_aggregate(tmp_path):
    rows = [
        {"zoom": 2, "tile_x": 3, "tile_y": 1, "lng_min": 135.0, "lng_max": 140.0,
         "lat_min": 33.0, "lat_max": 36.0},
        {"zoom": 3, "tile_x": 6, "tile_y": 2, "lng_min": 90.0, "lng_max": 100.0,
         "lat_min": 10.0, "lat_max": 20.0},
    ]
    out = tmp_path / "tileset.json"
    ts = tileset_from_aggregate(rows, str(out))
    assert out.exists()
    assert ts["root"]["boundingVolume"]["region"][0] == math.radians(90.0)


def test_grouped_writer(ray_session, tmp_path):
    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import write_per_group

    ds = ray.data.from_items(
        [{"typ": t, "v": i} for i, t in enumerate(["a", "b", "a", "c", "b", "a"])]
    )
    out = str(tmp_path / "groups")
    res = write_per_group(ds, "typ", out).to_pandas()
    assert len(res) == 3
    assert sorted(res["key"]) == ["a", "b", "c"]
    import os
    assert os.path.exists(os.path.join(out, "part=a", "data.jsonl"))
    # rerun: all groups skipped
    res2 = write_per_group(ds, "typ", out).to_pandas()
    assert res2["skipped"].all()


def test_single_writer(ray_session, tmp_path):
    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import SingleWriterActor

    path = str(tmp_path / "one.jsonl")
    ds = ray.data.range(100)
    out = ds.map_batches(
        SingleWriterActor,
        fn_constructor_args=(path,),
        batch_format="pandas",
        concurrency=1,
    )
    total = out.to_pandas()["written"].sum()
    assert total == 100
    with open(path) as f:
        assert len(f.readlines()) == 100


def test_write_tiles(ray_session, tmp_path):
    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import write_tiles

    rows = []
    for z, x, y in [(2, 1, 1), (2, 1, 1), (2, 2, 0)]:
        rows.append(
            {
                "zoom": z, "tile_x": x, "tile_y": y,
                "ring_xy": [0.1, 0.1, 0.9, 0.1, 0.9, 0.9, 0.1, 0.9],
            }
        )
    ds = ray.data.from_items(rows)
    res = write_tiles(ds, str(tmp_path / "tiles"), debug_sidecar=True).to_pandas()
    assert len(res) == 2
    import os
    assert os.path.exists(str(tmp_path / "tiles" / "2" / "1" / "1.json"))
    got = res.set_index(["tile_x", "tile_y"])["n_features"]
    assert got[(1, 1)] == 2 and got[(2, 0)] == 1


def test_shorten_field_name():
    from plateau_gis_converter_ray.stages.transforms import shorten_field_name

    assert shorten_field_name("short") == "short"
    assert len(shorten_field_name("acousticRating")) <= 10
    taken = set()
    a = shorten_field_name("measuredHeightAboveGround", taken)
    b = shorten_field_name("measuredHeightAboveGrid", taken)
    assert a != b and len(a) <= 10 and len(b) <= 10
    # deterministic
    assert shorten_field_name("acousticRating") == shorten_field_name("acousticRating")


def test_write_tiles_detail_degradation(ray_session, tmp_path):
    """Oversized tile payload degrades extent 2^12 -> lower (mvt/mod.rs:308-336)."""
    import numpy as np
    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import write_tiles

    rng = np.random.default_rng(0)
    rows = []
    # one tile with a huge ring set -> payload > 2000 bytes cap
    for i in range(300):
        pts = rng.random((40, 2))
        rows.append({"zoom": 3, "tile_x": 1, "tile_y": 1,
                     "ring_xy": pts.reshape(-1).tolist()})
    rows.append({"zoom": 3, "tile_x": 2, "tile_y": 1,
                 "ring_xy": [0.1, 0.1, 0.9, 0.1, 0.9, 0.9]})
    ds = ray.data.from_items(rows)
    res = write_tiles(ds, str(tmp_path / "t"), max_bytes=2000).to_pandas()
    big = res[res["tile_x"] == 1].iloc[0]
    small = res[res["tile_x"] == 2].iloc[0]
    assert big["detail"] == 9  # degraded to the floor
    assert small["detail"] == 12  # untouched
    assert not bool(big["skew_warn"])


def test_geojson_group_format(ray_session, tmp_path):
    import json
    import os

    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import write_per_group

    ds = ray.data.from_items(
        [{"typ": "Building", "fid": i, "lng": 139.0 + i, "lat": 35.0} for i in range(3)]
    )
    out = str(tmp_path / "gj")
    write_per_group(ds, "typ", out, fmt="geojson").to_pandas()
    with open(os.path.join(out, "part=Building", "data.geojson")) as f:
        fc = json.load(f)
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 3
    ft = fc["features"][0]
    assert ft["geometry"]["type"] == "Point"
    assert ft["geometry"]["coordinates"][0] == 139.0
    assert ft["properties"]["fid"] == 0
    assert "lng" not in ft["properties"]


def test_kml_czml_group_formats(ray_session, tmp_path):
    import json
    import os

    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import write_per_group

    ds = ray.data.from_items(
        [{"typ": "Building", "fid": i, "lng": 139.5, "lat": 35.5, "height": i}
         for i in range(2)]
    )
    out1 = str(tmp_path / "kml")
    write_per_group(ds, "typ", out1, fmt="kml").to_pandas()
    kml = open(os.path.join(out1, "part=Building", "data.kml")).read()
    assert kml.startswith('<?xml') and "<Placemark>" in kml
    assert "<coordinates>139.5,35.5</coordinates>" in kml
    assert '<Data name="height">' in kml

    out2 = str(tmp_path / "czml")
    write_per_group(ds, "typ", out2, fmt="czml").to_pandas()
    with open(os.path.join(out2, "part=Building", "data.czml")) as f:
        packets = json.load(f)
    assert packets[0]["id"] == "document"
    assert packets[1]["position"]["cartographicDegrees"][:2] == [139.5, 35.5]
    assert packets[1]["properties"]["height"] == 0
    # per-feature HTML description table (czml/mod.rs:143-165): one row
    # per property, values in their JSON form, round-trippable
    desc = packets[1]["description"]
    assert desc.startswith("<table>") and desc.endswith("</table>")
    import re as _re

    rows = dict(_re.findall(r"<tr><td>(.*?)</td><td>(.*?)</td></tr>", desc))
    assert json.loads(rows["height"]) == 0
    assert json.loads(rows["fid"]) == 0
    assert set(rows) == set(packets[1]["properties"])


def test_vertex_table_dedup():
    """Per-tile vertex dedup (cesiumtiles/mod.rs:312 IndexSet role):
    identical quantized points collapse; indices reference the table."""
    rings = [
        (True, np.array([[0.0, 0.0], [0.5, 0.0], [0.5, 0.5], [0.0, 0.0]])),
        (True, np.array([[0.5, 0.5], [0.0, 0.0], [0.25, 0.25]])),
    ]
    tile = encode_tile_dict(rings, 4)
    # quantized: (0,0),(2,0),(2,2),(0,0) + (2,2),(0,0),(1,1) -> 4 unique
    assert tile["vertices"] == [[0, 0], [2, 0], [2, 2], [1, 1]]
    assert tile["ring_indices"] == [[0, 1, 2, 0], [2, 0, 3]]


def test_pbf_varint_packed_roundtrip():
    import numpy as np

    from plateau_gis_converter_ray.sinks.pbf import (
        _decode_packed,
        encode_varint,
        encode_varints_packed,
    )

    vals = [0, 1, 127, 128, 300, 2**21 - 1, 2**32 - 1, 2**50]
    packed = encode_varints_packed(np.array(vals, dtype=np.uint64))
    assert _decode_packed(packed) == vals
    # vectorized packed encoding == per-value scalar encoding
    assert packed == b"".join(encode_varint(v) for v in vals)


def test_make_tile_pbf_golden_and_roundtrip():
    """Golden-byte pin + decode of a small tile; layout per mvt/mod.rs +
    vector_tile.rs (version-first layer framing, packed geometry)."""
    import numpy as np

    from plateau_gis_converter_ray.sinks.mvt import make_tile_pbf, mvt_feature_id
    from plateau_gis_converter_ray.sinks.pbf import decode_tile_pbf

    ring = np.array([[0.1, 0.1], [0.9, 0.1], [0.9, 0.9], [0.1, 0.9]])
    feats = [{"rings": [(True, ring)], "attrs": {"name": "a", "height": 3},
              "id": "bldg_1"}]
    pbf = make_tile_pbf(feats, 12)
    d = decode_tile_pbf(pbf)
    (layer,) = d["layers"]
    assert layer["version"] == 2 and layer["extent"] == 4096
    assert layer["keys"] == ["name", "height"]
    assert layer["values"] == [("string", "a"), ("uint", 3)]
    (f,) = layer["features"]
    assert f["type"] == 3 and f["id"] == mvt_feature_id("bldg_1")
    assert f["tags"] == [0, 0, 1, 1]
    # MoveTo(1), 3 LineTo, ClosePath over the quantized square
    assert f["geometry"] == [9, 820, 820, 26, 6552, 0, 0, 6552, 6551, 0, 15]
    # byte-golden: framing is deterministic
    assert pbf == make_tile_pbf(feats, 12)
    assert len(pbf) == 75


def test_simplify_ring_reference_semantics():
    import numpy as np

    from plateau_gis_converter_ray.sinks.mvt import simplify_ring

    # duplicates removed, collinear midpoints removed, endpoints kept
    q = np.array([[0, 0], [0, 0], [1, 0], [2, 0], [4, 0], [4, 4], [0, 0]])
    out = simplify_ring(q)
    assert out.tolist() == [[0, 0], [4, 0], [4, 4], [0, 0]]
    # reference quirk preserved: the |cross|==|cross| predicate also drops
    # "anti-collinear" midpoints ([4,0] here: |−1*2| == |−1*−2|)
    q2 = np.array([[0, 0], [2, 1], [4, 0], [0, 0]])
    assert simplify_ring(q2).tolist() == [[0, 0], [2, 1], [0, 0]]
    # genuinely non-matching points survive
    q3 = np.array([[0, 0], [2, 1], [5, 0], [0, 0]])
    assert simplify_ring(q3).tolist() == q3.tolist()


def test_write_tiles_emits_decodable_pbf(ray_session, tmp_path):
    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import write_tiles
    from plateau_gis_converter_ray.sinks.pbf import decode_tile_pbf

    rows = [{"zoom": 2, "tile_x": 1, "tile_y": 1, "pid": "p7",
             "ring_xy": [0.1, 0.1, 0.9, 0.1, 0.9, 0.9, 0.1, 0.9]}]
    ds = ray.data.from_items(rows)
    write_tiles(ds, str(tmp_path / "tiles")).to_pandas()
    import os
    p = str(tmp_path / "tiles" / "2" / "1" / "1.pbf")
    assert os.path.exists(p)
    with open(p, "rb") as f:
        d = decode_tile_pbf(f.read())
    (layer,) = d["layers"]
    assert layer["keys"] == ["pid"]
    assert layer["values"] == [("string", "p7")]
    assert len(layer["features"]) == 1


def test_hilbert_tile_archive_roundtrip(ray_session, tmp_path):
    """Sorted single-file archive: the reference's id-sorted write
    (mvt/mod.rs:237-271) over PMTiles Hilbert ids."""
    import numpy as np
    import ray.data

    from plateau_gis_converter_ray.kernels.hilbert import zxy_to_id
    from plateau_gis_converter_ray.sinks.archive import (
        TileArchiveReader,
        write_tile_archive,
    )

    rng = np.random.default_rng(3)
    rows = []
    seen = set()
    for _ in range(200):
        z = int(rng.integers(3, 9))
        x = int(rng.integers(0, 1 << z))
        y = int(rng.integers(0, 1 << z))
        tid = int(zxy_to_id(z, np.array([x]), np.array([y]))[0])
        if tid in seen:
            continue
        seen.add(tid)
        rows.append({"tile_id": tid, "payload": f"tile-{z}/{x}/{y}".encode()})
    ds = ray.data.from_items(rows)
    path = str(tmp_path / "tiles.prta")
    info = write_tile_archive(ds, path)
    assert info["n_entries"] == len(rows)

    rd = TileArchiveReader(path)
    # directory strictly sorted by hilbert id
    assert (np.diff(rd.tile_ids) > 0).all()
    # every tile retrievable by binary search, byte-exact
    for r in rows:
        assert rd.get(r["tile_id"]) == r["payload"]
    assert rd.get(-1) is None


def test_ply_writer_roundtrip(ray_session, tmp_path):
    """Two-pass centroid + global bit-pattern vertex dedup + binary faces
    (sink/ply/mod.rs semantics)."""
    import numpy as np
    import ray.data

    from plateau_gis_converter_ray.sinks.ply import read_ply, write_ply_from_triangles

    # two triangles sharing an edge -> 4 unique recentred vertices
    t1 = [0.0, 0.0, 0.0, 2.0, 0.0, 0.0, 0.0, 2.0, 0.0]
    t2 = [2.0, 0.0, 0.0, 2.0, 2.0, 0.0, 0.0, 2.0, 0.0]
    ds = ray.data.from_items([{"tri_xyz": t1}, {"tri_xyz": t2}])
    path = str(tmp_path / "mesh.ply")
    info = write_ply_from_triangles(ds, path)
    assert info["n_verts"] == 4 and info["n_faces"] == 2
    back = read_ply(path)
    assert back["header"][1] == "format binary_little_endian 1.0"
    assert len(back["vertices"]) == 4 and len(back["faces"]) == 2
    # recentred: centroid of ALL 6 triangle corners subtracted
    all_pts = np.array([t1, t2]).reshape(-1, 3)
    mu = all_pts.mean(axis=0)
    got = back["vertices"][back["faces"].reshape(-1)]
    assert np.allclose(got, all_pts - mu)
    # shared-edge vertices deduped: face index sets overlap
    assert len(set(back["faces"][0]) & set(back["faces"][1])) == 2


def test_ply_writer_distributed_matches_sequential_indexset(
    ray_session, tmp_path
):
    """The distributed first-occurrence dedup (hash exchange + range sort,
    no driver dict) must produce BYTE-identical output to the sequential
    IndexSet pass of ply/mod.rs:192-202 — on a multi-block dataset with
    duplicate vertices both within and ACROSS blocks."""
    import numpy as np
    import ray.data

    from plateau_gis_converter_ray.sinks.ply import (
        PLY_HEADER_TEMPLATE,
        write_ply_from_triangles,
    )

    rng = np.random.default_rng(7)
    # 60 triangles drawn from a 15-point vertex pool => heavy sharing
    pool = rng.normal(size=(15, 3)) * 10
    tris = pool[rng.integers(0, 15, size=(60, 3))]
    items = [{"tri_xyz": t.reshape(-1).tolist()} for t in tris]
    ds = ray.data.from_items(items).repartition(7)  # force cross-block dups

    path = str(tmp_path / "dist.ply")
    info = write_ply_from_triangles(ds, path)

    # sequential reference: the exact IndexSet semantics
    corners = tris.reshape(-1, 3)
    um = np.round(corners * 1e6).astype(np.int64)
    mu = um.sum(axis=0).astype(np.float64) / (1e6 * len(corners))
    rec = corners - mu[None, :]
    vindex: dict = {}
    vbuf = bytearray()
    idxs = []
    for row in np.ascontiguousarray(rec, dtype="<f8").view(np.uint8).reshape(-1, 24):
        key = row.tobytes()
        vi = vindex.get(key)
        if vi is None:
            vi = vindex[key] = len(vindex)
            vbuf += key
        idxs.append(vi)
    fbuf = bytearray()
    for a, b, c in np.array(idxs, dtype=np.uint32).reshape(-1, 3):
        fbuf += b"\x03" + np.array([a, b, c], dtype="<u4").tobytes()
    expected = (
        PLY_HEADER_TEMPLATE.format(n_verts=len(vindex), n_faces=60).encode()
        + bytes(vbuf)
        + bytes(fbuf)
    )
    with open(path, "rb") as f:
        got = f.read()
    assert info["n_verts"] == len(vindex) < len(corners)
    assert got == expected  # byte-identical


def test_write_tiles_layer_column(ray_session, tmp_path):
    """Per-typename MVT layers: a 'layer' column splits features into
    separate Tile.Layer messages (mod.rs layers HashMap)."""
    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import write_tiles
    from plateau_gis_converter_ray.sinks.pbf import decode_tile_pbf

    rows = [
        {"zoom": 2, "tile_x": 1, "tile_y": 1, "layer": "Building",
         "ring_xy": [0.1, 0.1, 0.9, 0.1, 0.9, 0.9, 0.1, 0.9]},
        {"zoom": 2, "tile_x": 1, "tile_y": 1, "layer": "Road",
         "ring_xy": [0.2, 0.2, 0.8, 0.2, 0.8, 0.8, 0.2, 0.8]},
    ]
    write_tiles(ray.data.from_items(rows), str(tmp_path / "t")).to_pandas()
    with open(str(tmp_path / "t" / "2" / "1" / "1.pbf"), "rb") as f:
        d = decode_tile_pbf(f.read())
    assert sorted(layer["name"] for layer in d["layers"]) == ["Building", "Road"]


def test_kml_czml_polygon_geometry(ray_session, tmp_path):
    """Rows carrying a flat ring_lnglat become KML Polygon placemarks and
    CZML polygon packets (kml/mod.rs:117; czml/mod.rs:201-209: one packet
    per face, perPositionHeight)."""
    import json
    import os

    import ray.data

    from plateau_gis_converter_ray.sinks.grouped import write_per_group

    ring = [139.5, 35.5, 139.6, 35.5, 139.6, 35.6, 139.5, 35.6, 139.5, 35.5]
    ds = ray.data.from_items(
        [{"typ": "Building", "fid": 1, "ring_lnglat": ring, "height": 12}]
    )
    out1 = str(tmp_path / "kmlp")
    write_per_group(ds, "typ", out1, fmt="kml").to_pandas()
    kml = open(os.path.join(out1, "part=Building", "data.kml")).read()
    assert "<Polygon><outerBoundaryIs><LinearRing>" in kml
    assert "139.5,35.5 139.6,35.5" in kml

    out2 = str(tmp_path / "czmlp")
    write_per_group(ds, "typ", out2, fmt="czml").to_pandas()
    packets = json.load(open(os.path.join(out2, "part=Building", "data.czml")))
    poly = packets[1]["polygon"]
    assert poly["perPositionHeight"] is True
    assert poly["positions"]["cartographicDegrees"][:6] == [
        139.5, 35.5, 0.0, 139.6, 35.5, 0.0
    ]


def test_archive_bbox_range_query(ray_session, tmp_path):
    """Hilbert-range bbox reads == brute per-id gets, with one contiguous
    disk read per range (the PMTiles locality payoff)."""
    import numpy as np
    import ray.data

    from plateau_gis_converter_ray.kernels.hilbert import zxy_to_id
    from plateau_gis_converter_ray.kernels.webmercator import (
        zxy_from_lnglat_webmercator,
    )
    from plateau_gis_converter_ray.sinks.archive import (
        TileArchiveBboxReader,
        hilbert_ranges_for_bbox,
        write_tile_archive,
    )

    z = 10
    # a dense tile patch over Tokyo plus scattered far-away tiles
    cx, cy = zxy_from_lnglat_webmercator(z, 139.7, 35.6)
    rows = []
    for dx in range(-4, 5):
        for dy in range(-4, 5):
            tid = int(zxy_to_id(z, np.array([int(cx) + dx]), np.array([int(cy) + dy]))[0])
            rows.append({"tile_id": tid, "payload": f"t{tid}".encode()})
    for far in range(50):
        tid = int(zxy_to_id(z, np.array([far * 7 % (1 << z)]), np.array([far * 13 % (1 << z)]))[0])
        if all(r["tile_id"] != tid for r in rows):
            rows.append({"tile_id": tid, "payload": f"f{tid}".encode()})
    path = str(tmp_path / "bbox.prta")
    write_tile_archive(ray.data.from_items(rows), path)

    bbox = (139.55, 35.45, 139.85, 35.75)
    rd = TileArchiveBboxReader(path)
    got = dict(rd.query_bbox(z, *bbox))

    ranges = hilbert_ranges_for_bbox(z, *bbox)
    assert len(ranges) >= 1
    covering = set()
    for lo, hi in ranges:
        covering.update(range(lo, hi + 1))
    exp = {
        r["tile_id"]: r["payload"] for r in rows if r["tile_id"] in covering
    }
    assert got == exp and len(exp) > 0
    # locality: the read count is the range count that hit, never per-tile
    assert rd.last_read_count <= len(ranges)
    assert rd.last_read_count < len(exp) or len(exp) <= len(ranges)
