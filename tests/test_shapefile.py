"""Shapefile binary writer round-trip tests (ESRI whitepaper layout;
reference: nusamai/src/sink/shapefile/mod.rs:73-365)."""

import numpy as np

from plateau_gis_converter_ray.sinks.shapefile import (
    jpr_prj_wkt,
    read_polygonz_shp,
    write_polygonz_shp,
)


def _sq(z=2.0):
    return np.array([[0, 0, z], [1, 0, z], [1, 1, z], [0, 1, z], [0, 0, z]],
                    dtype=np.float64)


def test_polygonz_roundtrip(tmp_path):
    base = str(tmp_path / "Building")
    fields = [("name", "C", 16), ("height", "N", 8)]
    info = write_polygonz_shp(
        base, [[_sq(2.0)], [_sq(5.0) + np.array([10, 10, 0])]],
        fields, [{"name": "a", "height": 3}, {"name": "bb", "height": 12}],
    )
    assert info["n_records"] == 2
    back = read_polygonz_shp(base)
    assert back["file_code"] == 9994 and back["version"] == 1000
    assert back["shape_type"] == 15  # PolygonZ
    import os
    # declared length (16-bit words) matches the actual file size
    assert back["file_words"] * 2 == os.path.getsize(base + ".shp")
    assert len(back["shapes"]) == 2
    # outer rings re-ordered to clockwise (the reference writer's fixture
    # semantics, shapefile/mod.rs:306-365): CCW input comes back reversed
    ring = back["shapes"][0][0]
    assert np.allclose(ring, _sq(2.0)[::-1])
    assert np.allclose(back["shapes"][1][0], (_sq(5.0) + np.array([10, 10, 0]))[::-1])
    assert back["fields"] == [("name", "C", 16), ("height", "N", 8)]
    assert back["records"][0]["name"] == "a"
    assert back["records"][1]["height"] == "12"
    # .shx parallel index exists with one 8-byte entry per record
    assert os.path.getsize(base + ".shx") == 100 + 2 * 8
    # .prj carries ESRI WKT
    with open(base + ".prj") as f:
        assert f.read().startswith("GEOGCS[")


def test_jpr_prj_wkt():
    wkt = jpr_prj_wkt(9)
    assert "Transverse_Mercator" in wkt and "JGD_2011" in wkt
    assert "139.8333333333333" in wkt


def test_per_type_shapefiles(ray_session, tmp_path):
    import os

    import ray.data

    from plateau_gis_converter_ray.sinks.shapefile import (
        read_polygonz_shp,
        write_per_type_shapefiles,
    )

    rows = []
    for i, t in enumerate(["bldg:Building", "bldg:Building", "tran:Road"]):
        rows.append(
            {"typename": t, "measuredHeightAboveGround": 10 + i,
             "rings_xyz": [0, 0, 1, 1, 0, 1, 1, 1, 1, 0, 1, 1]}
        )
    ds = ray.data.from_items(rows)
    res = write_per_type_shapefiles(
        ds, str(tmp_path), "typename"
    ).to_pandas().set_index("typename")
    assert int(res.loc["bldg_Building", "n_records"]) == 2
    assert os.path.exists(str(tmp_path / "tran_Road.shp"))
    back = read_polygonz_shp(str(tmp_path / "bldg_Building"))
    # field names shortened to the dbf 10-char limit
    assert all(len(f[0]) <= 10 for f in back["fields"])
    assert len(back["shapes"][0][0]) == 5  # ring auto-closed


def test_outer_ring_reordered_to_clockwise_reference_fixture():
    """shapefile/mod.rs:306-365's own fixture: CCW square (0,0)(5,0)(5,5)
    (0,5) writes as the CW ring (0,0)(0,5)(5,5)(5,0)(0,0)."""
    import tempfile

    ring = np.array([[0., 0., 111.], [5., 0., 111.], [5., 5., 111.],
                     [0., 5., 111.], [0., 0., 111.]])
    with tempfile.TemporaryDirectory() as d:
        base = f"{d}/dummy"
        write_polygonz_shp(base, [[ring]], [("id", "C", 8)], [{"id": "dummy"}])
        back = read_polygonz_shp(base)
    got = back["shapes"][0][0]
    expect = np.array([[0., 0., 111.], [0., 5., 111.], [5., 5., 111.],
                       [5., 0., 111.], [0., 0., 111.]])
    assert np.array_equal(got, expect)
    assert back["records"][0]["id"] == "dummy"


def test_vectorized_framing_matches_per_record(tmp_path):
    """The array-vectorized single-ring .shp framing and the numpy dbf
    record block must be BYTE-identical to the per-record path."""
    import numpy as np

    from plateau_gis_converter_ray.sinks.shapefile import (
        dbf_record_block,
        polygonz_record,
        polygonz_single_ring_block,
        write_polygonz_shp,
    )

    rng = np.random.default_rng(3)
    shapes, lens = [], []
    for i in range(23):
        npts = int(rng.integers(3, 9))
        ring = rng.normal(size=(npts, 3)) * 50
        if i % 3 == 0:
            ring = ring[::-1]  # mix orientations
        closed = np.concatenate([ring, ring[:1]])
        shapes.append([closed])
        lens.append(len(closed))

    block, words, offs = polygonz_single_ring_block(
        np.concatenate([s[0] for s in shapes]), np.array(lens)
    )
    expected = bytearray()
    pos_words = 50
    for i, s in enumerate(shapes):
        content = polygonz_record(s)
        assert offs[i] == pos_words and words[i] == len(content) // 2
        import struct

        expected += struct.pack(">ii", i + 1, len(content) // 2) + content
        pos_words += 4 + len(content) // 2
    assert block == bytes(expected)

    # dbf block: C and N fields, truncation, non-ascii replacement
    fields = [("name", "C", 8), ("num", "N", 6)]
    columns = {
        "name": ["alpha", "a-very-long-value", "ünïcode", ""],
        "num": ["42", "123456789", "-7", "0"],
    }
    got = dbf_record_block(fields, columns)
    expected2 = bytearray()
    for i in range(4):
        expected2 += b" "
        for name, ftype, width in fields:
            s = str(columns[name][i])[:width]
            pad = s.rjust(width) if ftype == "N" else s.ljust(width)
            expected2 += pad.encode("ascii", "replace")
    assert got == bytes(expected2)

    # end-to-end through write_polygonz_shp with dict-of-columns records
    recs = {"name": ["a", "b"] * 11 + ["c"], "num": [str(i) for i in range(23)]}
    info = write_polygonz_shp(str(tmp_path / "vec"), shapes, fields, recs)
    assert info["n_records"] == 23
