"""SQLite single-writer sink (gpkg architecture) + schema-first contract."""

import sqlite3

import numpy as np
import pyarrow as pa
import pytest


def test_sqlite_writer_per_type_tables(ray_session, tmp_path):
    import ray.data

    from plateau_gis_converter_ray.sinks.sqlite import SQLiteWriter, finalize_contents

    db = str(tmp_path / "out.db")
    ds = ray.data.from_items(
        [
            {"typ": ["Building", "Road"][i % 2], "fid": i,
             "lng": 139.0 + i * 0.01, "lat": 35.0 + i * 0.01,
             "attrs": {"height": i}}
            for i in range(50)
        ]
    )
    out = ds.map_batches(
        SQLiteWriter,
        fn_constructor_args=(db, "typ"),
        batch_format="pandas",
        concurrency=1,  # the single-tx serialization point (gpkg/mod.rs:210-251)
    )
    assert out.to_pandas()["written"].sum() == 50
    contents = finalize_contents(db)
    assert set(contents) == {"Building", "Road"}
    assert contents["Building"]["rows"] == 25
    con = sqlite3.connect(db)
    # nested attrs stringified (gpkg/attributes.rs role)
    v = con.execute('SELECT attrs FROM "Building" LIMIT 1').fetchone()[0]
    assert v.startswith("{") and "height" in v
    # bbox recorded in contents metadata (update_bbox role)
    row = con.execute(
        "SELECT min_x, max_x FROM contents WHERE table_name='Road'"
    ).fetchone()
    assert 139.0 <= row[0] <= row[1] <= 139.5


def test_derive_schema_matches_pipeline(ray_session):
    """The schema is finalized before any data flows (main.rs:242-251):
    derive_schema(chain) must equal the streamed output schema exactly."""
    import ray.data

    from plateau_gis_converter_ray.pipelines.build import (
        DataRequirements,
        apply_chain,
        build_transform_chain,
        derive_schema,
    )

    with pytest.raises(ValueError):
        # tile assignment consumes lng/lat: non-lnglat CRS is rejected
        build_transform_chain(
            DataRequirements(output_crs="webmercator", tile_scheme="3dt")
        )

    req = DataRequirements(
        output_crs="lnglat",
        rename_rules={"*:name": "title"},
        jsonify=True,
        tile_scheme="3dt",
        min_zoom=6,
        max_zoom=8,
    )
    chain = build_transform_chain(req)

    rows = [
        {
            "gml:name": f"bldg{i}",
            "lng": 135.0 + i * 0.1,
            "lat": 34.0 + i * 0.1,
            "height": float(i),
            "props": {"a": i},
        }
        for i in range(20)
    ]
    ds = ray.data.from_items(rows)
    in_schema = ds.schema().base_schema
    expected = derive_schema(in_schema, chain)
    out = apply_chain(ds, chain)
    got = out.schema().base_schema
    assert got.names == expected.names
    for name in got.names:
        assert got.field(name).type == expected.field(name).type, name


def test_derive_schema_identity_projection():
    import pyarrow as pa

    from plateau_gis_converter_ray.pipelines.build import derive_schema

    schema = pa.schema([("lng", pa.float64()), ("lat", pa.float64()), ("v", pa.int64())])
    out = derive_schema(schema, [("projection", {"output": "lnglat"})])
    assert out == schema  # height-less lnglat chain is the identity
    out2 = derive_schema(schema, [("projection", {"output": "ecef"})])
    assert set(out2.names) == {"v", "ecef_x", "ecef_y", "ecef_z"}


def test_gpb_blob_roundtrip():
    import numpy as np

    from plateau_gis_converter_ray.sinks.sqlite import decode_gpb, gpb_multipolygonz

    ring = np.array([[0., 0., 111.], [5., 0., 111.], [5., 5., 111.],
                     [0., 5., 111.], [0., 0., 111.]])
    hole = np.array([[1., 1., 111.], [4., 1., 111.], [4., 4., 111.],
                     [1., 4., 111.], [1., 1., 111.]])
    blob = gpb_multipolygonz([[ring, hole]], srs_id=6697)
    # header per geometry.rs:48-58: GP magic, version 0, flags 0b1, LE srs
    assert blob[:2] == b"GP" and blob[2] == 0 and blob[3] == 1
    d = decode_gpb(blob)
    assert d["srs_id"] == 6697
    assert d["geometry_type"] == 1006 and d["byte_order"] == 1
    assert len(d["polys"]) == 1 and len(d["polys"][0]) == 2
    assert np.array_equal(d["polys"][0][0], ring)
    assert np.array_equal(d["polys"][0][1], hole)


def test_sqlite_writer_geom_blobs(ray_session, tmp_path):
    import sqlite3

    import numpy as np
    import ray.data

    from plateau_gis_converter_ray.sinks.sqlite import SQLiteWriter, decode_gpb

    db = str(tmp_path / "geo.db")
    rows = [
        {"fid": i, "typ": "Building", "rings_xyz": [0, 0, 1, 1, 0, 1, 1, 1, 1]}
        for i in range(5)
    ]
    ds = ray.data.from_items(rows)
    written = ds.map_batches(
        SQLiteWriter,
        fn_constructor_args=(db, "typ"),
        fn_constructor_kwargs={"geom_col": "rings_xyz", "srs_id": 6697},
        batch_format="pandas",
        concurrency=1,
    ).to_pandas()["written"].sum()
    assert written == 5
    con = sqlite3.connect(db)
    blobs = [r[0] for r in con.execute('SELECT geom FROM "Building"')]
    assert len(blobs) == 5
    d = decode_gpb(blobs[0])
    assert d["srs_id"] == 6697
    assert len(d["polys"][0][0]) == 4  # closed triangle


def test_gpb_reference_byte_fixture():
    """geometry.rs:124-210's own test vector, byte-exact: 1 polygon with a
    hole, closed 5-point rings, srs 1234 -> 274 bytes with the documented
    offsets."""
    import struct

    import numpy as np

    from plateau_gis_converter_ray.sinks.sqlite import gpb_multipolygonz

    ext = np.array([[0., 0., 111.], [5., 0., 111.], [5., 5., 111.],
                    [0., 5., 111.], [0., 0., 111.]])
    hole = np.array([[1., 1., 111.], [2., 1., 111.], [2., 2., 111.],
                     [1., 2., 111.], [1., 1., 111.]])
    b = gpb_multipolygonz([[ext, hole]], srs_id=1234)
    assert len(b) == 274
    assert b[0:4] == bytes([0x47, 0x50, 0x00, 0b00000001])
    assert b[4:8] == struct.pack("<i", 1234)
    assert b[8] == 0x01
    assert b[9:13] == struct.pack("<I", 1006)
    assert b[13:17] == struct.pack("<I", 1)
    assert b[17] == 0x01
    assert b[18:22] == struct.pack("<I", 1003)
    assert b[22:26] == struct.pack("<I", 2)
    assert b[26:30] == struct.pack("<I", 5)
    assert b[30:38] == struct.pack("<d", 0.0)
    assert b[54:62] == struct.pack("<d", 5.0)
    assert b[142:150] == struct.pack("<d", 111.0)
    assert b[150:154] == struct.pack("<I", 5)
    assert b[154:162] == struct.pack("<d", 1.0)
