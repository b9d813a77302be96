"""3D Tiles 1.1 implicit-quadtree subtree pins (sinks/implicit.py).

The per-subtree bit COUNTS are oracle-gated (implicit_quadtree); these
pins cover the byte layout SQL can't see: Morton indexing, the spec
bitstream convention, the binary container round-trip, and the full
pipeline's availability sets against a local recompute.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL


def test_morton_and_level_offset():
    from plateau_gis_converter_ray.sinks.implicit import (
        level_offset,
        morton2,
    )

    # hand cases: morton(x=1,y=0)=1, (0,1)=2, (1,1)=3, (2,3)=0b1110=14
    assert morton2(np.array([1, 0, 1, 2]), np.array([0, 1, 1, 3]), 2).tolist() \
        == [1, 2, 3, 14]
    # level-major offsets: (4^L - 1) / 3
    assert [level_offset(i) for i in range(5)] == [0, 1, 5, 21, 85]


def test_bitstream_convention_and_roundtrip():
    from plateau_gis_converter_ray.sinks.implicit import pack_bits, unpack_bits

    # spec: bit i -> byte i//8, position i%8 (little bit order)
    assert pack_bits(np.array([0]), 8) == b"\x01"
    assert pack_bits(np.array([7]), 8) == b"\x80"
    assert pack_bits(np.array([8]), 16) == b"\x00\x01"
    idx = np.unique(np.array([0, 3, 9, 20, 84, 63]))
    assert unpack_bits(pack_bits(idx, 85), 85).tolist() == sorted(idx.tolist())


def test_subtree_container_roundtrip():
    from plateau_gis_converter_ray.sinks.implicit import (
        MAGIC,
        decode_subtree,
        encode_subtree,
    )

    tile = np.array([0, 1, 5, 21, 84])
    content = np.array([21, 84])
    child = np.array([0, 255])
    blob = encode_subtree(tile, content, child, 4)
    assert blob[:4] == MAGIC
    version, jlen, blen = struct.unpack("<IQQ", blob[4:24])
    assert version == 1 and jlen % 8 == 0
    meta = json.loads(blob[24 : 24 + jlen])
    assert meta["tileAvailability"]["availableCount"] == 5
    t, c, ch, _ = decode_subtree(blob, 4)
    assert t.tolist() == tile.tolist()
    assert c.tolist() == content.tolist()
    assert ch.tolist() == child.tolist()


def test_implicit_pipeline_availability_sets(ray_session):
    """Decode every emitted .subtree blob and compare the three
    availability sets against a local recompute of the ancestor closure
    over the same occupied z11 tiles."""
    import pyarrow as pa
    import ray.data

    from plateau_gis_converter_ray.sinks.implicit import (
        decode_subtree,
        implicit_subtrees,
        avail_index,
        morton2,
        subtree_key,
    )
    from plateau_gis_converter_ray.stages.geocode import add_lnglat_arith
    from plateau_gis_converter_ray.stages.tiles import assign_webmercator

    ev = pd.read_parquet(SF_SMALL + "/events.parquet", columns=["event_id"])
    b = assign_webmercator(
        add_lnglat_arith(pa.Table.from_pandas(ev), "event_id"), 11
    )
    t = (
        pd.DataFrame(
            {"x": b.column("tile_x").to_numpy(),
             "y": b.column("tile_y").to_numpy()}
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )
    S = 4
    tiles = ray.data.from_arrow(
        pa.table(
            {
                "z": pa.array(np.full(len(t), 11, np.int64)),
                "x": pa.array(t["x"].to_numpy().astype(np.int64)),
                "y": pa.array(t["y"].to_numpy().astype(np.int64)),
            }
        )
    )
    out = implicit_subtrees(tiles, subtree_levels=S).to_pandas()

    # local recompute: ancestor closure grouped by subtree
    want_tile: dict = {}
    want_content: dict = {}
    want_child: dict = {}
    for x, y in zip(t["x"].to_numpy(), t["y"].to_numpy()):
        for up in range(12):
            z, xa, ya = 11 - up, int(x) >> up, int(y) >> up
            rl, rx, ry = (z // S) * S, xa >> (z % S), ya >> (z % S)
            key = (rl, rx, ry)
            bit = int(
                avail_index(
                    np.array([z - rl]),
                    np.array([xa - (rx << (z - rl))]),
                    np.array([ya - (ry << (z - rl))]),
                )[0]
            )
            want_tile.setdefault(key, set()).add(bit)
            if up == 0:
                want_content.setdefault(key, set()).add(bit)
            if z == rl and rl > 0:
                pk = (rl - S, rx >> S, ry >> S)
                cbit = int(
                    morton2(
                        np.array([rx - ((rx >> S) << S)]),
                        np.array([ry - ((ry >> S) << S)]), S,
                    )[0]
                )
                want_child.setdefault(pk, set()).add(cbit)

    assert len(out) == len(want_tile)
    for row in out.itertuples():
        key = (int(row.root_level), int(row.root_x), int(row.root_y))
        tb, cb, chb, meta = decode_subtree(bytes(row.blob), S)
        assert set(tb.tolist()) == want_tile[key]
        assert set(cb.tolist()) == want_content.get(key, set())
        assert set(chb.tolist()) == want_child.get(key, set())
        assert row.n_tile_bits == len(want_tile[key])
    # sanity: the root subtree exists and is internally consistent
    assert (0, 0, 0) in want_tile

    # subtree_key helper agrees with the inline arithmetic above
    rl, rx, ry = subtree_key(
        np.array([11]), np.array([1000]), np.array([700]), S
    )
    assert (int(rl[0]), int(rx[0]), int(ry[0])) == (8, 125, 87)


def test_write_implicit_tileset_resume(ray_session, tmp_path):
    """Full artifact write + the resume contract: a complete artifact
    with a matching fingerprint+config is skipped touching NO file; a
    changed fingerprint rebuilds."""
    import os

    import pyarrow as pa
    import ray.data

    from plateau_gis_converter_ray.sinks.implicit import (
        decode_subtree,
        write_implicit_tileset,
    )

    def tiles():
        return ray.data.from_arrow(
            pa.table(
                {
                    "z": pa.array([11, 11, 11], pa.int64()),
                    "x": pa.array([1000, 1001, 40], pa.int64()),
                    "y": pa.array([700, 700, 50], pa.int64()),
                }
            )
        )

    out = str(tmp_path / "implicit")
    r1 = write_implicit_tileset(
        tiles(), out, max_level=11, fingerprint=[["events", 1]]
    )
    assert r1["built"] and len(r1["subtrees"]) >= 3
    assert os.path.exists(os.path.join(out, "tileset.json"))
    ts = json.load(open(os.path.join(out, "tileset.json")))
    it = ts["root"]["implicitTiling"]
    assert it["subdivisionScheme"] == "QUADTREE" and it["subtreeLevels"] == 4
    # every committed record corresponds to a decodable file
    for lv, x, y, nb in r1["subtrees"]:
        p = os.path.join(out, "subtrees", f"{lv}.{x}.{y}.subtree")
        blob = open(p, "rb").read()
        assert len(blob) == nb
        decode_subtree(blob, 4)

    mtimes = {
        f: os.path.getmtime(os.path.join(out, "subtrees", f))
        for f in os.listdir(os.path.join(out, "subtrees"))
    }
    r2 = write_implicit_tileset(
        tiles(), out, max_level=11, fingerprint=[["events", 1]]
    )
    assert not r2["built"]
    assert r2["subtrees"] == r1["subtrees"]
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, "subtrees", f)) == m

    # changed input fingerprint: never serves the stale artifact
    r3 = write_implicit_tileset(
        tiles(), out, max_level=11, fingerprint=[["events", 2]]
    )
    assert r3["built"]
