"""Grouped / partitioned writers — the sink patterns of SURVEY.md §2.7.

- :func:`write_per_group` — one file per group key (the geojson/shapefile/
  kml "file per typename" pattern, geojson/mod.rs:106-152), realized as
  ``groupby(key).map_groups(write)`` so each group writes in parallel, plus
  a manifest line per group for resume.
- :func:`write_tiles` — one payload file per (z, x, y) under ``z/x/y.*``
  (the 3dtiles/mvt layout, cesiumtiles/mod.rs:262-340), fed by the salted
  tile shuffle; encodes with the MVT command-stream encoder.
- :class:`SingleWriterActor` — serialization point for one-file formats
  (gpkg's single sqlite transaction, czml/kml single documents;
  gpkg/mod.rs:210-251): batches stream through ONE actor that appends in
  arrival order.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..state.manifest import PartitionManifest, atomic_write_dir


def properties_html_table(props: dict) -> str:
    """Per-feature HTML description table (czml/mod.rs:150-158: one
    <tr><td>key</td><td>value</td></tr> per property; values rendered as
    their JSON form, the serde_json Display the reference formats with)."""
    rows = "".join(
        f"<tr><td>{k}</td><td>{json.dumps(v, default=str)}</td></tr>"
        for k, v in props.items()
    )
    return f"<table>{rows}</table>"


def write_per_group(ds, key: str, out_dir: str, fmt: str = "jsonl"):
    """Write one file per distinct ``key`` value; returns the manifest.

    Each group writes atomically (temp dir + rename) and commits a manifest
    line, so reruns skip completed groups upstream of the shuffle.
    """
    manifest = PartitionManifest(out_dir)
    done = manifest.completed_keys()

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        k = str(g[key].iloc[0])
        if k in done:
            return pd.DataFrame({"key": [k], "rows": [0], "skipped": [True]})
        part_dir = manifest.partition_dir(k)

        def do_write(tmp):
            path = os.path.join(tmp, f"data.{fmt}")
            if fmt == "jsonl":
                g.to_json(path, orient="records", lines=True)
            elif fmt == "parquet":
                g.to_parquet(path, index=False)
            elif fmt == "csv":
                g.to_csv(path, index=False)
            elif fmt == "geojson":
                # one FeatureCollection per group (geojson/mod.rs:106-152):
                # rows with lng/lat become Point features, other columns
                # become properties
                feats = []
                for rec in g.to_dict(orient="records"):
                    lng = rec.pop("lng", None)
                    lat = rec.pop("lat", None)
                    geom = (
                        {"type": "Point", "coordinates": [lng, lat]}
                        if lng is not None and lat is not None
                        else None
                    )
                    feats.append(
                        {"type": "Feature", "geometry": geom,
                         "properties": {kk: vv for kk, vv in rec.items()
                                        if kk != key}}
                    )
                with open(path, "w") as f:
                    json.dump(
                        {"type": "FeatureCollection", "features": feats},
                        f, separators=(",", ":"), default=str,
                    )
            elif fmt == "kml":
                # Placemarks with ExtendedData (sink/kml/mod.rs:68-283 shape)
                parts = ['<?xml version="1.0" encoding="UTF-8"?>',
                         '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>']
                for rec in g.to_dict(orient="records"):
                    lng = rec.pop("lng", None)
                    lat = rec.pop("lat", None)
                    ring = rec.pop("ring_lnglat", None)
                    data = "".join(
                        f'<Data name="{kk}"><value>{vv}</value></Data>'
                        for kk, vv in rec.items() if kk != key
                    )
                    if ring is not None and len(ring):
                        # polygon placemark (kml/mod.rs:117,257-299 role):
                        # outer LinearRing from the flat [lng,lat,...] ring
                        pairs = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                        coords = " ".join(f"{a},{b}" for a, b in pairs)
                        geom = (
                            "<Polygon><outerBoundaryIs><LinearRing>"
                            f"<coordinates>{coords}</coordinates>"
                            "</LinearRing></outerBoundaryIs></Polygon>"
                        )
                    elif lng is not None and lat is not None:
                        geom = f"<Point><coordinates>{lng},{lat}</coordinates></Point>"
                    else:
                        geom = ""
                    parts.append(
                        f"<Placemark><ExtendedData>{data}</ExtendedData>{geom}</Placemark>"
                    )
                parts.append("</Document></kml>")
                with open(path, "w") as f:
                    f.write("".join(parts))
            elif fmt == "czml":
                # CZML packet array with a document packet first
                # (sink/czml/mod.rs:68-391 shape)
                packets = [{"id": "document", "version": "1.0"}]
                for rec in g.to_dict(orient="records"):
                    lng = rec.pop("lng", None)
                    lat = rec.pop("lat", None)
                    ring = rec.pop("ring_lnglat", None)
                    props = {kk: vv for kk, vv in rec.items() if kk != key}
                    pkt = {
                        "id": str(rec.get("fid", rec.get("id", len(packets)))),
                        "properties": props,
                        # per-feature HTML property table
                        # (czml/mod.rs:143-165 map_to_html_table)
                        "description": properties_html_table(props),
                    }
                    if ring is not None and len(ring):
                        # one polygon packet per face; CZML has no
                        # multi-part polygons (czml/mod.rs:201-209)
                        pairs = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                        degrees = []
                        for a, b in pairs:
                            degrees += [float(a), float(b), 0.0]
                        pkt["polygon"] = {
                            "positions": {"cartographicDegrees": degrees},
                            "perPositionHeight": True,
                        }
                    elif lng is not None and lat is not None:
                        pkt["position"] = {
                            "cartographicDegrees": [lng, lat, 0.0]
                        }
                    packets.append(pkt)
                with open(path, "w") as f:
                    json.dump(packets, f, separators=(",", ":"), default=str)
            else:
                raise ValueError(f"unknown fmt {fmt}")

        atomic_write_dir(part_dir, do_write)
        manifest.commit_partition(k, len(g), checksum=int(abs(hash((k, len(g))))))
        return pd.DataFrame({"key": [k], "rows": [len(g)], "skipped": [False]})

    return ds.groupby(key).map_groups(write_group, batch_format="pandas")


MAX_TILE_BYTES = 500_000  # compressed cap (mvt/mod.rs:308-336)
MIN_DETAIL = 9  # extent degrades 2^12 -> 2^9 before giving up
FEATURE_WARN = 200_000  # per-tile feature-count skew guard (mvt/mod.rs:296-301)


def write_tiles(ds, out_dir: str, extent: int = 1 << 12,
                max_bytes: int = MAX_TILE_BYTES, debug_sidecar: bool = False):
    """Write one MVT tile per (z, x, y): groupby(tile key) ->
    map_groups(encode + write z/x/y.pbf). Expects columns zoom, tile_x,
    tile_y and per-row ring payloads as list columns ``ring_xy`` (flat
    [x0,y0,x1,y1,...] tile-local coords in [0,1]); optional ``pid`` becomes
    the feature id + a tag.

    The payload is REAL MVT protobuf (sinks/pbf.py — varint/packed framing
    mirroring mvt/mod.rs:303-345 + vector_tile.rs); ``debug_sidecar=True``
    additionally writes the deterministic dict form as ``y.json`` (off by
    default: a sidecar per tile doubles file count and write IO at 10^9
    tiles). Mirrors the
    reference's detail-degradation retry (mvt/mod.rs:308-336): if the
    zlib-compressed pbf exceeds ``max_bytes`` the tile is re-encoded at
    successively halved extents down to 2^9. Tiles with more than
    ``FEATURE_WARN`` features are flagged (the skew detector,
    mvt/mod.rs:296-301)."""
    import zlib

    from .mvt import encode_tile_dict, make_tile_pbf

    os.makedirs(out_dir, exist_ok=True)

    def write_tile(g: pd.DataFrame) -> pd.DataFrame:
        z = int(g["zoom"].iloc[0])
        x = int(g["tile_x"].iloc[0])
        y = int(g["tile_y"].iloc[0])
        has_pid = "pid" in g.columns
        has_layer = "layer" in g.columns  # per-typename MVT layers
        feats = []
        rings = []
        for i, flat in enumerate(g["ring_xy"]):
            arr = np.asarray(flat, dtype=np.float64).reshape(-1, 2)
            rings.append((True, arr))
            feat = {"rings": [(True, arr)]}
            if has_pid:
                pid = str(g["pid"].iloc[i])
                feat["attrs"] = {"pid": pid}
                feat["id"] = pid
            if has_layer:
                feat["layer"] = str(g["layer"].iloc[i])
            feats.append(feat)

        detail = extent.bit_length() - 1
        while True:
            pbf = make_tile_pbf(feats, detail)
            compressed = zlib.compress(pbf)
            if len(compressed) <= max_bytes or detail <= MIN_DETAIL:
                break
            detail -= 1  # degrade detail and retry (mvt/mod.rs:318-333)

        path_dir = os.path.join(out_dir, str(z), str(x))
        os.makedirs(path_dir, exist_ok=True)
        tmp = os.path.join(path_dir, f".tmp_{y}.pbf")
        with open(tmp, "wb") as f:
            f.write(pbf)
        os.replace(tmp, os.path.join(path_dir, f"{y}.pbf"))
        if debug_sidecar:
            # debuggable dict sidecar (per-tile dedup vertex table included)
            attrs = [f.get("attrs") or {} for f in feats] if has_pid else None
            sidecar = json.dumps(
                encode_tile_dict(rings, 1 << detail, attrs=attrs),
                separators=(",", ":"),
            )
            tmp_j = os.path.join(path_dir, f".tmp_{y}.json")
            with open(tmp_j, "w") as f:
                f.write(sidecar)
            os.replace(tmp_j, os.path.join(path_dir, f"{y}.json"))
        return pd.DataFrame(
            {
                "zoom": [z], "tile_x": [x], "tile_y": [y],
                "n_features": [len(g)],
                "detail": [detail],
                "compressed_bytes": [len(compressed)],
                "skew_warn": [len(g) > FEATURE_WARN],
            }
        )

    return ds.groupby(["zoom", "tile_x", "tile_y"]).map_groups(
        write_tile, batch_format="pandas"
    )


class SingleWriterActor:
    """One-file-format writer: exactly one actor appends all batches.

    Use as ``ds.map_batches(SingleWriterActor, fn_constructor_args=(path,),
    concurrency=1)`` — concurrency=1 IS the serialization contract.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.fh = open(path, "a")
        self.rows = 0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        for rec in batch.to_dict(orient="records"):
            self.fh.write(json.dumps(rec, separators=(",", ":"), default=str) + "\n")
        self.fh.flush()
        self.rows += len(batch)
        return pd.DataFrame({"written": [len(batch)]})
