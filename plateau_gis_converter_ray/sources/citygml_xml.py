"""CityGML-shaped XML source: REAL per-file XML parse, file-parallel.

The reference's ``CityGmlSource::run`` opens each .gml file, streams it
through a namespace-aware XML reader and emits one entity per
``core:cityObjectMember`` with its attributes and geometry, resolving
code-typed attributes against codelist dictionaries
(``nusamai/src/source/citygml.rs:60-141``). This module does the same on
Ray Data:

- :func:`write_citygml_files` synthesizes deterministic CityGML-shaped
  documents (``core:CityModel`` -> ``core:cityObjectMember`` ->
  ``bldg:Building`` with ``gml:posList`` footprints, ``bldg:measuredHeight``
  and ``gen:stringAttribute`` generics, plus a codeSpace-coded usage
  attribute) — no real PLATEAU data is shippable, so the corpus is
  generated at any scale from the row index, like every other fixture;
- :func:`read_citygml` = ``ray.data.read_binary_files`` over the .gml
  directory (one task per file — the reference's per-file parallelism)
  -> ``map_batches`` ElementTree parse -> one Arrow row per building with
  the usage code resolved through the gml:Dictionary codelist
  (stages/codelist.py), i.e. the full source contract: parse + codelist
  resolution in one pass.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

NS = {
    "core": "http://www.opengis.net/citygml/2.0",
    "bldg": "http://www.opengis.net/citygml/building/2.0",
    "gen": "http://www.opengis.net/citygml/generics/2.0",
    "gml": "http://www.opengis.net/gml",
}

USAGE_CODES = {f"u{k}": name for k, name in enumerate(
    ["residential", "commercial", "industrial", "public",
     "agricultural", "transport", "religious", "vacant"]
)}

GENERATOR_VERSION = "v1"


def _building_xml(idx: int) -> str:
    """One deterministic bldg:Building member for global feature ``idx``."""
    from ..stages.geocode import geocode_arith

    lng, lat = geocode_arith(np.array([idx], dtype=np.int64))
    lng, lat = float(lng[0]), float(lat[0])
    h = (idx * 7) % 200 + 3
    d = 0.0005 + (idx % 5) * 0.0001  # footprint half-size in degrees
    # closed CCW ring, lat lng order inside posList (CityGML axis order)
    ring = [
        (lat, lng), (lat, lng + d), (lat + d, lng + d), (lat + d, lng),
        (lat, lng),
    ]
    pos = " ".join(f"{a:.7f} {b:.7f} 0" for a, b in ring)
    usage = f"u{idx % len(USAGE_CODES)}"
    return (
        f'<core:cityObjectMember><bldg:Building gml:id="bldg_{idx:08d}">'
        f"<bldg:measuredHeight>{h}</bldg:measuredHeight>"
        f'<bldg:usage codeSpace="../../codelists/usage.xml">{usage}</bldg:usage>'
        f'<gen:stringAttribute name="district">'
        f"<gen:value>d{idx % 16}</gen:value></gen:stringAttribute>"
        f"<bldg:lod0FootPrint><gml:MultiSurface><gml:surfaceMember>"
        f"<gml:Polygon><gml:exterior><gml:LinearRing>"
        f"<gml:posList>{pos}</gml:posList>"
        f"</gml:LinearRing></gml:exterior></gml:Polygon>"
        f"</gml:surfaceMember></gml:MultiSurface></bldg:lod0FootPrint>"
        f"</bldg:Building></core:cityObjectMember>"
    )


def write_citygml_files(out_dir: str, n_files: int, feats_per_file: int) -> str:
    """Synthesize the .gml corpus (idempotent via _SUCCESS marker) plus the
    usage codelist the coded attribute points at."""
    from ..stages.codelist import write_codelist_xml

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    write_codelist_xml(os.path.join(out_dir, "codelists", "usage.xml"),
                       USAGE_CODES)
    header = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<core:CityModel "
        + " ".join(f'xmlns:{k}="{v}"' for k, v in NS.items())
        + ">"
    )
    for f in range(n_files):
        parts = [header]
        for j in range(feats_per_file):
            parts.append(_building_xml(f * feats_per_file + j))
        parts.append("</core:CityModel>")
        tmp = os.path.join(out_dir, f".tmp_{f:05d}.gml")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("".join(parts))
        os.replace(tmp, os.path.join(out_dir, f"{f:05d}.gml"))
    with open(marker, "w") as fh:
        fh.write(str(n_files * feats_per_file))
    return out_dir


class CityGmlParse:
    """Per-file parse + codelist resolution (one instance shipped as the
    task fn; the codelist XML parses lazily once per worker)."""

    def __init__(self, codelist_path: str):
        self.codelist_path = codelist_path
        self._codes: dict[str, str] | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import xml.etree.ElementTree as ET

        if self._codes is None:
            from ..stages.codelist import parse_codelist_xml

            self._codes = parse_codelist_xml(self.codelist_path)
        gml_ids, files, usages, districts = [], [], [], []
        heights, lngs, lats, npts = [], [], [], []
        for path, blob in zip(
            batch.column("path").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            root = ET.fromstring(blob)
            fname = os.path.basename(path)
            for member in root.iter(
                f"{{{NS['core']}}}cityObjectMember"
            ):
                b = member.find(f"{{{NS['bldg']}}}Building", )
                if b is None:
                    continue
                gml_ids.append(b.get(f"{{{NS['gml']}}}id"))
                files.append(fname)
                hgt = b.find(f"{{{NS['bldg']}}}measuredHeight")
                heights.append(float(hgt.text) if hgt is not None else 0.0)
                usage = b.find(f"{{{NS['bldg']}}}usage")
                code = usage.text if usage is not None else ""
                usages.append(self._codes.get(code, code))
                district = ""
                for ga in b.iter(f"{{{NS['gen']}}}stringAttribute"):
                    if ga.get("name") == "district":
                        v = ga.find(f"{{{NS['gen']}}}value")
                        district = v.text if v is not None else ""
                districts.append(district)
                pos = b.find(
                    ".//{{{gml}}}posList".format(gml=NS["gml"])
                )
                coords = np.array(
                    pos.text.split(), dtype=np.float64
                ).reshape(-1, 3)
                # CityGML posList is lat lng h -> axis swap on ingest
                # (transformer/transform/projection.rs:30-34 role)
                lats.append(float(coords[0, 0]))
                lngs.append(float(coords[0, 1]))
                npts.append(len(coords))
        return pa.table(
            {
                "gml_id": pa.array(gml_ids, pa.string()),
                "file": pa.array(files, pa.string()),
                "usage": pa.array(usages, pa.string()),
                "district": pa.array(districts, pa.string()),
                "height": pa.array(heights, pa.float64()),
                "lng": pa.array(lngs, pa.float64()),
                "lat": pa.array(lats, pa.float64()),
                "n_ring_pts": pa.array(npts, pa.int64()),
            }
        )


def read_citygml(gml_dir: str):
    """File-parallel CityGML read: one read task per .gml file, parse +
    codelist resolve inside the fused chain."""
    import ray.data

    files = sorted(
        os.path.join(gml_dir, f)
        for f in os.listdir(gml_dir)
        if f.endswith(".gml")
    )
    ds = ray.data.read_binary_files(files, include_paths=True)
    return ds.map_batches(
        CityGmlParse(os.path.join(gml_dir, "codelists", "usage.xml")),
        batch_format="pyarrow",
    )


def ensure_citygml_corpus(sf: float, base: str = "/tmp/plateau_ray_data") -> str:
    """Scale-proportional corpus: ~sf * 3200 buildings over sf-scaled file
    count (>= 4 files so the read parallelizes)."""
    n_feats = max(64, int(sf * 320000))
    per_file = 64
    n_files = max(4, n_feats // per_file)
    out = os.path.join(base, f"citygml_{GENERATOR_VERSION}_sf{sf:g}")
    return write_citygml_files(out, n_files, per_file)
