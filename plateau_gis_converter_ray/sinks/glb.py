"""Binary glTF (glb) writer + EXT_structural_metadata encoder.

Re-derives the reference's 3D-Tiles tile content writer for the tabular
engine:

- glb container framing == ``nusamai-gltf/src/glb.rs:22-72`` exactly
  (magic/version/total-length header; JSON chunk space-padded, BIN chunk
  zero-padded, both to the requested alignment — the reference writes with
  alignment 8, gltf.rs:270);
- glTF JSON layout == ``nusamai/src/sink/cesiumtiles/gltf.rs:19-273``:
  one interleaved 9-float vertex buffer view (stride 36) with
  positions/normals/texcoords/_FEATURE_ID_0 accessors, per-primitive u32
  index accessors, a single scene/node carrying the tile translation, and
  ``EXT_mesh_features`` + ``EXT_structural_metadata`` extensions;
- :class:`MetadataEncoder` == ``cesiumtiles/metadata/mod.rs:23-504``:
  schema-driven per-tile property-table columnarizer (typename -> Class,
  per-property little-endian value buffers, string offset tables, noData
  fills for absent attributes, one shared Enum01 value dictionary).
  Arrays are not needed by the tabular schemas and are omitted (the
  reference's array_offsets branch) — scalar int64/uint64/float64/string/
  enum cover every attribute the engine's tables produce.

Triangulation lives in ``kernels/earcut.py`` (ear clipping with holes ==
the reference's earcut crate, cesiumtiles/mod.rs:20); ``fan_triangulate``
below remains the O(n) fast path for rings the caller knows are convex.
"""

from __future__ import annotations

import json
import struct

import numpy as np

GLB_MAGIC = b"glTF"
JSON_MARKER = b"JSON"
BIN_MARKER = b"BIN\x00"

INT64_NO_DATA = -(2 ** 63)
UINT64_NO_DATA = 2 ** 64 - 1
FLOAT_NO_DATA = np.finfo(np.float64).max
ENUM_NO_DATA = 0
ENUM_NO_DATA_NAME = ""


def write_glb(json_bytes: bytes, bin_bytes: bytes, alignment: int = 8) -> bytes:
    """glb container bytes (glb.rs:27-72 padding arithmetic, verbatim)."""
    jlen = len(json_bytes)
    jpad = (alignment - ((12 + 8 + jlen + 8) % alignment)) % alignment
    blen = len(bin_bytes)
    bpad = (alignment - ((12 + 16 + blen) % alignment)) % alignment
    total = 12 + 8 + jlen + jpad + 8 + blen + bpad
    out = bytearray()
    out += GLB_MAGIC
    out += struct.pack("<II", 2, total)
    out += struct.pack("<I", jlen + jpad) + JSON_MARKER
    out += json_bytes + b"\x20" * jpad
    out += struct.pack("<I", blen + bpad) + BIN_MARKER
    out += bin_bytes + b"\x00" * bpad
    return bytes(out)


def read_glb(buf: bytes) -> tuple[dict, bytes]:
    """Parse a glb back to (gltf json, bin chunk) — the round-trip check."""
    if buf[:4] != GLB_MAGIC:
        raise ValueError("glb magic must be 'glTF'")
    version, total = struct.unpack_from("<II", buf, 4)
    if version != 2:
        raise ValueError("glb version must be 2")
    if total != len(buf):
        raise ValueError(f"total length mismatch: {total} != {len(buf)}")
    jlen, = struct.unpack_from("<I", buf, 12)
    if buf[16:20] != JSON_MARKER:
        raise ValueError("first chunk must be JSON")
    gltf = json.loads(buf[20:20 + jlen].decode("utf-8"))
    pos = 20 + jlen
    blen, = struct.unpack_from("<I", buf, pos)
    if buf[pos + 4:pos + 8] != BIN_MARKER:
        raise ValueError("second chunk must be BIN")
    return gltf, buf[pos + 8:pos + 8 + blen]


def _add_padding(buffer: bytearray, alignment: int = 4) -> None:
    while len(buffer) % alignment:
        buffer.append(0)


class MetadataEncoder:
    """Schema-driven per-tile property-table columnarizer.

    ``schema``: {typename: {prop_name: type}} with type one of 'int64' |
    'uint64' | 'float64' | 'string' | 'enum', optionally suffixed '[]' for
    variable-length arrays (the reference's ``max_occurs != 1`` attributes
    -> arrayOffsets branch, metadata/mod.rs:300-314). ``add_feature``
    appends one row (noData fills for absent props, matching
    metadata/mod.rs:174-213) and returns the per-class feature id;
    ``into_metadata`` flushes the per-property little-endian buffers +
    array/string offset tables into the shared BIN buffer and returns the
    EXT_structural_metadata JSON.
    """

    def __init__(self, schema: dict[str, dict[str, str]]):
        self.schema = schema
        self.classes: dict[str, dict] = {}
        self.enum_values: dict[str, int] = {ENUM_NO_DATA_NAME: 0}

    def _class(self, typename: str) -> dict:
        cls = self.classes.get(typename)
        if cls is None:
            props = {}
            for name, type_ in self.schema[typename].items():
                is_array = type_.endswith("[]")
                base = type_[:-2] if is_array else type_
                props[name] = {
                    "type": base,
                    "is_array": is_array,
                    "values": bytearray(),
                    "string_offsets": [0] if base == "string" else [],
                    "array_offsets": [0] if is_array else [],
                    "count": 0,  # total elements appended (array offsets)
                    "used": False,
                }
            cls = self.classes[typename] = {"props": props, "count": 0}
        return cls

    def _append_value(self, prop: dict, v) -> None:
        t = prop["type"]
        if t == "int64":
            prop["values"] += struct.pack("<q", int(v))
        elif t == "uint64":
            prop["values"] += struct.pack("<Q", int(v))
        elif t == "float64":
            prop["values"] += struct.pack("<d", float(v))
        elif t == "string":
            prop["values"] += str(v).encode("utf-8")
            prop["string_offsets"].append(len(prop["values"]))
        elif t == "enum":
            idx = self.enum_values.setdefault(str(v), len(self.enum_values))
            prop["values"] += struct.pack("<I", idx)
        else:
            raise TypeError(t)
        prop["count"] += 1

    def add_feature(self, typename: str, attributes: dict) -> int:
        if typename not in self.schema:
            raise KeyError(typename)
        cls = self._class(typename)
        for name, prop in cls["props"].items():
            t = prop["type"]
            if name in attributes:
                v = attributes[name]
                prop["used"] = True
                if prop["is_array"]:
                    for item in v:
                        self._append_value(prop, item)
                    prop["array_offsets"].append(
                        len(prop["string_offsets"]) - 1 if t == "string"
                        else prop["count"]
                    )
                else:
                    self._append_value(prop, v)
            elif prop["is_array"]:
                # absent array -> empty slice (metadata/mod.rs:184-192)
                prop["array_offsets"].append(
                    len(prop["string_offsets"]) - 1 if t == "string"
                    else prop["count"]
                )
            else:  # noData fill (metadata/mod.rs:195-210)
                if t == "int64":
                    prop["values"] += struct.pack("<q", INT64_NO_DATA)
                elif t == "uint64":
                    prop["values"] += struct.pack("<Q", UINT64_NO_DATA)
                elif t == "float64":
                    prop["values"] += struct.pack("<d", FLOAT_NO_DATA)
                elif t == "string":
                    prop["string_offsets"].append(len(prop["values"]))
                elif t == "enum":
                    prop["values"] += struct.pack("<I", ENUM_NO_DATA)
        fid = cls["count"]
        cls["count"] += 1
        return fid

    def into_metadata(self, buffer: bytearray, buffer_views: list[dict]) -> dict:
        classes_json: dict[str, dict] = {}
        property_tables: list[dict] = []
        for typename, cls in self.classes.items():
            class_props: dict[str, dict] = {}
            pt_props: dict[str, dict] = {}
            for name, prop in cls["props"].items():
                if not prop["used"]:
                    continue
                t = prop["type"]
                cp: dict = {
                    "type": {"int64": "SCALAR", "uint64": "SCALAR",
                             "float64": "SCALAR", "string": "STRING",
                             "enum": "ENUM"}[t],
                }
                if t in ("int64", "uint64", "float64"):
                    cp["componentType"] = {"int64": "INT64", "uint64": "UINT64",
                                           "float64": "FLOAT64"}[t]
                if t == "enum":
                    cp["enumType"] = "Enum01"
                if prop["is_array"]:
                    cp["array"] = True
                    cp["noData"] = []
                else:
                    cp["noData"] = {
                        "int64": INT64_NO_DATA, "uint64": UINT64_NO_DATA,
                        "float64": FLOAT_NO_DATA, "string": "",
                        "enum": ENUM_NO_DATA_NAME,
                    }[t]
                class_props[name] = cp

                start = len(buffer)
                buffer += prop["values"]
                buffer_views.append(
                    {"buffer": 0, "byteOffset": start,
                     "byteLength": len(buffer) - start,
                     "name": "prop_values"}
                )
                values_idx = len(buffer_views) - 1
                _add_padding(buffer)
                entry = {"values": values_idx}
                if prop["is_array"]:
                    start = len(buffer)
                    for off in prop["array_offsets"]:
                        buffer += struct.pack("<I", off)
                    buffer_views.append(
                        {"buffer": 0, "byteOffset": start,
                         "byteLength": len(buffer) - start,
                         "name": "prop_array_offsets"}
                    )
                    entry["arrayOffsets"] = len(buffer_views) - 1
                    _add_padding(buffer)
                if t == "string":
                    start = len(buffer)
                    for off in prop["string_offsets"]:
                        buffer += struct.pack("<I", off)
                    buffer_views.append(
                        {"buffer": 0, "byteOffset": start,
                         "byteLength": len(buffer) - start,
                         "name": "prop_string_offsets"}
                    )
                    entry["stringOffsets"] = len(buffer_views) - 1
                    _add_padding(buffer)
                pt_props[name] = entry
            classes_json[typename] = {"properties": class_props}
            property_tables.append(
                {"class": typename, "count": cls["count"], "properties": pt_props}
            )
        enums = {
            "Enum01": {
                "valueType": "UINT32",
                "values": [
                    {"value": i, "name": n} for n, i in self.enum_values.items()
                ],
            }
        }
        return {
            "schema": {"id": "Schema", "classes": classes_json, "enums": enums},
            "propertyTables": property_tables,
        }


def fan_triangulate(n: int, base: int) -> np.ndarray:
    """Index fan for a convex ring of n vertices starting at ``base``."""
    if n < 3:
        return np.empty(0, dtype=np.uint32)
    i = np.arange(1, n - 1, dtype=np.uint32)
    return np.stack([np.full(n - 2, base, np.uint32), base + i, base + i + 1],
                    axis=1).reshape(-1)


def material_json(mat: dict, texture_set: dict, image_set: dict) -> dict:
    """One glTF material (material.rs:28-54 semantics): baseColorFactor +
    metallic 0.2 / roughness 0.5, baseColorTexture via the uri-deduped
    texture/image IndexSets."""
    pbr: dict = {
        "baseColorFactor": [float(c) for c in mat.get("base_color", (1, 1, 1, 1))],
        "metallicFactor": 0.2,
        "roughnessFactor": 0.5,
    }
    uri = mat.get("texture_uri")
    if uri:
        if uri not in texture_set:
            image_set.setdefault(uri, len(image_set))
            texture_set[uri] = len(texture_set)
        pbr["baseColorTexture"] = {"index": texture_set[uri], "texCoord": 0}
    out = {"pbrMetallicRoughness": pbr}
    if "name" in mat:
        out["name"] = mat["name"]
    return out


def tile_glb_bytes(vertices9: np.ndarray, indices: np.ndarray,
                   translation: list[float],
                   metadata: MetadataEncoder | None = None,
                   num_features: int = 0,
                   primitives: list[dict] | None = None,
                   materials: list[dict] | None = None) -> bytes:
    """Assemble one tile's glb (gltf.rs:19-273 JSON layout).

    ``vertices9``: (n, 9) float32 [x y z nx ny nz u v feature_id];
    ``indices``: flat u32 triangle list into it (the single-primitive
    path). Alternatively ``primitives`` = [{"indices": u32 array,
    "material": int}] groups triangles per material (the reference's
    Primitives = HashMap<Material, PrimitiveInfo>, gltf.rs:17,131-158) with
    ``materials`` = [{"base_color": [r,g,b,a], "texture_uri": str|None,
    "name": str}] deduped upstream (material.rs IndexSet role).
    """
    vertices9 = np.ascontiguousarray(vertices9, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.uint32)
    bin_content = bytearray()
    buffer_views: list[dict] = []
    accessors: list[dict] = []

    n_vert = len(vertices9)
    if n_vert:
        bin_content += vertices9.tobytes()
        buffer_views.append(
            {"buffer": 0, "byteOffset": 0, "byteLength": len(bin_content),
             "byteStride": 36, "target": 34962, "name": "vertices"}
        )
        pos = vertices9[:, :3].astype(np.float64)
        accessors.append(
            {"name": "positions", "bufferView": 0, "componentType": 5126,
             "count": n_vert, "type": "VEC3",
             "min": pos.min(axis=0).tolist(), "max": pos.max(axis=0).tolist()}
        )
        accessors.append(
            {"name": "normals", "bufferView": 0, "byteOffset": 12,
             "componentType": 5126, "count": n_vert, "type": "VEC3"}
        )
        accessors.append(
            {"name": "texcoords", "bufferView": 0, "byteOffset": 24,
             "componentType": 5126, "count": n_vert, "type": "VEC2"}
        )
        accessors.append(
            {"name": "_feature_ids", "bufferView": 0, "byteOffset": 32,
             "componentType": 5126, "count": n_vert, "type": "SCALAR"}
        )

    structural_metadata = None
    if metadata is not None:
        structural_metadata = metadata.into_metadata(bin_content, buffer_views)

    if primitives is None:
        primitives = (
            [{"indices": indices, "material": 0}] if len(indices) else []
        )

    gltf_primitives = []
    for prim in primitives:
        pidx = np.ascontiguousarray(prim["indices"], dtype=np.uint32)
        if not len(pidx):
            continue
        _add_padding(bin_content, 4)
        idx_offset = len(bin_content)
        bin_content += pidx.tobytes()
        buffer_views.append(
            {"buffer": 0, "byteOffset": idx_offset,
             "byteLength": len(bin_content) - idx_offset,
             "target": 34963, "name": "indices"}
        )
        accessors.append(
            {"name": "indices", "bufferView": len(buffer_views) - 1,
             "componentType": 5125, "count": int(len(pidx)),
             "type": "SCALAR"}
        )
        gltf_primitives.append(
            {
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2,
                               "_FEATURE_ID_0": 3},
                "indices": len(accessors) - 1,
                "material": int(prim.get("material", 0)),
                "mode": 4,
                "extensions": {
                    "EXT_mesh_features": {
                        "featureIds": [
                            {"featureCount": int(num_features),
                             "attribute": 0, "propertyTable": 0}
                        ]
                    }
                },
            }
        )

    # materials / textures / images (material.rs to_gltf + IndexSets)
    texture_set: dict[str, int] = {}
    image_set: dict[str, int] = {}
    if materials is None:
        gltf_materials = [{"name": "default", "pbrMetallicRoughness":
                           {"baseColorFactor": [1.0, 1.0, 1.0, 1.0]}}]
    else:
        gltf_materials = [
            material_json(m, texture_set, image_set) for m in materials
        ]
    gltf_textures = [
        {"source": image_set[uri]} for uri in texture_set
    ]
    gltf_images = [{"uri": uri} for uri in image_set]

    gltf: dict = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": translation} if gltf_primitives
                  else {"translation": translation}],
        "meshes": [{"primitives": gltf_primitives}] if gltf_primitives else [],
        "materials": gltf_materials,
        "accessors": accessors,
        "bufferViews": buffer_views,
        "buffers": [{"byteLength": len(bin_content)}] if bin_content else [],
        "extensionsUsed": ["EXT_mesh_features", "EXT_structural_metadata"],
    }
    if gltf_textures:
        gltf["textures"] = gltf_textures
        gltf["images"] = gltf_images
    if structural_metadata is not None:
        gltf["extensions"] = {"EXT_structural_metadata": structural_metadata}

    return write_glb(json.dumps(gltf, separators=(",", ":")).encode("utf-8"),
                     bytes(bin_content))
