"""Mapbox Vector Tile protobuf wire format — pure-Python writer + reader.

Emits real, spec-compliant ``.pbf`` bytes for the tile payloads (no protoc
needed): varint / length-delimited framing around the existing
GeometryEncoder / TagsEncoder streams, matching the reference's prost
encoding of ``nusamai-mvt/src/vector_tile.rs`` (field numbers + packed
geometry/tags arrays) as driven by ``nusamai/src/sink/mvt/mod.rs:303-345``.
Field emit order follows the prost struct order (version first for Layer),
so byte streams line up with the reference encoder's output for the same
logical tile.

The reader (:func:`decode_tile_pbf`) is a minimal independent parser used
by the round-trip tests; it understands exactly the Tile/Layer/Feature/
Value subset of the spec.
"""

from __future__ import annotations

import numpy as np

# wire types
_VARINT = 0
_I64 = 1
_LEN = 2
_I32 = 5


def encode_varint(v: int) -> bytes:
    """Single uint64 varint."""
    v = int(v)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_varints_packed(vals) -> bytes:
    """Vectorized packed-varint encoding of a uint array (numpy, no per-int
    Python loop): per-value byte length from bit length, then one scatter
    of 7-bit groups with continuation bits into the output buffer."""
    a = np.asarray(vals, dtype=np.uint64)
    if len(a) == 0:
        return b""
    with np.errstate(over="ignore"):
        nbits = np.zeros(len(a), dtype=np.int64)
        tmp = a.copy()
        while True:
            live = tmp > 0
            if not live.any():
                break
            nbits[live] += 1
            tmp >>= np.uint64(1)
        nbytes = np.maximum((nbits + 6) // 7, 1)
        total = int(nbytes.sum())
        out = np.empty(total, dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
        max_b = int(nbytes.max())
        for k in range(max_b):
            sel = nbytes > k
            byte = ((a[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
            cont = (nbytes[sel] > k + 1).astype(np.uint8) << 7
            out[starts[sel] + k] = byte | cont
    return out.tobytes()


def _field(num: int, wire: int) -> bytes:
    return encode_varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, _LEN) + encode_varint(len(payload)) + payload


def _varint_field(num: int, v: int) -> bytes:
    return _field(num, _VARINT) + encode_varint(v)


def encode_value(tagged: tuple) -> bytes:
    """TagsEncoder value tuple ('string'|'float'|'double'|'uint'|'sint'|
    'int'|'bool', v) -> Tile.Value message bytes."""
    tag, v = tagged
    if tag == "string":
        return _len_field(1, v.encode("utf-8"))
    if tag == "float":
        return _field(2, _I32) + np.float32(v).tobytes()
    if tag == "double":
        return _field(3, _I64) + np.float64(v).tobytes()
    if tag == "int":
        return _varint_field(4, int(v) & 0xFFFFFFFFFFFFFFFF)
    if tag == "uint":
        return _varint_field(5, int(v))
    if tag == "sint":
        s = int(v)
        return _varint_field(6, ((s << 1) ^ (s >> 63)) & 0xFFFFFFFFFFFFFFFF)
    if tag == "bool":
        return _varint_field(7, 1 if v else 0)
    raise TypeError(f"unknown value tag {tag}")


def encode_feature(geometry, tags=None, feature_id=None, geom_type: int = 3) -> bytes:
    """Tile.Feature: id(1) tags(2, packed) type(3) geometry(4, packed)."""
    out = bytearray()
    if feature_id is not None:
        out += _varint_field(1, int(feature_id))
    if tags:
        out += _len_field(2, encode_varints_packed(tags))
    out += _varint_field(3, geom_type)
    out += _len_field(4, encode_varints_packed(geometry))
    return bytes(out)


def encode_layer(name: str, features: list[bytes], keys: list[str],
                 values: list[tuple], extent: int) -> bytes:
    """Tile.Layer in prost struct order: version(15) name(1) features(2)
    keys(3) values(4) extent(5)."""
    out = bytearray()
    out += _varint_field(15, 2)
    out += _len_field(1, name.encode("utf-8"))
    for f in features:
        out += _len_field(2, f)
    for k in keys:
        out += _len_field(3, k.encode("utf-8"))
    for v in values:
        out += _len_field(4, encode_value(v))
    out += _varint_field(5, extent)
    return bytes(out)


def encode_tile_pbf(layers: list[bytes]) -> bytes:
    """Tile: layers(3) repeated."""
    out = bytearray()
    for layer in layers:
        out += _len_field(3, layer)
    return bytes(out)


# ---------------------------------------------------------------------------
# minimal reader (round-trip tests)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _iter_fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        num, wire = key >> 3, key & 7
        if wire == _VARINT:
            v, pos = _read_varint(buf, pos)
        elif wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wire == _I64:
            v = buf[pos:pos + 8]
            pos += 8
        elif wire == _I32:
            v = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"wire type {wire}")
        yield num, wire, v


def _decode_packed(buf: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


def decode_tile_pbf(buf: bytes) -> dict:
    layers = []
    for num, _w, v in _iter_fields(buf):
        if num != 3:
            continue
        layer = {"features": [], "keys": [], "values": [], "version": None,
                 "name": None, "extent": 4096}
        for lnum, _lw, lv in _iter_fields(v):
            if lnum == 15:
                layer["version"] = lv
            elif lnum == 1:
                layer["name"] = lv.decode("utf-8")
            elif lnum == 5:
                layer["extent"] = lv
            elif lnum == 3:
                layer["keys"].append(lv.decode("utf-8"))
            elif lnum == 4:
                val = None
                for vnum, _vw, vv in _iter_fields(lv):
                    if vnum == 1:
                        val = ("string", vv.decode("utf-8"))
                    elif vnum == 2:
                        val = ("float", float(np.frombuffer(vv, np.float32)[0]))
                    elif vnum == 3:
                        val = ("double", float(np.frombuffer(vv, np.float64)[0]))
                    elif vnum == 4:
                        val = ("int", vv)
                    elif vnum == 5:
                        val = ("uint", vv)
                    elif vnum == 6:
                        val = ("sint", (vv >> 1) ^ -(vv & 1))
                    elif vnum == 7:
                        val = ("bool", bool(vv))
                layer["values"].append(val)
            elif lnum == 2:
                feat = {"id": None, "tags": [], "type": None, "geometry": []}
                for fnum, _fw, fv in _iter_fields(lv):
                    if fnum == 1:
                        feat["id"] = fv
                    elif fnum == 2:
                        feat["tags"] = _decode_packed(fv)
                    elif fnum == 3:
                        feat["type"] = fv
                    elif fnum == 4:
                        feat["geometry"] = _decode_packed(fv)
                layer["features"].append(feat)
        layers.append(layer)
    return {"layers": layers}
