"""Per-record transform stages — the Transformer-chain analogues (SURVEY §2.2).

Each reference ``Transform`` (transformer/transform/*.rs) maps to a pure
Arrow-batch function or small callable class here; schema rewrites happen
implicitly through Arrow (schema-in/schema-out), mirroring the reference's
``transform_schema`` lock-step contract (transformer/mod.rs:30-35).

Composition: chain ``map_batches`` calls — Ray Data fuses adjacent stateless
stages, which is the SerialTransform analogue (transform/mod.rs:27-62).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def shorten_field_name(name: str, taken: set[str] | None = None) -> str:
    """Deterministic Shapefile 10-char field shortening.

    The reference ships a curated PLATEAU dictionary (shp_field_dict.json,
    attrname.rs:37-48) we don't copy; the *mechanism* — wildcard-applied
    <=10-char names with collision-free assignment — is reproduced with a
    deterministic abbreviator: keep if short, else drop inner vowels then
    truncate, salting the tail digit on collision.
    """
    if len(name) <= 10:
        return name
    head, rest = name[0], name[1:]
    squeezed = head + "".join(c for c in rest if c.lower() not in "aeiou")
    cand = squeezed[:10] if len(squeezed) >= 10 else (squeezed + name[1:])[:10]
    if taken is not None:
        base = cand
        i = 0
        while cand in taken:
            i += 1
            suffix = str(i)
            cand = base[: 10 - len(suffix)] + suffix
        taken.add(cand)
    return cand


class FieldRenamer:
    """EditFieldNamesTransform semantics (transform/attrname.rs:62-138).

    - exact rules ("ns:foo" -> new) take precedence over
    - wildcard rules ("*:foo" -> new, matched after stripping any prefix),
    - otherwise the namespace prefix is stripped ("ns:foo" -> "foo"),
      except "ns:id" which keeps its prefix (attrname.rs:108-113),
    - names with no prefix pass through (unless exactly ruled).
    An optional shorten dict (the Shapefile 10-char dictionary analogue,
    attrname.rs:37-48) loads as wildcard rules.
    """

    def __init__(self, rules: dict[str, str] | None = None,
                 shorten: dict[str, str] | None = None,
                 auto_shorten: bool = False):
        self.exact: dict[str, str] = {}
        self.general: dict[str, str] = {}
        self.auto_shorten = auto_shorten
        if shorten:
            for k, v in shorten.items():
                if len(v) > 10:
                    raise ValueError(f"shortened name must be <=10 chars: {v}")
                self.general[k] = v
        if rules:
            for before, after in rules.items():
                if before.startswith("*:"):
                    self.general[before[2:]] = after
                else:
                    self.exact[before] = after

    def rename(self, name: str) -> str:
        if name in self.exact:
            return self.exact[name]
        pos = name.find(":")
        if pos == -1:
            return name
        key = name[pos + 1 :]
        if key in self.general:
            return self.general[key]
        if key == "id":
            return name  # would collide with the global "id" (gml:id)
        return key

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = [self.rename(c) for c in batch.column_names]
        if self.auto_shorten:
            taken: set[str] = set()
            names = [shorten_field_name(n, taken) for n in names]
        return batch.rename_columns(names)


def jsonify(batch: pa.Table, objects_only: bool = True) -> pa.Table:
    """Serialize nested (struct / list) columns to JSON strings
    (transform/jsonify.rs:30-78; objects_only mirrors the two variants)."""
    cols = []
    names = []
    for name in batch.column_names:
        col = batch.column(name)
        t = col.type
        is_obj = pa.types.is_struct(t) or pa.types.is_map(t)
        is_arr = pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t)
        if is_obj or (is_arr and not objects_only):
            vals = col.to_pylist()
            col = pa.array(
                [None if v is None else json.dumps(v, separators=(",", ":"), sort_keys=True) for v in vals],
                pa.string(),
            )
        names.append(name)
        cols.append(col)
    return pa.table(dict(zip(names, cols)))


def dot_flatten(batch: pa.Table, max_depth: int = 8) -> pa.Table:
    """Flatten nested struct columns to dot-keys (transform/dots.rs:15-73).

    ``a: struct<b, c>`` -> columns ``a.b``, ``a.c``; repeats to depth.
    List columns are left as-is (the reference flattens arrays to ``a.0``
    form only in the key-value representation; our tabular form keeps lists).
    """
    for _ in range(max_depth):
        if not any(pa.types.is_struct(f.type) for f in batch.schema):
            break
        cols = []
        names = []
        for name in batch.column_names:
            col = batch.column(name)
            if pa.types.is_struct(col.type):
                combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                flat = combined.flatten()
                for sub, field in zip(flat, col.type):
                    names.append(f"{name}.{field.name}")
                    cols.append(sub)
            else:
                names.append(name)
                cols.append(col)
        batch = pa.table(dict(zip(names, cols)))
    return batch


def geom_stats(batch: pa.Table, list_col: str, out_prefix: str = "") -> pa.Table:
    """Per-row min/max over a list<float> column -> minHeight/maxHeight
    (transform/geomstats.rs:13-65: per-row vertex-height aggregate)."""
    import pyarrow.compute as pc

    col = batch.column(list_col).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    # vectorized segmented min/max over the flat value buffer via reduceat
    offsets = col.offsets.to_numpy()
    values = col.values.to_numpy()
    starts = offsets[:-1]
    empty = offsets[1:] == starts
    safe_starts = np.minimum(starts, max(len(values) - 1, 0))
    if len(values):
        lo_np = np.minimum.reduceat(values, np.clip(safe_starts, 0, len(values) - 1))
        hi_np = np.maximum.reduceat(values, np.clip(safe_starts, 0, len(values) - 1))
    else:
        lo_np = np.zeros(len(starts))
        hi_np = np.zeros(len(starts))
    lo = pa.array(np.where(empty, np.nan, lo_np))
    hi = pa.array(np.where(empty, np.nan, hi_np))
    return batch.append_column(f"{out_prefix}minHeight", lo).append_column(
        f"{out_prefix}maxHeight", hi
    )


def filter_highest_lod(batch: pa.Table, lod_col: str = "lods", lowest: bool = False) -> pa.Table:
    """FilterLodTransform analogue (transform/lods.rs:30-93): compute the
    per-row LOD bitmask, keep only the highest (or lowest) LOD's geometry,
    drop rows left without geometry.

    Expects ``lod_col``: list<int> of the LODs present per row. Adds
    ``lod_kept`` and drops rows with an empty list.
    """
    vals = batch.column(lod_col).to_pylist()
    kept = np.array(
        [(-1 if not v else (min(v) if lowest else max(v))) for v in vals],
        dtype=np.int64,
    )
    mask = kept >= 0
    out = batch.append_column("lod_kept", pa.array(kept)).filter(pa.array(mask))
    return out


def flatten_tree(batch: pa.Table, children_col: str, id_col: str,
                 type_col: str | None = None, keep_parent: bool = True) -> pa.Table:
    """FlattenTreeTransform analogue (transform/flatten.rs:89-289): 1->N
    explode of nested child rows with parentId/parentType attribution.

    ``children_col`` is list<struct<...>>; each child becomes a top-level row
    with ``parentId`` (and ``parentType``). Parent rows keep their columns
    (children column dropped); child rows carry the child-struct fields.
    """
    import pyarrow.compute as pc

    parents = batch.drop_columns([children_col])
    children = batch.column(children_col)
    lengths = pc.list_value_length(children).fill_null(0).to_numpy()
    parent_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    rep = np.repeat(np.arange(len(batch)), lengths)
    flat = children.combine_chunks().flatten() if isinstance(children, pa.ChunkedArray) else children.flatten()
    child_tbl = pa.Table.from_arrays(
        [flat.field(i) for i in range(flat.type.num_fields)],
        names=[flat.type.field(i).name for i in range(flat.type.num_fields)],
    )
    # explicit types: a childless batch repeats to an EMPTY object array,
    # which untyped pa.array() would infer as null — diverging from the
    # id/type columns' schema and breaking downstream concat
    child_tbl = child_tbl.append_column(
        "parentId",
        pa.array(parent_ids[rep], type=batch.schema.field(id_col).type),
    )
    if type_col is not None:
        ptype = batch.column(type_col).to_numpy(zero_copy_only=False)
        child_tbl = child_tbl.append_column(
            "parentType",
            pa.array(ptype[rep], type=batch.schema.field(type_col).type),
        )
    if not keep_parent:
        return child_tbl
    return parents, child_tbl


def mergedown(batch: pa.Table, child_lists_col: str, root_list_col: str) -> pa.Table:
    """GeometricMergedownTransform analogue (transform/geommerge.rs:27-67):
    concat all descendants' geometry spans into the root row (with dedup)."""
    root = batch.column(root_list_col).to_pylist()
    kids = batch.column(child_lists_col).to_pylist()
    merged = []
    for r, k in zip(root, kids):
        seen = list(dict.fromkeys((r or []) + [g for c in (k or []) for g in (c or [])]))
        merged.append(seen)
    return batch.drop_columns([root_list_col, child_lists_col]).append_column(
        root_list_col, pa.array(merged)
    )
