"""Requirements-driven pipeline assembly — the reference's physical-plan spine.

In the reference the *sink* declares ``DataRequirements`` and the transformer
chain is derived from them before any data flows (sink/mod.rs:53-82 consumed
at main.rs:160-164,242-251; chain order fixed in
transformer/builder.rs:106-187: projection -> geomstats -> appearance ->
rename -> lod-filter -> flatten -> mergedown -> key-value). Here:

- :class:`DataRequirements` — the declarative needs a sink states;
- :class:`SinkProvider` — registry entry with typed, validated parameters
  (the parameters/mod.rs:30-120 analogue);
- :func:`build_transform_chain` — composes the ``map_batches`` stage list
  from requirements in the reference's fixed order;
- :data:`BUILTIN_SINKS` — the BUILTIN_SINKS registry (nusamai/src/lib.rs:7-19).

The CLI (``python -m plateau_gis_converter_ray``) wires source -> derived
chain -> sink exactly like main.rs:111-292.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable
from typing import Any


@dataclasses.dataclass
class DataRequirements:
    """What a sink needs from the upstream transformer (sink/mod.rs:53-82)."""

    # CRS the sink wants coordinates in
    output_crs: str = "lnglat"  # lnglat | webmercator | ecef | jpr
    jpr_zone: int = 9
    # which LOD policy (lods.rs:30-93): None = keep all
    lod_filter: str | None = None  # "highest" | "lowest" | None
    # rename rules applied before write (attrname.rs)
    rename_rules: dict[str, str] | None = None
    shorten_names: bool = False
    # serialize nested attributes to JSON text (jsonify.rs)
    jsonify: bool = False
    # flatten nested attrs to dotted keys (dots.rs)
    dot_notation: bool = False
    # inject per-row min/max stats over this list column (geomstats.rs)
    geom_stats_col: str | None = None
    # tile assignment fan-out
    tile_scheme: str | None = None  # "3dt" | "webmercator" | None
    min_zoom: int = 7
    max_zoom: int = 12


@dataclasses.dataclass
class Parameter:
    """Typed, validated sink parameter (parameters/mod.rs:30-120)."""

    name: str
    type: str  # "string" | "boolean" | "integer" | "path"
    required: bool = False
    default: Any = None

    def validate(self, value: Any) -> Any:
        if value is None:
            if self.required:
                raise ValueError(f"parameter {self.name!r} is required")
            return self.default
        if self.type == "integer" and not isinstance(value, int):
            raise ValueError(f"parameter {self.name!r} must be int")
        if self.type == "boolean" and not isinstance(value, bool):
            raise ValueError(f"parameter {self.name!r} must be bool")
        if self.type in ("string", "path") and not isinstance(value, str):
            raise ValueError(f"parameter {self.name!r} must be str")
        return value


@dataclasses.dataclass
class SinkProvider:
    name: str
    description: str
    parameters: list[Parameter]
    make_requirements: Callable[[dict], DataRequirements]
    run: Callable[..., Any]  # (ds, params, out_dir) -> result

    def validate_params(self, raw: dict) -> dict:
        known = {p.name for p in self.parameters}
        for k in raw:
            if k not in known:
                raise ValueError(f"unknown parameter {k!r} for sink {self.name!r}")
        return {p.name: p.validate(raw.get(p.name)) for p in self.parameters}


def build_transform_chain(req: DataRequirements) -> list[tuple[str, dict]]:
    """Derive the stage list from requirements, in the reference's fixed
    chain order (builder.rs:106-187). Returns (stage_name, kwargs) pairs the
    runner maps to map_batches calls."""
    chain: list[tuple[str, dict]] = []
    if req.tile_scheme and req.output_crs != "lnglat":
        # tile assignment consumes lng/lat (the reference's slicers run on
        # geographic coords; projection to other CRS happens in the payload
        # path, not the key path)
        raise ValueError("tile_scheme requires output_crs='lnglat'")
    # 1. projection (always first, like NusamaiTransformBuilder)
    chain.append(
        ("projection", {"output": req.output_crs, "jpr_zone": req.jpr_zone})
    )
    # 2. geomstats
    if req.geom_stats_col:
        chain.append(("geom_stats", {"list_col": req.geom_stats_col}))
    # 3. (appearance has no tabular analogue: decode stage plays that role)
    # 4. rename
    if req.rename_rules or req.shorten_names:
        chain.append(
            ("rename", {"rules": req.rename_rules or {}, "shorten": req.shorten_names})
        )
    # 5. lod filter
    if req.lod_filter:
        chain.append(("lod_filter", {"mode": req.lod_filter}))
    # 6/7. flatten / mergedown are data-model dependent; CLI datasets are flat
    # 8. key-value style serializations
    if req.jsonify:
        chain.append(("jsonify", {}))
    if req.dot_notation:
        chain.append(("dots", {}))
    if req.tile_scheme:
        chain.append(
            (
                "tiles",
                {
                    "scheme": req.tile_scheme,
                    "min_zoom": req.min_zoom,
                    "max_zoom": req.max_zoom,
                },
            )
        )
    return chain


def apply_chain(ds, chain: list[tuple[str, dict]]):
    """Materialize the declarative chain onto a Dataset as map_batches calls.

    Stateless stages are plain functions (fused by Ray Data); the projection
    stage is an actor pool (geoid grid state)."""
    import pyarrow as pa

    from ..stages.projection import ProjectionStage
    from ..stages.tiles import assign_webmercator, fanout_zooms
    from ..stages.transforms import (
        FieldRenamer,
        dot_flatten,
        filter_highest_lod,
        geom_stats,
        jsonify,
    )

    for name, kw in chain:
        if name == "projection":
            if kw.get("output", "lnglat") == "lnglat" and "height" not in (
                ds.schema().names if hasattr(ds, "schema") else []
            ):
                # identity CRS on height-less data: skip the actor pool
                continue
            ds = ds.map_batches(
                ProjectionStage(**kw), batch_format="pyarrow"
            )
        elif name == "geom_stats":
            col = kw["list_col"]
            ds = ds.map_batches(
                lambda b, col=col: geom_stats(b, col), batch_format="pyarrow"
            )
        elif name == "rename":
            renamer = FieldRenamer(
                rules=kw.get("rules") or {}, auto_shorten=bool(kw.get("shorten"))
            )
            ds = ds.map_batches(renamer, batch_format="pyarrow")
        elif name == "lod_filter":
            lowest = kw.get("mode") == "lowest"
            ds = ds.map_batches(
                lambda b, lowest=lowest: filter_highest_lod(b, lowest=lowest),
                batch_format="pyarrow",
            )
        elif name == "jsonify":
            ds = ds.map_batches(lambda b: jsonify(b), batch_format="pyarrow")
        elif name == "dots":
            ds = ds.map_batches(lambda b: dot_flatten(b), batch_format="pyarrow")
        elif name == "tiles":
            if kw["scheme"] == "webmercator":
                z = kw["max_zoom"]
                ds = ds.map_batches(
                    lambda b, z=z: assign_webmercator(b, z), batch_format="pyarrow"
                )
            else:
                mn, mx = kw["min_zoom"], kw["max_zoom"]

                def fan(b: pa.Table, mn=mn, mx=mx) -> pa.Table:
                    keep = [c for c in b.column_names if c not in
                            ("zoom", "tile_x", "tile_y", "tile_id")]
                    return fanout_zooms(b, mn, mx, keep=keep)

                ds = ds.map_batches(fan, batch_format="pyarrow")
        else:
            raise ValueError(f"unknown stage {name!r}")
    return ds


# ---------------------------------------------------------------------------
# builtin sinks (lib.rs:7-19 analogue)


def _parquet_run(ds, params, out_dir):
    ds.write_parquet(out_dir)
    return {"out_dir": out_dir}


def _grouped_run(ds, params, out_dir):
    from ..sinks.grouped import write_per_group

    return write_per_group(ds, params["group_by"], out_dir, fmt=params["format"])


def _tiles_run(ds, params, out_dir):
    from ..sinks.grouped import write_tiles

    return write_tiles(ds, out_dir)


def _tiles3d_run(ds, params, out_dir):
    from ..sinks.tiles3d import write_tiles_3dt

    return write_tiles_3dt(ds, out_dir)


def _implicit_run(ds, params, out_dir):
    """3D Tiles 1.1 implicit-quadtree sink: reduce the webmercator-keyed
    rows to distinct occupied (z, x, y) tiles (one combiner — the payload
    never reaches the writer), then emit the ``.subtree`` availability
    blobs + root tileset.json via :func:`sinks.implicit
    .write_implicit_tileset` (atomic, fingerprint-keyed resume). The
    lineage fingerprint is the input row count — cheap (scan-rooted
    count) and enough to catch a changed input between runs."""
    import pyarrow as pa

    from ..sinks.implicit import write_implicit_tileset
    from ..stages.treeagg import tree_group_agg

    z = params.get("max_zoom") or 12
    n_rows = ds.count()

    def pick(b: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "z": pa.array(np.full(b.num_rows, z, dtype=np.int64)),
                "x": b.column("tile_x").cast(pa.int64()),
                "y": b.column("tile_y").cast(pa.int64()),
            }
        )

    tiles = tree_group_agg(
        ds.map_batches(pick, batch_format="pyarrow"),
        ["z", "x", "y"],
        {"n": (None, "count")},
    ).select_columns(["z", "x", "y"])
    return write_implicit_tileset(
        tiles,
        out_dir,
        max_level=z,
        subtree_levels=params.get("subtree_levels") or 4,
        fingerprint=[["rows", int(n_rows)]],
    )


def _shapefile_run(ds, params, out_dir):
    from ..sinks.shapefile import write_per_type_shapefiles

    return write_per_type_shapefiles(
        ds, out_dir, params["type_col"], ring_col=params.get("ring_col") or "rings_xyz"
    )


def _ply_run(ds, params, out_dir):
    import os

    from ..sinks.ply import write_ply_from_triangles

    return write_ply_from_triangles(ds, os.path.join(out_dir, "output.ply"))


def _archive_run(ds, params, out_dir):
    """MVT tiles into ONE Hilbert-sorted archive file: encode each tile's
    pbf payload in the grouped stage, then the global tile_id sort +
    single-writer append (the PMTiles-style path, mvt/mod.rs:237-271)."""
    import os

    import numpy as np
    import pandas as pd

    from ..kernels.hilbert import zxy_to_id
    from ..sinks.archive import write_tile_archive
    from ..sinks.mvt import make_tile_pbf

    def encode_tile(g: pd.DataFrame) -> pd.DataFrame:
        z = int(g["zoom"].iloc[0])
        x = int(g["tile_x"].iloc[0])
        y = int(g["tile_y"].iloc[0])
        feats = []
        for flat in g["ring_xy"]:
            arr = np.asarray(flat, dtype=np.float64).reshape(-1, 2)
            feats.append({"rings": [(True, arr)]})
        tid = int(zxy_to_id(z, np.array([x]), np.array([y]))[0])
        return pd.DataFrame(
            {"tile_id": [tid], "payload": [make_tile_pbf(feats, 12)]}
        )

    payloads = ds.groupby(["zoom", "tile_x", "tile_y"]).map_groups(
        encode_tile, batch_format="pandas"
    )
    return write_tile_archive(payloads, os.path.join(out_dir, "tiles.prta"))


def _noop_run(ds, params, out_dir):
    # noop sink: count rows (sink/noop/mod.rs:62-85)
    return {"num_rows": ds.count()}


def _sqlite_run(ds, params, out_dir):
    import os

    from ..sinks.sqlite import SQLiteWriter, finalize_contents

    db = os.path.join(out_dir, "output.db")
    written = ds.map_batches(
        SQLiteWriter,
        fn_constructor_args=(db, params.get("table_col")),
        batch_format="pandas",
        concurrency=1,  # the single-transaction contract (gpkg/mod.rs:210-251)
    ).to_pandas()["written"].sum()
    contents = finalize_contents(db)
    return {"db": db, "written": int(written), "tables": list(contents)}


BUILTIN_SINKS: dict[str, SinkProvider] = {
    "parquet": SinkProvider(
        name="parquet",
        description="partitioned parquet output (the serde-sink analogue)",
        parameters=[Parameter("compression", "string", default="snappy")],
        make_requirements=lambda p: DataRequirements(),
        run=_parquet_run,
    ),
    "grouped": SinkProvider(
        name="grouped",
        description="one file per group key (geojson/shapefile/kml pattern)",
        parameters=[
            Parameter("group_by", "string", required=True),
            Parameter("format", "string", default="jsonl"),
        ],
        make_requirements=lambda p: DataRequirements(jsonify=True),
        run=_grouped_run,
    ),
    "tiles": SinkProvider(
        name="tiles",
        description="z/x/y tile payloads (3dtiles/mvt pattern)",
        parameters=[
            Parameter("min_zoom", "integer", default=7),
            Parameter("max_zoom", "integer", default=12),
        ],
        make_requirements=lambda p: DataRequirements(
            tile_scheme="3dt",
            min_zoom=p.get("min_zoom") or 7,
            max_zoom=p.get("max_zoom") or 12,
        ),
        run=_tiles_run,
    ),
    "3dtiles": SinkProvider(
        name="3dtiles",
        description="z/x/y.glb binary tiles + metadata (cesiumtiles sink)",
        parameters=[
            Parameter("min_zoom", "integer", default=7),
            Parameter("max_zoom", "integer", default=12),
        ],
        make_requirements=lambda p: DataRequirements(
            tile_scheme="3dt",
            min_zoom=p.get("min_zoom") or 7,
            max_zoom=p.get("max_zoom") or 12,
        ),
        run=_tiles3d_run,
    ),
    "implicit": SinkProvider(
        name="implicit",
        description="3D Tiles 1.1 implicit-quadtree availability "
        "(.subtree blobs + tileset.json, OGC 22-025r4 §8)",
        parameters=[
            Parameter("max_zoom", "integer", default=12),
            Parameter("subtree_levels", "integer", default=4),
        ],
        make_requirements=lambda p: DataRequirements(
            tile_scheme="webmercator",
            max_zoom=p.get("max_zoom") or 12,
        ),
        run=_implicit_run,
    ),
    "shapefile": SinkProvider(
        name="shapefile",
        description="PolygonZ .shp/.shx/.dbf/.prj set per typename",
        parameters=[
            Parameter("type_col", "string", required=True),
            Parameter("ring_col", "string", default="rings_xyz"),
        ],
        make_requirements=lambda p: DataRequirements(shorten_names=True),
        run=_shapefile_run,
    ),
    "archive": SinkProvider(
        name="archive",
        description="Hilbert-sorted single-file pbf tile archive (PMTiles role)",
        parameters=[
            Parameter("min_zoom", "integer", default=7),
            Parameter("max_zoom", "integer", default=12),
        ],
        make_requirements=lambda p: DataRequirements(
            tile_scheme="3dt",
            min_zoom=p.get("min_zoom") or 7,
            max_zoom=p.get("max_zoom") or 12,
        ),
        run=_archive_run,
    ),
    "ply": SinkProvider(
        name="ply",
        description="Stanford PLY binary (two-pass centroid, vertex dedup)",
        parameters=[],
        make_requirements=lambda p: DataRequirements(),
        run=_ply_run,
    ),
    "noop": SinkProvider(
        name="noop",
        description="count rows (smoke-test sink)",
        parameters=[],
        make_requirements=lambda p: DataRequirements(),
        run=_noop_run,
    ),
    "sqlite": SinkProvider(
        name="sqlite",
        description="single-file sqlite database (the gpkg-sink architecture)",
        parameters=[Parameter("table_col", "string", default=None)],
        make_requirements=lambda p: DataRequirements(jsonify=True),
        run=_sqlite_run,
    ),
}


def derive_schema(schema: "object", chain: list[tuple[str, dict]]):
    """Pure schema transform: pa.Schema -> pa.Schema for the derived chain.

    The reference finalizes the schema BEFORE any data flows — every
    Transform implements transform_schema in lock-step with transform
    (transformer/mod.rs:30-35, applied at main.rs:242-251). This is that
    contract for the tabular chain; tests assert the streamed output schema
    equals this precomputation.
    """
    import pyarrow as pa

    from ..stages.transforms import FieldRenamer, shorten_field_name

    for name, kw in chain:
        fields = list(schema)
        if name == "projection":
            out = kw.get("output", "lnglat")
            has_height = "height" in schema.names
            if out == "lnglat" and not has_height:
                continue  # identity skip, mirrors apply_chain
            drop = {"lng", "lat", "height"}
            fields = [f for f in fields if f.name not in drop]
            added = {
                "lnglat": [("lng", pa.float64()), ("lat", pa.float64()), ("height", pa.float64())],
                "webmercator": [("mx", pa.float64()), ("my", pa.float64()), ("height", pa.float64())],
                "ecef": [("ecef_x", pa.float64()), ("ecef_y", pa.float64()), ("ecef_z", pa.float64())],
                "jpr": [("jpr_x", pa.float64()), ("jpr_y", pa.float64()), ("height", pa.float64())],
            }[out]
            schema = pa.schema(fields + [pa.field(n, t) for n, t in added])
        elif name == "geom_stats":
            schema = pa.schema(
                fields
                + [pa.field("minHeight", pa.float64()), pa.field("maxHeight", pa.float64())]
            )
        elif name == "rename":
            renamer = FieldRenamer(rules=kw.get("rules") or {})
            names = [renamer.rename(f.name) for f in fields]
            if kw.get("shorten"):
                taken: set[str] = set()
                names = [shorten_field_name(n, taken) for n in names]
            schema = pa.schema(
                [pa.field(n, f.type) for n, f in zip(names, fields)]
            )
        elif name == "lod_filter":
            schema = pa.schema(fields + [pa.field("lod_kept", pa.int64())])
        elif name == "jsonify":
            new_fields = []
            for f in fields:
                nested = pa.types.is_struct(f.type) or pa.types.is_map(f.type)
                new_fields.append(
                    pa.field(f.name, pa.string()) if nested else f
                )
            schema = pa.schema(new_fields)
        elif name == "dots":
            new_fields = []

            def flatten_field(f, prefix=""):
                if pa.types.is_struct(f.type):
                    for i in range(f.type.num_fields):
                        sub = f.type.field(i)
                        yield from flatten_field(sub, f"{prefix}{f.name}.")
                else:
                    yield pa.field(f"{prefix}{f.name}", f.type)

            for f in fields:
                new_fields.extend(flatten_field(f))
            schema = pa.schema(new_fields)
        elif name == "tiles":
            if kw["scheme"] == "webmercator":
                schema = pa.schema(
                    fields
                    + [
                        pa.field("tile_x", pa.int32()),
                        pa.field("tile_y", pa.int32()),
                        pa.field("tile_id", pa.int64()),
                    ]
                )
            else:
                schema = pa.schema(
                    fields
                    + [
                        pa.field("zoom", pa.int32()),
                        pa.field("tile_x", pa.int64()),
                        pa.field("tile_y", pa.int64()),
                        pa.field("tile_id", pa.int64()),
                    ]
                )
    return schema


# ---------------------------------------------------------------------------
# source providers (source/mod.rs:15-31 analogue)


def _parquet_source(path: str, columns=None):
    import os

    import ray.data

    if os.path.isfile(path):
        # metadata-stripped schema so block-schema dedup works (sources.tables)
        from ..sources.tables import _clean_schema

        return ray.data.read_parquet(
            path, columns=columns,
            schema=_clean_schema(path, tuple(columns) if columns else None),
        )
    return ray.data.read_parquet(path, columns=columns)


def _jsonl_source(path: str, columns=None):
    import ray.data

    ds = ray.data.read_json(path)
    return ds.select_columns(columns) if columns else ds


def _images_source(path: str, columns=None):
    """The synthetic Lance-shaped image table; ``path`` is 'sf<scale>'."""
    from ..sources.images import ensure_image_table, read_images

    sf = float(path.replace("sf", "")) if path.startswith("sf") else 0.001
    return read_images(ensure_image_table(sf), columns=columns)


@dataclasses.dataclass
class SourceProvider:
    name: str
    description: str
    open: Callable[..., Any]  # (path, columns) -> Dataset


BUILTIN_SOURCES: dict[str, SourceProvider] = {
    "parquet": SourceProvider(
        "parquet", "parquet file/directory (column-pruned read)", _parquet_source
    ),
    "jsonl": SourceProvider("jsonl", "JSON-lines file/directory", _jsonl_source),
    "images": SourceProvider(
        "images",
        "deterministic synthetic image table; path is e.g. 'sf0.001'",
        _images_source,
    ),
}
