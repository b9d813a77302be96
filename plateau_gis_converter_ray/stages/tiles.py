"""Tile-assignment stages: the engine's shuffle-key producers.

Mirrors the reference's slicing flat_map (SURVEY.md §2.3): each input row
fans out to one (tile, payload) row per zoom level, keyed by the PMTiles
Hilbert id — the single scalar shuffle/sort key (tileid/hilbert.rs:3-39,
consumed by the sort stage at cesiumtiles/mod.rs:222-230).

All functions are vectorized ``map_batches`` bodies over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import scheme3dt
from ..kernels.hilbert import zxy_to_id
from ..kernels.webmercator import zxy_from_lnglat_webmercator


def assign_webmercator(batch: pa.Table, zoom: int) -> pa.Table:
    """Append square-scheme WebMercator (tile_x, tile_y, tile_id) at ``zoom``."""
    lng = batch.column("lng").to_numpy()
    lat = batch.column("lat").to_numpy()
    x, y = zxy_from_lnglat_webmercator(zoom, lng, lat)
    tid = zxy_to_id(zoom, x, y)
    return (
        batch.append_column("tile_x", pa.array(x, pa.int32()))
        .append_column("tile_y", pa.array(y, pa.int32()))
        .append_column("tile_id", pa.array(tid.astype(np.int64)))
    )


def assign_3dt(batch: pa.Table, zoom: int) -> pa.Table:
    """Append non-square 3D-Tiles scheme (tile_x, tile_y) at ``zoom``
    (scheme.rs:32-38 semantics, x aligned to x_step)."""
    lng = batch.column("lng").to_numpy()
    lat = batch.column("lat").to_numpy()
    x, y = scheme3dt.zxy_from_lng_lat(zoom, lng, lat)
    return batch.append_column("tile_x", pa.array(x, pa.int64())).append_column(
        "tile_y", pa.array(y, pa.int64())
    )


def fanout_zooms(
    batch: pa.Table,
    min_zoom: int,
    max_zoom: int,
    keep: list[str],
    extent_m: np.ndarray | float = 0.0,
) -> pa.Table:
    """1 -> N fan-out: one output row per (input row, zoom), with the
    reference's geometric-error skip rule applied per zoom.

    The reference skips a feature at ``zoom < max_zoom`` when its approx
    extent is below ``geometric_error(z, y) * 1.5`` (cesiumtiles/
    slice.rs:132-148); ``extent_m`` is the per-row approx extent in meters
    (0 for points, which therefore appear only at max_zoom unless huge).
    Output columns: ``keep`` + [zoom, tile_x, tile_y, tile_id].
    """
    lng = batch.column("lng").to_numpy()
    lat = batch.column("lat").to_numpy()
    n = len(lng)
    ext = np.broadcast_to(np.asarray(extent_m, dtype=np.float64), (n,))

    parts = []
    for z in range(min_zoom, max_zoom + 1):
        x, y = scheme3dt.zxy_from_lng_lat(z, lng, lat)  # clamps into the grid
        if z < max_zoom:
            err = scheme3dt.geometric_error(z, y)
            mask = ext >= err * 1.5
        else:
            mask = np.ones(n, dtype=bool)
        if not mask.any():
            continue
        idx = np.nonzero(mask)[0]
        sub = batch.select(keep).take(pa.array(idx))
        # Hilbert ids need square-grid coords; the non-square scheme's
        # (x, y) at z>=2 has y < 2^(z-1) -- ids stay unique per (z,x,y)
        # because zxy_to_id(z, x, y) is injective over x,y < 2^z.
        tid = zxy_to_id(z, x[idx], y[idx])
        sub = (
            sub.append_column("zoom", pa.array(np.full(len(idx), z, dtype=np.int32)))
            .append_column("tile_x", pa.array(x[idx], pa.int64()))
            .append_column("tile_y", pa.array(y[idx], pa.int64()))
            .append_column("tile_id", pa.array(tid.astype(np.int64)))
        )
        parts.append(sub)
    if not parts:
        return batch.select(keep).slice(0, 0).append_column(
            "zoom", pa.array([], pa.int32())
        ).append_column("tile_x", pa.array([], pa.int64())).append_column(
            "tile_y", pa.array([], pa.int64())
        ).append_column("tile_id", pa.array([], pa.int64()))
    return pa.concat_tables(parts)


def salt_column(keys: np.ndarray, hot_threshold_ids: np.ndarray, n_salts: int, row_idx: np.ndarray) -> np.ndarray:
    """Salted shuffle key: hot keys spread over ``n_salts`` sub-keys.

    ``hot_threshold_ids`` is the (small, broadcast) set of known-hot tile ids
    (e.g. the Tokyo-bay cells); other keys keep salt 0 so downstream
    re-aggregation only has to merge the hot groups.
    """
    salt = np.zeros(len(keys), dtype=np.int64)
    hot = np.isin(keys, hot_threshold_ids)
    salt[hot] = (row_idx[hot] % n_salts).astype(np.int64)
    return salt
