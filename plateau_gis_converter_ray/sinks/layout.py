"""Spatially clustered parquet layout (Hilbert-ordered write) + the
row-group pruning it buys.

At 100 TB the cheapest query is the one whose bytes never leave storage:
parquet readers prune ROW GROUPS whose column min/max statistics exclude
the predicate, but pruning only bites if rows with similar values are
physically adjacent. This sink sorts rows by their Hilbert cell id
before writing (``ds.sort`` — Ray's distributed range sort), so each row
group covers a tight lng/lat rectangle and a bbox filter touches only
the intersecting groups. The same idea drives the tile archive's
contiguous range reads (sinks/archive.py) — this is its parquet-stats
form, and the Z-ORDER/CLUSTER BY of the lakehouse engines.

``row_groups_scanned`` measures the effect without reading data: it
counts row groups whose lng/lat statistics intersect the bbox — exactly
the set a pushdown scan would deserialize.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..kernels.hilbert import zxy_to_id
from ..stages.geocode import add_lnglat_arith

_Z = 12  # cell grid for the clustering key: 4096 x 4096 over the world


def _hilbert_key(batch: pa.Table) -> pa.Table:
    lng = batch.column("lng").to_numpy()
    lat = batch.column("lat").to_numpy()
    n = 1 << _Z
    x = np.clip(((lng + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    # simple equirectangular y — monotone in lat, which is all clustering
    # needs (the WM tile pipelines keep the true mercator y)
    y = np.clip(((90.0 - lat) / 180.0 * n).astype(np.int64), 0, n - 1)
    return batch.append_column("hkey", pa.array(zxy_to_id(_Z, x, y)))


def _events_with_hkey(sf_dir: str):
    from ..sources.tables import read_table

    ds = read_table(sf_dir, "events", ["event_id", "value"])
    return ds.map_batches(
        lambda b: add_lnglat_arith(b, "event_id"), batch_format="pyarrow"
    ).map_batches(_hilbert_key, batch_format="pyarrow")


def write_clustered_events(sf_dir: str, out_dir: str,
                           rows_per_group: int = 2048) -> str:
    """Write events (with derived lng/lat) Hilbert-clustered; returns the
    parquet directory. Sort is Ray's distributed range sort — no driver
    materialization."""
    os.makedirs(out_dir, exist_ok=True)
    _events_with_hkey(sf_dir).sort("hkey").write_parquet(
        out_dir, row_group_size=rows_per_group
    )
    return out_dir


def write_unclustered_events(sf_dir: str, out_dir: str,
                             rows_per_group: int = 2048) -> str:
    """Same table, arrival order (the layout a naive ingest leaves)."""
    os.makedirs(out_dir, exist_ok=True)
    _events_with_hkey(sf_dir).write_parquet(
        out_dir, row_group_size=rows_per_group
    )
    return out_dir


def row_groups_scanned(parquet_dir: str, lng_lo: float, lng_hi: float,
                       lat_lo: float, lat_hi: float) -> tuple[int, int, int]:
    """(row groups a bbox pushdown scan must read, total row groups,
    rows inside those matched groups) — decided purely from footer
    statistics, no data bytes touched. A group with missing/disabled
    statistics counts as a hit (a pushdown scanner must read it)."""
    import pyarrow.parquet as pq

    hit = total = hit_rows = 0
    for f in sorted(os.listdir(parquet_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(parquet_dir, f))
        schema_names = md.schema.to_arrow_schema().names
        i_lng = schema_names.index("lng")
        i_lat = schema_names.index("lat")
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            s_lng = rg.column(i_lng).statistics
            s_lat = rg.column(i_lat).statistics
            total += 1
            no_stats = (
                s_lng is None or s_lat is None
                or not s_lng.has_min_max or not s_lat.has_min_max
            )
            if no_stats or (
                s_lng.min <= lng_hi and s_lng.max >= lng_lo
                and s_lat.min <= lat_hi and s_lat.max >= lat_lo
            ):
                hit += 1
                hit_rows += rg.num_rows
    return hit, total, hit_rows
