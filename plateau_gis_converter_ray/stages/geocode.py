"""Deterministic geocoding: derive (lng, lat) for rows.

The synthetic input has no coordinates; the engine derives them
deterministically so the reference's tiling semantics can be applied and
independently re-derived by the DuckDB oracle:

- :func:`geocode_arith` — pure modular arithmetic on an int64 id, expressible
  verbatim in ANSI SQL (used for the oracle-gated queries). The SQL equivalent
  is in :data:`GEOCODE_SQL`.
- :func:`geocode_hash` — splitmix64-based with a 30% Tokyo-bay hotspot, used
  by the flagship image pipeline to exercise skew handling (salting); checked
  rows-only by the driver and exactly in pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.imagecodec import splitmix64

# [122, 146] x [24, 46] — Japan bbox, same as sources.municipalities
GEOCODE_SQL = {
    "lng": "(122.0 + ((({id} * 9973) % 240000) / 10000.0))",
    "lat": "(24.0 + ((({id} * 7919) % 220000) / 10000.0))",
}

TOKYO_BAY = (139.5, 140.1, 35.3, 35.8)  # hotspot box (lng0, lng1, lat0, lat1)


def geocode_arith(ids: np.ndarray):
    """lng/lat from an int64 id via modular arithmetic (SQL-reproducible)."""
    ids = ids.astype(np.int64)
    lng = 122.0 + ((ids * 9973) % 240000) / 10000.0
    lat = 24.0 + ((ids * 7919) % 220000) / 10000.0
    return lng, lat


def geocode_hash(indices: np.ndarray):
    """Skewed geocode: ~30% of rows land in the Tokyo-bay hotspot box."""
    idx = indices.astype(np.uint64)
    s = splitmix64(idx ^ np.uint64(0x9E0))
    u1 = (s & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2.0**32
    u2 = ((s >> np.uint64(32)).astype(np.float64)) / 2.0**32
    hot = (splitmix64(idx ^ np.uint64(0x707)) % np.uint64(10)) < np.uint64(3)
    lng0, lng1, lat0, lat1 = TOKYO_BAY
    lng = np.where(hot, lng0 + u1 * (lng1 - lng0), 122.0 + u1 * 24.0)
    lat = np.where(hot, lat0 + u2 * (lat1 - lat0), 24.0 + u2 * 22.0)
    return lng, lat


def image_row_index(image_ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Parse the row index back out of 'img_{idx:012d}' ids (vectorized)."""
    import pyarrow.compute as pc

    return pc.utf8_slice_codeunits(image_ids, 4, 16).cast(pa.int64()).to_numpy()


def add_lnglat_arith(batch: pa.Table, id_col: str) -> pa.Table:
    lng, lat = geocode_arith(batch.column(id_col).to_numpy())
    return batch.append_column("lng", pa.array(lng)).append_column(
        "lat", pa.array(lat)
    )


def add_lnglat_hash(batch: pa.Table, id_col: str = "image_id") -> pa.Table:
    idx = image_row_index(batch.column(id_col))
    lng, lat = geocode_hash(idx)
    t = batch.append_column("row_idx", pa.array(idx))
    return t.append_column("lng", pa.array(lng)).append_column("lat", pa.array(lat))
