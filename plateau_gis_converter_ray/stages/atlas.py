"""Texture-atlas packing: fixed-capacity mosaic assembly per size class.

The GIS texture-packing analogue (3D-Tiles texture atlases / map-tile
mosaics): pack every (w, h) size class's images into grid x grid atlases
in a deterministic global order, emit one assembled RGB mosaic per atlas
plus a placement table mapping each image to (atlas_id, slot).

Distributed plan (no step holds more than one atlas of pixels):

1. placements — a histogram-prefix DENSE RANK per size class (the
   global_shuffle_rank pattern): per-(class, idx-bucket) counts through
   the combiner tree, tiny prefix table back on the driver, then one
   bucket-keyed exchange assigns rank = prefix + position; atlas_id =
   rank // capacity, slot = rank % capacity. Buckets are ORDER-PRESERVING
   in the image index, so rank order == id order. Everything that moves
   is int64 — the row index stands in for the image_id string (the id
   embeds it; reconstructed only at the edges), and image bytes never
   enter phase 1.
2. assembly — placements join back to the bytes through ``auto_join`` on
   the int64 index (placement rows are ~32 B/image: planner-broadcast at
   bench scale with the runtime memory fallback, partitioned hash join at
   a scale where the table outgrows the limit), then ONE groupby on a
   single packed int64 atlas key co-locates each atlas's <= capacity
   tiles and a map_groups decodes the group stack and writes tiles
   row-major into the mosaic. This is the only movement of pixel bytes:
   one all-to-all keyed by atlas, the minimum any packer that co-locates
   tiles must pay.

Determinism: rank order is a pure function of the image index; the
mosaic buffer is zeroed so partially-filled tail atlases are stable.
Pinned in pytest by cropping every slot back out of the mosaic and
comparing to the independently-decoded source tile (byte equality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .decode import binary_views, decode_group_stack
from .treeagg import clean_arrow, tree_group_agg

# packed key layout: w and h are pixel sizes (< 2^20), atlas_id < 2^24
_KW, _KH = 44, 24


def _pack_key(w, h, atlas_id):
    return (
        (np.asarray(w, dtype=np.int64) << _KW)
        | (np.asarray(h, dtype=np.int64) << _KH)
        | np.asarray(atlas_id, dtype=np.int64)
    )


def atlas_placements(
    meta_ds, grid: int = 8, n_buckets: int = 64, n_rows_hint: int | None = None
):
    """(idx, w, h, atlas_id, slot) for every image, dense-ranked per
    (w, h) size class. ``meta_ds`` is a Dataset with (image_id, w, h) —
    metadata columns only, never the payload. ``n_rows_hint`` sizes the
    order-preserving buckets (callers get it O(1) from parquet metadata);
    unset, the width covers the bench scales and the cap keeps any larger
    input correct (the last bucket just grows — the prefix table handles
    any occupancy shape, skew only costs balance, not correctness)."""
    capacity = grid * grid
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    width = max(4096, -(-int(n_rows_hint) // n_buckets)) if n_rows_hint else 4096

    def keyed(batch: pa.Table) -> pa.Table:
        from .geocode import image_row_index

        idx = image_row_index(batch.column("image_id"))
        return pa.table(
            {
                "idx": pa.array(idx),
                "w": batch.column("w").cast(pa.int64()),
                "h": batch.column("h").cast(pa.int64()),
                "bucket": pa.array(np.minimum(idx // width, n_buckets - 1)),
            }
        )

    meta = meta_ds.map_batches(keyed, batch_format="pyarrow")
    hist = tree_group_agg(
        meta, ["w", "h", "bucket"], {"n": (None, "count")}
    ).to_pandas()
    hist = hist.sort_values(["w", "h", "bucket"])
    hist["prefix"] = (
        hist.groupby(["w", "h"])["n"].cumsum() - hist["n"]
    ).astype(np.int64)
    prefix = {
        (int(r.w), int(r.h), int(r.bucket)): int(r.prefix)
        for r in hist.itertuples()
    }

    def rank_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("idx", kind="mergesort")
        base = prefix[
            (int(g["w"].iloc[0]), int(g["h"].iloc[0]), int(g["bucket"].iloc[0]))
        ]
        rank = base + np.arange(len(g), dtype=np.int64)
        return clean_arrow(
            pd.DataFrame(
                {
                    "idx": g["idx"].to_numpy(),
                    "w": g["w"].to_numpy(),
                    "h": g["h"].to_numpy(),
                    "atlas_id": rank // capacity,
                    "slot": rank % capacity,
                }
            )
        )

    return meta.groupby(["w", "h", "bucket"]).map_groups(
        rank_group, batch_format="pandas"
    )


def assemble_atlases(images, placements, grid: int = 8, force: str | None = None):
    """One mosaic row per atlas: (w, h, atlas_id, n_tiles, mosaic_w,
    mosaic_h, atlas_bytes, slots, image_ids). ``images`` must carry
    EXACTLY (image_id, bytes, fmt) — w/h ride on the placement side so the
    join has no overlapping non-key columns; ``placements`` is
    :func:`atlas_placements` output."""
    from .geocode import image_row_index
    from .joins import auto_join

    def add_idx(batch: pa.Table) -> pa.Table:
        idx = image_row_index(batch.column("image_id"))
        return pa.table(
            {
                "idx": pa.array(idx),
                "bytes": batch.column("bytes"),
                "fmt": batch.column("fmt"),
            }
        )

    left = images.map_batches(add_idx, batch_format="pyarrow")
    pl = placements.materialize()
    joined = auto_join(
        left, pl, on=("idx",), num_partitions=4,
        right_size_hint=pl.size_bytes(), force=force,
    )

    def key_it(batch: pa.Table) -> pa.Table:
        k = _pack_key(
            batch.column("w").to_numpy(),
            batch.column("h").to_numpy(),
            batch.column("atlas_id").to_numpy(),
        )
        return pa.table(
            {
                "akey": pa.array(k),
                "idx": batch.column("idx"),
                "slot": batch.column("slot"),
                "bytes": batch.column("bytes"),
                "fmt": batch.column("fmt"),
            }
        )

    keyed = joined.map_batches(key_it, batch_format="pyarrow")

    def build(g: pd.DataFrame) -> pd.DataFrame:
        akey = int(g["akey"].iloc[0])
        w = int(akey >> _KW)
        h = int((akey >> _KH) & ((1 << (_KW - _KH)) - 1))
        atlas_id = int(akey & ((1 << _KH) - 1))
        g = g.sort_values("slot", kind="mergesort")
        fmts = g["fmt"].tolist()
        blobs = [memoryview(b) for b in g["bytes"].tolist()]
        mosaic = np.zeros((grid * h, grid * w, 3), dtype=np.uint8)
        by_fmt: dict[str, list[int]] = {}
        for i, f in enumerate(fmts):
            by_fmt.setdefault(f, []).append(i)
        tiles = np.empty((len(g), h, w, 3), dtype=np.uint8)
        for f, rows in by_fmt.items():
            tiles[np.array(rows)] = decode_group_stack(blobs, rows, f, w, h)
        slots = g["slot"].to_numpy()
        rr, cc = slots // grid, slots % grid
        for i in range(len(g)):  # <= capacity iterations per atlas
            mosaic[rr[i] * h : (rr[i] + 1) * h, cc[i] * w : (cc[i] + 1) * w] = (
                tiles[i]
            )
        ids = [f"img_{int(i):012d}" for i in g["idx"].tolist()]
        return pd.DataFrame(
            {
                "w": [w],
                "h": [h],
                "atlas_id": [atlas_id],
                "n_tiles": [len(g)],
                "mosaic_w": [grid * w],
                "mosaic_h": [grid * h],
                "atlas_bytes": [mosaic.tobytes()],
                "slots": [slots.astype(np.int64).tolist()],
                "image_ids": [ids],
            }
        )

    return keyed.groupby("akey").map_groups(build, batch_format="pandas")


def atlas_summary(atlases) -> "pa.Table":
    """Cheap per-atlas audit rows (no pixel payload): occupancy + an exact
    integer checksum of the mosaic, so the registry query stays light
    while the round-trip pin in pytest exercises the full bytes."""

    def summarize(batch: pa.Table) -> pa.Table:
        blobs = binary_views(batch.column("atlas_bytes"))
        sums = np.array(
            [
                int(np.sum(np.frombuffer(b, dtype=np.uint8), dtype=np.int64))
                for b in blobs
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "w": batch.column("w").cast(pa.int64()),
                "h": batch.column("h").cast(pa.int64()),
                "atlas_id": batch.column("atlas_id").cast(pa.int64()),
                "n_tiles": batch.column("n_tiles").cast(pa.int64()),
                "px_sum": pa.array(sums),
            }
        )

    return atlases.map_batches(summarize, batch_format="pyarrow")
