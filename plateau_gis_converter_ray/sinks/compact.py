"""Small-file compaction (table maintenance): bin-pack many small parquet
files into ~target-size outputs.

At 100 TB a streamed ingest leaves millions of block-sized files; readers
then pay per-file open/footer costs and the metadata store bloats. The
reference has no analogue (its sinks write once); this is the Ray-native
maintenance pass the north rule's resumable-output contract implies.

Design:
- the PLAN is metadata-only on the driver: file sizes via ``os.stat``
  (no data read), first-fit-decreasing into bins of ``target_bytes`` —
  deterministic (ties broken by name) so a resumed run re-derives the
  same plan;
- each bin compacts in its own Ray task (read its files, write ONE
  contiguous parquet) via temp-dir + atomic rename, committing a
  manifest line (rows, byte size, file lineage, elapsed) per bin —
  a killed compaction resumes by skipping finished bins before any
  compute is scheduled;
- the source directory is never touched: compaction writes a NEW
  directory and the final swap is the caller's single atomic rename,
  so concurrent readers stay consistent throughout.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from ..state.manifest import PartitionManifest, atomic_write_dir


def plan_bins(in_dir: str, target_bytes: int) -> list[list[str]]:
    """First-fit-decreasing pack of the directory's parquet files into
    bins of at most ``target_bytes`` (a single file larger than the
    target gets its own bin). Deterministic: sizes descending, names
    ascending on ties, and the final plan re-sorted for stable bin ids."""
    files = [
        (f, os.stat(os.path.join(in_dir, f)).st_size)
        for f in sorted(os.listdir(in_dir))
        if f.endswith(".parquet")
    ]
    bins: list[list[str]] = []
    free: list[int] = []
    for name, size in sorted(files, key=lambda t: (-t[1], t[0])):
        for i in range(len(bins)):
            if free[i] >= size:
                bins[i].append(name)
                free[i] -= size
                break
        else:
            bins.append([name])
            free.append(max(0, target_bytes - size))
    for b in bins:
        b.sort()
    bins.sort(key=lambda b: b[0])
    return bins


def compact_parquet_dir(in_dir: str, out_dir: str,
                        target_bytes: int = 128 << 20) -> dict:
    """Compact ``in_dir``'s parquet files into ``out_dir`` (resumable).

    Returns ``{"bins": n, "compacted": k, "skipped": n-k, "rows": total}``
    (rows counts only newly compacted bins)."""
    import pyarrow.parquet as pq
    import ray.data

    bins = plan_bins(in_dir, target_bytes)
    manifest = PartitionManifest(out_dir)
    done = manifest.completed_keys()
    todo = [
        {"bin": i, "files": json.dumps(fs)}
        for i, fs in enumerate(bins)
        if str(i) not in done
    ]
    total_rows = 0
    if todo:
        def compact(batch: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa

            out = []
            for rec in batch.to_dict("records"):  # <= 1 bin per batch
                t0 = time.monotonic()
                key = str(rec["bin"])
                files = json.loads(rec["files"])
                tables = [
                    pq.read_table(os.path.join(in_dir, f)) for f in files
                ]
                merged = pa.concat_tables(tables, promote_options="default")
                part_dir = manifest.partition_dir(key)

                def do_write(tmp, merged=merged):
                    pq.write_table(
                        merged, os.path.join(tmp, "data.parquet")
                    )

                atomic_write_dir(part_dir, do_write)
                size = os.stat(
                    os.path.join(part_dir, "data.parquet")
                ).st_size
                elapsed = time.monotonic() - t0
                manifest.commit_partition(
                    key,
                    rows=merged.num_rows,
                    checksum=size,
                    lineage={"files": files},
                    metrics={
                        "elapsed_s": round(elapsed, 4),
                        "bytes": size,
                        "rows_per_s": round(
                            merged.num_rows / max(elapsed, 1e-9), 1
                        ),
                    },
                )
                out.append(
                    {"bin": int(rec["bin"]), "rows": merged.num_rows}
                )
            return pd.DataFrame(out)

        stats = (
            ray.data.from_items(todo)
            .map_batches(compact, batch_format="pandas", batch_size=1)
            .to_pandas()
        )
        total_rows = int(stats["rows"].sum()) if len(stats) else 0
    return {
        "bins": len(bins),
        "compacted": len(todo),
        "skipped": len(bins) - len(todo),
        "rows": total_rows,
    }
