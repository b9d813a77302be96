"""Small-file compaction (table maintenance): bin-pack many small parquet
files into ~target-size outputs.

At 100 TB a streamed ingest leaves millions of block-sized files; readers
then pay per-file open/footer costs and the metadata store bloats. The
reference has no analogue (its sinks write once); this is the Ray-native
maintenance pass the north rule's resumable-output contract implies.

Design:
- the PLAN is metadata-only on the driver: file sizes via ``os.stat``
  (no data read), best-fit-decreasing into bins of ``target_bytes`` —
  deterministic (ties broken by name / lowest bin id) so a resumed run
  re-derives the same plan;
- each bin compacts in its own Ray task (read its files, write ONE
  contiguous parquet) via temp-dir + atomic rename, committing a
  manifest line (rows, byte size, file lineage, elapsed) per bin —
  a killed compaction resumes by skipping finished bins before any
  compute is scheduled;
- the source directory is never touched: compaction writes a NEW
  directory and the final swap is the caller's single atomic rename,
  so concurrent readers stay consistent throughout.

**Deployment requirement — shared filesystem.** Bin tasks rename their
part directories and append manifest lines from INSIDE Ray worker tasks,
so on a multi-node cluster ``in_dir``/``out_dir`` MUST be on storage every
node mounts at the same path (NFS/EFS/FSx or an object-store FUSE mount —
the standard data-lake layout this sink models). On node-local disks the
manifests and payloads would scatter across nodes and resume would re-run
or miss bins. The same contract applies to the corpus shard writer
(pipelines/corpus.py) and the keyed upsert sink (sinks/upsert.py); the
ANN index builder (stages/ann_index.py) instead returns commit records to
the driver and only the payload rename runs worker-side.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from ..state.manifest import PartitionManifest, atomic_write_dir


def plan_bins(in_dir: str, target_bytes: int) -> list[list[str]]:
    """Best-fit-decreasing pack of the directory's parquet files into
    bins of at most ``target_bytes`` (a single file larger than the
    target gets its own bin). O(n log n) via a sorted free-capacity list
    (a linear first-fit scan is quadratic at the millions-of-files scale
    this module targets). Deterministic: sizes descending, names
    ascending on ties; best-fit chooses the tightest capacity and breaks
    capacity ties by lowest bin id, so a resumed run re-derives the same
    plan; the final plan is re-sorted for stable bin ids."""
    import bisect

    files = [
        (f, os.stat(os.path.join(in_dir, f)).st_size)
        for f in sorted(os.listdir(in_dir))
        if f.endswith(".parquet")
    ]
    bins: list[list[str]] = []
    # sorted list of (free_capacity, bin_index): best fit = the smallest
    # capacity >= size; the bin_index tiebreak keeps it deterministic
    free: list[tuple[int, int]] = []
    for name, size in sorted(files, key=lambda t: (-t[1], t[0])):
        pos = bisect.bisect_left(free, (size, -1))
        if pos < len(free):
            cap, i = free.pop(pos)
            bins[i].append(name)
            bisect.insort(free, (cap - size, i))
        else:
            bins.append([name])
            bisect.insort(free, (max(0, target_bytes - size), len(bins) - 1))
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
    # resume-safety: a completed bin is only skipped if its recorded file
    # lineage matches the re-derived plan — if the SOURCE directory
    # changed between crash and resume, positional bin ids no longer mean
    # the same file set and silently skipping would duplicate some rows
    # and drop others; fail loudly instead
    if done and os.path.exists(manifest.path):
        recorded: dict[str, list] = {}
        with open(manifest.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                recorded[rec["key"]] = rec.get("lineage", {}).get("files")
        for i, fs in enumerate(bins):
            k = str(i)
            if k in done and recorded.get(k) is not None and recorded[k] != fs:
                raise ValueError(
                    f"compaction resume: bin {k} was committed for files "
                    f"{recorded[k]} but the re-derived plan assigns {fs} — "
                    "the source directory (or the packing algorithm) "
                    "changed since the previous run; compact into a fresh "
                    "out_dir"
                )
        # a shrunk source can leave committed bins BEYOND the new plan:
        # their part dirs would silently keep rows for files that no
        # longer exist — refuse rather than serve stale data
        stale = sorted(done - {str(i) for i in range(len(bins))}, key=int)
        if stale:
            raise ValueError(
                f"compaction resume: committed bins {stale} are not in the "
                f"re-derived {len(bins)}-bin plan — the source directory "
                "shrank since the previous run; compact into a fresh out_dir"
            )
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
                part_dir = manifest.partition_dir(key)
                data_path = os.path.join(part_dir, "data.parquet")
                lineage_json = json.dumps(files)
                n_rows = None
                if os.path.exists(data_path):
                    # crash landed between the atomic rename and the
                    # manifest commit: recommit from the parquet footer —
                    # but ONLY if the payload's own recorded file list
                    # (written into its key-value metadata) matches the
                    # re-derived plan; a source change in that window
                    # otherwise recommits stale rows under fresh lineage
                    md = pq.read_metadata(data_path)
                    kv = md.metadata or {}
                    if kv.get(b"compact_files") == lineage_json.encode():
                        n_rows = md.num_rows
                    else:
                        import shutil

                        shutil.rmtree(part_dir)
                if n_rows is None:
                    tables = [
                        pq.read_table(os.path.join(in_dir, f))
                        for f in files
                    ]
                    merged = pa.concat_tables(
                        tables, promote_options="default"
                    )
                    merged = merged.replace_schema_metadata(
                        {"compact_files": lineage_json}
                    )
                    n_rows = merged.num_rows

                    def do_write(tmp, merged=merged):
                        pq.write_table(
                            merged, os.path.join(tmp, "data.parquet")
                        )

                    atomic_write_dir(part_dir, do_write)
                size = os.stat(data_path).st_size
                elapsed = time.monotonic() - t0
                manifest.commit_partition(
                    key,
                    rows=n_rows,
                    checksum=size,
                    lineage={"files": files},
                    metrics={
                        "elapsed_s": round(elapsed, 4),
                        "bytes": size,
                        "rows_per_s": round(
                            n_rows / max(elapsed, 1e-9), 1
                        ),
                    },
                )
                out.append({"bin": int(rec["bin"]), "rows": n_rows})
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
