"""Per-partition lineage manifest — the checkpoint/resume contract.

The reference has NO checkpointing (a run is all-or-nothing,
pipeline/feedback.rs:51-72); the north rule requires a killed run to resume
without recomputing completed partitions. Design (SURVEY.md §7.4):

- output is partitioned: one directory per partition key (tile-id bucket,
  typename, ...), written via temp-dir + atomic ``os.rename``;
- each completed partition appends one JSON line to ``manifest.jsonl``
  (atomic append of a single line) recording key, row count, payload
  checksum, and lineage (input fingerprint + stage chain);
- on restart, :func:`completed_keys` is read and finished partitions are
  filtered out *before* any compute is scheduled.

Writes happen inside Ray tasks (``map_groups``); the manifest append uses
O_APPEND single-line writes which are atomic on POSIX for < PIPE_BUF sizes.
"""

from __future__ import annotations

import json
import os
import tempfile


class PartitionManifest:
    def __init__(self, root: str, run_config: dict | None = None):
        self.root = root
        self.path = os.path.join(root, "manifest.jsonl")
        os.makedirs(root, exist_ok=True)
        self.run_config = run_config or {}

    def completed_keys(self) -> set[str]:
        done = set()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn write from a killed run: partition not committed
                    done.add(rec["key"])
        return done

    def partition_dir(self, key: str) -> str:
        return os.path.join(self.root, f"part={key}")

    def commit_partition(self, key: str, rows: int, checksum: int,
                         lineage: dict | None = None,
                         metrics: dict | None = None) -> None:
        """Record a finished partition. The data dir must already be renamed
        into place (see :func:`atomic_write_dir`). ``metrics`` carries the
        partition's runtime figures (elapsed seconds, rows/s) — the north
        rule's per-partition lineage + metrics record."""
        rec = {
            "key": key,
            "rows": rows,
            "checksum": int(checksum),
            "lineage": lineage or {},
            "metrics": metrics or {},
        }
        line = json.dumps(rec, separators=(",", ":")) + "\n"
        fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
        try:
            os.write(fd, line.encode())
        finally:
            os.close(fd)


def atomic_write_dir(final_dir: str, write_fn) -> None:
    """Write into a temp dir next to ``final_dir`` then atomically rename."""
    parent = os.path.dirname(final_dir)
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".tmp_", dir=parent)
    try:
        write_fn(tmp)
        if os.path.exists(final_dir):
            # completed by a concurrent/previous attempt — idempotent no-op
            import shutil

            shutil.rmtree(tmp)
            return
        os.rename(tmp, final_dir)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
