"""Stateful stream processing over key-hash bucket actors.

Ray Data has no event-time windows/watermarks (SURVEY §2.9: the reference
has none either — bounded channels only). For stream-shaped semantics that
genuinely need cross-batch state in arrival order (running aggregates fed
incrementally, not recomputed), the Dataset API cannot express the operator
— this is the documented "(c) raw Ray actors as a last resort" case from
the build brief.

Design + partitioning assumption:
- the input is an ordered, partitioned log: batches arrive in ts order
  *per key* (here: the events table sorted by ts);
- keys are hash-partitioned over N bucket actors; each actor owns its keys'
  state exclusively (no cross-actor coordination);
- the driver (or an upstream stage) routes each batch slice to its bucket
  actor; actors apply increments and can snapshot state at any time.

At cluster scale the bucket actors are placed per node and fed by
``iter_batches`` from an upstream sorted Dataset; state snapshots write to
the manifest for resume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_bucket_actor():
    """Define the actor class lazily (ray import at call time)."""
    import ray

    @ray.remote
    class StreamBucket:
        """Owns the running state for its hash bucket of keys."""

        def __init__(self):
            self.totals: dict[int, int] = {}
            self.counts: dict[int, int] = {}
            self.last_ts: dict[int, int] = {}
            self.out_of_order = 0

        def ingest(self, keys, ts_us, values_c) -> int:
            """Apply one ordered batch slice; returns rows applied."""
            for k, t, v in zip(keys, ts_us, values_c):
                k = int(k)
                if self.last_ts.get(k, -(1 << 62)) > t:
                    self.out_of_order += 1  # ordering violation detector
                self.last_ts[k] = int(t)
                self.totals[k] = self.totals.get(k, 0) + int(v)
                self.counts[k] = self.counts.get(k, 0) + 1
            return len(keys)

        def snapshot(self) -> dict:
            return {
                "totals": dict(self.totals),
                "counts": dict(self.counts),
                "out_of_order": self.out_of_order,
            }

    return StreamBucket


def stream_running_totals(sf_dir: str, n_buckets: int = 4) -> pd.DataFrame:
    """Feed the events log (ts-ordered) through bucket actors; return the
    final per-user running totals. Equivalent batch recomputation is the
    test oracle.
    """
    import ray
    import ray.data

    StreamBucket = make_bucket_actor()
    actors = [StreamBucket.remote() for _ in range(n_buckets)]

    ds = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["user_id", "ts", "value"])
        .sort("ts")
    )
    # ordered replay: route each batch's rows to their bucket actor; the
    # per-key order is preserved because the stream itself is ts-sorted and
    # each key maps to exactly one actor
    pending = []
    for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        users = batch["user_id"].to_numpy()
        ts = batch["ts"].astype("int64").to_numpy()
        vals = np.round(batch["value"].to_numpy() * 100).astype(np.int64)
        bucket = (users % n_buckets).astype(np.int64)
        for b in range(n_buckets):
            m = bucket == b
            if m.any():
                pending.append(actors[b].ingest.remote(
                    users[m].tolist(), ts[m].tolist(), vals[m].tolist()
                ))
        # bound the in-flight queue (backpressure, like the reference's
        # bounded channels pipeline/runner.rs:15-16)
        if len(pending) > 4 * n_buckets:
            ray.get(pending[: 2 * n_buckets])
            pending = pending[2 * n_buckets :]
    ray.get(pending)

    rows = []
    for snap in ray.get([a.snapshot.remote() for a in actors]):
        assert snap["out_of_order"] == 0, "per-key ordering violated"
        for k, total in snap["totals"].items():
            rows.append(
                {"user_id": int(k), "total_c": int(total), "n": snap["counts"][k]}
            )
    for a in actors:
        ray.kill(a)
    return pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)
