"""`ray job submit` entrypoint for the corpus-clean pipeline (dedup ->
keep-canonical -> sharded parquet), with optional post-compaction.

On a real cluster:

    ray job submit --working-dir . -- python jobs/corpus_job.py \
        --sf-dir /data/sf1 --out /out/corpus --shards 64 --compact

Resume-safe like the flagship job: a killed submission re-run skips
manifest-committed shards (finished-shard pruning happens BEFORE compute
is scheduled), and the optional compaction pass is itself resumable per
bin (sinks/compact.py). `ray job submit` retries therefore converge
without recomputing finished partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/plateau_ray_out/corpus_job")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--compact", action="store_true",
                    help="bin-pack the shard files after the write")
    ap.add_argument("--target-mb", type=int, default=128)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from plateau_gis_converter_ray.pipelines.corpus import write_corpus_dedup

    res = write_corpus_dedup(args.sf_dir, args.out, n_shards=args.shards)
    if args.compact:
        from plateau_gis_converter_ray.sinks.compact import (
            compact_parquet_dir,
        )

        flat = os.path.join(args.out, "_flat")
        os.makedirs(flat, exist_ok=True)
        # shard payloads live one level down (part=K/part.parquet);
        # hard-link them into one flat dir so the size-based bin plan
        # sees them without copying bytes
        for k in sorted(os.listdir(args.out)):
            src = os.path.join(args.out, k, "part.parquet")
            if k.startswith("part=") and os.path.exists(src):
                dst = os.path.join(flat, f"{k.replace('=', '_')}.parquet")
                if not os.path.exists(dst):
                    os.link(src, dst)
        res["compaction"] = compact_parquet_dir(
            flat, os.path.join(args.out, "compacted"),
            target_bytes=args.target_mb << 20,
        )
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
