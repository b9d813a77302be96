"""`ray job submit` entrypoint for the flagship pipeline.

On a real cluster:

    ray job submit --working-dir . -- python jobs/flagship_job.py \
        --sf 0.1 --out /tmp/plateau_ray_out/flagship_job --chunks 16

The job is resume-safe: a killed submission re-run skips manifest-committed
chunks (state/manifest.py), so `ray job submit` retries converge without
recomputing finished partitions — the north rule's mid-shuffle resume
contract (verified by tools/killtest.py).

In the sandbox this runs against the local Ray (`RAY_ADDRESS=local`); on a
cluster, `ray.init(address="auto")` picks up the running GCS the job was
submitted to.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", default=None)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--glb-tiles", action="store_true",
                    help="also write z/x/y.glb tile content")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from plateau_gis_converter_ray.pipelines.flagship import (
        run_flagship,
        write_flagship_glb_tiles,
    )

    res = run_flagship(sf=args.sf, out_dir=args.out, n_chunks=args.chunks)
    if args.glb_tiles:
        tiles = write_flagship_glb_tiles(res["out_dir"]).to_pandas()
        res["glb_tiles"] = int(len(tiles))
        res["glb_bytes"] = int(tiles["glb_bytes"].sum())
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
