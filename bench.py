"""Benchmark harness — one JSON line on stdout.

Headline: the flagship tile-assignment pipeline (image decode -> geocode ->
PIP join -> multi-zoom tile fanout -> combiner -> groupby) over the synthetic
image table at the scale matching $GRAFT_SF_DIR, repeated ``REPEAT`` times in
one streaming Dataset to amortize session fixed costs; metric value is the
headline wall seconds, with tile-assignments/s (BASELINE.json's metric)
reported alongside. Per-query timings for the registry's representative
pipelines are under "queries".

Usage:
  python bench.py              # honours RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR
  python bench.py --scaling    # runs itself at 8 and 32 CPUs in fresh
                               # processes; prints throughputs + efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "4"))

BENCH_QUERIES = [
    "tile_wm_z12",
    "sessionize",
    "order_minmax",
    "tile_3dt_z7",
    "pip_mesh",
    "knn_points",
    "pricing_summary",
    "nation_revenue",
    "events_window",
    "dedup_exact",
    "embed_knn",
    "text_stats_by_lang",
    # r2 additions: the de-drivered join family + new operators
    "top_orders",
    "asof_latest_order",
    "embed_near_dup_cosine",
    "ivf_self_knn",
    "range_join_recent",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else 0.1


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from plateau_gis_converter_ray.pipelines.flagship import tile_aggregate_ds
    from plateau_gis_converter_ray.sources.images import ensure_image_table

    sf = _sf_of(SF_DIR)

    # untimed: generate-or-reuse the image table, warm the page cache
    table_dir = ensure_image_table(sf)
    files = sorted(
        os.path.join(table_dir, f)
        for f in os.listdir(table_dir)
        if f.endswith(".parquet")
    )
    for f in files:
        with open(f, "rb") as fh:
            fh.read()

    # headline: one streaming pipeline over REPEAT x the input files
    t0 = time.perf_counter()
    agg = tile_aggregate_ds(files * REPEAT, decode_concurrency=(1, NUM_CPUS))
    total_assignments = int(agg.sum("n_assignments"))
    headline = time.perf_counter() - t0

    # per-query timings (sf_dir tables); skipped in scaling legs
    query_secs = {}
    bench_queries = (
        [] if os.environ.get("GRAFT_BENCH_QUERIES") == "0" else BENCH_QUERIES
    )
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in bench_queries:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # consume: count() streams without materializing on the driver
        if hasattr(res, "count"):
            res.count()
        query_secs[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "flagship_tile_assignment_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": query_secs,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "repeat": REPEAT,
        "assignments": total_assignments,
        "assignments_per_s": round(total_assignments / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """8 vs 32 CPUs in fresh processes; legs ALTERNATE and each level keeps
    its minimum over GRAFT_SCALING_REPS rounds — the sandbox host is
    multi-tenant with ~2x throughput swings between minutes, and the min is
    the standard noise-robust estimator for identical deterministic work."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_QUERIES="0",
            # bigger workload per leg so per-session fixed costs (~seconds)
            # don't dominate the 32-cpu numerator
            GRAFT_BENCH_REPEAT=os.environ.get("GRAFT_SCALING_WORK", "8"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    lo, hi = 8, 32
    lo_runs, hi_runs = [], []
    for _ in range(reps):
        lo_runs.append(run(lo))
        hi_runs.append(run(hi))
    r_lo = min(lo_runs, key=lambda r: r["value"])
    r_hi = min(hi_runs, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "sec_8_all": [r["value"] for r in lo_runs],
        "sec_32_all": [r["value"] for r in hi_runs],
        "assignments_per_s_8": r_lo["assignments_per_s"],
        "assignments_per_s_32": r_hi["assignments_per_s"],
        "sf": r_lo["sf"],
        "repeat": r_lo["repeat"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
