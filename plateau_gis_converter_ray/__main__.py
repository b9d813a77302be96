"""CLI — the nusamai main.rs lifecycle (main.rs:111-292) on Ray Data.

    python -m plateau_gis_converter_ray convert INPUT.parquet OUT_DIR \\
        --sink noop|parquet|grouped|tiles [--param k=v ...] [--num-cpus N]

Lifecycle, mirroring the reference:
  1. resolve sink provider from the registry, validate typed params
     (main.rs:134-158);
  2. sink.make_requirements() -> derive the transform chain *before any data
     flows* (main.rs:160-164, 242-251);
  3. read source (column-pruned parquet; the CityGML-source analogue);
  4. apply the derived chain as fused map_batches stages;
  5. run the sink; print wall time (main.rs:291).

The CLI owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="plateau_gis_converter_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    conv = sub.add_parser("convert", help="run source -> derived chain -> sink")
    conv.add_argument("input", help="parquet file/dir (the tabular source)")
    conv.add_argument("output", help="output directory")
    conv.add_argument("--sink", default="noop")
    conv.add_argument("--source", default="parquet",
                      help="source provider (see BUILTIN_SOURCES)")
    conv.add_argument("--rules", default=None,
                      help="JSON file of rename rules (exact + '*:wildcard' "
                           "keys), the --rules mapping-rules file of "
                           "main.rs:166-179")
    conv.add_argument("--param", action="append", default=[], metavar="K=V")
    conv.add_argument("--columns", default=None, help="comma-separated read pruning")
    conv.add_argument("--num-cpus", type=int, default=8)
    conv.add_argument("--dump-chain", action="store_true",
                      help="print the derived chain and exit (schema-first)")
    conv.add_argument("--dump-schema", action="store_true",
                      help="print the derived OUTPUT schema and exit without "
                           "running (the reference's schema-dump, "
                           "main.rs:253-257: schema finalized before data flows)")

    ls = sub.add_parser("sinks", help="list builtin sinks and their parameters")
    sub.add_parser("sources", help="list builtin source providers")

    q = sub.add_parser(
        "query",
        help="run a registry pipeline by name (the __ray_entry__.queries() "
             "surface) and write its result",
    )
    q.add_argument("name", nargs="?", default=None,
                   help="query name; omit to list all registered queries")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None,
                   help="output parquet path (directory); default = print "
                        "row count + head only")
    q.add_argument("--num-cpus", type=int, default=8)

    dd = sub.add_parser(
        "dedup-corpus",
        help="write the deduplicated documents corpus (near-dup pairs -> "
             "CC -> keep-canonical) as hash-sharded parquet with a "
             "lineage+metrics manifest; resumable (finished shards skip)",
    )
    dd.add_argument("sf_dir", help="testdata dir holding documents.parquet")
    dd.add_argument("output", help="output directory (manifest.jsonl + part=K/)")
    dd.add_argument("--shards", type=int, default=8)
    dd.add_argument("--no-resume", action="store_true")
    dd.add_argument("--num-cpus", type=int, default=8)

    cc = sub.add_parser(
        "clean-corpus",
        help="end-to-end training-corpus clean: quality filter -> exact + "
             "near-dup dedup -> eval decontamination -> sequence packing; "
             "staged, resumable (complete stages skip on rerun)",
    )
    cc.add_argument("sf_dir", help="testdata dir holding documents.parquet")
    cc.add_argument("output", help="output directory (per-stage part=K/)")
    cc.add_argument("--budget", type=int, default=256,
                    help="tokens per packed training sequence")
    cc.add_argument("--num-cpus", type=int, default=8)

    args = p.parse_args(argv)

    if args.cmd == "clean-corpus":
        import ray

        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from plateau_gis_converter_ray.pipelines.textclean import (
            run_text_clean,
        )

        t0 = time.perf_counter()
        try:
            res = run_text_clean(args.sf_dir, args.output,
                                 budget=args.budget)
            res["elapsed_s"] = round(time.perf_counter() - t0, 3)
            print(json.dumps(res))
            return 0
        finally:
            ray.shutdown()

    if args.cmd == "dedup-corpus":
        import ray

        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from plateau_gis_converter_ray.pipelines.corpus import (
            write_corpus_dedup,
        )

        t0 = time.perf_counter()
        try:
            res = write_corpus_dedup(
                args.sf_dir, args.output, n_shards=args.shards,
                resume=not args.no_resume,
            )
            res["elapsed_s"] = round(time.perf_counter() - t0, 3)
            print(json.dumps(res))
            return 0
        finally:
            ray.shutdown()

    if args.cmd == "query":
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        import __ray_entry__ as entrymod

        registry = entrymod.queries()
        oracles = entrymod.oracle_sql()
        if args.name is None:
            for name in sorted(registry):
                gate = "oracle" if name in oracles else "rows"
                print(f"{name:28s} [{gate}]")
            return 0
        if args.name not in registry:
            print(f"unknown query {args.name!r}; run without a name to list",
                  file=sys.stderr)
            return 2

        import ray

        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        t0 = time.perf_counter()
        try:
            result = registry[args.name](args.sf_dir)
            if args.out and hasattr(result, "write_parquet"):
                result.write_parquet(args.out)
                n = "written"
            else:
                df = result.to_pandas() if hasattr(result, "to_pandas") else result
                if args.out:
                    df.to_parquet(os.path.join(args.out, "result.parquet")) \
                        if os.path.isdir(args.out) else df.to_parquet(args.out)
                n = len(df)
            print(json.dumps({"query": args.name, "rows": n,
                              "elapsed_s": round(time.perf_counter() - t0, 3)}))
            return 0
        finally:
            ray.shutdown()

    from plateau_gis_converter_ray.pipelines.build import (
        BUILTIN_SINKS,
        BUILTIN_SOURCES,
        apply_chain,
        build_transform_chain,
    )

    if args.cmd == "sources":
        for name, s in BUILTIN_SOURCES.items():
            print(f"{name:10s} {s.description}")
        return 0

    if args.cmd == "sinks":
        for name, s in BUILTIN_SINKS.items():
            params = ", ".join(
                f"{q.name}:{q.type}{'*' if q.required else ''}" for q in s.parameters
            )
            print(f"{name:10s} {s.description}  [{params}]")
        return 0

    if args.sink not in BUILTIN_SINKS:
        print(f"unknown sink {args.sink!r}; available: {sorted(BUILTIN_SINKS)}",
              file=sys.stderr)
        return 2
    provider = BUILTIN_SINKS[args.sink]

    raw_params = {}
    for kv in args.param:
        k, _, v = kv.partition("=")
        if v.isdigit():
            v = int(v)
        elif v in ("true", "false"):
            v = v == "true"
        raw_params[k] = v
    try:
        params = provider.validate_params(raw_params)
    except ValueError as e:
        print(f"parameter error: {e}", file=sys.stderr)
        return 2

    req = provider.make_requirements(params)
    if args.rules:
        with open(args.rules) as f:
            req.rename_rules = {**(req.rename_rules or {}), **json.load(f)}
    chain = build_transform_chain(req)
    if args.dump_chain:
        print(json.dumps({"sink": args.sink, "chain": chain}, indent=2))
        return 0
    if args.dump_schema:
        # pure schema path: pyarrow metadata read + derive_schema, no Ray
        import pyarrow.parquet as pq

        from plateau_gis_converter_ray.pipelines.build import derive_schema

        in_schema = pq.read_schema(
            args.input
            if args.input.endswith(".parquet")
            else next(
                os.path.join(args.input, f)
                for f in sorted(os.listdir(args.input))
                if f.endswith(".parquet")
            )
        )
        if args.columns:
            keep = args.columns.split(",")
            import pyarrow as pa

            in_schema = pa.schema([f for f in in_schema if f.name in keep])
        out_schema = derive_schema(in_schema, chain)
        print(json.dumps(
            {
                "sink": args.sink,
                "input_schema": {f.name: str(f.type) for f in in_schema},
                "output_schema": {f.name: str(f.type) for f in out_schema},
            },
            indent=2,
        ))
        return 0

    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    t0 = time.perf_counter()
    try:
        import ray.data

        columns = args.columns.split(",") if args.columns else None
        if args.source not in BUILTIN_SOURCES:
            print(f"unknown source {args.source!r}", file=sys.stderr)
            return 2
        ds = BUILTIN_SOURCES[args.source].open(args.input, columns)
        ds = apply_chain(ds, chain)
        result = provider.run(ds, params, args.output)
        if hasattr(result, "to_pandas"):
            result = {"rows": len(result.to_pandas())}
        elapsed = time.perf_counter() - t0
        print(json.dumps({"sink": args.sink, "elapsed_s": round(elapsed, 3),
                          "result": result}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
