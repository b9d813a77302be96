"""Clean-schema parquet reads for the driver-provided testdata tables.

The testdata parquet files carry a ``pandas`` schema-metadata blob whose
presence makes ``hash(pa.Schema)`` raise (metadata dict), which defeats Ray
Data's block-schema deduplication: every block-metadata unify falls back to
the slow path and each worker logs "Failed to hash the schemas" (the r2
bench-tail noise). Reading with an explicitly metadata-stripped schema makes
every downstream block carry a hashable schema — dedup works, the log is
clean, and nothing else changes (the pandas metadata only describes index
columns we never use).
"""

from __future__ import annotations

from functools import lru_cache


def _schema_of(path: str, columns: tuple | None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return schema


_clean_schema_cached = lru_cache(maxsize=256)(_schema_of)


def _clean_schema(path: str, columns: tuple | None):
    import os

    if os.path.isdir(path):
        # stage-output directories (pipelines/textclean.py) hold N part
        # files with one schema; read it off the first footer. NOT cached:
        # unlike the immutable testdata files, stage dirs can be
        # rewritten within one process.
        parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if not parts:
            raise FileNotFoundError(
                f"{path} contains no parquet files (empty stage output?)"
            )
        return _schema_of(os.path.join(path, parts[0]), columns)
    return _clean_schema_cached(path, columns)


def read_table(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    filter=None,
):
    """``read_parquet`` for ``{sf_dir}/{table}.parquet`` with column pruning,
    optional row-filter pushdown (a ``pyarrow.dataset`` expression evaluated
    at the scan — row groups whose statistics exclude the predicate are
    never read, so a date-range query touches only the matching fraction of
    a 100 TB table), and a metadata-stripped schema (see module docstring)."""
    import ray.data

    import os

    path = f"{sf_dir}/{table}.parquet"
    kwargs = {}
    if filter is not None:
        kwargs["filter"] = filter
    # Ray's default parallelism floor (2 x CPUs) over-splits SMALL files:
    # a 600 KB documents table lands in 64 ~80-row blocks, and every
    # downstream stage pays a task schedule per block for microseconds of
    # compute each (~8 ms/block measured: a 10 MiB lineitem scan is 0.60s
    # at 64 blocks vs 0.27s at 16). Cap reads under 32 MiB at 16 blocks
    # (>= 2 MiB per block; 16-way still saturates the per-block fixed
    # cost for data this small). Anything larger keeps Ray's own sizing
    # unconditionally — the cap can never reduce read parallelism for a
    # file a cluster would meaningfully split, on any machine size.
    try:
        if os.path.isfile(path):
            size = os.path.getsize(path)
        else:  # stage-output dir: sum the part files (O(#files) metadata)
            size = sum(
                e.stat().st_size
                for e in os.scandir(path)
                if e.name.endswith(".parquet")
            )
        if size < (32 << 20):
            kwargs["override_num_blocks"] = 16
    except OSError:
        pass
    return ray.data.read_parquet(
        path,
        columns=columns,
        schema=_clean_schema(path, tuple(columns) if columns else None),
        **kwargs,
    )
