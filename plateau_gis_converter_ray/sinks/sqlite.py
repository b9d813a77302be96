"""SQLite sink — the GeoPackage sink's architecture (sink/gpkg/mod.rs:84-276).

Reference shape reproduced:
- parallel encode upstream (map_batches), then a SINGLE writer actor holding
  one sqlite connection/transaction (the reference's single sqlx tx,
  gpkg/mod.rs:210-251) — `concurrency=1` IS the serialization contract;
- one table per group key (per-type tables, gpkg/table.rs:7), created
  lazily from the first batch's schema with attribute stringification for
  nested values (gpkg/attributes.rs:5-55);
- a `contents` metadata table with per-table row counts and bbox, updated at
  finalize (the gpkg_contents + update_bbox step, gpkg/mod.rs:228-244);
- output deleted up-front like the reference (gpkg/mod.rs:94-99).
"""

from __future__ import annotations

import json
import os
import sqlite3

import numpy as np
import pandas as pd


def _sql_type(dtype) -> str:
    if np.issubdtype(dtype, np.integer):
        return "INTEGER"
    if np.issubdtype(dtype, np.floating):
        return "REAL"
    return "TEXT"


class SQLiteWriter:
    """Single-writer actor: all batches stream through one connection.

    Usage: ``ds.map_batches(SQLiteWriter, fn_constructor_args=(db_path,
    table_col), batch_format="pandas", concurrency=1)`` then
    :func:`finalize_contents` on the driver.
    """

    def __init__(self, db_path: str, table_col: str | None = None,
                 table_name: str = "features",
                 bbox_cols: tuple = ("lng", "lat")):
        if os.path.exists(db_path):
            os.unlink(db_path)  # start clean (gpkg/mod.rs:94-99)
        os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
        # Ray may invoke __call__ from a different thread than __init__; the
        # actor itself serializes calls, so cross-thread use is safe here
        self.con = sqlite3.connect(db_path, check_same_thread=False)
        self.con.execute("PRAGMA journal_mode=WAL")
        self.con.execute("BEGIN")
        self.table_col = table_col
        self.table_name = table_name
        self.bbox_cols = bbox_cols
        self.known_tables: dict[str, list[str]] = {}

    def _ensure_table(self, name: str, df: pd.DataFrame) -> list[str]:
        if name in self.known_tables:
            return self.known_tables[name]
        cols = [c for c in df.columns if c != self.table_col]
        defs = ", ".join(
            f'"{c}" {_sql_type(df[c].dtype)}' for c in cols
        )
        self.con.execute(f'CREATE TABLE IF NOT EXISTS "{name}" ({defs})')
        self.known_tables[name] = cols
        return cols

    @staticmethod
    def _stringify(v):
        """Nested attribute stringification (gpkg/attributes.rs:5-55)."""
        if isinstance(v, (list, dict)):
            return json.dumps(v, separators=(",", ":"), sort_keys=True)
        if isinstance(v, np.ndarray):
            return json.dumps(v.tolist(), separators=(",", ":"))
        return v

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        groups = (
            batch.groupby(self.table_col, sort=False)
            if self.table_col
            else [(self.table_name, batch)]
        )
        written = 0
        for name, g in groups:
            cols = self._ensure_table(str(name), g)
            rows = [
                tuple(self._stringify(v) for v in rec)
                for rec in g[cols].itertuples(index=False, name=None)
            ]
            placeholders = ",".join("?" * len(cols))
            self.con.executemany(
                f'INSERT INTO "{name}" VALUES ({placeholders})', rows
            )
            written += len(rows)
        self.con.commit()
        self.con.execute("BEGIN")
        return pd.DataFrame({"written": [written]})


def finalize_contents(db_path: str, bbox_cols: tuple = ("lng", "lat")) -> dict:
    """Driver-side finalize: build the `contents` metadata table with row
    counts and bbox per data table (the update_bbox step)."""
    con = sqlite3.connect(db_path)
    con.execute(
        "CREATE TABLE IF NOT EXISTS contents "
        "(table_name TEXT PRIMARY KEY, row_count INTEGER, "
        "min_x REAL, min_y REAL, max_x REAL, max_y REAL)"
    )
    tables = [
        r[0]
        for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' AND name != 'contents'"
        )
    ]
    out = {}
    for t in tables:
        cols = {r[1] for r in con.execute(f'PRAGMA table_info("{t}")')}
        n = con.execute(f'SELECT COUNT(*) FROM "{t}"').fetchone()[0]
        if set(bbox_cols) <= cols:
            bx = con.execute(
                f'SELECT MIN("{bbox_cols[0]}"), MIN("{bbox_cols[1]}"), '
                f'MAX("{bbox_cols[0]}"), MAX("{bbox_cols[1]}") FROM "{t}"'
            ).fetchone()
        else:
            bx = (None, None, None, None)
        con.execute(
            "INSERT OR REPLACE INTO contents VALUES (?,?,?,?,?,?)",
            (t, n, *bx),
        )
        out[t] = {"rows": n, "bbox": bx}
    con.commit()
    con.close()
    return out
