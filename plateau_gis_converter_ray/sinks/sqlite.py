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
import struct

import numpy as np
import pandas as pd


def _sql_type(dtype) -> str:
    if np.issubdtype(dtype, np.integer):
        return "INTEGER"
    if np.issubdtype(dtype, np.floating):
        return "REAL"
    return "TEXT"


# ---------------------------------------------------------------------------
# GeoPackage SQL Geometry Binary (GPB) blobs — nusamai-gpkg/src/geometry.rs
# :48-120 semantics: "GP" magic, version 0, flags 0b1 (little-endian, no
# envelope), LE srs_id, then WKB MultiPolygonZ (1006) of PolygonZ (1003).

WKB_POLYGON_Z = 1003
WKB_MULTIPOLYGON_Z = 1006


def gpb_multipolygonz(polys: list[list[np.ndarray]], srs_id: int = 4326) -> bytes:
    """Encode a MultiPolygonZ ([polygon][ring (n,3) closed xyz]) as a GPB
    blob (write_indexed_multipolygon, geometry.rs:89-120)."""
    out = bytearray(b"GP\x00\x01")
    out += struct.pack("<i", srs_id)
    out += b"\x01" + struct.pack("<II", WKB_MULTIPOLYGON_Z, len(polys))
    for rings in polys:
        out += b"\x01" + struct.pack("<II", WKB_POLYGON_Z, len(rings))
        for ring in rings:
            ring = np.ascontiguousarray(ring, dtype="<f8")
            out += struct.pack("<I", len(ring))
            out += ring.tobytes()
    return bytes(out)


def decode_gpb(blob: bytes) -> dict:
    """Parse a GPB blob back (round-trip tests)."""
    if blob[:2] != b"GP":
        raise ValueError("bad GPB magic")
    version, flags = blob[2], blob[3]
    srs_id, = struct.unpack_from("<i", blob, 4)
    pos = 8
    byte_order = blob[pos]
    gtype, npolys = struct.unpack_from("<II", blob, pos + 1)
    pos += 9
    polys = []
    for _ in range(npolys):
        _bo = blob[pos]
        _pt, nrings = struct.unpack_from("<II", blob, pos + 1)
        pos += 9
        rings = []
        for _ in range(nrings):
            npts, = struct.unpack_from("<I", blob, pos)
            pos += 4
            rings.append(
                np.frombuffer(blob, "<f8", npts * 3, pos).reshape(-1, 3).copy()
            )
            pos += npts * 24
        polys.append(rings)
    return {"version": version, "flags": flags, "srs_id": srs_id,
            "geometry_type": gtype, "byte_order": byte_order, "polys": polys}


class SQLiteWriter:
    """Single-writer actor: all batches stream through one connection.

    Usage: ``ds.map_batches(SQLiteWriter, fn_constructor_args=(db_path,
    table_col), batch_format="pandas", concurrency=1)`` then
    :func:`finalize_contents` on the driver.
    """

    def __init__(self, db_path: str, table_col: str | None = None,
                 table_name: str = "features",
                 bbox_cols: tuple = ("lng", "lat"),
                 geom_col: str | None = None, srs_id: int = 4326):
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
        self.geom_col = geom_col
        self.srs_id = srs_id
        self.known_tables: dict[str, list[str]] = {}

    def _ensure_table(self, name: str, df: pd.DataFrame) -> list[str]:
        if name in self.known_tables:
            return self.known_tables[name]
        cols = [c for c in df.columns if c != self.table_col]
        defs = ", ".join(
            f'"{c}" BLOB' if c == "geom"
            else f'"{c}" {_sql_type(df[c].dtype)}' for c in cols
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
        if self.geom_col and self.geom_col in batch.columns:
            # flat xyz ring column -> GPB MultiPolygonZ blob (geometry.rs)
            def to_blob(flat):
                ring = np.asarray(flat, dtype=np.float64).reshape(-1, 3)
                ring = np.concatenate([ring, ring[:1]])  # close
                return gpb_multipolygonz([[ring]], self.srs_id)

            batch = batch.drop(columns=[self.geom_col]).assign(
                geom=[to_blob(v) for v in batch[self.geom_col]]
            )
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
