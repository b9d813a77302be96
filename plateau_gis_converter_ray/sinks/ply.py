"""Stanford PLY binary sink — the reference's two-pass centroid writer.

Mirrors ``nusamai/src/sink/ply/mod.rs``:

- pass 1: global centroid over every triangle vertex — here a distributed
  ``map_batches`` partial-sum (int-µm accumulators, order-free and
  bit-stable per the determinism contract) folded on the driver
  (mod.rs:166-186's serialized fold, parallelized);
- pass 2: recentre, then global vertex dedup on the f64 BIT PATTERN of the
  recentred coords (the ``IndexSet<[u64;3]>`` at mod.rs:192-202) with
  first-occurrence index assignment, faces as ``uchar 3 + u32 x 3``;
- header == PLY_HEADER_TEMPLATE (mod.rs:25-34): binary_little_endian,
  double x/y/z, uchar-list faces.

The assembly pass is one writer per output file (the format is one file —
the same serialization point as the reference's writer closure); at scale
one shards by key range into multiple .ply files, like every grouped sink
here. The index-assignment dict is the insertion-ordered IndexSet role.
"""

from __future__ import annotations

import os

import numpy as np

PLY_HEADER_TEMPLATE = (
    "ply\n"
    "format binary_little_endian 1.0\n"
    "element vertex {n_verts}\n"
    "property double x\n"
    "property double y\n"
    "property double z\n"
    "element face {n_faces}\n"
    "property list uchar uint vertex_indices\n"
    "end_header\n"
)


def triangulate_polygons_ds(poly_ds):
    """Polygon rows -> triangle rows, the reference's PLY geometry pass
    (``ply/mod.rs:111-150``: geodetic->geocentric 3D ring ->
    ``project3d_to_2d`` -> earcut -> triangle soup).

    Input rows: ``ring_xyz`` flat [x0,y0,z0,...] exterior ring, optional
    ``holes_xyz`` list of flat hole rings. Output rows: ``tri_xyz`` flat
    9-float triangles — the input ``write_ply_from_triangles`` expects.
    Runs as a vectorizable ``map_batches`` stage (earcut per footprint,
    tens of vertices each; the per-batch loop is over features, not
    vertices-of-the-whole-dataset).
    """
    import pandas as pd

    from ..kernels.earcut import earcut, project3d_to_2d

    def triangulate(batch: pd.DataFrame) -> pd.DataFrame:
        has_holes = "holes_xyz" in batch.columns
        out = []
        for row_i in range(len(batch)):
            ring = np.asarray(
                batch["ring_xyz"].iloc[row_i], dtype=np.float64
            ).reshape(-1, 3)
            raw_holes = batch["holes_xyz"].iloc[row_i] if has_holes else None
            if raw_holes is None:
                raw_holes = []
            holes = [
                np.asarray(h, dtype=np.float64).reshape(-1, 3)
                for h in raw_holes
                if len(h)
            ]
            coords3d = (
                np.concatenate([ring] + holes) if holes else ring
            )
            hole_indices = []
            pos = len(ring)
            for h in holes:
                hole_indices.append(pos)
                pos += len(h)
            flat = project3d_to_2d(coords3d, len(ring))
            if flat is None:
                continue  # degenerate footprint (reference skips too)
            tris = earcut(flat, hole_indices or None).reshape(-1, 3)
            for t in tris:
                out.append(coords3d[t].reshape(-1))
        return pd.DataFrame({"tri_xyz": out})

    return poly_ds.map_batches(triangulate, batch_format="pandas")


def write_ply_from_triangles(tri_ds, path: str) -> dict:
    """``tri_ds``: rows with ``tri_xyz`` = flat [x0,y0,z0,x1,y1,z1,x2,y2,z2]
    (one triangle per row). Returns {path, n_verts, n_faces}."""

    # pass 1: exact integer-µm centroid partials, distributed
    def partial(batch) -> "object":
        import pandas as pd

        tri = np.stack(
            [np.asarray(t, dtype=np.float64) for t in batch["tri_xyz"]]
        ).reshape(-1, 3)
        um = np.round(tri * 1e6).astype(np.int64)
        return pd.DataFrame(
            {
                "sx": [int(um[:, 0].sum())],
                "sy": [int(um[:, 1].sum())],
                "sz": [int(um[:, 2].sum())],
                "n": [len(um)],
            }
        )

    parts = tri_ds.map_batches(partial, batch_format="pandas").to_pandas()
    n_total = int(parts["n"].sum())
    mu = np.array(
        [parts["sx"].sum(), parts["sy"].sum(), parts["sz"].sum()],
        dtype=np.float64,
    ) / (1e6 * max(n_total, 1))

    # pass 2: recentre + global bit-pattern vertex dedup + face stream
    vindex: dict[bytes, int] = {}
    vbuf = bytearray()
    fbuf = bytearray()
    n_faces = 0
    for batch in tri_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        tri = np.stack(
            [np.asarray(t, dtype=np.float64) for t in batch["tri_xyz"]]
        ).reshape(-1, 3)
        rec = tri - mu[None, :]
        packed = np.ascontiguousarray(rec, dtype="<f8").view(np.uint8).reshape(-1, 24)
        idxs = np.empty(len(rec), dtype=np.uint32)
        for i, row in enumerate(packed):
            key = row.tobytes()
            vi = vindex.get(key)
            if vi is None:
                vi = vindex[key] = len(vindex)
                vbuf += key
            idxs[i] = vi
        tri_idx = idxs.reshape(-1, 3)
        for a, b, c in tri_idx:
            fbuf += b"\x03" + np.array([a, b, c], dtype="<u4").tobytes()
        n_faces += len(tri_idx)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(
            PLY_HEADER_TEMPLATE.format(
                n_verts=len(vindex), n_faces=n_faces
            ).encode("ascii")
        )
        f.write(bytes(vbuf))
        f.write(bytes(fbuf))
    os.replace(tmp, path)
    return {"path": path, "n_verts": len(vindex), "n_faces": n_faces}


def read_ply(path: str) -> dict:
    """Minimal binary PLY reader for the round-trip tests."""
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii").splitlines()
    n_verts = n_faces = 0
    for line in header:
        if line.startswith("element vertex"):
            n_verts = int(line.split()[-1])
        elif line.startswith("element face"):
            n_faces = int(line.split()[-1])
    pos = head_end
    verts = np.frombuffer(data, "<f8", n_verts * 3, pos).reshape(-1, 3)
    pos += n_verts * 24
    faces = np.empty((n_faces, 3), dtype=np.uint32)
    for i in range(n_faces):
        assert data[pos] == 3
        faces[i] = np.frombuffer(data, "<u4", 3, pos + 1)
        pos += 13
    return {"header": header, "vertices": verts, "faces": faces}
