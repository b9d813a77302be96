"""PMTiles-compliant Hilbert-curve tile ids, vectorized over (x, y).

Semantics match ``nusamai-mvt/src/tileid/hilbert.rs:3-39`` (z <= ~29; ids
exceed u32 from z=17 up). The id is the shuffle/sort key for tile assembly.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def zxy_to_id(z: int, x, y):
    """Hilbert tile id(s) for tiles at zoom ``z`` (hilbert.rs:18-28).

    ``x``/``y`` may be scalars or arrays; returns uint64 of the same shape.
    """
    scalar_in = np.isscalar(x) and np.isscalar(y)
    x = np.atleast_1d(np.asarray(x)).astype(_U64)
    y = np.atleast_1d(np.asarray(y)).astype(_U64)
    acc = np.full(np.broadcast(x, y).shape, ((1 << (2 * z)) - 1) // 3, dtype=_U64)
    tx = x.copy()
    ty = y.copy()
    with np.errstate(over="ignore"):
        for a in range(z - 1, -1, -1):
            s = _U64(1 << a)
            rx = (tx >> _U64(a)) & _U64(1)
            ry = (ty >> _U64(a)) & _U64(1)
            # rotate (hilbert.rs:30-39); wrapping u64 arithmetic matches Rust's
            # wrapping_sub because numpy uint64 wraps modulo 2^64.
            swap = ry == 0
            flip = swap & (rx == 1)
            fx = np.where(flip, (s - _U64(1)) - tx, tx)
            fy = np.where(flip, (s - _U64(1)) - ty, ty)
            tx = np.where(swap, fy, fx)
            ty = np.where(swap, fx, fy)
            acc = acc + s * s * ((_U64(3) * rx) ^ ry)
    return _U64(acc[0]) if (scalar_in and acc.shape == (1,)) else acc


def id_to_zxy(tile_id: int):
    """Inverse: tile id -> (z, x, y) (hilbert.rs:3-16). Scalar."""
    tile_id = int(tile_id)
    # Rust: z = u64::BITS/2 - leading_zeros(3*id+1)/2 - 1, clz = 64 - bit_length
    bl = (3 * tile_id + 1).bit_length()
    z = 32 - (64 - bl) // 2 - 1
    acc = ((1 << (2 * z)) - 1) // 3
    pos = tile_id - acc
    tx = ty = 0
    for a in range(z):
        rx = (pos // 2) & 1
        ry = (pos ^ rx) & 1
        s = 1 << a
        if ry == 0:
            if rx == 1:
                tx = (s - 1) - tx
                ty = (s - 1) - ty
            tx, ty = ty, tx
        tx += s * rx
        ty += s * ry
        pos //= 4
    return z, tx, ty
