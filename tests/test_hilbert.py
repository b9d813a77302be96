"""Fixtures ported from nusamai-mvt/src/tileid/hilbert.rs:41-79."""

import numpy as np

from plateau_gis_converter_ray.kernels.hilbert import id_to_zxy, zxy_to_id

FIXTURE = [
    ((0, 0, 0), 0),
    ((1, 0, 0), 1),
    ((1, 0, 1), 2),
    ((1, 1, 1), 3),
    ((1, 1, 0), 4),
    ((2, 0, 1), 8),
    ((2, 1, 1), 7),
    ((2, 2, 0), 19),
    ((2, 3, 3), 15),
    ((2, 3, 2), 16),
    ((3, 0, 0), 21),
    ((3, 7, 0), 84),
    ((4, 0, 0), 85),
    ((4, 15, 0), 340),
    ((18, 1, 1), 22906492247),  # exceeds u32
]


def test_roundtrip_fixture():
    for (z, x, y), expected in FIXTURE:
        tid = zxy_to_id(z, x, y)
        assert int(tid) == expected, (z, x, y)
        assert id_to_zxy(expected) == (z, x, y)


def test_vectorized():
    z = 4
    xs = np.arange(16)
    ys = np.arange(16) % 8
    ids = zxy_to_id(z, xs, ys)
    for i in range(16):
        assert int(ids[i]) == int(zxy_to_id(z, int(xs[i]), int(ys[i])))
        assert id_to_zxy(int(ids[i])) == (z, int(xs[i]), int(ys[i]))


def test_unique_within_zoom():
    z = 6
    xx, yy = np.meshgrid(np.arange(1 << z), np.arange(1 << z))
    ids = zxy_to_id(z, xx.ravel(), yy.ravel())
    assert len(np.unique(ids)) == (1 << z) ** 2
    base = ((1 << (2 * z)) - 1) // 3
    assert ids.min() == base
    assert ids.max() == base + (1 << (2 * z)) - 1
