"""Clipper conformance: invariants + a scalar re-derivation oracle.

The scalar oracle below re-implements the reference's fold
(cesiumtiles/slice.rs:252-298) line-by-line in plain Python; the vectorized
kernel must match it bit-for-bit on random polygons.
"""

import numpy as np

from plateau_gis_converter_ray.kernels.clip import (
    clip_ring,
    is_cw,
    polygon_area,
    ring_area,
    signed_ring_area,
    slice_polygon_3dt,
    slice_polygon_mvt,
)


def scalar_clip_ring(ring, axis, k1, k2):
    """Direct port of the reference's per-edge fold (the oracle)."""
    out = []
    n = len(ring)
    pts = list(ring) + [ring[0]]
    a = None
    for b in pts:
        if a is None:
            a = b
            continue
        av, bv = a[axis], b[axis]
        if av < k1:
            if bv > k1:
                t = (k1 - av) / (bv - av)
                p = a + (b - a) * t
                p[axis] = k1
                out.append(p)
        elif av > k2:
            if bv < k2:
                t = (k2 - av) / (bv - av)
                p = a + (b - a) * t
                p[axis] = k2
                out.append(p)
        else:
            out.append(a.copy())
        if bv < k1 and av > k1:
            t = (k1 - av) / (bv - av)
            p = a + (b - a) * t
            p[axis] = k1
            out.append(p)
        elif bv > k2 and av < k2:
            t = (k2 - av) / (bv - av)
            p = a + (b - a) * t
            p[axis] = k2
            out.append(p)
        a = b
    return np.array(out).reshape(-1, ring.shape[1])


def test_clip_matches_scalar_oracle():
    rng = np.random.default_rng(42)
    for trial in range(50):
        n = rng.integers(3, 12)
        ring = rng.uniform(-10, 10, size=(n, 5))
        for axis in (0, 1):
            lo, hi = sorted(rng.uniform(-8, 8, 2))
            got = clip_ring(ring, axis, lo, hi)
            want = scalar_clip_ring(ring.copy(), axis, lo, hi)
            assert got.shape == want.shape, (trial, axis)
            np.testing.assert_array_equal(got, want)


def test_clip_square_inside_slab():
    sq = np.array([[0.0, 0.0], [4, 0], [4, 4], [0, 4]])
    out = clip_ring(sq, 1, -10, 10)
    np.testing.assert_array_equal(out, sq)


def test_clip_square_half():
    sq = np.array([[0.0, 0.0], [4, 0], [4, 4], [0, 4]])
    out = clip_ring(sq, 1, 0.0, 2.0)
    # area of clipped region should be half of original
    assert abs(ring_area(out) - 8.0) < 1e-12


def test_area_and_winding():
    ccw = np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1]])
    assert signed_ring_area(ccw) > 0
    assert not is_cw(ccw)
    assert is_cw(ccw[::-1])
    assert abs(ring_area(ccw) - 1.0) < 1e-15
    assert abs(polygon_area([ccw * 4, ccw]) - 15.0) < 1e-12


def test_slice_3dt_partitions_area():
    """Slicing must partition the polygon: tile pieces sum to the original area."""
    # triangle spanning several z=4 tiles around Japan
    tri = np.array(
        [[135.0, 30.0, 10.0, 0.0, 0.0],
         [145.0, 31.0, 20.0, 1.0, 0.0],
         [140.0, 42.0, 30.0, 0.5, 1.0]]
    )
    orig = ring_area(tri[:, :2])
    pieces = list(slice_polygon_3dt(6, [tri]))
    assert len(pieces) >= 4
    total = sum(ring_area(rings[0][:, :2]) for (_, rings) in pieces if len(rings[0]))
    assert abs(total - orig) < 1e-9
    # interpolated extra columns stay within the original value ranges
    for (z, x, y), rings in pieces:
        assert z == 6
        if len(rings[0]):
            assert rings[0][:, 2].min() >= 10.0 - 1e-9
            assert rings[0][:, 2].max() <= 30.0 + 1e-9


def test_slice_3dt_keys_match_point_tiling():
    """Every emitted tile key must contain part of the polygon bbox."""
    from plateau_gis_converter_ray.kernels.scheme3dt import (
        x_slice_range, x_step, y_slice_range,
    )

    tri = np.array([[139.0, 35.0, 0, 0, 0], [141.0, 35.5, 0, 0, 0], [140.0, 36.5, 0, 0, 0]])
    for (z, x, y), rings in slice_polygon_3dt(6, [tri]):
        south, north = y_slice_range(z, y)
        west, east = x_slice_range(z, x, int(x_step(z, y)))
        if len(rings[0]):
            assert rings[0][:, 1].min() >= float(south) - 1e-9
            assert rings[0][:, 1].max() <= float(north) + 1e-9
            assert rings[0][:, 0].min() >= float(west) - 1e-9
            assert rings[0][:, 0].max() <= float(east) + 1e-9


def test_slice_mvt_winding_and_locals():
    # CW square in normalized mercator (y down): visit corners clockwise
    sq = np.array([[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8]])
    assert signed_ring_area(sq) > 0  # y-down: this ordering has positive shoelace
    out = {}
    slice_polygon_mvt(2, 1 << 12, 0, [sq], out)
    assert len(out) >= 4
    for (z, x, y), rings in out.items():
        assert z == 2
        for is_ext, ring in rings:
            assert len(ring) >= 3
            # tile-local coords in [0,1] when buffer=0
            assert ring[:, 0].min() >= -1e-9 and ring[:, 0].max() <= 1 + 1e-9
            assert ring[:, 1].min() >= -1e-9 and ring[:, 1].max() <= 1 + 1e-9


def test_slice_mvt_buffer_extends_bounds():
    sq = np.array([[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8]])
    out = {}
    buffer = (1 << 12) * 5 // 256  # extent 2^12, buffer_pixels 5 (mvt/mod.rs:206-207)
    slice_polygon_mvt(2, 1 << 12, buffer, [sq], out)
    buf_width = buffer / (1 << 12)
    for _, rings in out.items():
        for _, ring in rings:
            assert ring[:, 0].min() >= -buf_width - 1e-9
            assert ring[:, 0].max() <= 1 + buf_width + 1e-9
