"""Douglas-Peucker: deviation bound, subsequence, idempotence, ring mode."""

import numpy as np

from plateau_gis_converter_ray.kernels.simplify import (
    dp_simplify,
    dp_simplify_ring,
    max_deviation,
)


def _noisy_line(n=500, seed=7):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 100, n)
    y = np.sin(x / 7.0) * 10 + rng.normal(0, 0.05, n)
    return np.stack([x, y], axis=1)


def test_dp_deviation_bound_and_subsequence():
    pts = _noisy_line()
    for eps in (0.1, 0.5, 2.0):
        kept = dp_simplify(pts, eps)
        assert kept[0] == 0 and kept[-1] == len(pts) - 1
        assert (np.diff(kept) > 0).all()  # strict subsequence
        assert max_deviation(pts, kept) <= eps + 1e-12
        assert len(kept) < len(pts)
    # monotone: tighter eps keeps at least as many points
    k1 = dp_simplify(pts, 0.1)
    k2 = dp_simplify(pts, 2.0)
    assert len(k1) >= len(k2)


def test_dp_idempotent():
    pts = _noisy_line()
    kept = dp_simplify(pts, 0.5)
    again = dp_simplify(pts[kept], 0.5)
    assert np.array_equal(again, np.arange(len(kept)))


def test_dp_ring():
    t = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    r = 10 + 0.02 * np.sin(40 * t)
    ring = np.stack([r * np.cos(t), r * np.sin(t)], axis=1)
    kept = dp_simplify_ring(ring, 0.5)
    assert 3 <= len(kept) < len(ring)
    # area roughly preserved (a 0.5-eps simplification of a r=10 circle)
    def area(p):
        x, y = p[:, 0], p[:, 1]
        return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    assert abs(area(ring[kept]) - area(ring)) / area(ring) < 0.05


def test_dp_degenerate():
    assert np.array_equal(dp_simplify(np.zeros((2, 2)), 1.0), [0, 1])
    seg = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 0.0]])
    kept = dp_simplify(seg, 0.1)
    assert kept[0] == 0 and kept[-1] == 2
