"""Fixtures ported from nusamai/src/sink/cesiumtiles/tiling/scheme.rs:100-260."""

import numpy as np
import pytest

from plateau_gis_converter_ray.kernels.scheme3dt import (
    calc_parent_zxy,
    geometric_error,
    is_valid_zxy,
    iter_x_slice,
    iter_y_slice,
    msb,
    size_for_z,
    x_slice_range,
    x_step,
    y_slice_range,
    zxy_from_lng_lat,
)


def test_msb():
    assert list(msb(np.array([0, 1, 2, 3, 4]))) == [0, 1, 2, 2, 3]


def test_x_step():
    fixtures = [
        ((0, 0), 1), ((1, 0), 1), ((1, 1), 1), ((2, 0), 1), ((2, 1), 1),
        ((3, 0), 2), ((3, 1), 1), ((3, 2), 1), ((3, 3), 2),
        ((4, 0), 4), ((4, 1), 2), ((4, 2), 1), ((4, 3), 1), ((4, 4), 1),
        ((4, 5), 1), ((4, 6), 2), ((4, 7), 4),
        ((5, 0), 8), ((5, 1), 4),
    ]
    for (z, y), expected in fixtures:
        assert int(x_step(z, y)) == expected, (z, y)


def test_is_valid_zxy():
    assert is_valid_zxy(0, 0, 0)
    assert is_valid_zxy(1, 0, 0)
    assert is_valid_zxy(1, 1, 1)
    assert is_valid_zxy(3, 0, 0)
    assert not is_valid_zxy(3, 1, 0)
    assert is_valid_zxy(3, 2, 0)
    assert not is_valid_zxy(3, 3, 0)
    assert not is_valid_zxy(4, 1, 1)
    assert not is_valid_zxy(4, 3, 0)
    assert not is_valid_zxy(4, 3, 1)
    assert is_valid_zxy(4, 4, 1)
    assert is_valid_zxy(4, 0, 6)
    assert not is_valid_zxy(4, 1, 6)
    assert is_valid_zxy(4, 2, 6)
    assert is_valid_zxy(4, 0, 7)
    assert not is_valid_zxy(4, 7, 7)
    assert is_valid_zxy(4, 8, 7)


def test_size_for_z():
    assert size_for_z(0) == (1, 1)
    assert size_for_z(1) == (2, 2)
    assert size_for_z(2) == (4, 2)
    assert size_for_z(3) == (8, 4)


def test_iter_y_slice():
    assert list(iter_y_slice(1, -25.0, 60.0)) == [0, 1]
    assert list(iter_y_slice(3, -25.0, 60.0)) == [0, 1, 2]
    assert list(iter_y_slice(4, -25.0, 60.0)) == [1, 2, 3, 4, 5]


def test_iter_x_slice():
    assert iter_x_slice(4, 0, -24.0, 46.0) == [(4, 4)]
    assert iter_x_slice(4, 1, -24.0, 46.0) == [(6, 2), (8, 2)]
    assert iter_x_slice(4, 2, -24.0, 46.0) == [(6, 1), (7, 1), (8, 1), (9, 1), (10, 1)]
    assert iter_x_slice(4, 3, -24.0, 46.0) == [(6, 1), (7, 1), (8, 1), (9, 1), (10, 1)]
    assert iter_x_slice(4, 7, -24.0, 46.0) == [(4, 4)]


def test_geometric_error():
    assert abs(float(geometric_error(1, 1)) - 1e100) < 1e93
    assert abs(float(geometric_error(2, 1)) - 525957.5361033019) < 1e-7
    for y in range(4):
        assert abs(float(geometric_error(3, y)) - 262978.76805165096) < 1e-7
    assert abs(float(geometric_error(4, 0)) - 131489.38402582548) < 1e-7
    assert abs(float(geometric_error(4, 1)) - 146103.17544566366) < 1e-7
    assert abs(float(geometric_error(4, 2)) - 131489.38402582548) < 1e-7
    assert abs(float(geometric_error(4, 3)) - 131489.38402582548) < 1e-7
    assert abs(float(geometric_error(4, 6)) - 146103.17544566366) < 1e-7
    assert abs(float(geometric_error(4, 7)) - 131489.38402582548) < 1e-7
    assert abs(float(geometric_error(5, 0)) - 65744.69201291274) < 1e-7
    assert abs(float(geometric_error(5, 1)) - 76338.70680864961) < 1e-7
    assert abs(float(geometric_error(5, 2)) - 65744.69201291274) < 1e-7
    assert abs(float(geometric_error(5, 3)) - 83415.98216479822) < 1e-7
    assert abs(float(geometric_error(5, 4)) - 65744.69201291274) < 1e-7


def test_geometric_error_y_out_of_range():
    with pytest.raises(ValueError):
        geometric_error(3, 4)


def test_slice_range():
    z, x, y = 4, 4, 1
    xs = int(x_step(z, y))
    south, north = y_slice_range(z, y)
    west, east = x_slice_range(z, x, xs)
    assert (float(south), float(north), float(west), float(east)) == (
        45.0, 67.5, -90.0, -45.0,
    )


def test_calc_parent_zxy():
    assert calc_parent_zxy(2, 0, 0) == (1, 0, 0)
    assert calc_parent_zxy(2, 2, 0) == (1, 1, 0)
    assert calc_parent_zxy(2, 2, 1) == (1, 1, 1)
    assert calc_parent_zxy(2, 1, 1) == (1, 0, 1)
    assert calc_parent_zxy(3, 0, 0) == (2, 0, 0)
    assert calc_parent_zxy(3, 2, 0) == (2, 1, 0)
    assert calc_parent_zxy(3, 1, 1) == (2, 0, 0)
    assert calc_parent_zxy(3, 2, 1) == (2, 1, 0)
    assert calc_parent_zxy(4, 4, 1) == (3, 2, 0)
    assert calc_parent_zxy(4, 4, 2) == (3, 2, 1)
    assert calc_parent_zxy(4, 0, 2) == (3, 0, 1)


def test_zxy_from_lng_lat_valid_and_vectorized():
    rng = np.random.default_rng(7)
    lng = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    for z in [0, 1, 2, 5, 9, 15]:
        x, y = zxy_from_lng_lat(z, lng, lat)
        for i in range(0, 500, 97):
            assert is_valid_zxy(z, int(x[i]), int(y[i])), (z, x[i], y[i])
        # tile bounds actually contain the point (x-aligned tiles are wide)
        xs = x_step(z, y)
        south, north = y_slice_range(z, y)
        west, east = x_slice_range(z, x, xs)
        assert np.all((lat >= south) & (lat <= north))
        assert np.all((lng >= west) & (lng <= east))


def test_zxy_from_lng_lat_boundary_clamps_into_grid():
    # lat=-90 / lng=180 used to emit y == y_size (invalid tile, out-of-domain
    # Hilbert id); they now clamp into the last valid row/column
    for z in [0, 1, 2, 7, 12]:
        x, y = zxy_from_lng_lat(z, np.array([180.0, -180.0, 0.0]),
                                np.array([-90.0, 90.0, -90.0]))
        for xi, yi in zip(x.tolist(), y.tolist()):
            assert is_valid_zxy(z, int(xi), int(yi)), (z, xi, yi)
