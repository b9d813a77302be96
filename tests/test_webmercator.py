"""Fixtures ported from nusamai-mvt/src/webmercator.rs:46-115."""

import numpy as np

from plateau_gis_converter_ray.kernels.webmercator import (
    CIRCUMFERENCE,
    lnglat_to_web_mercator,
    lnglat_to_web_mercator_meters,
    web_mercator_meters_to_lnglat,
    web_mercator_to_lnglat,
    zxy_from_lnglat_webmercator,
)


def test_roundtrip_normalized():
    for lng, lat in [(136.08, 37.39), (0.3, 0.2)]:
        mx, my = lnglat_to_web_mercator(lng, lat)
        lng2, lat2 = web_mercator_to_lnglat(mx, my)
        assert abs(lng - lng2) < 1e-13
        assert abs(lat - lat2) < 1e-13


def test_roundtrip_meters():
    for lng, lat in [(136.08, 37.39), (0.3, 0.2)]:
        mx, my = lnglat_to_web_mercator_meters(lng, lat)
        lng2, lat2 = web_mercator_meters_to_lnglat(mx, my)
        assert abs(lng - lng2) < 1e-9
        assert abs(lat - lat2) < 1e-9


def test_null_island():
    mx, my = lnglat_to_web_mercator(0.0, 0.0)
    assert abs(mx - 0.5) < 1e-10
    assert abs(my - 0.5) < 1e-10
    mx, my = lnglat_to_web_mercator_meters(0.0, 0.0)
    assert abs(mx) < 1e-9
    assert abs(my) < 1e-9


def test_bound_in_meters():
    mx, my = lnglat_to_web_mercator_meters(180.0, 85.0511287798066)
    assert abs(mx - CIRCUMFERENCE / 2) < 1e-7
    assert abs(my - CIRCUMFERENCE / 2) < 1e-7


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    lng = rng.uniform(-179.9, 179.9, 1000)
    lat = rng.uniform(-84.9, 84.9, 1000)
    mx, my = lnglat_to_web_mercator(lng, lat)
    for i in [0, 17, 999]:
        sx, sy = lnglat_to_web_mercator(float(lng[i]), float(lat[i]))
        assert mx[i] == sx and my[i] == sy


def test_tile_xy():
    # slippy-map sanity: Tokyo station (139.7671, 35.6812) at z=12 is
    # x=floor((139.7671+180)/360*4096)=floor(3638.05)=3638
    x, y = zxy_from_lnglat_webmercator(12, 139.7671, 35.6812)
    assert int(x) == 3638
    mx, my = lnglat_to_web_mercator(139.7671, 35.6812)
    assert int(y) == int(my * 4096)
