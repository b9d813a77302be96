"""Projection fixtures ported from nusamai-projection (cartesian.rs tests,
etmerc.rs round_trip, jprect.rs zones — PROJ-derived expectations)."""

import numpy as np

from plateau_gis_converter_ray.kernels.projection import (
    ExtendedTransverseMercator,
    GeoidGrid,
    JPR_ROMAN,
    JPR_ZONES,
    axis_swap,
    geocentric_to_geodetic,
    geodetic_to_geocentric,
    grs80,
    jpr_zone_projection,
    wgs84,
)

# PROJ-derived per-zone fixtures (jprect.rs:320-339):
# project_inverse(10*z^2, 10*z^2) -> (lng, lat)
ZONE_DATA = [
    (129.5001070162252, 33.00009017667281),
    (131.00042806620712, 33.00036070613305),
    (132.1676649612675, 36.00081118731552),
    (133.501712285731, 33.001442815599916),
    (134.3361064243794, 36.002253277312406),
    (136.0039933010935, 36.00324469874967),
    (137.172102073566, 36.0044163624128),
    (138.50709942815922, 36.005768260190365),
    (139.8423187209358, 36.00730038272098),
    (140.84504648774808, 40.00900650080927),
    (140.26509038599607, 44.01088997134999),
    (142.26795943105512, 44.01295973802651),
    (144.27107818464975, 44.01520940180659),
    (142.01958184674254, 26.017691869346883),
    (127.52247965928949, 26.020309314749657),
    (124.02557746313299, 26.023107208243783),
    (131.02887528672798, 26.02608553672523),
    (136.03097002921405, 20.029267328281904),
    (154.03607111621068, 26.032583441961588),
]


def test_geodetic_to_geocentric_fixture():
    # cartesian.rs:218-240
    w = wgs84()
    x, y, z = geodetic_to_geocentric(w, 140.0, 37.0, 50.0)
    assert abs(float(x) - -3906851.9770472576) < 1e-10
    assert abs(float(y) - 3278238.0530045824) < 1e-10
    assert abs(float(z) - 3817423.251099322) < 1e-10
    x, y, z = geodetic_to_geocentric(w, 123.0, 90.0, 150.0)
    assert abs(float(x)) < 1e-9 and abs(float(y)) < 1e-9
    assert abs(float(z) - (w.b + 150.0)) < 1e-9
    x, y, z = geodetic_to_geocentric(w, 0.0, 0.0, 100.0)
    assert abs(float(x) - (w.a + 100.0)) < 1e-9
    assert abs(float(y)) < 1e-9 and abs(float(z)) < 1e-9


def test_geocentric_roundtrip():
    # cartesian.rs:168-211 (outside evolute / inside / singular disc)
    w = wgs84()
    for (lng, lat, h), htol in [
        ((140.0, 37.0, 50.0), 1e-7),
        ((45.0, 74.58501644931525, -6344866.234164982), 1e-7),
        ((0.0, 90.0, w.b), 1e-7),
    ]:
        x, y, z = geodetic_to_geocentric(w, lng, lat, h)
        lng2, lat2, h2 = geocentric_to_geodetic(w, x, y, z)
        assert abs(float(lng2) - lng) < 1e-10
        assert abs(float(lat2) - lat) < 1e-9
        assert abs(float(h2) - h) < htol


def test_etmerc_zone8_fixture():
    # etmerc.rs:378-403 (cs2cs epsg:6668 -> epsg:6676)
    tm = ExtendedTransverseMercator(138.5, 36.0, 0.9999, grs80())
    x, y, _ = tm.forward(138.19318970050347, 36.65209371778363)
    assert abs(float(x) - -27430.911753676937) < 1e-9
    assert abs(float(y) - 72396.2255270589) < 1e-9
    lng2, lat2, _ = tm.inverse(x, y)
    assert abs(float(lng2) - 138.19318970050347) < 1e-10
    assert abs(float(lat2) - 36.65209371778363) < 1e-10


def test_jpr_zones_proj_fixtures():
    # jprect.rs:342-366
    assert len(JPR_ZONES) == 19 and len(JPR_ROMAN) == 19
    for zone_no in range(1, 20):
        proj = jpr_zone_projection(zone_no)
        lng, lat, _ = proj.inverse(0.0, 0.0)
        lng0, lat0 = JPR_ZONES[zone_no]
        assert abs(float(lng) - lng0) < 1e-12
        assert abs(float(lat) - lat0) < 1e-12
        d = float(10 * zone_no * zone_no)
        lng, lat, _ = proj.inverse(d, d)
        assert abs(float(lng) - ZONE_DATA[zone_no - 1][0]) < 1e-12, zone_no
        assert abs(float(lat) - ZONE_DATA[zone_no - 1][1]) < 1e-12, zone_no
        x2, y2, _ = proj.forward(lng, lat)
        assert abs(float(x2) - d) < 1e-8
        assert abs(float(y2) - d) < 1e-8


def test_etmerc_vectorized_matches_scalar():
    tm = jpr_zone_projection(9)
    rng = np.random.default_rng(1)
    lng = 139.83 + rng.uniform(-1, 1, 100)
    lat = 36.0 + rng.uniform(-1, 1, 100)
    x, y, _ = tm.forward(lng, lat)
    for i in [0, 50, 99]:
        xs, ys, _ = tm.forward(float(lng[i]), float(lat[i]))
        assert float(xs) == x[i] and float(ys) == y[i]


def test_etmerc_domain():
    tm = jpr_zone_projection(1)
    # ~91 deg east of the central meridian at the equator -> |ce| > 2.623
    x, y, _ = tm.forward(220.5, 0.0)
    assert np.isnan(float(x))
    # inverse domain: easting beyond 150 deg equivalent
    lng, lat, _ = tm.inverse(3.0 * tm.a, 0.0)
    assert np.isnan(float(lng))


def test_axis_swap():
    c = np.array([[35.0, 139.0, 10.0], [36.0, 140.0, 20.0]])
    out = axis_swap(c)
    np.testing.assert_array_equal(out[0], [139.0, 35.0, 10.0])


def test_geoid_grid():
    g = GeoidGrid()
    # deterministic
    g2 = GeoidGrid()
    np.testing.assert_array_equal(g.values, g2.values)
    lng = np.array([138.2839817085188, 139.5])
    lat = np.array([37.12378643088312, 35.5])
    h = g.height(lng, lat)
    assert np.all((h >= 25.0) & (h <= 45.0))
    # vshift semantics: lng/lat unchanged, height += geoid (vshift.rs:17-20)
    lng2, lat2, he = g.jgd2011_to_wgs84(lng, lat, np.array([0.0, 10.0]))
    np.testing.assert_array_equal(lng2, lng)
    np.testing.assert_array_equal(lat2, lat)
    np.testing.assert_allclose(he, h + np.array([0.0, 10.0]))
    # bilinear: interior point between grid nodes lies within node bounds
    v = g.height(np.array([135.05]), np.array([35.05]))
    assert 25.0 <= float(v[0]) <= 45.0
