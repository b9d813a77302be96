"""Earcut kernel: concave + holed fixtures, area preserved, no flipped
triangles (VERDICT r2 item #3; reference = the earcut crate driven from
cesiumtiles/mod.rs:20 and ply/mod.rs:111-150)."""

import numpy as np
import pytest

from plateau_gis_converter_ray.kernels.earcut import (
    earcut,
    project3d_to_2d,
    ring_is_convex,
    triangulate_rings,
)


def _tri_areas(coords, tris):
    t = np.asarray(tris, dtype=np.int64).reshape(-1, 3)
    a = coords[t[:, 0]]
    b = coords[t[:, 1]]
    c = coords[t[:, 2]]
    return 0.5 * (
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    )


def _poly_area(ring):
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


L_SHAPE = np.array(
    [[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]], dtype=float
)


def test_l_shape_concave():
    tris = earcut(L_SHAPE)
    assert len(tris) == (len(L_SHAPE) - 2) * 3
    areas = _tri_areas(L_SHAPE, tris)
    assert (areas > 0).all()  # no flipped triangles
    assert np.isclose(areas.sum(), _poly_area(L_SHAPE))


def test_l_shape_clockwise_input_same_cover():
    tris = earcut(L_SHAPE[::-1].copy())
    areas = _tri_areas(L_SHAPE[::-1], tris)
    assert (areas > 0).all()
    assert np.isclose(areas.sum(), _poly_area(L_SHAPE))


def test_star_polygon():
    k = 10
    ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
    r = np.where(np.arange(k) % 2 == 0, 2.0, 0.7)
    star = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
    tris = earcut(star)
    areas = _tri_areas(star, tris)
    assert len(tris) == (k - 2) * 3
    assert (areas > 0).all()
    assert np.isclose(areas.sum(), _poly_area(star))


def test_square_with_hole():
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], dtype=float)
    coords = np.concatenate([outer, hole])
    tris = earcut(coords, [4])
    areas = _tri_areas(coords, tris)
    assert (areas > 0).all()
    assert np.isclose(areas.sum(), 16.0 - 4.0)


def test_two_holes():
    outer = np.array([[0, 0], [10, 0], [10, 4], [0, 4]], dtype=float)
    h1 = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], dtype=float)
    h2 = np.array([[6, 1], [8, 1], [8, 3], [6, 3]], dtype=float)
    coords = np.concatenate([outer, h1, h2])
    tris = earcut(coords, [4, 8])
    areas = _tri_areas(coords, tris)
    assert (areas > 0).all()
    assert np.isclose(areas.sum(), 40.0 - 4.0 - 4.0)


def test_collinear_points_skipped():
    ring = np.array(
        [[0, 0], [2, 0], [4, 0], [4, 4], [0, 4]], dtype=float
    )  # (2,0) collinear on the bottom edge
    tris = earcut(ring)
    areas = _tri_areas(ring, tris)
    assert np.isclose(areas.sum(), 16.0)
    assert (areas >= 0).all()


@pytest.mark.parametrize("seed", range(25))
def test_random_star_shaped_area_preserved(seed):
    """Radially-perturbed polygons are simple by construction; the
    triangulation must cover them exactly with CCW triangles."""
    from plateau_gis_converter_ray.kernels.imagecodec import splitmix64

    k = 12
    s = splitmix64(np.arange(k, dtype=np.uint64) + np.uint64(seed * 1000))
    r = 0.5 + (s % np.uint64(1000)).astype(np.float64) / 2000.0
    ang = np.linspace(0, 2 * np.pi, k, endpoint=False)
    ring = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
    tris = earcut(ring)
    areas = _tri_areas(ring, tris)
    assert len(tris) == (k - 2) * 3
    assert (areas > 0).all()
    assert np.isclose(areas.sum(), _poly_area(ring))


def test_ring_is_convex():
    square = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    assert ring_is_convex(square)
    assert ring_is_convex(square[::-1].copy())
    assert not ring_is_convex(L_SHAPE)


def test_triangulate_rings_fan_matches_earcut_cover():
    square = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    fan = triangulate_rings(square)
    assert len(fan) == 6  # fast path
    assert np.isclose(_tri_areas(square, fan).sum(), 4.0)
    concave = triangulate_rings(L_SHAPE)
    assert np.isclose(_tri_areas(L_SHAPE, concave).sum(), _poly_area(L_SHAPE))


def test_project3d_to_2d_vertical_wall():
    """A vertical quad (constant y) projects to a non-degenerate 2D ring
    whose area matches the 3D face area — the wall-surface case the PLY/glb
    path hits (reference: utils3d::project3d_to_2d)."""
    wall = np.array(
        [[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], dtype=float
    )
    flat = project3d_to_2d(wall, 4)
    assert flat is not None
    assert np.isclose(_poly_area(flat), 12.0)
    tris = earcut(flat)
    assert np.isclose(abs(_tri_areas(flat, tris)).sum(), 12.0)


def test_project3d_degenerate_returns_none():
    line = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], dtype=float)
    assert project3d_to_2d(line, 3) is None


def test_ply_polygon_pipeline_e2e(ray_session, tmp_path):
    """Polygon rows -> project3d_to_2d -> earcut -> triangle rows -> PLY
    round-trip (the reference's ply/mod.rs:111-150 geometry pass)."""
    import ray.data

    from plateau_gis_converter_ray.sinks.ply import (
        read_ply,
        triangulate_polygons_ds,
        write_ply_from_triangles,
    )

    l_ring = [c for xy in L_SHAPE for c in (xy[0], xy[1], 0.0)]
    outer = [0, 0, 5, 4, 0, 5, 4, 4, 5, 0, 4, 5]
    hole = [1, 1, 5, 3, 1, 5, 3, 3, 5, 1, 3, 5]
    rows = [
        {"ring_xyz": l_ring, "holes_xyz": []},
        {"ring_xyz": outer, "holes_xyz": [hole]},
    ]
    tri = triangulate_polygons_ds(ray.data.from_items(rows))
    res = write_ply_from_triangles(tri, str(tmp_path / "out.ply"))
    ply = read_ply(str(tmp_path / "out.ply"))
    # L-shape: 4 triangles; holed square: 8 vertices + 2 bridge dups -> 10
    # polygon vertices -> 10 - 2 = 8 triangles
    assert res["n_faces"] == len(ply["faces"]) == 4 + 8
    # triangulated area == 7 (L) + 12 (square minus hole)
    v = ply["vertices"]
    f = ply["faces"].astype(int)
    a = v[f[:, 0]][:, :2]
    b = v[f[:, 1]][:, :2]
    c = v[f[:, 2]][:, :2]
    areas = 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    )
    assert np.isclose(areas.sum(), 7.0 + 12.0)


def test_earcut_triangulate_query(ray_session):
    """Registry query: every star footprint triangulates to n-2 CCW
    triangles whose areas sum to the ring area exactly (to 1e-9 deg^2)."""
    import __ray_entry__ as em

    df = em.queries()["earcut_triangulate"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 64
    assert (df["n_triangles"] == df["n_vertices"] - 2).all()
    assert (df["tri_area_e9"] == df["ring_area_e9"]).all()


def test_concave_outer_with_hole():
    """Hole bridging inside a CONCAVE outer ring (reflex vertices between
    the hole and the outer boundary) — the harder bridge case."""
    outer = np.array(
        [[0, 0], [8, 0], [8, 8], [5, 8], [5, 3], [3, 3], [3, 8], [0, 8]],
        dtype=float,
    )  # U-shape, area 64 - 2*5 = 54
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], dtype=float)
    coords = np.concatenate([outer, hole])
    tris = earcut(coords, [8])
    areas = _tri_areas(coords, tris)
    assert (areas > 0).all()
    assert np.isclose(areas.sum(), 54.0 - 1.0)
