"""Property-based conformance (hypothesis): clipper and scheme invariants
hold for arbitrary polygons/points, not just the ported fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from plateau_gis_converter_ray.kernels import scheme3dt
from plateau_gis_converter_ray.kernels.clip import (
    clip_ring,
    ring_area,
    slice_polygon_3dt,
)
from plateau_gis_converter_ray.kernels.hilbert import id_to_zxy, zxy_to_id
from plateau_gis_converter_ray.kernels.pip import points_in_ring

coord = st.floats(-80.0, 80.0, allow_nan=False, width=64)


@st.composite
def convex_polygon(draw):
    """Random convex polygon: jittered angles on a circle (guaranteed simple
    and convex — all vertices on one circle, sorted by angle)."""
    cx = draw(st.floats(-170, 170))
    cy = draw(st.floats(-80, 80))
    n = draw(st.integers(5, 9))
    r = draw(st.floats(0.5, 6.0))
    jitter = [draw(st.floats(0.0, 0.9)) for _ in range(n)]
    base = np.linspace(0, 2 * np.pi, n, endpoint=False)
    angles = base + np.array(jitter) * (2 * np.pi / n) * 0.9
    pts = np.stack([cx + r * np.cos(angles), cy + r * np.sin(angles)], axis=1)
    return pts


@st.composite
def star_polygon(draw):
    """Random star-shaped polygon: varying radii, angle gaps < pi so the
    anchor stays inside -> the polygon is simple (no self-intersection)."""
    cx = draw(st.floats(-170, 170))
    cy = draw(st.floats(-80, 80))
    n = draw(st.integers(5, 9))
    rs = np.array([draw(st.floats(0.5, 6.0)) for _ in range(n)])
    jitter = np.array([draw(st.floats(0.05, 0.95)) for _ in range(n)])
    base = np.linspace(0, 2 * np.pi, n, endpoint=False)
    angles = base + jitter * (2 * np.pi / n)  # keeps cyclic gaps < pi for n>=5
    pts = np.stack([cx + rs * np.cos(angles), cy + rs * np.sin(angles)], axis=1)
    return pts


@settings(max_examples=40, deadline=None)
@given(star_polygon(), st.floats(-50, 40), st.floats(0.5, 20))
def test_clip_slab_area_never_grows(poly, k1, width):
    k2 = k1 + width
    ring5 = np.hstack([poly, np.zeros((len(poly), 3))])
    clipped = clip_ring(ring5, 1, k1, k2)
    assert ring_area(clipped[:, :2]) <= ring_area(poly) + 1e-9
    if len(clipped):
        assert clipped[:, 1].min() >= k1 - 1e-9
        assert clipped[:, 1].max() <= k2 + 1e-9


@st.composite
def star_polygon_midlat(draw):
    """Star polygon confined to |lat| < 45 where every row has x_step == 1
    (away from the widened polar columns)."""
    poly = draw(star_polygon())
    cy = np.clip(poly[:, 1].mean(), -38.0, 38.0)
    poly = poly - [0.0, poly[:, 1].mean() - cy]
    return poly


@settings(max_examples=25, deadline=None)
@given(star_polygon_midlat(), st.integers(2, 7))
def test_slice_partitions_area_midlat(poly, zoom):
    """Away from the polar x_step>1 rows the slicer partitions exactly.

    (In polar rows the reference's iter_x_slice drops a right-edge sliver
    when the last column isn't x_step-aligned — pinned by the reference's
    own fixture, see test_polar_sliver_drop_matches_reference.)"""
    ring5 = np.hstack([poly, np.zeros((len(poly), 3))])
    total = 0.0
    for _key, rings in slice_polygon_3dt(zoom, [ring5]):
        if len(rings[0]):
            total += ring_area(rings[0][:, :2])
    expect = ring_area(poly)
    assert abs(total - expect) < 1e-7 * max(1.0, expect)


def test_polar_sliver_drop_matches_reference():
    """Reference semantics pin: scheme.rs's own fixture iter_x_slice(4, 1,
    -24, 46) == [(6,2),(8,2)] even though content extends to x=10.04 — the
    unaligned last column is dropped in x_step>1 rows. Our port reproduces
    that row-for-row (the north rule asks for reference-identical
    assignments, not idealized ones)."""
    assert scheme3dt.iter_x_slice(4, 1, -24.0, 46.0) == [(6, 2), (8, 2)]
    # the same span one row south (x_step == 1) keeps every column
    assert scheme3dt.iter_x_slice(4, 2, -24.0, 46.0) == [
        (6, 1), (7, 1), (8, 1), (9, 1), (10, 1),
    ]


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 20), st.integers(0, 10**10))
def test_hilbert_roundtrip_random(z, seed):
    z = min(z, 20)
    rng = np.random.default_rng(seed)
    x = int(rng.integers(0, 1 << z)) if z else 0
    y = int(rng.integers(0, 1 << z)) if z else 0
    tid = int(zxy_to_id(z, x, y))
    assert id_to_zxy(tid) == (z, x, y)


@settings(max_examples=40, deadline=None)
@given(st.floats(-179.99, 179.99), st.floats(-89.99, 89.99), st.integers(0, 15))
def test_scheme_point_in_own_tile(lng, lat, z):
    x, y = scheme3dt.zxy_from_lng_lat(z, lng, lat)
    assert scheme3dt.is_valid_zxy(z, int(x), int(y))
    south, north = scheme3dt.y_slice_range(z, y)
    west, east = scheme3dt.x_slice_range(z, x, scheme3dt.x_step(z, y))
    assert south - 1e-12 <= lat <= north + 1e-12
    assert west - 1e-12 <= lng <= east + 1e-12


@settings(max_examples=25, deadline=None)
@given(convex_polygon(), st.integers(0, 10**9))
def test_pip_matches_winding_for_convex(poly, seed):
    """For convex polygons, PIP == 'same side of every edge' check."""
    rng = np.random.default_rng(seed)
    cx, cy = poly.mean(axis=0)
    px = cx + rng.uniform(-10, 10, 200)
    py = cy + rng.uniform(-10, 10, 200)
    got = points_in_ring(px, py, poly)
    a = poly
    b = np.roll(poly, -1, axis=0)
    cross = (b[:, 0] - a[:, 0])[None, :] * (py[:, None] - a[:, 1][None, :]) - (
        b[:, 1] - a[:, 1]
    )[None, :] * (px[:, None] - a[:, 0][None, :])
    inside_strict = (cross > 0).all(axis=1) | (cross < 0).all(axis=1)
    on_edge = (np.abs(cross) < 1e-9).any(axis=1)
    check = ~on_edge  # boundary points may differ by the half-open rule
    np.testing.assert_array_equal(got[check], inside_strict[check])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), max_size=200))
def test_packed_varint_roundtrip_property(vals):
    """Vectorized packed-varint encode == scalar encode, and decodes back."""
    from plateau_gis_converter_ray.sinks.pbf import (
        _decode_packed,
        encode_varint,
        encode_varints_packed,
    )

    packed = encode_varints_packed(np.array(vals, dtype=np.uint64))
    assert packed == b"".join(encode_varint(v) for v in vals)
    assert _decode_packed(packed) == vals


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-100, 100), st.integers(-100, 100)),
        min_size=2, max_size=40,
    )
)
def test_simplify_ring_properties(pts):
    """Endpoints always survive; output is a subsequence of the input."""
    from plateau_gis_converter_ray.sinks.mvt import simplify_ring

    q = np.array(pts, dtype=np.int64)
    out = simplify_ring(q)
    assert (out[0] == q[0]).all() and (out[-1] == q[-1]).all()
    # subsequence check
    it = iter(q.tolist())
    assert all(any(row == cand for cand in it) for row in out.tolist())


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=300), st.binary(max_size=300))
def test_glb_roundtrip_property(json_pad, bin_chunk):
    """Any JSON/BIN payload round-trips; total length is 4-aligned and
    matches the header field."""
    import json as _json
    import struct

    from plateau_gis_converter_ray.sinks.glb import read_glb, write_glb

    doc = {"k": json_pad.hex()}
    jb = _json.dumps(doc).encode()
    glb = write_glb(jb, bin_chunk)
    _, total = struct.unpack_from("<II", glb, 4)
    assert total == len(glb) and total % 4 == 0
    gltf, binc = read_glb(glb)
    assert gltf == doc
    assert binc[: len(bin_chunk)] == bin_chunk


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.floats(-1e5, 1e5, allow_nan=False),
                st.floats(-1e5, 1e5, allow_nan=False),
                st.floats(-100, 100, allow_nan=False),
            ),
            min_size=3, max_size=12,
        ),
        min_size=1, max_size=5,
    ),
    st.integers(0, 10**6),
)
def test_shapefile_polygonz_roundtrip_property(features, seed):
    """Any PolygonZ feature set round-trips bit-exact through .shp/.dbf."""
    import tempfile

    from plateau_gis_converter_ray.sinks.shapefile import (
        read_polygonz_shp,
        write_polygonz_shp,
    )

    shapes = []
    records = []
    for i, pts in enumerate(features):
        ring = np.array(pts + [pts[0]], dtype=np.float64)  # closed
        shapes.append([ring])
        records.append({"fid": i, "tag": f"s{seed % 97}"})
    with tempfile.TemporaryDirectory() as d:
        base = f"{d}/t"
        write_polygonz_shp(base, shapes,
                           [("fid", "N", 8), ("tag", "C", 8)], records)
        back = read_polygonz_shp(base)
    assert len(back["shapes"]) == len(shapes)
    for got, want in zip(back["shapes"], shapes):
        w = want[0]
        # use the writer's own strict left-to-right signed area — a
        # pairwise .sum() can flip orientation on near-zero-area rings
        # (hypothesis found a subnormal-coordinate triangle where the
        # two summation orders disagree)
        from plateau_gis_converter_ray.sinks.shapefile import _signed_area_xy

        if _signed_area_xy(w) > 0:
            w = w[::-1]  # writer re-orders CCW outer rings to CW
        assert np.array_equal(got[0], w)  # f64 bit-exact
    assert [r["fid"] for r in back["records"]] == [str(i) for i in range(len(shapes))]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(2, 6),                      # zoom
            st.floats(100, 150, allow_nan=False),   # lng_min
            st.floats(0.01, 5, allow_nan=False),    # lng extent
            st.floats(20, 40, allow_nan=False),     # lat_min
            st.floats(0.01, 5, allow_nan=False),    # lat extent
        ),
        min_size=1, max_size=12,
    )
)
def test_tileset_root_bbox_bounds_all_contents(entries):
    """Tree assembly invariant: the root region always contains every
    content's bbox (bbox bubble-up, tree.rs:71-97)."""
    import math

    from plateau_gis_converter_ray.kernels import scheme3dt
    from plateau_gis_converter_ray.sinks.tileset import TileContent, TileTree

    tree = TileTree()
    for i, (z, lngmin, dx, latmin, dy) in enumerate(entries):
        x, y = scheme3dt.zxy_from_lng_lat(z, np.array([lngmin]), np.array([latmin]))
        tree.add_content(
            TileContent((z, int(x[0]), int(y[0])), f"{z}/{x[0]}/{y[0]}.glb",
                        lngmin, lngmin + dx, latmin, latmin + dy, 0.0, 10.0)
        )
    ts = tree.into_tileset()
    region = ts["root"]["boundingVolume"]["region"]
    west, south, east, north = region[0], region[1], region[2], region[3]
    for z, lngmin, dx, latmin, dy in entries:
        assert west <= math.radians(lngmin) + 1e-12
        assert east >= math.radians(lngmin + dx) - 1e-12
        assert south <= math.radians(latmin) + 1e-12
        assert north >= math.radians(latmin + dy) - 1e-12


@settings(max_examples=40, deadline=None)
@given(convex_polygon(), convex_polygon())
def test_convex_clip_intersection_properties(pa_, pb_):
    """area(A ∩ B) <= min(area A, area B); the operation is symmetric in
    area; clipping A by itself reproduces area(A)."""
    from plateau_gis_converter_ray.kernels.clip import convex_clip, ring_area

    aa, ab = ring_area(pa_), ring_area(pb_)
    i_ab = ring_area(convex_clip(pa_, pb_))
    i_ba = ring_area(convex_clip(pb_, pa_))
    tol = 1e-9 * max(1.0, aa, ab)
    assert i_ab <= min(aa, ab) + tol
    assert abs(i_ab - i_ba) <= tol
    assert abs(ring_area(convex_clip(pa_, pa_)) - aa) <= tol


def test_clip_intersection_area_concave_clip():
    """The signed fan-triangle overlay is EXACT on a concave clip ring
    where Sutherland–Hodgman provably is not: L-shape (area 3) inside a
    2x2 square — S–H clips to the half-plane kernel (area 1). Also:
    symmetry, self-intersection identity, and a concave-vs-concave pair
    vs a dense-grid estimate."""
    import numpy as np

    from plateau_gis_converter_ray.kernels.clip import (
        clip_intersection_area,
        convex_clip,
        ring_area,
    )

    L = np.array(
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], dtype=np.float64
    )
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=np.float64)
    # the exact answer
    assert abs(clip_intersection_area(sq, L) - 3.0) < 1e-12
    assert abs(clip_intersection_area(L, sq) - 3.0) < 1e-12
    # self-intersection == own area, concave subject AND clip
    assert abs(clip_intersection_area(L, L) - 3.0) < 1e-12
    # orientation-insensitive in the clip ring
    assert abs(clip_intersection_area(sq, L[::-1].copy()) - 3.0) < 1e-12
    # ...and S-H against the concave window is indeed wrong (kernel only)
    assert abs(ring_area(convex_clip(sq, L)) - 1.0) < 1e-12
    # concave x concave, offset: grid cross-check
    L2 = L + np.array([0.5, 0.5])
    got = clip_intersection_area(L, L2)
    cell = 1 / 256
    gx, gy = np.meshgrid(
        np.arange(0, 3, cell) + cell / 2,
        np.arange(0, 3, cell) + cell / 2,
        indexing="ij",
    )

    def in_L(ring, x, y):
        # winding via even-odd ray cast (simple rings)
        inside = np.zeros(x.shape, bool)
        n = len(ring)
        for i in range(n):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % n]
            hit = ((y0 > y) != (y1 > y)) & (
                x < (x1 - x0) * (y - y0) / (y1 - y0) + x0
            )
            inside ^= hit
        return inside

    est = (
        (in_L(L, gx, gy) & in_L(L2, gx, gy)).sum() * cell * cell
    )
    assert abs(got - est) < 0.05
    assert abs(clip_intersection_area(L2, L) - got) < 1e-12


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(6, 24), st.integers(6, 24))
def test_marching_squares_complement_invariance(seed, h, w):
    """Inverting the binary mask yields IDENTICAL segment counts — the
    16-case lookup tables are palindromic (case c <-> 15 - c), so the
    iso-contour between fg and bg is the same line set."""
    from plateau_gis_converter_ray.stages.raster_ops import (
        _MS_DIAG,
        _MS_STRAIGHT,
    )

    assert (_MS_DIAG == _MS_DIAG[::-1]).all()
    assert (_MS_STRAIGHT == _MS_STRAIGHT[::-1]).all()
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 2, size=(h, w)).astype(bool)

    def counts(mask):
        case = (
            mask[:-1, :-1].astype(np.uint8)
            + 2 * mask[:-1, 1:]
            + 4 * mask[1:, 1:]
            + 8 * mask[1:, :-1]
        )
        return int(_MS_DIAG[case].sum()), int(_MS_STRAIGHT[case].sum())

    assert counts(g) == counts(~g)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 4095), st.integers(0, 4095))
def test_quadkey_roundtrip(x, y):
    """kernels.webmercator.quadkey_strings decodes back to exactly (x, y)."""
    from plateau_gis_converter_ray.kernels.webmercator import quadkey_strings

    qk = str(quadkey_strings([x], [y], 12)[0])
    rx = ry = 0
    for ch in qk:
        d = int(ch)
        rx = (rx << 1) | (d & 1)
        ry = (ry << 1) | (d >> 1)
    assert (rx, ry) == (x, y)
    assert len(qk) == 12
