"""Property-based tests (hypothesis) — the randomized cross-check
layer the reference gets from its geopandas oracle
(tests/binpreds/binpred_test_dispatch.py), re-expressed as invariants
since geopandas is unavailable here."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cuspatial_spark.kernels.pip import _pip_one_polygon, point_in_polygon_pairs
from cuspatial_spark.kernels.quadtree import build_quadtree
from cuspatial_spark.kernels.segment import point_linestring_distance_pairs
from cuspatial_spark.kernels.zorder import point_keys, z_order, z_order_x, z_order_y

coords = st.floats(min_value=0.0, max_value=8.0, allow_nan=False, width=64)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=200),
       st.integers(min_value=1, max_value=6),
       st.integers(min_value=1, max_value=20))
def test_quadtree_invariants(pts, max_depth, max_size):
    """Structural invariants of any valid flat quadtree:
    - leaves tile the sorted point sequence exactly (disjoint cover)
    - internal child ranges lie within the table and children's keys
      have the parent's Morton prefix
    - level-0 point counts sum to the total."""
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    order, qt = build_quadtree(x, y, 0, 8, 0, 8, 8 / (1 << max_depth), max_depth, max_size)
    n = len(x)
    assert sorted(order.tolist()) == list(range(n))

    leaf = ~qt.is_internal_node
    # leaves cover [0, n) disjointly
    ranges = sorted(
        (int(o), int(o) + int(l)) for o, l in zip(qt.offset[leaf], qt.length[leaf])
    )
    pos = 0
    for s, e in ranges:
        assert s == pos, f"gap/overlap at {s} (expected {pos})"
        pos = e
    assert pos == n

    # internal nodes: children contiguous, right level, prefix matches
    for i in np.nonzero(qt.is_internal_node)[0]:
        o, l = int(qt.offset[i]), int(qt.length[i])
        assert 0 < l <= 4
        assert o + l <= len(qt.key)
        for c in range(o, o + l):
            assert qt.level[c] == qt.level[i] + 1
            assert int(qt.key[c]) >> 2 == int(qt.key[i])


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=12),
       st.lists(st.tuples(coords, coords), min_size=1, max_size=100))
def test_pip_kernel_matches_sql_formula(ring, pts):
    """The NumPy kernel and the JVM/SQL crossing formula (as used in
    oracle_sql and _pip_jvm_hit_expr) agree everywhere except exact
    on-edge points (kernel forces those False)."""
    px = np.array([p[0] for p in ring] + [ring[0][0]])
    py = np.array([p[1] for p in ring] + [ring[0][1]])
    tx = np.array([p[0] for p in pts])
    ty = np.array([p[1] for p in pts])
    kernel = _pip_one_polygon(tx, ty, np.array([0, len(px)]), px, py)

    # plain crossings parity (no edge exclusion), vectorized
    crossings = np.zeros(len(tx), dtype=np.int64)
    for i in range(len(px)):
        prev = len(px) - 1 if i == 0 else i - 1
        ax, ay, bx, by = px[i], py[i], px[prev], py[prev]
        if ax == bx and ay == by:
            continue
        y0 = by > ty
        y1 = ay > ty
        flip = (y0 != y1) & (((tx - ax) * (by - ay) < (bx - ax) * (ty - ay)) != y1)
        crossings += flip
    plain = (crossings % 2) == 1

    diff = kernel != plain
    if diff.any():
        # disagreements only allowed where the kernel found an on-edge
        # point; re-check those are indeed borderline (distance ~ 0)
        from cuspatial_spark.kernels.segment import point_segment_distance_squared

        for j in np.nonzero(diff)[0]:
            d2 = np.inf
            for i in range(len(px)):
                prev = len(px) - 1 if i == 0 else i - 1
                d2 = min(d2, float(np.asarray(point_segment_distance_squared(
                    tx[j], ty[j], px[i], py[i], px[prev], py[prev])).ravel()[0]))
            assert d2 < 1e-18, f"kernel/formula disagree off-edge (d2={d2})"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=1, max_size=100),
       st.integers(min_value=1, max_value=8))
def test_morton_roundtrip_and_ordering(pts, depth):
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    scale = 8 / (1 << depth)
    keys = point_keys(x, y, 0, 8, 0, 8, scale, depth)
    kx = z_order_x(keys)
    ky = z_order_y(keys)
    assert (z_order(kx, ky) == keys).all()
    # cell coords consistent with direct quantization (clamped at edge)
    ux = np.minimum((x / scale).astype(np.int64), (1 << 16) - 1)
    uy = np.minimum((y / scale).astype(np.int64), (1 << 16) - 1)
    np.testing.assert_array_equal(kx, ux)
    np.testing.assert_array_equal(ky, uy)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=2, max_size=10),
       st.tuples(coords, coords))
def test_point_linestring_distance_bounds(line, point):
    """Distance to a linestring <= distance to every vertex, and == 0
    when the query point is a vertex."""
    lx = np.array([p[0] for p in line])
    ly = np.array([p[1] for p in line])
    offs = np.array([0, len(lx)])
    d = point_linestring_distance_pairs(
        np.array([point[0]]), np.array([point[1]]), np.array([0]), offs, lx, ly
    )[0]
    vert_d = np.hypot(lx - point[0], ly - point[1]).min()
    assert d <= vert_d + 1e-12
    d0 = point_linestring_distance_pairs(
        np.array([lx[0]]), np.array([ly[0]]), np.array([0]), offs, lx, ly
    )[0]
    assert d0 == 0.0


mp_sets = st.lists(st.tuples(coords, coords), min_size=1, max_size=12)


@settings(max_examples=50, deadline=None)
@given(mp_sets, mp_sets)
def test_multipoint_distance_symmetry_and_identity(a_pts, b_pts):
    """d(A,B) == d(B,A); d(A,A) == 0; d(A,B) <= any single pair."""
    from cuspatial_spark.kernels.geom_distance import pairwise_multipoint_distance

    ax = np.array([p[0] for p in a_pts]); ay = np.array([p[1] for p in a_pts])
    bx = np.array([p[0] for p in b_pts]); by = np.array([p[1] for p in b_pts])
    oa = [0, len(ax)]; ob = [0, len(bx)]
    d_ab = pairwise_multipoint_distance([0], [0], oa, ax, ay, ob, bx, by)[0]
    d_ba = pairwise_multipoint_distance([0], [0], ob, bx, by, oa, ax, ay)[0]
    assert d_ab == d_ba
    assert pairwise_multipoint_distance([0], [0], oa, ax, ay, oa, ax, ay)[0] == 0.0
    first_pair = float(np.hypot(ax[0] - bx[0], ay[0] - by[0]))
    # upper bound up to 1 ulp: the kernel's sqrt(dx^2+dy^2) and
    # numpy's fused hypot round differently in the last place
    assert d_ab <= first_pair * (1.0 + 1e-12)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=8), mp_sets)
def test_multipoint_polygon_distance_consistent_with_membership(ring_pts, probe_pts):
    """mp-polygon distance is 0 iff some probe point is inside OR on
    the boundary-distance-zero set; otherwise equals the min of the
    per-point polygon distances."""
    from cuspatial_spark.kernels.geom_distance import (
        pairwise_multipoint_polygon_distance,
        pairwise_point_polygon_distance,
    )

    rx = np.array([p[0] for p in ring_pts] + [ring_pts[0][0]])
    ry = np.array([p[1] for p in ring_pts] + [ring_pts[0][1]])
    po, ro = [0, 1], [0, len(rx)]
    mx = np.array([p[0] for p in probe_pts]); my = np.array([p[1] for p in probe_pts])
    d_mp = pairwise_multipoint_polygon_distance(
        [0], [0], [0, len(mx)], mx, my, po, ro, rx, ry
    )[0]
    d_each = pairwise_point_polygon_distance(
        mx, my, np.zeros(len(mx), dtype=np.int64), po, ro, rx, ry
    )
    assert d_mp == d_each.min()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=2, max_size=6),
       st.lists(st.tuples(coords, coords), min_size=2, max_size=6))
def test_segment_intersection_kind_symmetry(a_pts, b_pts):
    """Intersection KIND (none/point/overlap) is symmetric in the
    operand order, and returned points lie on both segments' bboxes.
    Inputs are quantized to the dyadic 1/64 grid: denormal-length
    segments (~1e-308) legitimately classify differently depending on
    which operand's squared length underflows first, and non-dyadic
    coordinates put computed intersection points a ulp either side of
    exact — boundary noise, not geometry logic (exactly-degenerate
    segments stay covered: quantization maps them to equal endpoints)."""
    from cuspatial_spark.kernels.intersection import pairwise_linestring_intersection

    def q(vals):
        return np.round(np.asarray(vals) * 64.0) / 64.0

    ax = q([p[0] for p in a_pts]); ay = q([p[1] for p in a_pts])
    bx = q([p[0] for p in b_pts]); by = q([p[1] for p in b_pts])
    oa = [0, len(ax)]; ob = [0, len(bx)]
    _, kind_ab, coords_ab, _, _ = pairwise_linestring_intersection(
        [0], [0], oa, ax, ay, ob, bx, by
    )
    _, kind_ba, coords_ba, _, _ = pairwise_linestring_intersection(
        [0], [0], ob, bx, by, oa, ax, ay
    )

    # symmetry is asserted on GEOMETRY, not raw row counts: a chain
    # that retraces a segment meets the other operand twice at the
    # same location, and the two parametrizations can disagree by a
    # few ulps — beyond the kernel's 4-ulp dedup (reference parity),
    # so the duplicate survives in one operand order only.  Cluster
    # locations within a relative 1e-9 before comparing.
    def _near_seg(x, y, segs, tol=1e-9):
        for x0, y0, x1, y1 in segs:
            dx, dy = x1 - x0, y1 - y0
            l2 = dx * dx + dy * dy
            t = 0.0 if l2 == 0.0 else max(0.0, min(1.0, ((x - x0) * dx + (y - y0) * dy) / l2))
            if np.hypot(x - (x0 + t * dx), y - (y0 + t * dy)) <= tol:
                return True
        return False

    def point_clusters(kinds, coords, other_segs):
        """Distinct point locations, excluding points that lie (within
        tolerance) on an overlap segment reported by EITHER operand
        order — the kernel's on-segment dedup uses ulp equality, which
        near zero can keep a point one order and drop it the other."""
        pts = [tuple(c) for k, c in zip(kinds, coords) if k == 0]
        reps: list[tuple] = []
        for x, y in pts:
            if _near_seg(x, y, other_segs):
                continue
            if not any(abs(x - rx) <= 1e-9 * max(1.0, abs(rx))
                       and abs(y - ry) <= 1e-9 * max(1.0, abs(ry))
                       for rx, ry in reps):
                reps.append((x, y))
        return len(reps)

    segs_ab = [tuple(c) for k, c in zip(kind_ab, coords_ab) if k == 1]
    segs_ba = [tuple(c) for k, c in zip(kind_ba, coords_ba) if k == 1]
    all_segs = segs_ab + segs_ba
    assert len(segs_ab) == len(segs_ba)
    assert point_clusters(kind_ab, coords_ab, all_segs) == point_clusters(
        kind_ba, coords_ba, all_segs
    )
    eps = 1e-9
    for k, c in zip(kind_ab, coords_ab):
        xs = c[0::2]; ys = c[1::2]
        for px, py in zip(xs, ys):
            assert min(ax.min(), bx.min()) - eps <= px <= max(ax.max(), bx.max()) + eps
            assert min(ay.min(), by.min()) - eps <= py <= max(ay.max(), by.max()) + eps
