"""Geometry-to-geometry minimum distances, vectorized NumPy.

Semantics follow the reference kernels:
- segment-pair distance = min of the 4 point-to-segment distances,
  0 if the segments properly intersect
  (/root/reference/cpp/include/cuspatial/detail/utility/linestring.cuh:95-125)
- linestring x linestring: min over all segment pairs
  (detail/distance/linestring_distance.cuh)
- point x polygon: 0 if the point is inside (ray-cast), else min
  point-to-ring-edge distance (detail/distance/point_polygon_distance.cuh)
- linestring x polygon / polygon x polygon: 0 if intersecting or one
  contained in the other, else min edge-pair distance
  (detail/distance/linestring_polygon_distance.cuh, polygon_distance.cuh)

All functions take flat offset/vertex buffers and a per-pair index
array — one kernel call per Arrow batch.
"""

from __future__ import annotations

import numpy as np

from .pip import _pip_one_polygon
from .segment import point_segment_distance_squared


def _unique_pair_eval(lhs_idx, rhs_idx, fn) -> np.ndarray:
    """Evaluate a per-feature-pair scalar once per DISTINCT index pair
    and broadcast to rows.  Batches reference a small broadcast layer,
    so rows repeat the same few pairs (e.g. ``event_id % n_features``)
    — without this the per-pair Python cost multiplies by the batch
    size instead of the layer size (the round-2 'per-segment-pair
    Python' trap, measured 1000x on the point-polygon kernel)."""
    li = np.asarray(lhs_idx, dtype=np.int64)
    ri = np.asarray(rhs_idx, dtype=np.int64)
    pairs, inverse = np.unique(
        np.stack([li, ri], axis=1), axis=0, return_inverse=True
    )
    vals = np.fromiter(
        (fn(int(a), int(b)) for a, b in pairs), dtype=np.float64, count=len(pairs)
    )
    return vals[inverse.ravel()]


def _feature_segments(offsets: np.ndarray, idx: int):
    """(v0, v1) vertex index arrays for feature idx's segments."""
    s, e = int(offsets[idx]), int(offsets[idx + 1])
    if e - s < 2:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    v0 = np.arange(s, e - 1, dtype=np.int64)
    return v0, v0 + 1


def _ring_segments_of_polygon(poly_offsets, ring_offsets, p: int):
    """Segment endpoint index arrays for all rings of polygon p,
    including the closing (last->first) segment of each ring."""
    v0s, v1s = [], []
    for r in range(int(poly_offsets[p]), int(poly_offsets[p + 1])):
        s, e = int(ring_offsets[r]), int(ring_offsets[r + 1])
        idx = np.arange(s, e, dtype=np.int64)
        prev = np.roll(idx, 1)  # first vertex pairs with last
        v0s.append(prev)
        v1s.append(idx)
    if not v0s:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.concatenate(v0s), np.concatenate(v1s)


def _segments_intersect(ax, ay, bx, by, cx, cy, dx, dy) -> np.ndarray:
    """Vectorized proper-intersection test (broadcastable).  Touching /
    collinear-overlap cases yield 0 via the endpoint distances, so only
    proper crossings need detecting."""
    d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
    d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
    d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
    return (d1 * d2 < 0) & (d3 * d4 < 0)


def _min_dist_segments_to_segments(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> float:
    """Min distance between two segment sets (arrays of endpoints).
    Broadcasts (n_a, n_b); intended for per-pair feature work where
    n_a*n_b is small (the reference kernel is likewise all-pairs)."""
    A0x = ax0[:, None]
    A0y = ay0[:, None]
    A1x = ax1[:, None]
    A1y = ay1[:, None]
    B0x = bx0[None, :]
    B0y = by0[None, :]
    B1x = bx1[None, :]
    B1y = by1[None, :]
    if _segments_intersect(A0x, A0y, A1x, A1y, B0x, B0y, B1x, B1y).any():
        return 0.0
    d = np.minimum(
        np.minimum(
            point_segment_distance_squared(A0x, A0y, B0x, B0y, B1x, B1y),
            point_segment_distance_squared(A1x, A1y, B0x, B0y, B1x, B1y),
        ),
        np.minimum(
            point_segment_distance_squared(B0x, B0y, A0x, A0y, A1x, A1y),
            point_segment_distance_squared(B1x, B1y, A0x, A0y, A1x, A1y),
        ),
    )
    return float(np.sqrt(d.min())) if d.size else np.nan


def pairwise_linestring_distance(
    lhs_idx, rhs_idx, l_offsets, lx, ly, r_offsets, rx, ry
) -> np.ndarray:
    """Row i: min distance between linestring lhs_idx[i] and
    rhs_idx[i]."""
    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    l_offsets = np.asarray(l_offsets)
    r_offsets = np.asarray(r_offsets)

    def one(li, ri):
        a0, a1 = _feature_segments(l_offsets, li)
        b0, b1 = _feature_segments(r_offsets, ri)
        return _min_dist_segments_to_segments(
            lx[a0], ly[a0], lx[a1], ly[a1], rx[b0], ry[b0], rx[b1], ry[b1]
        )

    return _unique_pair_eval(lhs_idx, rhs_idx, one)


def pairwise_point_polygon_distance(
    px_pts, py_pts, poly_idx, poly_offsets, ring_offsets, px, py
) -> np.ndarray:
    """Row i: 0 if point i inside polygon poly_idx[i], else min
    distance to its ring edges."""
    px_pts = np.asarray(px_pts, dtype=np.float64)
    py_pts = np.asarray(py_pts, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly_offsets = np.asarray(poly_offsets, dtype=np.int64)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    pidx = np.asarray(poly_idx, dtype=np.int64)
    out = np.empty(len(px_pts), dtype=np.float64)
    # group rows by polygon: one vectorized (points x ring-segments)
    # evaluation per DISTINCT polygon, never per row
    for p in np.unique(pidx):
        m = pidx == p
        r0, r1 = poly_offsets[p], poly_offsets[p + 1]
        inside = _pip_one_polygon(
            px_pts[m], py_pts[m], ring_offsets[r0:r1 + 1], px, py
        )
        v0, v1 = _ring_segments_of_polygon(poly_offsets, ring_offsets, int(p))
        d2 = point_segment_distance_squared(
            px_pts[m][:, None], py_pts[m][:, None],
            px[v0][None, :], py[v0][None, :], px[v1][None, :], py[v1][None, :],
        ).min(axis=1)
        out[m] = np.where(inside, 0.0, np.sqrt(d2))
    return out


def pairwise_linestring_polygon_distance(
    line_idx, poly_idx, l_offsets, lx, ly, poly_offsets, ring_offsets, px, py
) -> np.ndarray:
    """Row i: 0 if linestring intersects or lies inside the polygon,
    else min edge-pair distance."""
    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly_offsets = np.asarray(poly_offsets, dtype=np.int64)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    l_offsets = np.asarray(l_offsets, dtype=np.int64)
    def one(li, p):
        a0, a1 = _feature_segments(l_offsets, li)
        # linestring start point inside polygon -> contained or crossing
        s = int(l_offsets[li])
        r0, r1 = poly_offsets[p], poly_offsets[p + 1]
        if _pip_one_polygon(lx[s:s + 1], ly[s:s + 1], ring_offsets[r0:r1 + 1], px, py)[0]:
            return 0.0
        v0, v1 = _ring_segments_of_polygon(poly_offsets, ring_offsets, p)
        return _min_dist_segments_to_segments(
            lx[a0], ly[a0], lx[a1], ly[a1], px[v0], py[v0], px[v1], py[v1]
        )

    return _unique_pair_eval(line_idx, poly_idx, one)


def pairwise_polygon_distance(
    lhs_idx, rhs_idx, l_poly_offsets, l_ring_offsets, lpx, lpy,
    r_poly_offsets, r_ring_offsets, rpx, rpy,
) -> np.ndarray:
    """Row i: 0 if the polygons intersect or one contains the other,
    else min edge-pair distance."""
    lpx = np.asarray(lpx, dtype=np.float64)
    lpy = np.asarray(lpy, dtype=np.float64)
    rpx = np.asarray(rpx, dtype=np.float64)
    rpy = np.asarray(rpy, dtype=np.float64)
    l_poly_offsets = np.asarray(l_poly_offsets, dtype=np.int64)
    l_ring_offsets = np.asarray(l_ring_offsets, dtype=np.int64)
    r_poly_offsets = np.asarray(r_poly_offsets, dtype=np.int64)
    r_ring_offsets = np.asarray(r_ring_offsets, dtype=np.int64)
    def one(lp, rp):
        # containment either way (test one vertex of each in the other)
        lv = int(l_ring_offsets[l_poly_offsets[lp]])
        rv = int(r_ring_offsets[r_poly_offsets[rp]])
        lr0, lr1 = l_poly_offsets[lp], l_poly_offsets[lp + 1]
        rr0, rr1 = r_poly_offsets[rp], r_poly_offsets[rp + 1]
        if _pip_one_polygon(
            lpx[lv:lv + 1], lpy[lv:lv + 1], r_ring_offsets[rr0:rr1 + 1], rpx, rpy
        )[0] or _pip_one_polygon(
            rpx[rv:rv + 1], rpy[rv:rv + 1], l_ring_offsets[lr0:lr1 + 1], lpx, lpy
        )[0]:
            return 0.0
        a0, a1 = _ring_segments_of_polygon(l_poly_offsets, l_ring_offsets, lp)
        b0, b1 = _ring_segments_of_polygon(r_poly_offsets, r_ring_offsets, rp)
        return _min_dist_segments_to_segments(
            lpx[a0], lpy[a0], lpx[a1], lpy[a1], rpx[b0], rpy[b0], rpx[b1], rpy[b1]
        )

    return _unique_pair_eval(lhs_idx, rhs_idx, one)


def pairwise_point_linestring_nearest_points(
    cx, cy, line_idx, part_offsets, lx, ly
):
    """Row i: nearest point on linestring line_idx[i] to point i.
    Returns (segment_id, nearest_x, nearest_y) arrays — the core of the
    reference's pairwise_point_linestring_nearest_points
    (core/spatial/nearest_points.py:18-124)."""
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)
    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    part_offsets = np.asarray(part_offsets, dtype=np.int64)
    n = len(cx)
    seg_out = np.zeros(n, dtype=np.int64)
    nx_out = np.empty(n, dtype=np.float64)
    ny_out = np.empty(n, dtype=np.float64)
    lidx = np.asarray(line_idx, dtype=np.int64)
    # group rows by linestring: one vectorized (points x segments)
    # evaluation per DISTINCT feature, never per row
    for li in np.unique(lidx):
        m = lidx == li
        v0, v1 = _feature_segments(part_offsets, int(li))
        ax, ay, bx, by = lx[v0], ly[v0], lx[v1], ly[v1]
        abx, aby = bx - ax, by - ay
        l2 = abx * abx + aby * aby
        safe = np.where(l2 == 0, 1.0, l2)
        C_x = cx[m][:, None]
        C_y = cy[m][:, None]
        t = np.clip(((C_x - ax) * abx + (C_y - ay) * aby) / safe, 0.0, 1.0)
        t = np.where(l2 == 0, 0.0, t)
        qx = ax + t * abx
        qy = ay + t * aby
        d2 = (C_x - qx) ** 2 + (C_y - qy) ** 2
        j = np.argmin(d2, axis=1)
        rows = np.arange(j.shape[0])
        seg_out[m] = j
        nx_out[m] = qx[rows, j]
        ny_out[m] = qy[rows, j]
    return seg_out, nx_out, ny_out


def pairwise_multipoint_distance(
    lhs_idx, rhs_idx, l_offsets, lx, ly, r_offsets, rx, ry
) -> np.ndarray:
    """Row i: min Euclidean distance between multipoint sets
    lhs_idx[i] and rhs_idx[i] (reference
    core/spatial/distance.py:169-240, CollectionType.MULTI branches;
    kernel cpp/include/cuspatial/detail/distance/point_distance.cuh)."""
    l_offsets = np.asarray(l_offsets, dtype=np.int64)
    r_offsets = np.asarray(r_offsets, dtype=np.int64)
    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    def one(a, b):
        ls, le = l_offsets[a], l_offsets[a + 1]
        rs, re = r_offsets[b], r_offsets[b + 1]
        d2 = (lx[ls:le, None] - rx[None, rs:re]) ** 2 + (
            ly[ls:le, None] - ry[None, rs:re]
        ) ** 2
        return np.sqrt(d2.min()) if d2.size else np.nan

    return _unique_pair_eval(lhs_idx, rhs_idx, one)


def pairwise_multipoint_linestring_distance(
    mp_idx, line_idx, m_offsets, mx, my, l_offsets, lx, ly
) -> np.ndarray:
    """Row i: min over multipoint mp_idx[i]'s points of the
    point-to-linestring distance (reference multipoint branch of
    pairwise_point_linestring_distance)."""
    m_offsets = np.asarray(m_offsets, dtype=np.int64)
    l_offsets = np.asarray(l_offsets, dtype=np.int64)
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    def one(m, li):
        ms, me = m_offsets[m], m_offsets[m + 1]
        v0, v1 = _feature_segments(l_offsets, li)
        d2 = point_segment_distance_squared(
            mx[ms:me, None], my[ms:me, None],
            lx[v0][None, :], ly[v0][None, :], lx[v1][None, :], ly[v1][None, :],
        )
        return np.sqrt(d2.min()) if d2.size else np.nan

    return _unique_pair_eval(mp_idx, line_idx, one)


def pairwise_multipoint_polygon_distance(
    mp_idx, poly_idx, m_offsets, mx, my, poly_offsets, ring_offsets, px, py
) -> np.ndarray:
    """Row i: 0 if any point of the multipoint is inside the polygon,
    else min point-to-ring-edge distance over the set (reference
    multipoint branch of pairwise_point_polygon_distance)."""
    m_offsets = np.asarray(m_offsets, dtype=np.int64)
    poly_offsets = np.asarray(poly_offsets, dtype=np.int64)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    def one(m, p):
        ms, me = m_offsets[m], m_offsets[m + 1]
        r0, r1 = poly_offsets[p], poly_offsets[p + 1]
        inside = _pip_one_polygon(
            mx[ms:me], my[ms:me], ring_offsets[r0:r1 + 1], px, py
        )
        if inside.any():
            return 0.0
        v0, v1 = _ring_segments_of_polygon(poly_offsets, ring_offsets, p)
        d2 = point_segment_distance_squared(
            mx[ms:me, None], my[ms:me, None],
            px[v0][None, :], py[v0][None, :], px[v1][None, :], py[v1][None, :],
        )
        return np.sqrt(d2.min()) if d2.size else np.nan

    return _unique_pair_eval(mp_idx, poly_idx, one)


def pairwise_multipoint_equals_count(
    l_offsets, lx, ly, r_offsets, rx, ry
) -> np.ndarray:
    """Row i: number of points in lhs multipoint i equal to ANY point
    of rhs multipoint i (core/binops/equals_count.py:12-80)."""
    l_offsets = np.asarray(l_offsets, dtype=np.int64)
    r_offsets = np.asarray(r_offsets, dtype=np.int64)
    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    n = len(l_offsets) - 1
    out = np.zeros(n, dtype=np.int64)
    for i in range(n):
        ls, le = l_offsets[i], l_offsets[i + 1]
        rs, re = r_offsets[i], r_offsets[i + 1]
        eq = (lx[ls:le, None] == rx[None, rs:re]) & (ly[ls:le, None] == ry[None, rs:re])
        out[i] = int(eq.any(axis=1).sum())
    return out
