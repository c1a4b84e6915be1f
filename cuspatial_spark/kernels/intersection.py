"""Pairwise linestring-linestring intersection with geometry output.

Reference: core/binops/intersection.py:25-157 +
cpp/include/cuspatial/detail/intersection/linestring_intersection.cuh —
per row (lhs linestring, rhs linestring) emit the intersection
geometry collection: crossing POINTS and collinear-overlap SEGMENTS,
each with look-back ids (lhs_segment_id, rhs_segment_id); points that
lie on an emitted overlap segment are deduplicated away, and duplicate
points are merged (the reference's "remove duplicates" pass).
"""

from __future__ import annotations

import numpy as np

from .floating import float_equal


def _segment_pair_intersection(ax, ay, bx, by, cx, cy, dx, dy):
    """Intersection of segments ab x cd (scalars).

    Returns (kind, payload):
      kind 0 -> no intersection
      kind 1 -> point (x, y)
      kind 2 -> overlap segment (x0, y0, x1, y1)
    """
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    denom = rx * sy - ry * sx
    acx, acy = cx - ax, cy - ay
    cross_ac_r = acx * ry - acy * rx

    if float_equal(np.float64(denom), np.float64(0.0)):
        # parallel; collinear iff (c-a) x r == 0
        if not float_equal(np.float64(cross_ac_r), np.float64(0.0)):
            return 0, None
        # collinear: project onto the dominant axis of r
        rr = rx * rx + ry * ry
        if rr == 0:
            # degenerate lhs segment: a point; on cd?
            ss = sx * sx + sy * sy
            if ss == 0:
                return (1, (ax, ay)) if (ax == cx and ay == cy) else (0, None)
            # must be collinear with cd, not merely projectable onto it
            # (cross_ac_r above is trivially 0 when r == 0)
            cross_as = (ax - cx) * sy - (ay - cy) * sx
            if not float_equal(np.float64(cross_as), np.float64(0.0)):
                return 0, None
            u = ((ax - cx) * sx + (ay - cy) * sy) / ss
            if 0.0 <= u <= 1.0:
                return 1, (ax, ay)
            return 0, None
        t0 = (acx * rx + acy * ry) / rr
        t1 = t0 + (sx * rx + sy * ry) / rr
        lo, hi = (t0, t1) if t0 <= t1 else (t1, t0)
        lo = max(lo, 0.0)
        hi = min(hi, 1.0)
        if lo > hi:
            return 0, None
        x0, y0 = ax + lo * rx, ay + lo * ry
        x1, y1 = ax + hi * rx, ay + hi * ry
        if lo == hi:
            return 1, (x0, y0)
        return 2, (x0, y0, x1, y1)

    t = (acx * sy - acy * sx) / denom
    u = (acx * ry - acy * rx) / denom
    if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
        return 1, (ax + t * rx, ay + t * ry)
    return 0, None


def pairwise_linestring_intersection(
    lhs_idx, rhs_idx, l_offsets, lx, ly, r_offsets, rx, ry
):
    """Returns flat result arrays:
    (pair_id, kind, coords, lhs_segment_id, rhs_segment_id)
    where kind: 0=point (coords len 2), 1=segment (coords len 4) —
    matching the reference's types_buffer semantics (POINT=0,
    LINESTRING=1 in its union encoding)."""
    l_offsets = np.asarray(l_offsets, dtype=np.int64)
    r_offsets = np.asarray(r_offsets, dtype=np.int64)
    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)

    out_pair, out_kind, out_coords, out_lseg, out_rseg = [], [], [], [], []
    for pi, (li, ri) in enumerate(zip(lhs_idx, rhs_idx)):
        li, ri = int(li), int(ri)
        points = []  # (x, y, lseg, rseg)
        segments = []  # (x0, y0, x1, y1, lseg, rseg)
        for i in range(l_offsets[li], l_offsets[li + 1] - 1):
            for j in range(r_offsets[ri], r_offsets[ri + 1] - 1):
                kind, payload = _segment_pair_intersection(
                    lx[i], ly[i], lx[i + 1], ly[i + 1],
                    rx[j], ry[j], rx[j + 1], ry[j + 1],
                )
                lseg = i - int(l_offsets[li])
                rseg = j - int(r_offsets[ri])
                if kind == 1:
                    points.append((payload[0], payload[1], lseg, rseg))
                elif kind == 2:
                    segments.append((*payload, lseg, rseg))
        # dedup: drop points lying on any overlap segment, merge dups
        def _within(v, lo, hi):
            # ULP-tolerant interval test: intersection points computed
            # from inexact t can land a few ulps outside the overlap
            # segment's bbox (reference uses ULP float-equal the same
            # way, detail/utility/floating_point.cuh)
            return (
                lo <= v <= hi
                or float_equal(np.float64(v), np.float64(lo))
                or float_equal(np.float64(v), np.float64(hi))
            )

        kept = {}
        for (x, y, lseg, rseg) in points:
            on_seg = False
            for (x0, y0, x1, y1, _, _) in segments:
                sx, sy = x1 - x0, y1 - y0
                crx = (x - x0) * sy - (y - y0) * sx
                if float_equal(np.float64(crx), np.float64(0.0)):
                    if _within(x, min(x0, x1), max(x0, x1)) and _within(
                        y, min(y0, y1), max(y0, y1)
                    ):
                        on_seg = True
                        break
            if on_seg:
                continue
            # ULP-tolerant merge: the same geometric point computed
            # from two segment parametrizations (e.g. a chain that
            # retraces a segment in the opposite direction) can differ
            # in the last ulp, so exact-key dedup is order-dependent
            dup = any(
                float_equal(np.float64(x), np.float64(kx))
                and float_equal(np.float64(y), np.float64(ky))
                for (kx, ky) in kept
            )
            if not dup:
                kept[(x, y)] = (lseg, rseg)
        for (x, y), (lseg, rseg) in kept.items():
            out_pair.append(pi)
            out_kind.append(0)
            out_coords.append([x, y])
            out_lseg.append(lseg)
            out_rseg.append(rseg)
        for (x0, y0, x1, y1, lseg, rseg) in segments:
            out_pair.append(pi)
            out_kind.append(1)
            out_coords.append([x0, y0, x1, y1])
            out_lseg.append(lseg)
            out_rseg.append(rseg)
    return (
        np.asarray(out_pair, dtype=np.int64),
        np.asarray(out_kind, dtype=np.int8),
        out_coords,
        np.asarray(out_lseg, dtype=np.int64),
        np.asarray(out_rseg, dtype=np.int64),
    )
