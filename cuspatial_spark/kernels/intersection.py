"""Pairwise linestring-linestring intersection with geometry output.

Reference: core/binops/intersection.py:25-157 +
cpp/include/cuspatial/detail/intersection/linestring_intersection.cuh —
per row (lhs linestring, rhs linestring) emit the intersection
geometry collection: crossing POINTS and collinear-overlap SEGMENTS,
each with look-back ids (lhs_segment_id, rhs_segment_id); points that
lie on an emitted overlap segment are deduplicated away, and duplicate
points are merged (the reference's "remove duplicates" pass,
detail/intersection/linestring_intersection_with_duplicates.cuh).

The segment-pair classification is fully vectorized (offset-flattened
NumPy broadcasting, the same pattern as kernels/geom_distance.py); only
the per-pair dedup of *emitted* geometries (a tiny fraction of the
candidate set) loops in Python.

Collinear-overlap correctness note: the interval endpoints t0, t1 are
each computed INDEPENDENTLY as projections of c and d onto r
(t1 = ((d-a)·r)/|r|^2, never t0 + delta) so the classification is
operand-order symmetric, and an overlap whose clamped interval
collapses within 4 ULP is snapped to a single point — a collinear
touch at one endpoint is a 0-dimensional intersection, not a
degenerate segment.
"""

from __future__ import annotations

import numpy as np

from .floating import float_equal

# Cap on the flattened segment-pair block processed at once.  Small on
# purpose: each candidate spawns ~20 float64 temporaries, and keeping a
# block's working set at ~2 MB per temporary lets the allocator reuse
# warm pages between blocks and keeps temporaries cache-resident —
# measured 60x faster than a 4M-candidate block on the benchmark VM
# (large fresh mmaps pay a first-touch page-fault per 4 KB every call).
_CHUNK = 1 << 18


def _classify(ax, ay, bx, by, cx, cy, dx, dy):
    """Vectorized segment ab x cd intersection over n pairs.

    Returns (kind, px, py, x0, y0, x1, y1):
      kind 0 -> none; 1 -> point (px, py); 2 -> overlap (x0,y0)-(x1,y1).
    """
    rx, ry = bx - ax, by - ay
    sx, sy = dx - cx, dy - cy
    acx, acy = cx - ax, cy - ay
    denom = rx * sy - ry * sx
    cross_ac_r = acx * ry - acy * rx

    parallel = float_equal(denom, 0.0)
    n = denom.shape[0]
    kind = np.zeros(n, dtype=np.int8)
    px = np.zeros(n)
    py = np.zeros(n)
    x0 = np.zeros(n)
    y0 = np.zeros(n)
    x1 = np.zeros(n)
    y1 = np.zeros(n)

    # --- general (non-parallel) crossing ---
    safe_denom = np.where(parallel, 1.0, denom)
    t = (acx * sy - acy * sx) / safe_denom
    u = cross_ac_r / safe_denom
    gen_hit = ~parallel & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    kind[gen_hit] = 1
    px = np.where(gen_hit, ax + t * rx, px)
    py = np.where(gen_hit, ay + t * ry, py)

    # --- collinear ---
    col = parallel & float_equal(cross_ac_r, 0.0)
    rr = rx * rx + ry * ry
    ss = sx * sx + sy * sy

    # non-degenerate lhs: project c and d onto r INDEPENDENTLY
    nd = col & (rr > 0.0)
    safe_rr = np.where(rr > 0.0, rr, 1.0)
    t0 = (acx * rx + acy * ry) / safe_rr
    t1 = ((dx - ax) * rx + (dy - ay) * ry) / safe_rr
    tlo = np.minimum(t0, t1)
    thi = np.maximum(t0, t1)
    tlo = np.maximum(tlo, 0.0)
    thi = np.minimum(thi, 1.0)
    # ULP snaps: exact parameter endpoints, then interval collapse
    tlo = np.where(float_equal(tlo, 0.0), 0.0, tlo)
    thi = np.where(float_equal(thi, 1.0), 1.0, thi)
    collapse = float_equal(tlo, thi)
    tlo = np.where(collapse, thi, tlo)
    valid = nd & (tlo <= thi)

    def _at_x(tt):
        return np.where(tt == 0.0, ax, np.where(tt == 1.0, bx, ax + tt * rx))

    def _at_y(tt):
        return np.where(tt == 0.0, ay, np.where(tt == 1.0, by, ay + tt * ry))

    col_pt = valid & (tlo == thi)
    col_seg = valid & (tlo < thi)
    kind[col_pt] = 1
    px = np.where(col_pt, _at_x(tlo), px)
    py = np.where(col_pt, _at_y(tlo), py)
    kind[col_seg] = 2
    x0 = np.where(col_seg, _at_x(tlo), x0)
    y0 = np.where(col_seg, _at_y(tlo), y0)
    x1 = np.where(col_seg, _at_x(thi), x1)
    y1 = np.where(col_seg, _at_y(thi), y1)

    # degenerate lhs (a point): on cd?
    deg = col & (rr == 0.0)
    deg_pp = deg & (ss == 0.0) & (ax == cx) & (ay == cy)
    cross_as = (ax - cx) * sy - (ay - cy) * sx
    safe_ss = np.where(ss > 0.0, ss, 1.0)
    u2 = ((ax - cx) * sx + (ay - cy) * sy) / safe_ss
    deg_ps = (
        deg & (ss > 0.0) & float_equal(cross_as, 0.0) & (u2 >= 0.0) & (u2 <= 1.0)
    )
    deg_hit = deg_pp | deg_ps
    kind[deg_hit] = 1
    px = np.where(deg_hit, ax, px)
    py = np.where(deg_hit, ay, py)

    return kind, px, py, x0, y0, x1, y1


def pairwise_linestring_intersection(
    lhs_idx, rhs_idx, l_offsets, lx, ly, r_offsets, rx, ry
):
    """Returns flat result arrays:
    (pair_id, kind, coords, lhs_segment_id, rhs_segment_id)
    where kind: 0=point (coords len 2), 1=segment (coords len 4) —
    matching the reference's types_buffer semantics (POINT=0,
    LINESTRING=1 in its union encoding)."""
    lhs_idx = np.asarray(lhs_idx, dtype=np.int64)
    rhs_idx = np.asarray(rhs_idx, dtype=np.int64)
    l_offsets = np.asarray(l_offsets, dtype=np.int64)
    r_offsets = np.asarray(r_offsets, dtype=np.int64)
    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)

    npair = lhs_idx.shape[0]
    if npair == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int8),
            [],
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )

    nl = np.maximum(l_offsets[lhs_idx + 1] - l_offsets[lhs_idx] - 1, 0)
    nr = np.maximum(r_offsets[rhs_idx + 1] - r_offsets[rhs_idx] - 1, 0)
    counts = nl * nr
    starts = np.concatenate([[0], np.cumsum(counts)])
    total = int(starts[-1])

    # hit accumulators (flattened candidate order == pair-major,
    # lseg-major, rseg-minor — identical to the reference's scan order)
    hits = []  # (pair, kind, lseg, rseg, px, py, x0, y0, x1, y1) chunks
    for c0 in range(0, total, _CHUNK):
        c1 = min(c0 + _CHUNK, total)
        flat = np.arange(c0, c1, dtype=np.int64)
        pair_of = np.searchsorted(starts, flat, side="right") - 1
        k = flat - starts[pair_of]
        nr_p = nr[pair_of]
        lseg = k // nr_p
        rseg = k - lseg * nr_p
        li = lhs_idx[pair_of]
        ri = rhs_idx[pair_of]
        i = l_offsets[li] + lseg
        j = r_offsets[ri] + rseg
        kind, px, py, x0, y0, x1, y1 = _classify(
            lx[i], ly[i], lx[i + 1], ly[i + 1],
            rx[j], ry[j], rx[j + 1], ry[j + 1],
        )
        m = kind != 0
        if m.any():
            hits.append(
                (
                    pair_of[m], kind[m], lseg[m], rseg[m],
                    px[m], py[m], x0[m], y0[m], x1[m], y1[m],
                )
            )

    if not hits:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int8),
            [],
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )

    hp = np.concatenate([h[0] for h in hits])
    hk = np.concatenate([h[1] for h in hits])
    hl = np.concatenate([h[2] for h in hits])
    hr = np.concatenate([h[3] for h in hits])
    hpx = np.concatenate([h[4] for h in hits])
    hpy = np.concatenate([h[5] for h in hits])
    hx0 = np.concatenate([h[6] for h in hits])
    hy0 = np.concatenate([h[7] for h in hits])
    hx1 = np.concatenate([h[8] for h in hits])
    hy1 = np.concatenate([h[9] for h in hits])

    # --- dedup of emitted geometries (reference's duplicate-removal
    # pass), vectorized across ALL pairs with grouped flattened
    # broadcasting. hp is sorted (pair-major flattened order), so
    # points/segments of one pair are contiguous after masking. ---
    pt_m = hk == 1
    sg_m = hk == 2
    ppair, pxs, pys = hp[pt_m], hpx[pt_m], hpy[pt_m]
    pls, prs = hl[pt_m], hr[pt_m]
    spair = hp[sg_m]
    sx0, sy0, sx1, sy1 = hx0[sg_m], hy0[sg_m], hx1[sg_m], hy1[sg_m]
    sls, srs = hl[sg_m], hr[sg_m]
    n_pt, n_sg = ppair.shape[0], spair.shape[0]

    keep = np.ones(n_pt, dtype=bool)
    if n_pt and n_sg:
        # drop points lying on any overlap segment OF THE SAME PAIR
        # (ULP-tolerant: intersection points from inexact t can land a
        # few ulps outside the segment bbox; reference uses the same
        # ULP comparator, detail/utility/floating_point.cuh)
        pt_cnt = np.bincount(ppair, minlength=npair)
        sg_cnt = np.bincount(spair, minlength=npair)
        pt_start = np.concatenate([[0], np.cumsum(pt_cnt)])
        sg_start = np.concatenate([[0], np.cumsum(sg_cnt)])
        combos = pt_cnt * sg_cnt
        cstart = np.concatenate([[0], np.cumsum(combos)])
        flat = np.arange(int(cstart[-1]), dtype=np.int64)
        cp = np.searchsorted(cstart, flat, side="right") - 1
        k = flat - cstart[cp]
        qi = pt_start[cp] + k // sg_cnt[cp]  # point index
        qj = sg_start[cp] + k - (k // sg_cnt[cp]) * sg_cnt[cp]  # segment index
        vx = sx1[qj] - sx0[qj]
        vy = sy1[qj] - sy0[qj]
        colin = float_equal(
            (pxs[qi] - sx0[qj]) * vy - (pys[qi] - sy0[qj]) * vx, 0.0
        )
        lox = np.minimum(sx0[qj], sx1[qj])
        hix = np.maximum(sx0[qj], sx1[qj])
        loy = np.minimum(sy0[qj], sy1[qj])
        hiy = np.maximum(sy0[qj], sy1[qj])
        inx = ((pxs[qi] >= lox) & (pxs[qi] <= hix)) | float_equal(pxs[qi], lox) | float_equal(pxs[qi], hix)
        iny = ((pys[qi] >= loy) & (pys[qi] <= hiy)) | float_equal(pys[qi], loy) | float_equal(pys[qi], hiy)
        on_seg = colin & inx & iny
        np.logical_and.at(keep, qi, ~on_seg)

    ppair, pxs, pys, pls, prs = ppair[keep], pxs[keep], pys[keep], pls[keep], prs[keep]
    n_pt = ppair.shape[0]

    if n_pt > 1:
        # ULP-tolerant merge of duplicate points within a pair, first
        # occurrence wins (the same geometric point computed from two
        # parametrizations can differ in the last ulp, so exact-key
        # dedup is order-dependent)
        pt_cnt = np.bincount(ppair, minlength=npair)
        pt_start = np.concatenate([[0], np.cumsum(pt_cnt)])
        combos = pt_cnt * pt_cnt
        cstart = np.concatenate([[0], np.cumsum(combos)])
        flat = np.arange(int(cstart[-1]), dtype=np.int64)
        cp = np.searchsorted(cstart, flat, side="right") - 1
        k = flat - cstart[cp]
        qi = pt_start[cp] + k // pt_cnt[cp]
        qj = pt_start[cp] + k - (k // pt_cnt[cp]) * pt_cnt[cp]
        earlier_dup = (
            (qj < qi)
            & float_equal(pxs[qi], pxs[qj])
            & float_equal(pys[qi], pys[qj])
        )
        keep2 = np.ones(n_pt, dtype=bool)
        np.logical_and.at(keep2, qi, ~earlier_dup)
        ppair, pxs, pys, pls, prs = (
            ppair[keep2], pxs[keep2], pys[keep2], pls[keep2], prs[keep2]
        )
        n_pt = ppair.shape[0]

    # interleave: per pair, points first then segments (stable)
    allpair = np.concatenate([ppair, spair])
    alltype = np.concatenate(
        [np.zeros(n_pt, dtype=np.int8), np.ones(n_sg, dtype=np.int8)]
    )
    order = np.lexsort((alltype, allpair))
    out_lseg = np.concatenate([pls, sls])[order]
    out_rseg = np.concatenate([prs, srs])[order]
    pt_coords = [[float(x), float(y)] for x, y in zip(pxs, pys)]
    sg_coords = [
        [float(a), float(b), float(c), float(d)]
        for a, b, c, d in zip(sx0, sy0, sx1, sy1)
    ]
    all_coords = pt_coords + sg_coords
    out_coords = [all_coords[q] for q in order]
    return (
        allpair[order],
        alltype[order],
        out_coords,
        out_lseg.astype(np.int64),
        out_rseg.astype(np.int64),
    )
