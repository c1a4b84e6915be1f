"""Point-to-segment / point-to-linestring distance kernels, vectorized.

Math follows the reference's projection-clamped segment distance
(/root/reference/cpp/include/cuspatial/detail/utility/linestring.cuh:54-105):
squared distances are minimized first, sqrt applied once at the end
(/root/reference/cpp/include/cuspatial/detail/algorithm/point_linestring_distance.cuh:33-50),
which matters for float32 golden parity.
"""

from __future__ import annotations

import numpy as np

from .floating import float_equal


def point_segment_distance_squared(cx, cy, ax, ay, bx, by):
    """Vectorized squared distance from point c to segment ab."""
    abx = bx - ax
    aby = by - ay
    acx = cx - ax
    acy = cy - ay
    l_squared = abx * abx + aby * aby
    zero = np.zeros(1, dtype=np.asarray(cx).dtype)
    degenerate = float_equal(l_squared, zero)
    r = acx * abx + acy * aby
    bcx = cx - bx
    bcy = cy - by
    dac = acx * acx + acy * acy
    dbc = bcx * bcx + bcy * bcy
    outside = (r <= 0) | (r >= l_squared)
    d_outside = np.where(dac < dbc, dac, dbc)
    # guard division for degenerate segments
    safe_l = np.where(degenerate | (l_squared == 0), 1, l_squared)
    t = r / safe_l
    pxp = ax + t * abx
    pyp = ay + t * aby
    pcx = cx - pxp
    pcy = cy - pyp
    d_inside = pcx * pcx + pcy * pcy
    return np.where(degenerate, dac, np.where(outside, d_outside, d_inside))


def point_linestring_distance_pairs(
    cx: np.ndarray,
    cy: np.ndarray,
    pair_line: np.ndarray,
    part_offsets: np.ndarray,
    lx: np.ndarray,
    ly: np.ndarray,
) -> np.ndarray:
    """Pair i: min distance from point (cx[i], cy[i]) to linestring
    pair_line[i].  part_offsets indexes into the vertex arrays (lx, ly);
    linestring j spans vertices part_offsets[j]..part_offsets[j+1]-1,
    giving (len-1) segments.  Returns sqrt of the min squared distance.
    """
    cx = np.asarray(cx)
    if cx.dtype != np.float32:
        cx = cx.astype(np.float64, copy=False)
    cy = np.asarray(cy).astype(cx.dtype, copy=False)
    lx = np.asarray(lx).astype(cx.dtype, copy=False)
    ly = np.asarray(ly).astype(cx.dtype, copy=False)
    part_offsets = np.asarray(part_offsets, dtype=np.int64)
    pair_line = np.asarray(pair_line, dtype=np.int64)
    n_pairs = len(cx)
    if n_pairs == 0:
        return np.zeros(0, dtype=cx.dtype)

    nseg = np.maximum(np.diff(part_offsets), 1) - 1  # segments per linestring
    reps = nseg[pair_line]
    pair_id = np.repeat(np.arange(n_pairs, dtype=np.int64), reps)
    flat = np.arange(len(pair_id), dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(reps)))
    seg_local = flat - np.repeat(starts[:-1], reps)
    v0 = part_offsets[pair_line][pair_id] + seg_local

    d2 = point_segment_distance_squared(
        cx[pair_id], cy[pair_id], lx[v0], ly[v0], lx[v0 + 1], ly[v0 + 1]
    )
    out = np.full(n_pairs, np.finfo(cx.dtype).max, dtype=cx.dtype)
    np.minimum.at(out, pair_id, d2.astype(cx.dtype, copy=False))
    return np.sqrt(out)
