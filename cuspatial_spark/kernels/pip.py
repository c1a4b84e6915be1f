"""Point-in-polygon ray-casting kernel (crossings-multiply variant).

Semantics match the reference kernel
(/root/reference/cpp/include/cuspatial/detail/algorithm/is_point_in_polygon.cuh:46-100):

- Eric Haines' crossings-multiply test, division-free.
- Rings may be closed or unclosed; the implicit closing segment
  (first-vertex, last-vertex) is always considered; degenerate (zero
  length under 4-ULP equality) segments are skipped.
- A point lying exactly ON an edge (4-ULP collinearity + x-range test)
  is OUTSIDE (`contains_properly` semantics).

Everything is vectorized over a flat (pair, segment) expansion — no
per-row Python loops — so it serves both the brute-force operator and
the quadtree-join refine phase.

Polygon layout (GeoArrow-flat, same buffers the reference consumes,
see /root/reference/python/cuspatial/cuspatial/core/spatial/join.py:76-87):
  poly_offsets: int array, len = n_polys + 1, indexes into ring space
  ring_offsets: int array, len = n_rings + 1, indexes into vertex space
  px, py:       vertex coordinate arrays
"""

from __future__ import annotations

import numpy as np

from .floating import float_equal


def _ring_segments(ring_offsets: np.ndarray, px: np.ndarray, py: np.ndarray):
    """Per-vertex segment endpoints (a=current vertex, b=previous-in-ring,
    wrapping so the first vertex pairs with the last).  Returns
    (ax, ay, bx, by, seg_ring) flat arrays, one entry per vertex.
    """
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    n_rings = len(ring_offsets) - 1
    n_vert = int(ring_offsets[-1])
    ring_len = np.diff(ring_offsets)
    seg_ring = np.repeat(np.arange(n_rings, dtype=np.int64), ring_len)
    # index of the previous vertex within the same ring (wrap to last)
    idx = np.arange(n_vert, dtype=np.int64)
    ring_start = np.repeat(ring_offsets[:-1], ring_len)
    ring_end = np.repeat(ring_offsets[1:], ring_len)
    prev = idx - 1
    wrap = prev < ring_start
    prev = np.where(wrap, ring_end - 1, prev)
    ax, ay = px[idx], py[idx]
    bx, by = px[prev], py[prev]
    return ax, ay, bx, by, seg_ring


def point_in_polygon_pairs(
    tx: np.ndarray,
    ty: np.ndarray,
    pair_poly: np.ndarray,
    poly_offsets: np.ndarray,
    ring_offsets: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
) -> np.ndarray:
    """Test pair i = (point (tx[i], ty[i]), polygon pair_poly[i]).

    Returns a bool array of len(tx).  Vectorized by expanding each pair to
    all segments of its polygon's rings and reducing with bincount.
    """
    tx = np.asarray(tx)
    if tx.dtype != np.float32:
        tx = tx.astype(np.float64, copy=False)
    ty = np.asarray(ty).astype(tx.dtype, copy=False)
    n_pairs = len(tx)
    if n_pairs == 0:
        return np.zeros(0, dtype=bool)
    poly_offsets = np.asarray(poly_offsets, dtype=np.int64)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    px = np.asarray(px).astype(tx.dtype, copy=False)
    py = np.asarray(py).astype(tx.dtype, copy=False)
    pair_poly = np.asarray(pair_poly, dtype=np.int64)

    ax, ay, bx, by, seg_ring = _ring_segments(ring_offsets, px, py)
    # vertex count per polygon (= segment count incl. wrap segments)
    poly_vert_start = ring_offsets[poly_offsets[:-1]]
    poly_vert_end = ring_offsets[poly_offsets[1:]]
    poly_nseg = poly_vert_end - poly_vert_start

    # expand pair space -> (pair, segment) space
    reps = poly_nseg[pair_poly]
    pair_id = np.repeat(np.arange(n_pairs, dtype=np.int64), reps)
    # segment index within the flat vertex space for each expansion slot
    seg_local = np.arange(len(pair_id), dtype=np.int64)
    seg_start = np.concatenate(([0], np.cumsum(reps)))
    seg_local = seg_local - np.repeat(seg_start[:-1], reps)
    seg_idx = poly_vert_start[pair_poly][pair_id] + seg_local

    sax, say = ax[seg_idx], ay[seg_idx]
    sbx, sby = bx[seg_idx], by[seg_idx]
    ptx, pty = tx[pair_id], ty[pair_id]

    run = sbx - sax
    rise = sby - say
    zero = np.zeros(1, dtype=tx.dtype)
    degenerate = float_equal(run, zero) & float_equal(rise, zero)

    rise_to_point = pty - say
    run_to_point = ptx - sax

    collinear = float_equal(run * rise_to_point, run_to_point * rise)
    minx = np.minimum(sax, sbx)
    maxx = np.maximum(sax, sbx)
    on_edge = collinear & (minx <= ptx) & (ptx <= maxx) & ~degenerate

    y0 = sby > pty  # previous vertex flag
    y1 = say > pty  # current vertex flag
    lhs = (ptx - sax) * rise
    rhs = run * rise_to_point
    crossing = (~degenerate) & (y0 != y1) & ((lhs < rhs) != y1)

    crossings = np.bincount(pair_id[crossing], minlength=n_pairs)
    edge_hits = np.bincount(pair_id[on_edge], minlength=n_pairs)
    return ((crossings & 1) == 1) & (edge_hits == 0)


def point_in_polygon_bits(
    tx: np.ndarray,
    ty: np.ndarray,
    poly_offsets: np.ndarray,
    ring_offsets: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
) -> np.ndarray:
    """Brute-force all-points x all-polygons PIP, packed as an int32
    bitmask per point (bit j set => inside polygon j).

    Mirrors the reference bitmask kernel's contract
    (/root/reference/cpp/include/cuspatial/point_in_polygon.cuh:42-102,
    <= 31 polygons).
    """
    n_polys = len(poly_offsets) - 1
    if n_polys > 31:
        raise ValueError("point_in_polygon supports at most 31 polygons")
    n = len(tx)
    out = np.zeros(n, dtype=np.int32)
    for j in range(n_polys):
        hits = point_in_polygon_pairs(
            tx,
            ty,
            np.full(n, j, dtype=np.int64),
            poly_offsets,
            ring_offsets,
            px,
            py,
        )
        out |= hits.astype(np.int32) << np.int32(j)
    return out
