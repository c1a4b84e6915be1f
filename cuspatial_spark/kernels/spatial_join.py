"""Refine phase of the quadtree spatial join: PIP + nearest-linestring.

Reproduces the semantics of
/root/reference/cpp/include/cuspatial/detail/join/quadtree_point_in_polygon.cuh:104-235
and .../quadtree_point_to_nearest_linestring.cuh:44-314 with vectorized
NumPy over the (pair, point) candidate expansion.
"""

from __future__ import annotations

import numpy as np

from .pip import point_in_polygon_pairs
from .quadtree import Quadtree
from .segment import point_linestring_distance_pairs


def _expand_pairs(qt: Quadtree, quad_idx: np.ndarray):
    """Expand (geom, quad) pairs to candidate (pair_id, sorted point
    position) rows, preserving pair-major enumeration order."""
    lengths = qt.length[quad_idx].astype(np.int64)
    offsets = qt.offset[quad_idx].astype(np.int64)
    pair_id = np.repeat(np.arange(len(quad_idx), dtype=np.int64), lengths)
    flat = np.arange(int(lengths.sum()), dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lengths)))
    local = flat - np.repeat(starts[:-1], lengths)
    point_pos = np.repeat(offsets, lengths) + local
    return pair_id, point_pos


def quadtree_point_in_polygon(
    poly_idx: np.ndarray,
    quad_idx: np.ndarray,
    qt: Quadtree,
    point_order: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    poly_offsets: np.ndarray,
    ring_offsets: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
):
    """For each (polygon, leaf-quad) pair test the quad's points.

    Returns (polygon_index, point_index) where point_index is the
    position in the Morton-sorted point order (an index into
    point_order), in pair-major enumeration order — matching the
    reference output (test_spatial_join.py:499-533 golden).
    """
    pair_id, point_pos = _expand_pairs(qt, np.asarray(quad_idx, dtype=np.int64))
    cand_poly = np.asarray(poly_idx, dtype=np.int64)[pair_id]
    orig = np.asarray(point_order, dtype=np.int64)[point_pos]
    hits = point_in_polygon_pairs(
        np.asarray(x)[orig], np.asarray(y)[orig], cand_poly,
        poly_offsets, ring_offsets, px, py,
    )
    return cand_poly[hits].astype(np.uint32), point_pos[hits].astype(np.uint32)


def quadtree_point_to_nearest_linestring(
    line_idx: np.ndarray,
    quad_idx: np.ndarray,
    qt: Quadtree,
    point_order: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    part_offsets: np.ndarray,
    lx: np.ndarray,
    ly: np.ndarray,
):
    """Per point: nearest linestring among those sharing its quadrant.

    Reduction semantics mirror the reference binop
    (quadtree_point_to_nearest_linestring.cuh:273-291): zero distances
    lose to non-zero ones; distance ties resolve to the smallest
    linestring id; if every candidate distance is zero the last
    enumerated candidate wins.

    Returns (point_index, linestring_index, distance) sorted by
    point_index (sorted-point position space).
    """
    pair_id, point_pos = _expand_pairs(qt, np.asarray(quad_idx, dtype=np.int64))
    cand_line = np.asarray(line_idx, dtype=np.int64)[pair_id]
    orig = np.asarray(point_order, dtype=np.int64)[point_pos]
    dist = point_linestring_distance_pairs(
        np.asarray(x)[orig], np.asarray(y)[orig], cand_line,
        part_offsets, lx, ly,
    )

    # group candidates by sorted point position
    order = np.argsort(point_pos, kind="stable")
    g_pos = point_pos[order]
    g_line = cand_line[order]
    g_dist = dist[order]
    uniq, start = np.unique(g_pos, return_index=True)

    group = np.searchsorted(uniq, g_pos)
    n_groups = len(uniq)
    dt = g_dist.dtype
    big = np.finfo(dt).max

    nz = g_dist != 0
    # min nonzero distance per group
    min_nz = np.full(n_groups, big, dtype=dt)
    np.minimum.at(min_nz, group[nz], g_dist[nz])
    has_nz = min_nz != big

    # among candidates achieving min nonzero distance: smallest line id
    out_line = np.full(n_groups, -1, dtype=np.int64)
    out_dist = np.zeros(n_groups, dtype=dt)
    winner = nz & (g_dist == min_nz[group])
    line_win = np.full(n_groups, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(line_win, group[winner], g_line[winner])
    out_line[has_nz] = line_win[has_nz]
    out_dist[has_nz] = min_nz[has_nz]

    # all-zero groups: last enumerated candidate wins (distance 0)
    if (~has_nz).any():
        # last occurrence per group in enumeration order
        last_idx = np.zeros(n_groups, dtype=np.int64)
        np.maximum.at(last_idx, group, np.arange(len(group), dtype=np.int64))
        z = ~has_nz
        out_line[z] = g_line[last_idx[z]]
        out_dist[z] = 0

    return uniq.astype(np.uint32), out_line.astype(np.uint32), out_dist
