"""Spherical (geodesic) point-in-polygon.

Re-expresses the reference's C++-internal spherical crossings test
(/root/reference/cpp/include/cuspatial/detail/algorithm/is_point_in_polygon.cuh:104-185
``is_left`` / ``is_intersecting`` / ``is_point_in_polygon_spherical``)
as vectorized NumPy over unit vectors on the sphere:

- every vertex / test point maps lon/lat (degrees) -> 3D unit vector;
- the reference point is the normalized midpoint of the polygon's
  first processed segment; crossings of the geodesic arc
  (test_point -> reference point) with the ring arcs toggle parity;
- the answer is ``parity == left_check`` where left_check is the side
  of the first segment the test point falls on (the reference's
  final ``point_is_within == left_check``).

Vectorized over test points; the per-segment loop runs driver/batch-
side over the (broadcast-small) polygon layer only.
"""

from __future__ import annotations

import numpy as np


def lonlat_to_xyz(lon_deg, lat_deg) -> np.ndarray:
    """(n, 3) unit vectors from lon/lat degrees."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)], axis=-1)


def _is_left_seg(p1: np.ndarray, p2: np.ndarray, p3: np.ndarray) -> np.ndarray:
    """is_left for a FIXED arc (p1, p2) against many points p3 (n,3)
    (is_point_in_polygon.cuh:107-111: dot(cross(-p1, p2-p1), p3-p1) > 0)."""
    nrm = np.cross(-p1, p2 - p1)
    return (p3 - p1) @ nrm > 0.0


def _is_left_arcs(p3: np.ndarray, p4: np.ndarray, p: np.ndarray) -> np.ndarray:
    """is_left for many arcs (p3[i], p4) against a fixed point p."""
    nrm = np.cross(-p3, p4 - p3)
    return np.einsum("ij,ij->i", nrm, p - p3) > 0.0


def _is_intersecting(b, a, tp, cp) -> np.ndarray:
    """Arc (b, a) x arc (tp[i], cp) per test point i
    (is_point_in_polygon.cuh:123-136)."""
    cond = tp @ b > 0.0
    p1left = _is_left_arcs(tp, cp, b)
    p2left = _is_left_arcs(tp, cp, a)
    p3left = _is_left_seg(b, a, tp)
    p4left = bool(_is_left_seg(b, a, cp[None, :])[0])
    return cond & (p1left != p2left) & (p3left != p4left)


def _one_polygon_spherical(tp, rings):
    """Parity for one polygon: tp (n,3), rings = list of (m,3) vertex
    arrays.  Mirrors the cuh loop structure exactly: the left_check /
    reference point come from the FIRST ring's first processed segment
    and persist across rings."""
    n = tp.shape[0]
    within = np.zeros(n, dtype=bool)
    left_check = None
    check_point = None
    for ring in rings:
        m = ring.shape[0]
        num_segments = m - 1
        closed = int(bool(np.all(ring[0] == ring[num_segments])))
        b = ring[num_segments - closed]
        for s in range(m):
            a = ring[s]
            if left_check is None:
                left_check = _is_left_seg(b, a, tp)
                c = a + b
                check_point = c / np.sqrt(c @ c)
            else:
                if (not closed) or s < num_segments:
                    within ^= _is_intersecting(b, a, tp, check_point)
            b = a
    return within == left_check


def point_in_polygon_spherical_pairs(
    lon, lat, poly_idx, poly_offsets, ring_offsets, plon, plat
) -> np.ndarray:
    """Row i: point i inside polygon poly_idx[i], geodesic semantics.
    Coordinates are lon/lat degrees; polygons must not span more than
    a hemisphere relative to the test points (the reference's
    dot(p1, p3) > 0 gate has the same limit)."""
    poly_offsets = np.asarray(poly_offsets, dtype=np.int64)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    tp_all = lonlat_to_xyz(lon, lat)
    vx = lonlat_to_xyz(plon, plat)
    pidx = np.asarray(poly_idx, dtype=np.int64)
    out = np.zeros(len(pidx), dtype=bool)
    for p in np.unique(pidx):
        m = pidx == p
        rings = [
            vx[int(ring_offsets[r]):int(ring_offsets[r + 1])]
            for r in range(int(poly_offsets[p]), int(poly_offsets[p + 1]))
        ]
        out[m] = _one_polygon_spherical(tp_all[m], rings)
    return out
