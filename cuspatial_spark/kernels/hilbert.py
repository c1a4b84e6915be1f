"""Hilbert-curve cell keys (S2-style space-filling order).

The Morton/Z-order key (kernels/zorder.py) is the engine's default
cell encoding — it is the quadtree key, so tile prefixes ARE quadrants.
The Hilbert key is the locality-optimal alternative (what S2 uses for
its cell ids): consecutive keys are always edge-adjacent cells, which
makes range partitioning over the key produce spatially compact,
low-perimeter partitions (fewer cross-partition neighbors for kNN /
range joins than Z-order's diagonal jumps).

``xy2d`` / ``d2xy`` are the classic per-level rotate-and-accumulate
transforms (Hilbert 1891; iterative formulation as in Warren,
Hacker's Delight §16), vectorized over NumPy arrays — one O(order)
loop of whole-array ops, no per-row Python.
"""

from __future__ import annotations

import numpy as np


def xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert index of integer cell coords on a 2^order x 2^order
    grid.  Vectorized; inputs are copied, not mutated."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(x.shape, dtype=np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: only where ry == 0
        rot = ry == 0
        flip = rot & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(rot, y_f, x_f), np.where(rot, x_f, y_f)
        s >>= 1
    return d


def d2xy(order: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of ``xy2d``: cell coords from Hilbert indices."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros(t.shape, dtype=np.int64)
    y = np.zeros(t.shape, dtype=np.int64)
    s = np.int64(1)
    while s < (np.int64(1) << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate back: only where ry == 0
        rot = ry == 0
        flip = rot & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(rot, y_f, x_f), np.where(rot, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y
