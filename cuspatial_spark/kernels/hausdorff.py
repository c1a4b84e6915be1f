"""Directed Hausdorff distance between multipoint "spaces".

Semantics per the reference kernel
(/root/reference/cpp/include/cuspatial/detail/distance/hausdorff.cuh:84-181):
result[i][j] = max over points p in space i of (min over q in space j of
dist(p, q)); diagonal is 0.  Returned as an (n_spaces, n_spaces) matrix
laid out like the reference's column-per-space DataFrame
(core/spatial/distance.py:27-100).
"""

from __future__ import annotations

import numpy as np


def directed_hausdorff(xs: np.ndarray, ys: np.ndarray, space_offsets: np.ndarray) -> np.ndarray:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offs = np.asarray(space_offsets, dtype=np.int64)
    n_spaces = len(offs)
    if n_spaces == 0:
        return np.zeros((0, 0), dtype=np.float64)
    bounds = np.concatenate((offs, [len(xs)]))
    out = np.zeros((n_spaces, n_spaces), dtype=np.float64)
    n = len(xs)
    if n <= 4096:
        # one dense distance matrix (fast path for small groups)
        dx = xs[:, None] - xs[None, :]
        dy = ys[:, None] - ys[None, :]
        d = np.sqrt(dx * dx + dy * dy)
        for i in range(n_spaces):
            si, ei = bounds[i], bounds[i + 1]
            for j in range(n_spaces):
                if i == j:
                    continue
                sj, ej = bounds[j], bounds[j + 1]
                if ei <= si or ej <= sj:
                    out[i, j] = np.nan
                    continue
                block = d[si:ei, sj:ej]
                out[i, j] = block.min(axis=1).max()
        return out
    # large groups: per-space-pair blocks so memory is O(|i|*|j|),
    # never O(n^2) over the whole group
    for i in range(n_spaces):
        si, ei = bounds[i], bounds[i + 1]
        for j in range(n_spaces):
            if i == j:
                continue
            sj, ej = bounds[j], bounds[j + 1]
            if ei <= si or ej <= sj:
                out[i, j] = np.nan
                continue
            dx = xs[si:ei, None] - xs[None, sj:ej]
            dy = ys[si:ei, None] - ys[None, sj:ej]
            out[i, j] = np.sqrt(dx * dx + dy * dy).min(axis=1).max()
    return out
