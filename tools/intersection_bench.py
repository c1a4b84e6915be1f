"""Batch-scaling micro-bench for the vectorized intersection kernel.

Verifies (round-2 verdict task 2) that kernels/intersection.py scales
linearly in the candidate-segment-pair count — i.e. the per-segment-
pair Python loop is gone.  Run:

    python tools/intersection_bench.py

Prints one JSON line: per-batch-size wall time and the throughput
ratio largest/smallest (should be ~1.0 for linear scaling; the old
scalar kernel degraded to per-pair interpreter cost, ~constant
pairs/sec but >100x lower).
"""

from __future__ import annotations

import json
import time

import numpy as np

from cuspatial_spark.kernels.intersection import pairwise_linestring_intersection


def _make_layer(n_lines: int, segs_per_line: int, rng) -> tuple:
    pts = segs_per_line + 1
    offsets = np.arange(n_lines + 1, dtype=np.int64) * pts
    base = rng.uniform(0, 100, size=(n_lines, 2))
    steps = rng.uniform(-1, 1, size=(n_lines, pts, 2)).cumsum(axis=1)
    xy = base[:, None, :] + steps
    return offsets, xy[:, :, 0].ravel(), xy[:, :, 1].ravel()


def main() -> None:
    rng = np.random.default_rng(7)
    sizes = [1_000, 10_000, 100_000]
    segs = 8  # 64 candidate segment pairs per feature pair
    results = {}
    for n in sizes:
        lo, lx, ly = _make_layer(n, segs, rng)
        ro, rx, ry = _make_layer(n, segs, rng)
        idx = np.arange(n, dtype=np.int64)
        # warm-up numpy allocator on the smallest size
        if n == sizes[0]:
            pairwise_linestring_intersection(idx[:100], idx[:100], lo, lx, ly, ro, rx, ry)
        t0 = time.perf_counter()
        pairwise_linestring_intersection(idx, idx, lo, lx, ly, ro, rx, ry)
        dt = time.perf_counter() - t0
        results[n] = {
            "sec": round(dt, 4),
            "cand_pairs": n * segs * segs,
            "cand_per_sec": round(n * segs * segs / dt),
        }
    ratio = results[sizes[-1]]["cand_per_sec"] / results[sizes[0]]["cand_per_sec"]
    print(json.dumps({"batch_scaling": results, "throughput_ratio_large_over_small": round(ratio, 3)}))


if __name__ == "__main__":
    main()
