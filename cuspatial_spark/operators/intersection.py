"""pairwise_linestring_intersection operator (#21) + touches/overlaps
predicates built on it.

Reference: core/binops/intersection.py:25-157 (geometry-collection
output with look-back ids); feature_touches.py:33-165 (boundary-only
contact); feature_overlaps.py (same-dimension partial overlap).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..geometry import LinestringArrays
from ..kernels.intersection import pairwise_linestring_intersection as k_intersect

INTERSECTION_SCHEMA_SUFFIX = [
    StructField("kind", ByteType(), False),  # 0=point, 1=overlap segment
    StructField("coords", ArrayType(DoubleType(), True), False),
    StructField("lhs_segment_id", LongType(), False),
    StructField("rhs_segment_id", LongType(), False),
]


def pairwise_linestring_intersection(
    df: DataFrame,
    lhs: LinestringArrays,
    rhs: LinestringArrays,
    lhs_idx: str = "lhs_index",
    rhs_idx: str = "rhs_index",
) -> DataFrame:
    """One output row per intersection geometry (exploded collection):
    input columns + (kind, coords, lhs_segment_id, rhs_segment_id)."""
    schema = StructType(df.schema.fields + INTERSECTION_SCHEMA_SUFFIX)
    lo, lx, ly = lhs.part_offsets, lhs.x, lhs.y
    ro, rx, ry = rhs.part_offsets, rhs.x, rhs.y

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pair, kind, coords, lseg, rseg = k_intersect(
                pdf[lhs_idx].to_numpy(), pdf[rhs_idx].to_numpy(),
                lo, lx, ly, ro, rx, ry,
            )
            out = pdf.iloc[pair].reset_index(drop=True)
            out["kind"] = kind
            # object dtype keeps ragged/equal-length lists as lists —
            # pandas would otherwise build a 2D block Arrow can't convert
            out["coords"] = pd.Series(coords, dtype=object, index=out.index)
            out["lhs_segment_id"] = lseg
            out["rhs_segment_id"] = rseg
            yield out

    return df.mapInPandas(run, schema=schema)


def linestring_touches_linestring(
    df: DataFrame,
    lhs: LinestringArrays,
    rhs: LinestringArrays,
    lhs_idx: str = "lhs_index",
    rhs_idx: str = "rhs_index",
    result: str = "touches",
) -> DataFrame:
    """.touches: geometries intersect but only at boundary points —
    here: intersection is non-empty, consists only of points, and each
    point is an endpoint of at least one of the two linestrings."""
    schema = StructType(df.schema.fields + [StructField(result, BooleanType(), False)])
    lo, lx, ly = lhs.part_offsets, lhs.x, lhs.y
    ro, rx, ry = rhs.part_offsets, rhs.x, rhs.y

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            li = pdf[lhs_idx].to_numpy()
            ri = pdf[rhs_idx].to_numpy()
            pair, kind, coords, _, _ = k_intersect(li, ri, lo, lx, ly, ro, rx, ry)
            touches = np.zeros(len(pdf), dtype=bool)
            bad = np.zeros(len(pdf), dtype=bool)  # interior contact seen
            for p, k, c in zip(pair, kind, coords):
                if k == 1:  # overlap segment -> interior contact
                    bad[p] = True
                    continue
                x, y = c
                a, b = int(li[p]), int(ri[p])
                l_ends = {
                    (lx[lo[a]], ly[lo[a]]),
                    (lx[lo[a + 1] - 1], ly[lo[a + 1] - 1]),
                }
                r_ends = {
                    (rx[ro[b]], ry[ro[b]]),
                    (rx[ro[b + 1] - 1], ry[ro[b + 1] - 1]),
                }
                if (x, y) in l_ends or (x, y) in r_ends:
                    touches[p] = True
                else:
                    bad[p] = True
            pdf[result] = touches & ~bad
            yield pdf

    return df.mapInPandas(run, schema=schema)


def linestring_overlaps_linestring(
    df: DataFrame,
    lhs: LinestringArrays,
    rhs: LinestringArrays,
    lhs_idx: str = "lhs_index",
    rhs_idx: str = "rhs_index",
    result: str = "overlaps",
) -> DataFrame:
    """.overlaps for linestrings: same-dimension partial overlap — a
    collinear overlap segment exists but neither contains the other."""
    schema = StructType(df.schema.fields + [StructField(result, BooleanType(), False)])
    lo, lx, ly = lhs.part_offsets, lhs.x, lhs.y
    ro, rx, ry = rhs.part_offsets, rhs.x, rhs.y

    def _length(offsets, xs, ys, i):
        s, e = int(offsets[i]), int(offsets[i + 1])
        return float(np.hypot(np.diff(xs[s:e]), np.diff(ys[s:e])).sum())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            li = pdf[lhs_idx].to_numpy()
            ri = pdf[rhs_idx].to_numpy()
            pair, kind, coords, _, _ = k_intersect(li, ri, lo, lx, ly, ro, rx, ry)
            overlap_len = np.zeros(len(pdf))
            for p, k, c in zip(pair, kind, coords):
                if k == 1:
                    overlap_len[p] += float(np.hypot(c[2] - c[0], c[3] - c[1]))
            out = np.zeros(len(pdf), dtype=bool)
            for i, (a, b) in enumerate(zip(li, ri)):
                if overlap_len[i] <= 0:
                    continue
                la = _length(lo, lx, ly, int(a))
                lb = _length(ro, rx, ry, int(b))
                # partial: overlap shorter than both (containment excluded)
                out[i] = overlap_len[i] < la - 1e-12 and overlap_len[i] < lb - 1e-12
            pdf[result] = out
            yield pdf

    return df.mapInPandas(run, schema=schema)
