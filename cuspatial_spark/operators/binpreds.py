"""Binary spatial predicates (DE-9IM-style GeoSeries methods).

Mirrors the reference's predicate layer (core/binpreds/*, dispatched
per (lhs_type, rhs_type) — binpred_dispatch.py:11-40): every predicate
is a composition of three primitives — contains_properly (ray-cast
PIP), intersects (segment intersection), equals (vertex matching) —
see basic_predicates.py:15-107.

Spark shape: each predicate takes a pairwise DataFrame (row i = one
lhs/rhs feature pair, referenced by index into broadcast layers) and
appends a boolean column.  Supported combos mirror the reference's
implemented subset; unsupported combos raise NotImplementedError just
like the reference's NotImplementedPredicate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BooleanType, StructField, StructType

from ..geometry import LinestringArrays, PolygonArrays
from ..kernels import geom_distance as gk
from ..kernels.pip import _pip_one_polygon


def _map_bool(df: DataFrame, fn, result: str):
    schema = StructType(df.schema.fields + [StructField(result, BooleanType(), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf[result] = fn(pdf)
            yield pdf

    return df.mapInPandas(run, schema=schema)


def _points_in_poly(pdf, polygons, x, y, polygon_idx):
    """Vector of contains_properly(poly_i, point_i)."""
    out = np.zeros(len(pdf), dtype=bool)
    xs = pdf[x].to_numpy()
    ys = pdf[y].to_numpy()
    pidx = pdf[polygon_idx].to_numpy()
    po, ro = polygons.part_offsets, polygons.ring_offsets
    for p in np.unique(pidx):
        m = pidx == p
        r0, r1 = po[p], po[p + 1]
        out[m] = _pip_one_polygon(xs[m], ys[m], ro[r0:r1 + 1], polygons.x, polygons.y)
    return out


def polygon_contains_properly_point(
    df: DataFrame, polygons: PolygonArrays,
    x: str = "x", y: str = "y", polygon_idx: str = "polygon_index",
    result: str = "contains_properly",
) -> DataFrame:
    """.contains_properly — interior-only containment; edge points are
    False (reference feature_contains_properly.py; kernel edge rule
    is_point_in_polygon.cuh:43,70-80)."""
    return _map_bool(df, lambda pdf: _points_in_poly(pdf, polygons, x, y, polygon_idx), result)


def point_within_polygon(
    df: DataFrame, polygons: PolygonArrays,
    x: str = "x", y: str = "y", polygon_idx: str = "polygon_index",
    result: str = "within",
) -> DataFrame:
    """.within(point, polygon) = reversed contains
    (feature_within.py)."""
    return _map_bool(df, lambda pdf: _points_in_poly(pdf, polygons, x, y, polygon_idx), result)


def polygon_intersects_point(
    df: DataFrame, polygons: PolygonArrays,
    x: str = "x", y: str = "y", polygon_idx: str = "polygon_index",
    result: str = "intersects",
) -> DataFrame:
    """.intersects for (polygon, point): containment or boundary
    contact (distance == 0) — feature_intersects.py:29-150."""

    def fn(pdf):
        inside = _points_in_poly(pdf, polygons, x, y, polygon_idx)
        d = gk.pairwise_point_polygon_distance(
            pdf[x].to_numpy(), pdf[y].to_numpy(), pdf[polygon_idx].to_numpy(),
            polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y,
        )
        return inside | (d == 0.0)

    return _map_bool(df, fn, result)


def polygon_disjoint_point(
    df: DataFrame, polygons: PolygonArrays,
    x: str = "x", y: str = "y", polygon_idx: str = "polygon_index",
    result: str = "disjoint",
) -> DataFrame:
    """.disjoint = NOT intersects (feature_disjoint.py)."""

    def fn(pdf):
        inside = _points_in_poly(pdf, polygons, x, y, polygon_idx)
        d = gk.pairwise_point_polygon_distance(
            pdf[x].to_numpy(), pdf[y].to_numpy(), pdf[polygon_idx].to_numpy(),
            polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y,
        )
        return ~(inside | (d == 0.0))

    return _map_bool(df, fn, result)


def linestring_intersects_linestring(
    df: DataFrame, lhs: LinestringArrays, rhs: LinestringArrays,
    lhs_idx: str = "lhs_index", rhs_idx: str = "rhs_index",
    result: str = "intersects",
) -> DataFrame:
    """.intersects for (linestring, linestring): min distance == 0
    (proper crossings, touches, and overlaps all collapse to 0)."""

    def fn(pdf):
        d = gk.pairwise_linestring_distance(
            pdf[lhs_idx].to_numpy(), pdf[rhs_idx].to_numpy(),
            lhs.part_offsets, lhs.x, lhs.y, rhs.part_offsets, rhs.x, rhs.y,
        )
        return d == 0.0

    return _map_bool(df, fn, result)


def linestring_crosses_linestring(
    df: DataFrame, lhs: LinestringArrays, rhs: LinestringArrays,
    lhs_idx: str = "lhs_index", rhs_idx: str = "rhs_index",
    result: str = "crosses",
) -> DataFrame:
    """.crosses for (linestring, linestring): proper interior
    crossing — segments properly intersect (feature_crosses.py:
    intersects minus boundary-only contact)."""

    def fn(pdf):
        out = np.zeros(len(pdf), dtype=bool)
        for i, (li, ri) in enumerate(
            zip(pdf[lhs_idx].to_numpy(), pdf[rhs_idx].to_numpy())
        ):
            a0, a1 = gk._feature_segments(lhs.part_offsets, int(li))
            b0, b1 = gk._feature_segments(rhs.part_offsets, int(ri))
            hit = gk._segments_intersect(
                lhs.x[a0][:, None], lhs.y[a0][:, None],
                lhs.x[a1][:, None], lhs.y[a1][:, None],
                rhs.x[b0][None, :], rhs.y[b0][None, :],
                rhs.x[b1][None, :], rhs.y[b1][None, :],
            )
            out[i] = bool(hit.any())
        return out

    return _map_bool(df, fn, result)


def polygon_contains_point(
    df: DataFrame, polygons: PolygonArrays,
    x: str = "x", y: str = "y", polygon_idx: str = "polygon_index",
    result: str = "contains",
) -> DataFrame:
    """.contains for (polygon, point): interior OR boundary
    (feature_contains.py:42-192 — PIP plus boundary correction)."""

    def fn(pdf):
        inside = _points_in_poly(pdf, polygons, x, y, polygon_idx)
        d = gk.pairwise_point_polygon_distance(
            pdf[x].to_numpy(), pdf[y].to_numpy(), pdf[polygon_idx].to_numpy(),
            polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y,
        )
        # contains (non-proper) counts boundary points as contained
        return inside | (d == 0.0)

    return _map_bool(df, fn, result)


def polygon_covers_point(
    df: DataFrame, polygons: PolygonArrays, **kw
) -> DataFrame:
    """.covers for (polygon, point) coincides with non-proper contains
    (feature_covers.py)."""
    kw.setdefault("result", "covers")
    return polygon_contains_point(df, polygons, **kw)


def multipoint_geom_equals(
    df: DataFrame, lhs_offsets, lhs_x, lhs_y, rhs_offsets, rhs_x, rhs_y,
    lhs_idx: str = "lhs_index", rhs_idx: str = "rhs_index",
    result: str = "geom_equals",
) -> DataFrame:
    """.geom_equals for (multi)points: every lhs point matches some
    rhs point and vice versa (feature_equals.py via
    pairwise_multipoint_equals_count)."""
    lo = np.asarray(lhs_offsets, dtype=np.int64)
    ro = np.asarray(rhs_offsets, dtype=np.int64)
    lx, ly = np.asarray(lhs_x), np.asarray(lhs_y)
    rx, ry = np.asarray(rhs_x), np.asarray(rhs_y)

    def fn(pdf):
        li = pdf[lhs_idx].to_numpy()
        ri = pdf[rhs_idx].to_numpy()
        out = np.zeros(len(pdf), dtype=bool)
        for i, (a, b) in enumerate(zip(li, ri)):
            acnt = gk.pairwise_multipoint_equals_count(
                [0, lo[a + 1] - lo[a]], lx[lo[a]:lo[a + 1]], ly[lo[a]:lo[a + 1]],
                [0, ro[b + 1] - ro[b]], rx[ro[b]:ro[b + 1]], ry[ro[b]:ro[b + 1]],
            )[0]
            bcnt = gk.pairwise_multipoint_equals_count(
                [0, ro[b + 1] - ro[b]], rx[ro[b]:ro[b + 1]], ry[ro[b]:ro[b + 1]],
                [0, lo[a + 1] - lo[a]], lx[lo[a]:lo[a + 1]], ly[lo[a]:lo[a + 1]],
            )[0]
            out[i] = acnt == (lo[a + 1] - lo[a]) and bcnt == (ro[b + 1] - ro[b])
        return out

    return _map_bool(df, fn, result)
