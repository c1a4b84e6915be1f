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
from ..kernels.segment import point_segment_distance_squared


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

    def pair(li: int, ri: int) -> bool:
        return bool(
            gk.pairwise_linestring_distance(
                [li], [ri],
                lhs.part_offsets, lhs.x, lhs.y, rhs.part_offsets, rhs.x, rhs.y,
            )[0]
            == 0.0
        )

    return _map_bool(
        df, lambda pdf: _unique_pair_map(pdf, lhs_idx, rhs_idx, pair), result
    )


def linestring_crosses_linestring(
    df: DataFrame, lhs: LinestringArrays, rhs: LinestringArrays,
    lhs_idx: str = "lhs_index", rhs_idx: str = "rhs_index",
    result: str = "crosses",
) -> DataFrame:
    """.crosses for (linestring, linestring): proper interior
    crossing — segments properly intersect (feature_crosses.py:
    intersects minus boundary-only contact)."""

    def pair(li: int, ri: int) -> bool:
        a0, a1 = gk._feature_segments(lhs.part_offsets, li)
        b0, b1 = gk._feature_segments(rhs.part_offsets, ri)
        return bool(
            gk._segments_intersect(
                lhs.x[a0][:, None], lhs.y[a0][:, None],
                lhs.x[a1][:, None], lhs.y[a1][:, None],
                rhs.x[b0][None, :], rhs.y[b0][None, :],
                rhs.x[b1][None, :], rhs.y[b1][None, :],
            ).any()
        )

    return _map_bool(
        df, lambda pdf: _unique_pair_map(pdf, lhs_idx, rhs_idx, pair), result
    )


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


def _unique_pair_map(pdf, lhs_idx: str, rhs_idx: str, fn) -> np.ndarray:
    """Evaluate a per-(lhs feature, rhs feature) boolean once per
    distinct index pair in the batch and broadcast to rows — feature
    layers are small (broadcastable), batches are large."""
    li = pdf[lhs_idx].to_numpy()
    ri = pdf[rhs_idx].to_numpy()
    out = np.zeros(len(pdf), dtype=bool)
    for a, b in {(int(a), int(b)) for a, b in zip(li, ri)}:
        out[(li == a) & (ri == b)] = fn(a, b)
    return out


def point_intersects_point(
    df: DataFrame,
    x: str = "x", y: str = "y", x2: str = "x2", y2: str = "y2",
    result: str = "intersects",
) -> DataFrame:
    """.intersects for (point, point) = coordinate equality
    (reference feature_intersects.py IntersectsByEquals) — a pure
    Catalyst expression."""
    from pyspark.sql import functions as F

    return df.withColumn(result, (F.col(x) == F.col(x2)) & (F.col(y) == F.col(y2)))


def point_intersects_linestring(
    df: DataFrame, linestrings: LinestringArrays,
    x: str = "x", y: str = "y", linestring_idx: str = "linestring_index",
    result: str = "intersects",
) -> DataFrame:
    """.intersects for (point, linestring): point lies on the
    linestring — min point-to-segment distance == 0
    (feature_intersects.py PointLineStringIntersects)."""
    from ..kernels.segment import point_linestring_distance_pairs

    lo, lx, ly = linestrings.part_offsets, linestrings.x, linestrings.y

    def fn(pdf):
        d = point_linestring_distance_pairs(
            pdf[x].to_numpy(), pdf[y].to_numpy(),
            pdf[linestring_idx].to_numpy(), lo, lx, ly,
        )
        return d == 0.0

    return _map_bool(df, fn, result)


def point_disjoint_linestring(df: DataFrame, linestrings: LinestringArrays, **kw) -> DataFrame:
    kw.setdefault("result", "disjoint")
    result = kw.pop("result")
    out = point_intersects_linestring(df, linestrings, result="__i", **kw)
    from pyspark.sql import functions as F

    return out.withColumn(result, ~F.col("__i")).drop("__i")


def polygon_intersects_polygon(
    df: DataFrame, lhs: PolygonArrays, rhs: PolygonArrays,
    lhs_idx: str = "lhs_index", rhs_idx: str = "rhs_index",
    result: str = "intersects",
) -> DataFrame:
    """.intersects for (polygon, polygon): containment either way,
    proper edge crossing, or boundary contact — i.e. pairwise polygon
    distance == 0 (feature_intersects.py PolygonPolygonIntersects)."""

    def fn(pdf):
        def pair(a, b):
            return gk.pairwise_polygon_distance(
                [a], [b],
                lhs.part_offsets, lhs.ring_offsets, lhs.x, lhs.y,
                rhs.part_offsets, rhs.ring_offsets, rhs.x, rhs.y,
            )[0] == 0.0

        return _unique_pair_map(pdf, lhs_idx, rhs_idx, pair)

    return _map_bool(df, fn, result)


def polygon_disjoint_polygon(
    df: DataFrame, lhs: PolygonArrays, rhs: PolygonArrays, **kw
) -> DataFrame:
    kw.setdefault("result", "disjoint")
    result = kw.pop("result")
    out = polygon_intersects_polygon(df, lhs, rhs, result="__i", **kw)
    from pyspark.sql import functions as F

    return out.withColumn(result, ~F.col("__i")).drop("__i")


def _ls_poly_flags(lines: LinestringArrays, polys: PolygonArrays, li: int, pi: int):
    """(within, crosses) for linestring li vs polygon pi.

    within: every vertex inside (ray-cast parity) or on the boundary
    (min edge distance == 0) and no proper edge crossing.
    crosses: a proper edge crossing exists, or some vertex strictly
    inside and some strictly outside (feature_within.py
    LineStringPolygonWithin / feature_crosses.py LineStringPolygonCrosses
    semantics at vertex resolution)."""
    s, e = int(lines.part_offsets[li]), int(lines.part_offsets[li + 1])
    vx, vy = lines.x[s:e], lines.y[s:e]
    r0, r1 = int(polys.part_offsets[pi]), int(polys.part_offsets[pi + 1])
    inside = _pip_one_polygon(vx, vy, polys.ring_offsets[r0:r1 + 1], polys.x, polys.y)
    v0, v1 = gk._ring_segments_of_polygon(polys.part_offsets, polys.ring_offsets, pi)
    d2 = point_segment_distance_squared(
        vx[:, None], vy[:, None],
        polys.x[v0][None, :], polys.y[v0][None, :],
        polys.x[v1][None, :], polys.y[v1][None, :],
    ).min(axis=1)
    on_bound = d2 == 0.0
    a0, a1 = gk._feature_segments(lines.part_offsets, li)
    proper = bool(
        gk._segments_intersect(
            lines.x[a0][:, None], lines.y[a0][:, None],
            lines.x[a1][:, None], lines.y[a1][:, None],
            polys.x[v0][None, :], polys.y[v0][None, :],
            polys.x[v1][None, :], polys.y[v1][None, :],
        ).any()
    )
    within = bool((inside | on_bound).all()) and not proper
    strict_in = inside & ~on_bound
    strict_out = ~inside & ~on_bound
    crosses = proper or bool(strict_in.any() and strict_out.any())
    return within, crosses


def linestring_within_polygon(
    df: DataFrame, lines: LinestringArrays, polys: PolygonArrays,
    line_idx: str = "linestring_index", polygon_idx: str = "polygon_index",
    result: str = "within",
) -> DataFrame:
    def fn(pdf):
        return _unique_pair_map(
            pdf, line_idx, polygon_idx, lambda a, b: _ls_poly_flags(lines, polys, a, b)[0]
        )

    return _map_bool(df, fn, result)


def linestring_crosses_polygon(
    df: DataFrame, lines: LinestringArrays, polys: PolygonArrays,
    line_idx: str = "linestring_index", polygon_idx: str = "polygon_index",
    result: str = "crosses",
) -> DataFrame:
    def fn(pdf):
        return _unique_pair_map(
            pdf, line_idx, polygon_idx, lambda a, b: _ls_poly_flags(lines, polys, a, b)[1]
        )

    return _map_bool(df, fn, result)


def polygon_contains_polygon(
    df: DataFrame, lhs: PolygonArrays, rhs: PolygonArrays,
    lhs_idx: str = "lhs_index", rhs_idx: str = "rhs_index",
    result: str = "contains",
) -> DataFrame:
    """.contains for (polygon, polygon): every rhs vertex inside or on
    the boundary of lhs and no proper edge crossing (vertex-resolution
    version of the reference's PIP-based ContainsPredicate,
    feature_contains.py:42-192)."""

    def fn(pdf):
        def pair(a, b):
            rs = int(rhs.ring_offsets[rhs.part_offsets[b]])
            re_ = int(rhs.ring_offsets[rhs.part_offsets[b + 1]])
            vx, vy = rhs.x[rs:re_], rhs.y[rs:re_]
            lr0, lr1 = int(lhs.part_offsets[a]), int(lhs.part_offsets[a + 1])
            inside = _pip_one_polygon(
                vx, vy, lhs.ring_offsets[lr0:lr1 + 1], lhs.x, lhs.y
            )
            v0, v1 = gk._ring_segments_of_polygon(lhs.part_offsets, lhs.ring_offsets, a)
            d2 = point_segment_distance_squared(
                vx[:, None], vy[:, None],
                lhs.x[v0][None, :], lhs.y[v0][None, :],
                lhs.x[v1][None, :], lhs.y[v1][None, :],
            ).min(axis=1)
            b0, b1 = gk._ring_segments_of_polygon(rhs.part_offsets, rhs.ring_offsets, b)
            proper = bool(
                gk._segments_intersect(
                    lhs.x[v0][:, None], lhs.y[v0][:, None],
                    lhs.x[v1][:, None], lhs.y[v1][:, None],
                    rhs.x[b0][None, :], rhs.y[b0][None, :],
                    rhs.x[b1][None, :], rhs.y[b1][None, :],
                ).any()
            )
            return bool((inside | (d2 == 0.0)).all()) and not proper

        return _unique_pair_map(pdf, lhs_idx, rhs_idx, pair)

    return _map_bool(df, fn, result)


def contains_allpairs(points_df: DataFrame, polygons: PolygonArrays, **kw) -> DataFrame:
    """GeoSeries.contains(other, allpairs=True) (geoseries.py:1009):
    the semi-join-shaped output — (point, polygon_id) index pairs of
    contains_properly over ALL pairs.  This IS the filter+refine
    spatial join; delegates to plans.point_in_polygon_join (broadcast
    tile filter + JVM ray-cast refine — the 100-TB path)."""
    from ..plans import point_in_polygon_join

    return point_in_polygon_join(points_df, polygons, **kw)


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

    def pair(a: int, b: int) -> bool:
        acnt = gk.pairwise_multipoint_equals_count(
            [0, lo[a + 1] - lo[a]], lx[lo[a]:lo[a + 1]], ly[lo[a]:lo[a + 1]],
            [0, ro[b + 1] - ro[b]], rx[ro[b]:ro[b + 1]], ry[ro[b]:ro[b + 1]],
        )[0]
        bcnt = gk.pairwise_multipoint_equals_count(
            [0, ro[b + 1] - ro[b]], rx[ro[b]:ro[b + 1]], ry[ro[b]:ro[b + 1]],
            [0, lo[a + 1] - lo[a]], lx[lo[a]:lo[a + 1]], ly[lo[a]:lo[a + 1]],
        )[0]
        return bool(acnt == (lo[a + 1] - lo[a]) and bcnt == (ro[b + 1] - ro[b]))

    return _map_bool(
        df, lambda pdf: _unique_pair_map(pdf, lhs_idx, rhs_idx, pair), result
    )
