"""Pairwise (row i vs row i) geometry operators.

Mirrors the reference's pairwise kernels (SURVEY §2.3-2.4): each
operator takes a DataFrame whose rows reference features in one or two
broadcast geometry layers by index, and appends a result column
computed by one vectorized kernel call per Arrow batch.

Also provides ``distance`` — the GeoPandas-style type dispatcher
(reference core/binops/distance_dispatch.py:43-140): picks the kernel
from the (lhs_type, rhs_type) pair.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..geometry import (
    LinestringArrays,
    MultiLinestringArrays,
    MultipointArrays,
    MultiPolygonArrays,
    PolygonArrays,
)
from ..kernels import geom_distance as gk
from ..kernels.pip import point_in_polygon_pairs


def _map_batches(df: DataFrame, fn, extra_fields):
    schema = StructType(df.schema.fields + extra_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield fn(pdf)

    return df.mapInPandas(run, schema=schema)


def _split_parts(layer):
    """(single-part layer, geometry_offsets-or-None) for a possibly
    multi-part layer."""
    if isinstance(layer, (MultiLinestringArrays, MultiPolygonArrays)):
        return layer.parts, np.asarray(layer.geometry_offsets, dtype=np.int64)
    return layer, None


def _part_pairs(li, ri, go_l, go_r):
    """Multi-part support for the pairwise distance family, entirely
    INSIDE the Arrow batch: expand each geometry-index row to its
    (lhs part, rhs part) index pairs with offset-flattened NumPy (no
    Spark join, no extra shuffle), run the single-part kernel on the
    part pairs, and min-reduce back per row — distance(multi, g) ==
    min over parts (reference core/spatial/distance.py:243-314).

    Returns (row, lp, rp) flat arrays; go_* None means that side's
    geometries ARE its parts."""
    n = len(li)
    cl = (go_l[li + 1] - go_l[li]) if go_l is not None else np.ones(n, dtype=np.int64)
    cr = (go_r[ri + 1] - go_r[ri]) if go_r is not None else np.ones(n, dtype=np.int64)
    counts = cl * cr
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    cum = np.concatenate(([0], np.cumsum(counts)))
    local = np.arange(int(cum[-1]), dtype=np.int64) - cum[row]
    crr = cr[row]
    lloc = local // crr
    rloc = local - lloc * crr
    lp = (go_l[li][row] + lloc) if go_l is not None else li[row]
    rp = (go_r[ri][row] + rloc) if go_r is not None else ri[row]
    return row, lp, rp


def _min_by_row(n, row, d):
    out = np.full(n, np.inf)
    np.minimum.at(out, row, np.asarray(d, dtype=np.float64))
    return out


def _pair_distance_fn(kernel, go_l, go_r):
    """Batch closure: single-part layers call the kernel directly;
    multi-part sides expand to part pairs and min-reduce per row."""
    if go_l is None and go_r is None:
        return lambda li, ri: kernel(li, ri)

    def fn(li, ri):
        row, lp, rp = _part_pairs(li, ri, go_l, go_r)
        return _min_by_row(len(li), row, kernel(lp, rp))

    return fn


def pairwise_point_in_polygon_spherical(
    df: DataFrame,
    polygons: PolygonArrays,
    lon: str = "lon",
    lat: str = "lat",
    polygon_idx: str = "polygon_index",
    result: str = "in_polygon",
) -> DataFrame:
    """Row i: point i inside polygon polygon_idx[i] under GEODESIC
    semantics — vertices and points are lon/lat degrees on the sphere
    (reference is_point_in_polygon.cuh:153-185, C++-internal; no
    Python surface exists in the reference).  The polygon layer's
    x/y arrays are interpreted as lon/lat."""
    from ..kernels.spherical import point_in_polygon_spherical_pairs

    po, ro, px, py = polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y

    def fn(pdf):
        pdf[result] = point_in_polygon_spherical_pairs(
            pdf[lon].to_numpy(), pdf[lat].to_numpy(),
            pdf[polygon_idx].to_numpy(), po, ro, px, py,
        )
        return pdf

    return _map_batches(df, fn, [StructField(result, BooleanType(), False)])


def pairwise_point_in_polygon(
    df: DataFrame,
    polygons: PolygonArrays,
    x: str = "x",
    y: str = "y",
    polygon_idx: str = "polygon_index",
    result: str = "in_polygon",
) -> DataFrame:
    """Row i: point i inside polygon polygon_idx[i]
    (reference cpp/src/point_in_polygon/point_in_polygon.cu:133-136)."""
    po, ro, px, py = polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y

    def fn(pdf):
        pdf[result] = point_in_polygon_pairs(
            pdf[x].to_numpy(), pdf[y].to_numpy(),
            pdf[polygon_idx].to_numpy(), po, ro, px, py,
        )
        return pdf

    return _map_batches(df, fn, [StructField(result, BooleanType(), False)])


def pairwise_linestring_distance(
    df: DataFrame,
    lhs: LinestringArrays | MultiLinestringArrays,
    rhs: LinestringArrays | MultiLinestringArrays,
    lhs_idx: str = "lhs_index",
    rhs_idx: str = "rhs_index",
    result: str = "distance",
) -> DataFrame:
    lhs, go_l = _split_parts(lhs)
    rhs, go_r = _split_parts(rhs)
    lo, lx, ly = lhs.part_offsets, lhs.x, lhs.y
    ro, rx, ry = rhs.part_offsets, rhs.x, rhs.y
    pair_d = _pair_distance_fn(
        lambda a, b: gk.pairwise_linestring_distance(a, b, lo, lx, ly, ro, rx, ry),
        go_l, go_r,
    )

    def fn(pdf):
        pdf[result] = pair_d(
            pdf[lhs_idx].to_numpy(dtype=np.int64), pdf[rhs_idx].to_numpy(dtype=np.int64)
        )
        return pdf

    return _map_batches(df, fn, [StructField(result, DoubleType(), True)])


def pairwise_point_polygon_distance(
    df: DataFrame,
    polygons: PolygonArrays | MultiPolygonArrays,
    x: str = "x",
    y: str = "y",
    polygon_idx: str = "polygon_index",
    result: str = "distance",
) -> DataFrame:
    polygons, go = _split_parts(polygons)
    po, ro, px, py = polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y

    def fn(pdf):
        xs = pdf[x].to_numpy()
        ys = pdf[y].to_numpy()
        gi = pdf[polygon_idx].to_numpy(dtype=np.int64)
        if go is None:
            pdf[result] = gk.pairwise_point_polygon_distance(xs, ys, gi, po, ro, px, py)
        else:
            row, _, rp = _part_pairs(gi, gi, None, go)
            d = gk.pairwise_point_polygon_distance(xs[row], ys[row], rp, po, ro, px, py)
            pdf[result] = _min_by_row(len(pdf), row, d)
        return pdf

    return _map_batches(df, fn, [StructField(result, DoubleType(), True)])


def pairwise_linestring_polygon_distance(
    df: DataFrame,
    linestrings: LinestringArrays | MultiLinestringArrays,
    polygons: PolygonArrays | MultiPolygonArrays,
    line_idx: str = "linestring_index",
    polygon_idx: str = "polygon_index",
    result: str = "distance",
) -> DataFrame:
    linestrings, go_l = _split_parts(linestrings)
    polygons, go_p = _split_parts(polygons)
    lo, lx, ly = linestrings.part_offsets, linestrings.x, linestrings.y
    po, ro, px, py = polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y
    pair_d = _pair_distance_fn(
        lambda a, b: gk.pairwise_linestring_polygon_distance(
            a, b, lo, lx, ly, po, ro, px, py
        ),
        go_l, go_p,
    )

    def fn(pdf):
        pdf[result] = pair_d(
            pdf[line_idx].to_numpy(dtype=np.int64),
            pdf[polygon_idx].to_numpy(dtype=np.int64),
        )
        return pdf

    return _map_batches(df, fn, [StructField(result, DoubleType(), True)])


def pairwise_polygon_distance(
    df: DataFrame,
    lhs: PolygonArrays | MultiPolygonArrays,
    rhs: PolygonArrays | MultiPolygonArrays,
    lhs_idx: str = "lhs_index",
    rhs_idx: str = "rhs_index",
    result: str = "distance",
) -> DataFrame:
    lhs, go_l = _split_parts(lhs)
    rhs, go_r = _split_parts(rhs)
    pair_d = _pair_distance_fn(
        lambda a, b: gk.pairwise_polygon_distance(
            a, b,
            lhs.part_offsets, lhs.ring_offsets, lhs.x, lhs.y,
            rhs.part_offsets, rhs.ring_offsets, rhs.x, rhs.y,
        ),
        go_l, go_r,
    )

    def fn(pdf):
        pdf[result] = pair_d(
            pdf[lhs_idx].to_numpy(dtype=np.int64), pdf[rhs_idx].to_numpy(dtype=np.int64)
        )
        return pdf

    return _map_batches(df, fn, [StructField(result, DoubleType(), True)])


def pairwise_multipoint_distance(
    df: DataFrame,
    lhs: MultipointArrays,
    rhs: MultipointArrays,
    lhs_idx: str = "lhs_index",
    rhs_idx: str = "rhs_index",
    result: str = "distance",
) -> DataFrame:
    """Row i: min distance between multipoint sets (the multipoint
    branches of reference pairwise_point_distance,
    core/spatial/distance.py:169-240)."""
    lo, lx, ly = lhs.part_offsets, lhs.x, lhs.y
    ro, rx, ry = rhs.part_offsets, rhs.x, rhs.y

    def fn(pdf):
        pdf[result] = gk.pairwise_multipoint_distance(
            pdf[lhs_idx].to_numpy(), pdf[rhs_idx].to_numpy(), lo, lx, ly, ro, rx, ry
        )
        return pdf

    return _map_batches(df, fn, [StructField(result, DoubleType(), True)])


def pairwise_point_multipoint_distance(
    df: DataFrame,
    mpoints: MultipointArrays,
    x: str = "x",
    y: str = "y",
    mp_idx: str = "multipoint_index",
    result: str = "distance",
) -> DataFrame:
    """Row i: min distance from point (x, y) to multipoint mp_idx[i]
    — the (POINT, MULTIPOINT) dispatch row."""
    mo, mx, my = mpoints.part_offsets, mpoints.x, mpoints.y

    def fn(pdf):
        xs = pdf[x].to_numpy()
        ys = pdf[y].to_numpy()
        mi = pdf[mp_idx].to_numpy()
        out = np.empty(len(pdf), dtype=np.float64)
        for m in np.unique(mi):
            sel = mi == m
            s, e = int(mo[m]), int(mo[m + 1])
            d2 = (xs[sel, None] - mx[None, s:e]) ** 2 + (ys[sel, None] - my[None, s:e]) ** 2
            out[sel] = np.sqrt(d2.min(axis=1))
        pdf[result] = out
        return pdf

    return _map_batches(df, fn, [StructField(result, DoubleType(), True)])


def pairwise_multipoint_linestring_distance(
    df: DataFrame,
    mpoints: MultipointArrays,
    linestrings: LinestringArrays | MultiLinestringArrays,
    mp_idx: str = "multipoint_index",
    line_idx: str = "linestring_index",
    result: str = "distance",
) -> DataFrame:
    linestrings, go = _split_parts(linestrings)
    mo, mx, my = mpoints.part_offsets, mpoints.x, mpoints.y
    lo, lx, ly = linestrings.part_offsets, linestrings.x, linestrings.y
    pair_d = _pair_distance_fn(
        lambda a, b: gk.pairwise_multipoint_linestring_distance(
            a, b, mo, mx, my, lo, lx, ly
        ),
        None, go,
    )

    def fn(pdf):
        pdf[result] = pair_d(
            pdf[mp_idx].to_numpy(dtype=np.int64),
            pdf[line_idx].to_numpy(dtype=np.int64),
        )
        return pdf

    return _map_batches(df, fn, [StructField(result, DoubleType(), True)])


def pairwise_multipoint_polygon_distance(
    df: DataFrame,
    mpoints: MultipointArrays,
    polygons: PolygonArrays | MultiPolygonArrays,
    mp_idx: str = "multipoint_index",
    polygon_idx: str = "polygon_index",
    result: str = "distance",
) -> DataFrame:
    polygons, go = _split_parts(polygons)
    mo, mx, my = mpoints.part_offsets, mpoints.x, mpoints.y
    po, ro, px, py = polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y
    pair_d = _pair_distance_fn(
        lambda a, b: gk.pairwise_multipoint_polygon_distance(
            a, b, mo, mx, my, po, ro, px, py
        ),
        None, go,
    )

    def fn(pdf):
        pdf[result] = pair_d(
            pdf[mp_idx].to_numpy(dtype=np.int64),
            pdf[polygon_idx].to_numpy(dtype=np.int64),
        )
        return pdf

    return _map_batches(df, fn, [StructField(result, DoubleType(), True)])


def pairwise_point_linestring_nearest_points(
    df: DataFrame,
    linestrings: LinestringArrays,
    x: str = "x",
    y: str = "y",
    line_idx: str = "linestring_index",
) -> DataFrame:
    """Adds (segment_id, nearest_x, nearest_y) — reference
    core/spatial/nearest_points.py:18-124."""
    lo, lx, ly = linestrings.part_offsets, linestrings.x, linestrings.y

    def fn(pdf):
        seg, nx, ny = gk.pairwise_point_linestring_nearest_points(
            pdf[x].to_numpy(), pdf[y].to_numpy(), pdf[line_idx].to_numpy(), lo, lx, ly
        )
        pdf["segment_id"] = seg
        pdf["nearest_x"] = nx
        pdf["nearest_y"] = ny
        return pdf

    return _map_batches(
        df,
        fn,
        [
            StructField("segment_id", LongType(), False),
            StructField("nearest_x", DoubleType(), True),
            StructField("nearest_y", DoubleType(), True),
        ],
    )


def pairwise_multipoint_equals_count(
    df: DataFrame,
    lhs_offsets,
    lhs_x,
    lhs_y,
    rhs_offsets,
    rhs_x,
    rhs_y,
    lhs_idx: str = "lhs_index",
    rhs_idx: str = "rhs_index",
    result: str = "equals_count",
) -> DataFrame:
    """Row i: count of lhs multipoint lhs_idx[i]'s points matching any
    point of rhs multipoint rhs_idx[i] (core/binops/equals_count.py)."""
    lo = np.asarray(lhs_offsets, dtype=np.int64)
    ro = np.asarray(rhs_offsets, dtype=np.int64)
    lx, ly = np.asarray(lhs_x), np.asarray(lhs_y)
    rx, ry = np.asarray(rhs_x), np.asarray(rhs_y)

    def fn(pdf):
        li = pdf[lhs_idx].to_numpy()
        ri = pdf[rhs_idx].to_numpy()
        # re-base offsets per selected feature
        sub_lo = np.concatenate(([0], np.cumsum(lo[li + 1] - lo[li])))
        sub_ro = np.concatenate(([0], np.cumsum(ro[ri + 1] - ro[ri])))
        slx = np.concatenate([lx[lo[i]:lo[i + 1]] for i in li]) if len(li) else lx[:0]
        sly = np.concatenate([ly[lo[i]:lo[i + 1]] for i in li]) if len(li) else ly[:0]
        srx = np.concatenate([rx[ro[i]:ro[i + 1]] for i in ri]) if len(ri) else rx[:0]
        sry = np.concatenate([ry[ro[i]:ro[i + 1]] for i in ri]) if len(ri) else ry[:0]
        pdf[result] = gk.pairwise_multipoint_equals_count(sub_lo, slx, sly, sub_ro, srx, sry)
        return pdf

    return _map_batches(df, fn, [StructField(result, LongType(), False)])
