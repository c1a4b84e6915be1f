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


def _expand_multipart(df: DataFrame, layer, idx_col: str):
    """Multi-part support for the pairwise distance family: a
    multi-geometry reference column is exploded to one row per PART via
    a broadcast join against the (geometry, part) table, the single-
    part kernel runs unchanged, and the caller min-reduces back to one
    row per original pair (distance(multi, g) == min over parts —
    reference core/spatial/distance.py:243-314 accepts multi* through
    the same geometry_offset flattening).

    Returns (df, part_layer, part_idx_col, expanded)."""
    if not isinstance(layer, (MultiLinestringArrays, MultiPolygonArrays)):
        return df, layer, idx_col, False
    geom, part = layer.part_table()
    part_col = f"__part_{idx_col}"
    tbl = df.sparkSession.createDataFrame(
        pd.DataFrame({idx_col: geom, part_col: part}),
        schema=f"{idx_col}: long, {part_col}: long",
    )
    return df.join(F.broadcast(tbl), on=idx_col, how="inner"), layer.parts, part_col, True


def _min_reduce(out: DataFrame, original_cols, result: str) -> DataFrame:
    """Collapse part-level rows back to one row per original pair."""
    keep = [c for c in original_cols]
    return (
        out.groupBy(*keep)
        .agg(F.min(result).alias(result))
        .select(*keep, result)
    )


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
    original_cols = df.columns
    df, lhs, lhs_col, el = _expand_multipart(df, lhs, lhs_idx)
    df, rhs, rhs_col, er = _expand_multipart(df, rhs, rhs_idx)
    lo, lx, ly = lhs.part_offsets, lhs.x, lhs.y
    ro, rx, ry = rhs.part_offsets, rhs.x, rhs.y

    def fn(pdf):
        pdf[result] = gk.pairwise_linestring_distance(
            pdf[lhs_col].to_numpy(), pdf[rhs_col].to_numpy(), lo, lx, ly, ro, rx, ry
        )
        return pdf

    out = _map_batches(df, fn, [StructField(result, DoubleType(), True)])
    return _min_reduce(out, original_cols, result) if (el or er) else out


def pairwise_point_polygon_distance(
    df: DataFrame,
    polygons: PolygonArrays | MultiPolygonArrays,
    x: str = "x",
    y: str = "y",
    polygon_idx: str = "polygon_index",
    result: str = "distance",
) -> DataFrame:
    original_cols = df.columns
    df, polygons, polygon_col, ep = _expand_multipart(df, polygons, polygon_idx)
    po, ro, px, py = polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y

    def fn(pdf):
        pdf[result] = gk.pairwise_point_polygon_distance(
            pdf[x].to_numpy(), pdf[y].to_numpy(),
            pdf[polygon_col].to_numpy(), po, ro, px, py,
        )
        return pdf

    out = _map_batches(df, fn, [StructField(result, DoubleType(), True)])
    return _min_reduce(out, original_cols, result) if ep else out


def pairwise_linestring_polygon_distance(
    df: DataFrame,
    linestrings: LinestringArrays | MultiLinestringArrays,
    polygons: PolygonArrays | MultiPolygonArrays,
    line_idx: str = "linestring_index",
    polygon_idx: str = "polygon_index",
    result: str = "distance",
) -> DataFrame:
    original_cols = df.columns
    df, linestrings, line_col, el = _expand_multipart(df, linestrings, line_idx)
    df, polygons, polygon_col, ep = _expand_multipart(df, polygons, polygon_idx)
    lo, lx, ly = linestrings.part_offsets, linestrings.x, linestrings.y
    po, ro, px, py = polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y

    def fn(pdf):
        pdf[result] = gk.pairwise_linestring_polygon_distance(
            pdf[line_col].to_numpy(), pdf[polygon_col].to_numpy(),
            lo, lx, ly, po, ro, px, py,
        )
        return pdf

    out = _map_batches(df, fn, [StructField(result, DoubleType(), True)])
    return _min_reduce(out, original_cols, result) if (el or ep) else out


def pairwise_polygon_distance(
    df: DataFrame,
    lhs: PolygonArrays | MultiPolygonArrays,
    rhs: PolygonArrays | MultiPolygonArrays,
    lhs_idx: str = "lhs_index",
    rhs_idx: str = "rhs_index",
    result: str = "distance",
) -> DataFrame:
    original_cols = df.columns
    df, lhs, lhs_col, el = _expand_multipart(df, lhs, lhs_idx)
    df, rhs, rhs_col, er = _expand_multipart(df, rhs, rhs_idx)

    def fn(pdf):
        pdf[result] = gk.pairwise_polygon_distance(
            pdf[lhs_col].to_numpy(), pdf[rhs_col].to_numpy(),
            lhs.part_offsets, lhs.ring_offsets, lhs.x, lhs.y,
            rhs.part_offsets, rhs.ring_offsets, rhs.x, rhs.y,
        )
        return pdf

    out = _map_batches(df, fn, [StructField(result, DoubleType(), True)])
    return _min_reduce(out, original_cols, result) if (el or er) else out


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
    original_cols = df.columns
    df, linestrings, line_col, el = _expand_multipart(df, linestrings, line_idx)
    mo, mx, my = mpoints.part_offsets, mpoints.x, mpoints.y
    lo, lx, ly = linestrings.part_offsets, linestrings.x, linestrings.y

    def fn(pdf):
        pdf[result] = gk.pairwise_multipoint_linestring_distance(
            pdf[mp_idx].to_numpy(), pdf[line_col].to_numpy(), mo, mx, my, lo, lx, ly
        )
        return pdf

    out = _map_batches(df, fn, [StructField(result, DoubleType(), True)])
    return _min_reduce(out, original_cols, result) if el else out


def pairwise_multipoint_polygon_distance(
    df: DataFrame,
    mpoints: MultipointArrays,
    polygons: PolygonArrays | MultiPolygonArrays,
    mp_idx: str = "multipoint_index",
    polygon_idx: str = "polygon_index",
    result: str = "distance",
) -> DataFrame:
    original_cols = df.columns
    df, polygons, polygon_col, ep = _expand_multipart(df, polygons, polygon_idx)
    mo, mx, my = mpoints.part_offsets, mpoints.x, mpoints.y
    po, ro, px, py = polygons.part_offsets, polygons.ring_offsets, polygons.x, polygons.y

    def fn(pdf):
        pdf[result] = gk.pairwise_multipoint_polygon_distance(
            pdf[mp_idx].to_numpy(), pdf[polygon_col].to_numpy(),
            mo, mx, my, po, ro, px, py,
        )
        return pdf

    out = _map_batches(df, fn, [StructField(result, DoubleType(), True)])
    return _min_reduce(out, original_cols, result) if ep else out


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
