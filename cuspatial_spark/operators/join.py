"""Spatial join operators (cuSpatial API parity layer).

- ``point_in_polygon``: brute-force points x (<=31) polygons, polygons
  broadcast, one vectorized Arrow-batched kernel call per batch
  (reference core/spatial/join.py:23-102; bitmask kernel
  cpp/include/cuspatial/point_in_polygon.cuh:42-102).
- ``join_quadtree_and_bounding_boxes`` / ``quadtree_point_in_polygon``
  / ``quadtree_point_to_nearest_linestring``: the quadtree join
  pipeline in partition-local parity mode — each input partition owns a
  quadtree built by ``quadtree_on_points`` and the refine runs inside
  the same ``mapInPandas`` pass (reference core/spatial/join.py:105-355).

For the distributed scale path (tile equi-join + vectorized refine)
see ``cuspatial_spark.plans.tile_join`` — that is the plan Catalyst can
broadcast/AQE-optimize; these parity operators exist to reproduce the
reference's exact output tables.
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

from ..geometry import LinestringArrays, PolygonArrays
from ..kernels import spatial_join as sj_kernels
from ..kernels.pip import point_in_polygon_bits
from ..kernels.quadtree import Quadtree
from ..kernels.quadtree import (
    join_quadtree_and_bounding_boxes as k_join_bboxes,
)
from ..kernels.quadtree import build_quadtree


def point_in_polygon(
    points: DataFrame,
    polygons: PolygonArrays,
    x: str = "x",
    y: str = "y",
    result_prefix: str = "in_polygon_",
) -> DataFrame:
    """Adds one boolean column per polygon (``{prefix}{id}``) to the
    points DataFrame.  Polygons must be single-ring-set (no
    multipolygons) and at most 31, like the reference kernel."""
    from ..geometry import require_single_part

    require_single_part(polygons, "point_in_polygon")
    if len(polygons) > 31:
        raise ValueError("point_in_polygon supports at most 31 polygons")
    poly_offsets = polygons.part_offsets
    ring_offsets = polygons.ring_offsets
    px, py = polygons.x, polygons.y
    ids = [int(i) for i in polygons.ids]

    out_fields = points.schema.fields + [
        StructField(f"{result_prefix}{pid}", BooleanType(), False) for pid in ids
    ]
    out_schema = StructType(out_fields)
    n_polys = len(ids)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bits = point_in_polygon_bits(
                pdf[x].to_numpy(), pdf[y].to_numpy(),
                poly_offsets, ring_offsets, px, py,
            )
            for j, pid in enumerate(ids):
                pdf[f"{result_prefix}{pid}"] = (bits >> j) & 1 > 0
            yield pdf

    return points.mapInPandas(compute, schema=out_schema)


QUADTREE_SCHEMA = StructType(
    [
        StructField("part_id", LongType(), False),
        StructField("key", LongType(), False),
        StructField("level", LongType(), False),
        StructField("is_internal_node", BooleanType(), False),
        StructField("length", LongType(), False),
        StructField("offset", LongType(), False),
    ]
)

PAIRS_SCHEMA = StructType(
    [
        StructField("part_id", LongType(), False),
        StructField("bbox_offset", LongType(), False),
        StructField("quad_offset", LongType(), False),
    ]
)

PIP_PAIRS_SCHEMA = StructType(
    [
        StructField("part_id", LongType(), False),
        StructField("polygon_index", LongType(), False),
        StructField("point_index", LongType(), False),
    ]
)

NEAREST_SCHEMA = StructType(
    [
        StructField("part_id", LongType(), False),
        StructField("point_index", LongType(), False),
        StructField("linestring_index", LongType(), False),
        StructField("distance", DoubleType(), False),
    ]
)


def _build_partition_quadtree(pdf: pd.DataFrame, x, y, params):
    return build_quadtree(
        pdf[x].to_numpy(), pdf[y].to_numpy(),
        params["x_min"], params["x_max"], params["y_min"], params["y_max"],
        params["scale"], params["max_depth"], params["max_size"],
    )


def join_quadtree_and_bounding_boxes(
    points: DataFrame,
    bboxes: np.ndarray | tuple,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    scale: float,
    max_depth: int,
    max_size: int,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Partition-local filter phase: per input partition, build the
    quadtree and BFS it against the (broadcast) bbox table.  Returns
    (part_id, bbox_offset, quad_offset)."""
    params = dict(x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
                  scale=scale, max_depth=max_depth, max_size=max_size)
    minx, miny, maxx, maxy = bboxes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            return
        _, qt = _build_partition_quadtree(pdf, x, y, params)
        bbox_off, quad_off = k_join_bboxes(
            qt, minx, miny, maxx, maxy,
            x_min, x_max, y_min, y_max, scale, max_depth,
        )
        part = int(pdf["part_id"].iloc[0]) if "part_id" in pdf else 0
        yield pd.DataFrame(
            {
                "part_id": np.full(len(bbox_off), part, dtype=np.int64),
                "bbox_offset": bbox_off.astype(np.int64),
                "quad_offset": quad_off.astype(np.int64),
            }
        )

    return points.mapInPandas(run, schema=PAIRS_SCHEMA)


def quadtree_point_in_polygon(
    points: DataFrame,
    polygons: PolygonArrays,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    scale: float,
    max_depth: int,
    max_size: int,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Full partition-local quadtree PIP pipeline (build + filter +
    refine in one mapInPandas pass).  Output (part_id, polygon_index,
    point_index) matches the reference ordering per partition
    (test_spatial_join.py:499-533)."""
    from ..geometry import require_single_part

    require_single_part(polygons, "quadtree_point_in_polygon")
    if (np.diff(polygons.part_offsets) > 1).any():
        raise ValueError("quadtree_point_in_polygon does not support multipolygons")
    params = dict(x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
                  scale=scale, max_depth=max_depth, max_size=max_size)
    minx, miny, maxx, maxy = polygons.bounding_boxes()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            return
        order, qt = _build_partition_quadtree(pdf, x, y, params)
        bbox_off, quad_off = k_join_bboxes(
            qt, minx, miny, maxx, maxy,
            x_min, x_max, y_min, y_max, scale, max_depth,
        )
        poly_idx, point_idx = sj_kernels.quadtree_point_in_polygon(
            bbox_off, quad_off, qt, order,
            pdf[x].to_numpy(), pdf[y].to_numpy(),
            polygons.part_offsets, polygons.ring_offsets,
            polygons.x, polygons.y,
        )
        part = int(pdf["part_id"].iloc[0]) if "part_id" in pdf else 0
        yield pd.DataFrame(
            {
                "part_id": np.full(len(poly_idx), part, dtype=np.int64),
                "polygon_index": poly_idx.astype(np.int64),
                "point_index": point_idx.astype(np.int64),
            }
        )

    return points.mapInPandas(run, schema=PIP_PAIRS_SCHEMA)


def quadtree_point_to_nearest_linestring(
    points: DataFrame,
    linestrings: LinestringArrays,
    expansion_radius: float,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    scale: float,
    max_depth: int,
    max_size: int,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Partition-local nearest-linestring pipeline; output matches
    test_spatial_join.py:593-910 per partition."""
    from ..geometry import require_single_part

    require_single_part(linestrings, "quadtree_point_to_nearest_linestring")
    params = dict(x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
                  scale=scale, max_depth=max_depth, max_size=max_size)
    minx, miny, maxx, maxy = linestrings.bounding_boxes(expansion_radius)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            return
        order, qt = _build_partition_quadtree(pdf, x, y, params)
        bbox_off, quad_off = k_join_bboxes(
            qt, minx, miny, maxx, maxy,
            x_min, x_max, y_min, y_max, scale, max_depth,
        )
        pt, ln, dist = sj_kernels.quadtree_point_to_nearest_linestring(
            bbox_off, quad_off, qt, order,
            pdf[x].to_numpy(), pdf[y].to_numpy(),
            linestrings.part_offsets, linestrings.x, linestrings.y,
        )
        part = int(pdf["part_id"].iloc[0]) if "part_id" in pdf else 0
        yield pd.DataFrame(
            {
                "part_id": np.full(len(pt), part, dtype=np.int64),
                "point_index": pt.astype(np.int64),
                "linestring_index": ln.astype(np.int64),
                "distance": dist.astype(np.float64),
            }
        )

    return points.mapInPandas(run, schema=NEAREST_SCHEMA)
