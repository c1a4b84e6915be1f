"""GeoPandas-style distance dispatcher (#19).

Mirrors GeoSeries.distance's type-pair dispatch
(reference core/geoseries.py:1400-1476 +
core/binops/distance_dispatch.py:43-140): select the pairwise distance
operator from the (lhs_kind, rhs_kind) geometry types, with the same
symmetric-swap behavior for combos implemented in one direction only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import pairwise as pw
from .distance import pairwise_point_distance

POINT, MULTIPOINT, LINESTRING, POLYGON = (
    "point",
    "multipoint",
    "linestring",
    "polygon",
)


def distance(
    df: DataFrame,
    lhs_kind: str,
    rhs_kind: str,
    lhs_layer=None,
    rhs_layer=None,
    **kw,
) -> DataFrame:
    """Row i: distance between lhs feature i and rhs feature i.

    Column conventions per kind:
    - point:       x/y (lhs) or x2/y2 (rhs when both are points)
    - linestring:  lhs_index / rhs_index / linestring_index
    - polygon:     lhs_index / rhs_index / polygon_index

    Layers are the broadcast geometry containers for non-point kinds.
    """
    pair = (lhs_kind, rhs_kind)
    if pair == (POINT, POINT):
        return pairwise_point_distance(df, "x", "y", "x2", "y2", **kw)
    if pair == (POINT, LINESTRING):
        from .distance import pairwise_point_linestring_distance

        return pairwise_point_linestring_distance(df, rhs_layer, **kw)
    if pair == (LINESTRING, POINT):
        from .distance import pairwise_point_linestring_distance

        return pairwise_point_linestring_distance(df, lhs_layer, **kw)
    if pair == (POINT, POLYGON):
        return pw.pairwise_point_polygon_distance(df, rhs_layer, **kw)
    if pair == (POLYGON, POINT):
        return pw.pairwise_point_polygon_distance(df, lhs_layer, **kw)
    if pair == (LINESTRING, LINESTRING):
        return pw.pairwise_linestring_distance(df, lhs_layer, rhs_layer, **kw)
    if pair == (LINESTRING, POLYGON):
        return pw.pairwise_linestring_polygon_distance(df, lhs_layer, rhs_layer, **kw)
    if pair == (POLYGON, LINESTRING):
        return pw.pairwise_linestring_polygon_distance(df, rhs_layer, lhs_layer, **kw)
    if pair == (POLYGON, POLYGON):
        return pw.pairwise_polygon_distance(df, lhs_layer, rhs_layer, **kw)
    # multipoint rows mirror the reference's CollectionType.MULTI
    # dispatch entries (distance_dispatch.py:49-124)
    if pair == (MULTIPOINT, MULTIPOINT):
        return pw.pairwise_multipoint_distance(df, lhs_layer, rhs_layer, **kw)
    if pair == (POINT, MULTIPOINT):
        return pw.pairwise_point_multipoint_distance(df, rhs_layer, **kw)
    if pair == (MULTIPOINT, POINT):
        return pw.pairwise_point_multipoint_distance(df, lhs_layer, **kw)
    if pair == (MULTIPOINT, LINESTRING):
        return pw.pairwise_multipoint_linestring_distance(df, lhs_layer, rhs_layer, **kw)
    if pair == (LINESTRING, MULTIPOINT):
        return pw.pairwise_multipoint_linestring_distance(df, rhs_layer, lhs_layer, **kw)
    if pair == (MULTIPOINT, POLYGON):
        return pw.pairwise_multipoint_polygon_distance(df, lhs_layer, rhs_layer, **kw)
    if pair == (POLYGON, MULTIPOINT):
        return pw.pairwise_multipoint_polygon_distance(df, rhs_layer, lhs_layer, **kw)
    raise NotImplementedError(f"distance not implemented for {pair}")
