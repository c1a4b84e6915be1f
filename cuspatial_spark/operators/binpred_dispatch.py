"""GeoPandas-style binary-predicate dispatcher covering the
reference's implemented (predicate x lhs_type x rhs_type) matrix
(core/binpreds/binpred_dispatch.py:11-40 and each feature_*.py
DispatchDict), the binpred counterpart of operators/dispatch.distance.

Compositional design: rather than one bespoke implementation per cell,
the matrix is closed over a small set of primitives —

- ``intersects(a, b)``  := pairwise distance == 0 wherever no
  specialized predicate exists (exact: every distance kernel returns
  0.0 iff the features meet, boundary inclusive), via the full 4x4
  distance dispatcher.
- ``disjoint(a, b)``    := NOT intersects(a, b)  (basic_predicates.py
  _basic_intersects negation).
- ``within(a, b)``      := contains(b, a) with sides swapped
  (feature_within.py delegates the same way).
- ``covers``            := boundary-inclusive containment variants.
- point/multipoint boundary predicates, linestring interval coverage,
  and polygon flag compositions live in operators/binpreds.py.

Column conventions (same as dispatch.distance): point coords are
``x``/``y`` (``x2``/``y2`` for the rhs when both sides are points);
layer-backed sides are referenced by index columns, defaulting to
``lhs_index``/``rhs_index``.  All predicates append a boolean
``result`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import binpreds as bp
from .dispatch import LINESTRING, MULTIPOINT, POINT, POLYGON
from .dispatch import distance as _distance
from .intersection import (
    linestring_overlaps_linestring,
    linestring_touches_linestring,
)

PREDICATES = (
    "intersects",
    "disjoint",
    "within",
    "contains",
    "contains_properly",
    "covers",
    "crosses",
    "touches",
    "overlaps",
    "geom_equals",
)


def _const(df: DataFrame, result: str, value: bool) -> DataFrame:
    """Predicate that is identically false/true for the combo (the
    reference's ImpossiblePredicate)."""
    return df.withColumn(result, F.lit(value))


def _negate(df: DataFrame, result: str) -> DataFrame:
    return df.withColumn(result, ~F.col(result))


def _swap_idx(kw: dict) -> dict:
    """Swap the lhs_idx/rhs_idx column kwargs for same-kind symmetric
    delegation (within(a, b) -> contains(b, a): the delegate's lhs
    index column is the caller's rhs one)."""
    out = dict(kw)
    a = out.pop("lhs_idx", "lhs_index")
    b = out.pop("rhs_idx", "rhs_index")
    out["lhs_idx"], out["rhs_idx"] = b, a
    return out


def binpred(
    df: DataFrame,
    predicate: str,
    lhs_kind: str,
    rhs_kind: str,
    lhs_layer=None,
    rhs_layer=None,
    result: str = "result",
    **kw,
) -> DataFrame:
    """Row i: predicate(lhs feature i, rhs feature i) as a boolean
    column.  Layers are the broadcast geometry containers for
    non-point kinds; point sides read coords from the DataFrame."""
    pair = (lhs_kind, rhs_kind)
    p = predicate

    from ..geometry import MultiLinestringArrays, MultiPolygonArrays

    if isinstance(lhs_layer, (MultiLinestringArrays, MultiPolygonArrays)) or isinstance(
        rhs_layer, (MultiLinestringArrays, MultiPolygonArrays)
    ):
        # multi-part layers: the distance dispatcher handles them
        # (min over parts), so the distance-closure predicates work;
        # the specialized single-part predicates do not
        if p == "intersects":
            out = _distance(df, lhs_kind, rhs_kind, lhs_layer, rhs_layer, **kw)
            return out.withColumn(result, F.col("distance") == 0.0).drop("distance")
        if p == "disjoint":
            out = _distance(df, lhs_kind, rhs_kind, lhs_layer, rhs_layer, **kw)
            return out.withColumn(result, F.col("distance") != 0.0).drop("distance")
        raise NotImplementedError(
            f"{p} over multi-part geometry layers is not supported "
            "(intersects/disjoint are, via the distance closure)"
        )

    if p == "disjoint":
        out = binpred(
            df, "intersects", lhs_kind, rhs_kind, lhs_layer, rhs_layer,
            result=result, **kw,
        )
        return _negate(out, result)

    if p == "intersects":
        if pair == (POINT, POINT):
            return bp.point_intersects_point(df, result=result, **kw)
        if pair == (POLYGON, POINT):
            return bp.polygon_intersects_point(df, lhs_layer, result=result, **kw)
        if pair == (POINT, POLYGON):
            return bp.polygon_intersects_point(df, rhs_layer, result=result, **kw)
        if pair == (POINT, LINESTRING):
            return bp.point_intersects_linestring(df, rhs_layer, result=result, **kw)
        if pair == (LINESTRING, POINT):
            return bp.point_intersects_linestring(df, lhs_layer, result=result, **kw)
        if pair == (LINESTRING, LINESTRING):
            return bp.linestring_intersects_linestring(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, POLYGON):
            return bp.polygon_intersects_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        # every remaining combo (all multipoint rows, ls<->poly):
        # distance == 0, exact and boundary-inclusive
        out = _distance(df, lhs_kind, rhs_kind, lhs_layer, rhs_layer, **kw)
        return out.withColumn(result, F.col("distance") == 0.0).drop("distance")

    if p == "within":
        # within(a, b) == contains(b, a); delegation is explicit per
        # pair because the underlying impls use kind-specific index
        # column kwargs (feature_within.py delegates identically)
        if pair == (POINT, LINESTRING):
            return bp.point_on_linestring(
                df, rhs_layer, result=result, interior_only=True, **kw
            )
        if pair == (POINT, POINT):
            return bp.point_intersects_point(df, result=result, **kw)
        if pair == (POINT, POLYGON):
            return bp.point_within_polygon(df, rhs_layer, result=result, **kw)
        if pair == (POINT, MULTIPOINT):
            # membership in a discrete set == zero min distance
            out = _distance(df, lhs_kind, rhs_kind, lhs_layer, rhs_layer, **kw)
            return out.withColumn(result, F.col("distance") == 0.0).drop("distance")
        if pair == (MULTIPOINT, POLYGON):
            return bp.polygon_contains_multipoint(
                df, rhs_layer, lhs_layer, result=result, **kw
            )
        if pair == (MULTIPOINT, LINESTRING):
            return bp.multipoint_on_linestring(
                df, lhs_layer, rhs_layer, result=result, mode="all", **kw
            )
        if pair == (MULTIPOINT, MULTIPOINT):
            return bp.multipoint_within_multipoint(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (LINESTRING, POLYGON):
            return bp.linestring_within_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (LINESTRING, LINESTRING):
            return bp.linestring_covers_linestring(
                df, rhs_layer, lhs_layer, result=result, **_swap_idx(kw)
            )
        if pair == (POLYGON, POLYGON):
            return bp.polygon_contains_polygon(
                df, rhs_layer, lhs_layer, result=result, **_swap_idx(kw)
            )
        if pair == (MULTIPOINT, POINT):
            # a 0-dim set is within a point only by collapsing onto it
            return bp.multipoint_equals_point(df, lhs_layer, result=result, **kw)
        if lhs_kind == POLYGON or pair in ((LINESTRING, POINT), (LINESTRING, MULTIPOINT)):
            # a feature is never within one of lower dimension
            # (feature_within.py (LineString, Point): ImpossiblePredicate).
            # (LINESTRING, MULTIPOINT) is a deliberate shapely-semantics
            # deviation: the reference maps that cell to
            # WithinIntersectsPredicate (feature_within.py:71), so it
            # answers True whenever the chain touches any member point —
            # shapely/GeoPandas (and our GEOS-backed oracles) say a 1-dim
            # feature is never within a 0-dim set.  Same policy as the
            # documented overlaps deviations.
            return _const(df, result, False)
        raise NotImplementedError(f"within not implemented for {pair}")

    if p == "contains":
        if pair == (POINT, POINT):
            out = bp.point_intersects_point(df, result=result, **kw)
            return out
        if pair == (POLYGON, POINT):
            return bp.polygon_contains_point(df, lhs_layer, result=result, **kw)
        if pair == (POLYGON, MULTIPOINT):
            return bp.polygon_contains_multipoint(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, LINESTRING):
            return bp.linestring_within_polygon(
                df, rhs_layer, lhs_layer, result=result, **kw
            )
        if pair == (POLYGON, POLYGON):
            return bp.polygon_contains_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (LINESTRING, POINT):
            return bp.point_on_linestring(
                df, lhs_layer, result=result, interior_only=True, **kw
            )
        if pair == (LINESTRING, LINESTRING):
            return bp.linestring_covers_linestring(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (MULTIPOINT, POINT):
            # interior of a multipoint IS its points: contains == membership
            return bp.multipoint_covers_point(df, lhs_layer, result=result, **kw)
        if pair == (MULTIPOINT, MULTIPOINT):
            # rhs point set is a subset of the lhs point set
            return bp.multipoint_within_multipoint(
                df, rhs_layer, lhs_layer, result=result, **_swap_idx(kw)
            )
        if pair == (LINESTRING, MULTIPOINT):
            # all rhs points on the chain, at least one on its interior
            return bp.multipoint_on_linestring(
                df, rhs_layer, lhs_layer, result=result, mode="contains", **kw
            )
        # remaining combos are reference-impossible: a feature never
        # contains one of higher dimension, and a point contains only
        # points (feature_contains.py (Point, MultiPoint)/(Point,
        # LineString)/(Point, Polygon)/(LineString, Polygon):
        # ImpossiblePredicate); multipoint lhs vs 1-D/2-D rhs likewise
        return _const(df, result, False)

    if p == "contains_properly":
        if pair == (POLYGON, POINT):
            return bp.polygon_contains_properly_point(
                df, lhs_layer, result=result, **kw
            )
        if pair == (POINT, POINT):
            # proper containment of a point by a point == equality
            # (feature_contains_properly.py ContainsProperlyByIntersection)
            return bp.point_intersects_point(df, result=result, **kw)
        if pair == (LINESTRING, POINT):
            return bp.point_on_linestring(
                df, lhs_layer, result=result, interior_only=True, **kw
            )
        if pair == (POLYGON, MULTIPOINT):
            return bp.polygon_contains_properly_multipoint(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, LINESTRING):
            return bp.polygon_contains_properly_linestring(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, POLYGON):
            return bp.polygon_contains_properly_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POINT, MULTIPOINT):
            # reference ContainsProperlyByIntersection: intersection test
            # (feature_contains_properly.py:176-185,198)
            out = _distance(df, lhs_kind, rhs_kind, lhs_layer, rhs_layer, **kw)
            return out.withColumn(result, F.col("distance") == 0.0).drop("distance")
        if pair == (MULTIPOINT, POINT):
            # interior of a multipoint IS its points: membership
            return bp.multipoint_covers_point(df, lhs_layer, result=result, **kw)
        if pair == (MULTIPOINT, MULTIPOINT):
            return bp.multipoint_within_multipoint(
                df, rhs_layer, lhs_layer, result=result, **_swap_idx(kw)
            )
        if pair == (LINESTRING, MULTIPOINT):
            # every rhs point strictly inside the chain (not an endpoint)
            return bp.multipoint_on_linestring(
                df, rhs_layer, lhs_layer, result=result, mode="all_interior", **kw
            )
        if pair == (LINESTRING, LINESTRING):
            # reference LineStringLineStringContainsProperly is
            # equals-based (_basic_equals_all,
            # feature_contains_properly.py:188-191)
            return bp.linestring_geom_equals(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        # remaining combos are impossible: a feature never properly
        # contains one of higher dimension (feature_contains_properly.py
        # (Point, LineString)/(Point, Polygon)/(LineString, Polygon):
        # ImpossiblePredicate); multipoint lhs vs 1-D/2-D rhs likewise
        return _const(df, result, False)

    if p == "covers":
        if pair == (POINT, POINT):
            return bp.point_intersects_point(df, result=result, **kw)
        if pair == (MULTIPOINT, POINT):
            return bp.multipoint_covers_point(df, lhs_layer, result=result, **kw)
        if pair == (MULTIPOINT, MULTIPOINT):
            # covers(a, b): every b point is an a point (subset swap)
            return bp.multipoint_within_multipoint(
                df, rhs_layer, lhs_layer, result=result, **_swap_idx(kw)
            )
        if pair == (POLYGON, POINT):
            return bp.polygon_covers_point(df, lhs_layer, result=result, **kw)
        if pair == (POLYGON, MULTIPOINT):
            return bp.polygon_contains_multipoint(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, LINESTRING):
            return bp.linestring_within_polygon(
                df, rhs_layer, lhs_layer, result=result, **kw
            )
        if pair == (POLYGON, POLYGON):
            return bp.polygon_contains_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (LINESTRING, POINT):
            return bp.point_on_linestring(df, lhs_layer, result=result, **kw)
        if pair == (LINESTRING, MULTIPOINT):
            return bp.multipoint_on_linestring(
                df, rhs_layer, lhs_layer, result=result, mode="all", **kw
            )
        if pair == (LINESTRING, LINESTRING):
            return bp.linestring_covers_linestring(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POINT, MULTIPOINT):
            # a point covers a multipoint only if every member equals it
            return bp.multipoint_equals_point(df, rhs_layer, result=result, **kw)
        # remaining combos are impossible: a feature never covers one
        # of higher dimension (feature_covers.py (Point, LineString)/
        # (Point, Polygon)/(LineString, Polygon)->CoversPredicateBase
        # False shapes); multipoint lhs vs 1-D/2-D rhs likewise
        return _const(df, result, False)

    if p == "crosses":
        if pair == (LINESTRING, LINESTRING):
            return bp.linestring_crosses_linestring(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (LINESTRING, POLYGON):
            return bp.linestring_crosses_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, LINESTRING):
            return bp.linestring_crosses_polygon(
                df, rhs_layer, lhs_layer, result=result, **kw
            )
        if POINT in pair or pair == (POLYGON, POLYGON) or MULTIPOINT in pair:
            # dim(intersection) < min(dim) is unsatisfiable for these
            # (feature_crosses.py CrossesPredicateBase / PointPointCrosses)
            return _const(df, result, False)
        raise NotImplementedError(f"crosses not implemented for {pair}")

    if p == "touches":
        if pair == (POINT, POLYGON):
            return bp.point_touches_polygon(df, rhs_layer, result=result, **kw)
        if pair == (POLYGON, POINT):
            return bp.point_touches_polygon(df, lhs_layer, result=result, **kw)
        if pair == (MULTIPOINT, POLYGON):
            return bp.multipoint_touches_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, MULTIPOINT):
            return bp.multipoint_touches_polygon(
                df, rhs_layer, lhs_layer, result=result, **kw
            )
        if pair in ((POINT, LINESTRING), (LINESTRING, POINT)):
            # point coincides with a chain endpoint: on the linestring
            # but not on its interior
            lines = rhs_layer if pair == (POINT, LINESTRING) else lhs_layer
            out = bp.point_on_linestring(df, lines, result="__on", **kw)
            out = bp.point_on_linestring(
                out, lines, result="__int", interior_only=True, **kw
            )
            return out.withColumn(
                result, F.col("__on") & ~F.col("__int")
            ).drop("__on", "__int")
        if pair == (LINESTRING, LINESTRING):
            return linestring_touches_linestring(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (LINESTRING, POLYGON):
            return bp.linestring_touches_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, LINESTRING):
            return bp.linestring_touches_polygon(
                df, rhs_layer, lhs_layer, result=result, **kw
            )
        if pair == (POLYGON, POLYGON):
            return bp.polygon_touches_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (MULTIPOINT, LINESTRING):
            return bp.multipoint_on_linestring(
                df, lhs_layer, rhs_layer, result=result, mode="touches", **kw
            )
        if pair == (LINESTRING, MULTIPOINT):
            return bp.multipoint_on_linestring(
                df, rhs_layer, lhs_layer, result=result, mode="touches", **kw
            )
        if pair in ((POINT, POINT), (POINT, MULTIPOINT), (MULTIPOINT, POINT),
                    (MULTIPOINT, MULTIPOINT)):
            # 0-dim features have empty boundaries: touches is
            # unsatisfiable (interiors are the points themselves)
            return _const(df, result, False)
        raise NotImplementedError(f"touches not implemented for {pair}")

    if p == "overlaps":
        if pair == (LINESTRING, LINESTRING):
            return linestring_overlaps_linestring(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, POLYGON):
            return bp.polygon_overlaps_polygon(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (MULTIPOINT, MULTIPOINT):
            return bp.multipoint_overlaps_multipoint(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        # every remaining combo mixes dimensions (or is a bare point):
        # the equal-dimension requirement fails (feature_overlaps.py
        # OverlapsPredicateBase / ImpossiblePredicate -> False)
        return _const(df, result, False)

    if p == "geom_equals":
        if pair == (POINT, POINT):
            return bp.point_intersects_point(df, result=result, **kw)
        if pair == (MULTIPOINT, MULTIPOINT):
            return bp.multipoint_geom_equals(
                df,
                lhs_layer.part_offsets, lhs_layer.x, lhs_layer.y,
                rhs_layer.part_offsets, rhs_layer.x, rhs_layer.y,
                result=result, **kw,
            )
        if pair == (LINESTRING, LINESTRING):
            return bp.linestring_geom_equals(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if pair == (POLYGON, POLYGON):
            return bp.polygon_geom_equals(
                df, lhs_layer, rhs_layer, result=result, **kw
            )
        if lhs_kind != rhs_kind:
            # mixed types are never geometrically equal here
            return _const(df, result, False)
        raise NotImplementedError(f"geom_equals not implemented for {pair}")

    raise NotImplementedError(f"unknown predicate {predicate!r}")
