"""Binary predicate tests — edge/interior/exterior cases per the
reference semantics (contains_properly excludes boundary; contains /
covers / intersects include it)."""

import numpy as np
import pandas as pd
import pytest

from cuspatial_spark.geometry import LinestringArrays, PolygonArrays
from cuspatial_spark.operators import binpreds as bp


@pytest.fixture(scope="module")
def square():
    return PolygonArrays(
        [0, 1], [0, 5],
        [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0],
    )


@pytest.fixture(scope="module")
def point_cases(spark):
    # interior, boundary-edge, vertex, exterior
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [0, 1, 2, 3],
                "x": [0.5, 0.5, 0.0, 2.0],
                "y": [0.5, 0.0, 0.0, 2.0],
                "polygon_index": [0, 0, 0, 0],
            }
        )
    ).cache()


class TestPolygonPointPreds:
    def test_contains_properly_excludes_boundary(self, spark, square, point_cases):
        got = bp.polygon_contains_properly_point(point_cases, square).orderBy("id").toPandas()
        assert list(got["contains_properly"]) == [True, False, False, False]

    def test_contains_includes_boundary(self, spark, square, point_cases):
        got = bp.polygon_contains_point(point_cases, square).orderBy("id").toPandas()
        assert list(got["contains"]) == [True, True, True, False]

    def test_covers(self, spark, square, point_cases):
        got = bp.polygon_covers_point(point_cases, square).orderBy("id").toPandas()
        assert list(got["covers"]) == [True, True, True, False]

    def test_intersects_and_disjoint(self, spark, square, point_cases):
        gi = bp.polygon_intersects_point(point_cases, square).orderBy("id").toPandas()
        gd = bp.polygon_disjoint_point(point_cases, square).orderBy("id").toPandas()
        assert list(gi["intersects"]) == [True, True, True, False]
        assert list(gd["disjoint"]) == [False, False, False, True]
        assert (gi["intersects"] ^ gd["disjoint"]).all()

    def test_within_reverse(self, spark, square, point_cases):
        got = bp.point_within_polygon(point_cases, square).orderBy("id").toPandas()
        assert list(got["within"]) == [True, False, False, False]


class TestLinestringPreds:
    def test_intersects_and_crosses(self, spark):
        lhs = LinestringArrays([0, 2, 4, 6],
                               [0.0, 2.0, 0.0, 1.0, 0.0, 1.0],
                               [0.0, 2.0, 0.0, 0.0, 0.0, 0.0])
        rhs = LinestringArrays([0, 2, 4, 6],
                               [0.0, 2.0, 1.0, 2.0, 5.0, 6.0],
                               [2.0, 0.0, 0.0, 0.0, 5.0, 5.0])
        df = spark.createDataFrame(
            pd.DataFrame({"id": [0, 1, 2], "lhs_index": [0, 1, 2], "rhs_index": [0, 1, 2]})
        )
        gi = bp.linestring_intersects_linestring(df, lhs, rhs).orderBy("id").toPandas()
        gc = bp.linestring_crosses_linestring(df, lhs, rhs).orderBy("id").toPandas()
        # pair 0: X crossing -> intersects + crosses
        # pair 1: touching end-to-end (collinear continuation) -> intersects, not crosses
        # pair 2: far apart -> neither
        assert list(gi["intersects"]) == [True, True, False]
        assert list(gc["crosses"]) == [True, False, False]


class TestEquals:
    def test_multipoint_geom_equals(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"id": [0, 1], "lhs_index": [0, 0], "rhs_index": [0, 1]})
        )
        got = bp.multipoint_geom_equals(
            df,
            [0, 2], [0.0, 1.0], [0.0, 1.0],           # lhs: {(0,0),(1,1)}
            [0, 2, 4], [1.0, 0.0, 0.0, 5.0], [1.0, 0.0, 0.0, 5.0],  # rhs0 same set reordered; rhs1 differs
        ).orderBy("id").toPandas()
        assert list(got["geom_equals"]) == [True, False]
