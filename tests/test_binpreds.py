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


class TestPolygonPolygonPreds:
    @pytest.fixture(scope="class")
    def layers(self):
        # 0: unit square; 1: inner square; 2: far square; 3: overlapping square
        return PolygonArrays(
            [0, 1, 2, 3, 4], [0, 5, 10, 15, 20],
            [0.0, 1.0, 1.0, 0.0, 0.0,
             0.25, 0.75, 0.75, 0.25, 0.25,
             2.0, 3.0, 3.0, 2.0, 2.0,
             0.5, 1.5, 1.5, 0.5, 0.5],
            [0.0, 0.0, 1.0, 1.0, 0.0,
             0.25, 0.25, 0.75, 0.75, 0.25,
             2.0, 2.0, 3.0, 3.0, 2.0,
             0.5, 0.5, 1.5, 1.5, 0.5],
        )

    def test_polygon_polygon_intersects_disjoint_contains(self, spark, layers):
        df = spark.createDataFrame(
            pd.DataFrame({"id": [0, 1, 2], "lhs_index": [0, 0, 0], "rhs_index": [1, 2, 3]})
        )
        gi = bp.polygon_intersects_polygon(df, layers, layers).orderBy("id").toPandas()
        gd = bp.polygon_disjoint_polygon(df, layers, layers).orderBy("id").toPandas()
        gc = bp.polygon_contains_polygon(df, layers, layers).orderBy("id").toPandas()
        assert list(gi["intersects"]) == [True, False, True]  # contained / far / overlap
        assert list(gd["disjoint"]) == [False, True, False]
        assert list(gc["contains"]) == [True, False, False]


class TestPointLinestringPreds:
    def test_point_on_linestring(self, spark):
        lines = LinestringArrays([0, 3], [0.0, 1.0, 1.0], [0.0, 0.0, 1.0])
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "id": [0, 1, 2, 3],
                    "x": [0.5, 0.0, 1.0, 0.5],
                    "y": [0.0, 0.0, 0.5, 0.1],
                    "linestring_index": [0, 0, 0, 0],
                }
            )
        )
        gi = bp.point_intersects_linestring(df, lines).orderBy("id").toPandas()
        gd = bp.point_disjoint_linestring(df, lines).orderBy("id").toPandas()
        # mid-segment, start vertex, mid of 2nd segment, off-line
        assert list(gi["intersects"]) == [True, True, True, False]
        assert list(gd["disjoint"]) == [False, False, False, True]

    def test_point_intersects_point(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"id": [0, 1], "x": [1.0, 1.0], "y": [2.0, 2.0],
                          "x2": [1.0, 1.0], "y2": [2.0, 2.5]})
        )
        got = bp.point_intersects_point(df).orderBy("id").toPandas()
        assert list(got["intersects"]) == [True, False]


class TestLinestringPolygonPreds:
    def test_within_and_crosses(self, spark, square):
        lines = LinestringArrays(
            [0, 2, 4, 6, 8],
            [0.2, 0.8, 0.5, 1.5, 2.0, 3.0, 0.0, 1.0],
            [0.2, 0.8, 0.5, 0.5, 2.0, 3.0, 0.0, 0.0],
        )
        # 0: fully inside; 1: pokes out (crosses); 2: outside; 3: along boundary edge
        df = spark.createDataFrame(
            pd.DataFrame(
                {"id": [0, 1, 2, 3], "linestring_index": [0, 1, 2, 3],
                 "polygon_index": [0, 0, 0, 0]}
            )
        )
        gw = bp.linestring_within_polygon(df, lines, square).orderBy("id").toPandas()
        gc = bp.linestring_crosses_polygon(df, lines, square).orderBy("id").toPandas()
        assert list(gw["within"]) == [True, False, False, True]
        assert list(gc["crosses"]) == [False, True, False, False]


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


class TestUniquePairMap:
    def test_inverse_mapping_and_call_count(self):
        import pandas as pd
        from cuspatial_spark.operators.binpreds import _unique_pair_map

        pdf = pd.DataFrame(
            {"lhs_index": [0, 1, 0, 1, 0], "rhs_index": [0, 0, 1, 0, 0]}
        )
        calls = []

        def fn(a, b):
            calls.append((a, b))
            return (a + b) % 2 == 0

        out = _unique_pair_map(pdf, "lhs_index", "rhs_index", fn)
        # one closure call per DISTINCT pair, rows broadcast via inverse
        assert sorted(calls) == [(0, 0), (0, 1), (1, 0)]
        assert list(out) == [True, False, False, False, True]

    def test_layer_size_guard(self):
        import numpy as np
        import pandas as pd
        import pytest
        from cuspatial_spark.operators import binpreds

        n = binpreds._MAX_UNIQUE_PAIRS_PER_BATCH + 1
        pdf = pd.DataFrame(
            {"lhs_index": np.arange(n), "rhs_index": np.arange(n)}
        )
        with pytest.raises(RuntimeError, match="broadcast-layer bound"):
            binpreds._unique_pair_map(
                pdf, "lhs_index", "rhs_index", lambda a, b: True
            )


class TestClosedChainBoundary:
    def test_within_at_closure_vertex(self, spark):
        """A closed chain (start == end) has an EMPTY topological
        boundary, so within(pt, ls) at the closure vertex is True
        (round-2 advice fix)."""
        import pandas as pd
        from cuspatial_spark.geometry import LinestringArrays

        ring = LinestringArrays([0, 5], [0.0, 2.0, 2.0, 0.0, 0.0],
                                [0.0, 0.0, 2.0, 2.0, 0.0])
        open_chain = LinestringArrays([0, 2], [0.0, 2.0], [0.0, 0.0])
        df = spark.createDataFrame(pd.DataFrame(
            {"id": [0, 1], "x": [0.0, 1.0], "y": [0.0, 0.0],
             "linestring_index": [0, 0]}))
        on_ring = bp.point_on_linestring(
            df, ring, interior_only=True).orderBy("id").toPandas()
        assert list(on_ring["on"]) == [True, True]
        on_open = bp.point_on_linestring(
            df, open_chain, interior_only=True).orderBy("id").toPandas()
        assert list(on_open["on"]) == [False, True]


class TestBoundarySplitProbes:
    def test_edge_split_at_crossings(self):
        import numpy as np
        from cuspatial_spark.operators.binpreds import _boundary_split_probes

        # one edge (0,0)->(4,0) vs a narrow square boundary cutting it
        # at x=2.2 and 2.3: probes must land in all three sub-intervals
        bx0 = np.array([2.2, 2.3, 2.3, 2.2])
        by0 = np.array([-1.0, -1.0, 1.0, 1.0])
        bx1 = np.array([2.3, 2.3, 2.2, 2.2])
        by1 = np.array([-1.0, 1.0, 1.0, -1.0])
        xs, ys = _boundary_split_probes(
            np.array([0.0]), np.array([0.0]), np.array([4.0]), np.array([0.0]),
            bx0, by0, bx1, by1,
        )
        assert (ys == 0.0).all()
        xs = np.sort(xs)
        assert len(xs) == 3
        assert xs[0] < 2.2 and 2.2 < xs[1] < 2.3 and xs[2] > 2.3
        # the interior sub-interval midpoint is NOT at a quartile —
        # the old t=1/4,1/2,3/4 sampling missed this pocket
        assert not np.isclose(xs[1] / 4.0, [0.25, 0.5, 0.75]).any()

    def test_collinear_overlap_params(self):
        import numpy as np
        from cuspatial_spark.operators.binpreds import _boundary_split_probes

        # boundary edge collinear with a sub-interval [1, 3] of the edge
        xs, ys = _boundary_split_probes(
            np.array([0.0]), np.array([0.0]), np.array([4.0]), np.array([0.0]),
            np.array([1.0]), np.array([0.0]), np.array([3.0]), np.array([0.0]),
        )
        xs = np.sort(xs)
        assert len(xs) == 3 and xs[0] < 1.0 and 1.0 < xs[1] < 3.0 and xs[2] > 3.0
