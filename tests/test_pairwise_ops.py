"""Pairwise distance / nearest / equals operators — analytic goldens
(shapely is unavailable in this environment, so cases are chosen to
have exact hand-computable answers) + kernel-level invariants."""

import numpy as np
import pandas as pd
import pytest

from cuspatial_spark.geometry import LinestringArrays, PolygonArrays
from cuspatial_spark.kernels import geom_distance as gk


def _lines(coords_list):
    xy, offsets = [], [0]
    for coords in coords_list:
        for c in coords:
            xy.extend(c)
        offsets.append(offsets[-1] + len(coords))
    arr = np.asarray(xy, dtype=np.float64)
    return LinestringArrays(np.asarray(offsets), arr[::2].copy(), arr[1::2].copy())


def _polys(rings_list):
    """rings_list: list of polygons, each a list of rings (closed)."""
    xy, ring_offsets, part_offsets = [], [0], [0]
    for rings in rings_list:
        for ring in rings:
            for c in ring:
                xy.extend(c)
            ring_offsets.append(ring_offsets[-1] + len(ring))
        part_offsets.append(part_offsets[-1] + len(rings))
    arr = np.asarray(xy, dtype=np.float64)
    return PolygonArrays(
        np.asarray(part_offsets), np.asarray(ring_offsets),
        arr[::2].copy(), arr[1::2].copy(),
    )


UNIT_SQ = [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]


class TestLinestringDistanceKernel:
    def test_parallel_lines(self):
        ls = _lines([[(0, 0), (1, 1)], [(0, 1), (1, 2)]])
        d = gk.pairwise_linestring_distance(
            [0], [1], ls.part_offsets, ls.x, ls.y, ls.part_offsets, ls.x, ls.y
        )
        np.testing.assert_allclose(d, [np.sqrt(2) / 2])

    def test_collinear_gap(self):
        # reference one-pair fixture: (0,0)-(1,1) vs (2,2)-(3,3): gap sqrt(2)
        a = _lines([[(0, 0), (1, 1)]])
        b = _lines([[(2, 2), (3, 3)]])
        d = gk.pairwise_linestring_distance(
            [0], [0], a.part_offsets, a.x, a.y, b.part_offsets, b.x, b.y
        )
        np.testing.assert_allclose(d, [np.sqrt(2.0)])

    def test_crossing_is_zero(self):
        a = _lines([[(0, 0), (2, 2)]])
        b = _lines([[(0, 2), (2, 0)]])
        d = gk.pairwise_linestring_distance(
            [0], [0], a.part_offsets, a.x, a.y, b.part_offsets, b.x, b.y
        )
        np.testing.assert_allclose(d, [0.0])

    def test_symmetry(self):
        rng = np.random.default_rng(11)
        a = _lines([list(map(tuple, rng.uniform(0, 4, (5, 2)))) for _ in range(20)])
        b = _lines([list(map(tuple, rng.uniform(0, 4, (5, 2)))) for _ in range(20)])
        idx = np.arange(20)
        d1 = gk.pairwise_linestring_distance(idx, idx, a.part_offsets, a.x, a.y, b.part_offsets, b.x, b.y)
        d2 = gk.pairwise_linestring_distance(idx, idx, b.part_offsets, b.x, b.y, a.part_offsets, a.x, a.y)
        np.testing.assert_allclose(d1, d2)


class TestPointPolygonDistanceKernel:
    def test_inside_outside_edge(self):
        poly = _polys([UNIT_SQ])
        d = gk.pairwise_point_polygon_distance(
            [0.5, 2.0, 0.5, -3.0], [0.5, 0.5, 2.0, -4.0],
            [0, 0, 0, 0], poly.part_offsets, poly.ring_offsets, poly.x, poly.y,
        )
        np.testing.assert_allclose(d, [0.0, 1.0, 1.0, 5.0])

    def test_hole(self):
        donut = _polys([
            [
                [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                [(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)],
            ]
        ])
        d = gk.pairwise_point_polygon_distance(
            [2.0, 0.5], [2.0, 0.5], [0, 0],
            donut.part_offsets, donut.ring_offsets, donut.x, donut.y,
        )
        # center of the hole: outside the polygon, 1.0 from the inner ring
        np.testing.assert_allclose(d, [1.0, 0.0])


class TestLinestringPolygonDistanceKernel:
    def test_cases(self):
        poly = _polys([UNIT_SQ])
        lines = _lines([
            [(0.25, 0.25), (0.75, 0.75)],  # inside -> 0
            [(2, 0), (2, 1)],              # 1 away
            [(-1, 0.5), (2, 0.5)],         # crosses -> 0
        ])
        d = gk.pairwise_linestring_polygon_distance(
            [0, 1, 2], [0, 0, 0], lines.part_offsets, lines.x, lines.y,
            poly.part_offsets, poly.ring_offsets, poly.x, poly.y,
        )
        np.testing.assert_allclose(d, [0.0, 1.0, 0.0])


class TestPolygonDistanceKernel:
    def test_cases(self):
        a = _polys([UNIT_SQ])
        b = _polys([
            [[(3, 0), (4, 0), (4, 1), (3, 1), (3, 0)]],         # 2 away
            [[(0.5, 0.5), (2, 0.5), (2, 2), (0.5, 2), (0.5, 0.5)]],  # overlaps
            [[(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75), (0.25, 0.25)]],  # contained
        ])
        d = gk.pairwise_polygon_distance(
            [0, 0, 0], [0, 1, 2],
            a.part_offsets, a.ring_offsets, a.x, a.y,
            b.part_offsets, b.ring_offsets, b.x, b.y,
        )
        np.testing.assert_allclose(d, [2.0, 0.0, 0.0])


class TestNearestPointsKernel:
    def test_projection_and_clamp(self):
        lines = _lines([[(0, 0), (2, 0), (2, 2)]])
        seg, nx, ny = gk.pairwise_point_linestring_nearest_points(
            [1.0, 3.0, -1.0], [1.0, 1.0, -1.0], [0, 0, 0],
            lines.part_offsets, lines.x, lines.y,
        )
        np.testing.assert_array_equal(seg, [0, 1, 0])
        np.testing.assert_allclose(nx, [1.0, 2.0, 0.0])
        np.testing.assert_allclose(ny, [0.0, 1.0, 0.0])


class TestMultipointEqualsKernel:
    def test_counts(self):
        # reference equals_count doctest-style case
        lo = [0, 3]
        lx = [0.0, 1.0, 2.0]
        ly = [0.0, 1.0, 2.0]
        ro = [0, 2]
        rx = [1.0, 5.0]
        ry = [1.0, 5.0]
        out = gk.pairwise_multipoint_equals_count(lo, lx, ly, ro, rx, ry)
        np.testing.assert_array_equal(out, [1])


class TestPairwiseSparkOps:
    def test_pairwise_pip_and_distances(self, spark):
        from cuspatial_spark.operators import pairwise as pw

        poly = _polys([UNIT_SQ, [[(10, 10), (12, 10), (12, 12), (10, 12), (10, 10)]]])
        pdf = pd.DataFrame(
            {
                "id": [0, 1, 2],
                "x": [0.5, 0.5, 11.0],
                "y": [0.5, 0.5, 11.0],
                "polygon_index": [0, 1, 1],
            }
        )
        df = spark.createDataFrame(pdf)
        got = pw.pairwise_point_in_polygon(df, poly).orderBy("id").toPandas()
        assert list(got["in_polygon"]) == [True, False, True]

        got2 = pw.pairwise_point_polygon_distance(df, poly).orderBy("id").toPandas()
        np.testing.assert_allclose(got2["distance"], [0.0, np.sqrt(9.5**2 + 9.5**2), 0.0])

    def test_nearest_points_op(self, spark):
        from cuspatial_spark.operators import pairwise as pw

        lines = _lines([[(0, 0), (2, 0)]])
        df = spark.createDataFrame(
            pd.DataFrame({"x": [1.0], "y": [1.0], "linestring_index": [0]})
        )
        got = pw.pairwise_point_linestring_nearest_points(df, lines).toPandas()
        assert got["segment_id"].iloc[0] == 0
        np.testing.assert_allclose(
            [got["nearest_x"].iloc[0], got["nearest_y"].iloc[0]], [1.0, 0.0]
        )

    def test_equals_count_op(self, spark):
        from cuspatial_spark.operators import pairwise as pw

        df = spark.createDataFrame(
            pd.DataFrame({"lhs_index": [0], "rhs_index": [0]})
        )
        got = pw.pairwise_multipoint_equals_count(
            df, [0, 3], [0.0, 1.0, 2.0], [0.0, 1.0, 2.0], [0, 2], [1.0, 5.0], [1.0, 5.0]
        ).toPandas()
        assert got["equals_count"].iloc[0] == 1
