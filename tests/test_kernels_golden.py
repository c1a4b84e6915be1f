"""Kernel-level golden tests against the reference pytest oracles.

All expected values are copied verbatim from the reference test suite
(see tests/golden_fixtures.py for file:line provenance).  Pure NumPy —
no SparkSession needed, so these gate the kernel math directly.
"""

import numpy as np
import pytest

from cuspatial_spark.kernels.hausdorff import directed_hausdorff
from cuspatial_spark.kernels.pip import point_in_polygon_bits, point_in_polygon_pairs
from cuspatial_spark.kernels.quadtree import (
    build_quadtree,
    join_quadtree_and_bounding_boxes,
)
from cuspatial_spark.kernels.spatial_join import (
    quadtree_point_in_polygon,
    quadtree_point_to_nearest_linestring,
)
from cuspatial_spark.kernels.zorder import z_order, z_order_x, z_order_y

from . import golden_fixtures as G


def _bounding_boxes(part_offsets, xs, ys, expansion=0.0):
    """Per-feature bbox over vertex ranges (reference bounding.py:29-48)."""
    offs = np.asarray(part_offsets, dtype=np.int64)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(offs) - 1
    minx = np.array([xs[offs[i]:offs[i + 1]].min() for i in range(n)]) - expansion
    maxx = np.array([xs[offs[i]:offs[i + 1]].max() for i in range(n)]) + expansion
    miny = np.array([ys[offs[i]:offs[i + 1]].min() for i in range(n)]) - expansion
    maxy = np.array([ys[offs[i]:offs[i + 1]].max() for i in range(n)]) + expansion
    return minx, miny, maxx, maxy


def _poly_vertex_ranges():
    """Polygon bboxes span ring ranges of each polygon."""
    po = np.asarray(G.SMALL_POLY_OFFSETS, dtype=np.int64)
    ro = np.asarray(G.SMALL_RING_OFFSETS, dtype=np.int64)
    return ro[po]  # vertex offset at each polygon boundary


class TestZOrder:
    def test_roundtrip(self):
        rng = np.random.default_rng(42)
        x = rng.integers(0, 1 << 15, 1000).astype(np.uint16)
        y = rng.integers(0, 1 << 15, 1000).astype(np.uint16)
        k = z_order(x, y)
        np.testing.assert_array_equal(z_order_x(k), x)
        np.testing.assert_array_equal(z_order_y(k), y)

    def test_known_values(self):
        assert z_order(np.array([0]), np.array([0]))[0] == 0
        assert z_order(np.array([1]), np.array([0]))[0] == 1
        assert z_order(np.array([0]), np.array([1]))[0] == 2
        assert z_order(np.array([7]), np.array([7]))[0] == 63


class TestBruteForcePIP:
    """Fixtures from tests/spatial/join/test_point_in_polygon.py:18-120."""

    tri = dict(
        px=np.array([-1, 0, 1, -1], dtype=np.float64),
        py=np.array([-1, 1, -1, -1], dtype=np.float64),
        poly_offsets=[0, 1],
        ring_offsets=[0, 4],
    )

    def test_one_point_in(self):
        bits = point_in_polygon_bits(
            np.array([0.0]), np.array([0.0]),
            self.tri["poly_offsets"], self.tri["ring_offsets"],
            self.tri["px"], self.tri["py"],
        )
        assert bits[0] == 1

    def test_one_point_out(self):
        bits = point_in_polygon_bits(
            np.array([1.0]), np.array([1.0]),
            self.tri["poly_offsets"], self.tri["ring_offsets"],
            self.tri["px"], self.tri["py"],
        )
        assert bits[0] == 0

    def test_two_rings_in_out(self):
        px = np.array([-1, 1, -1, -1, 3, 5, 3, 3], dtype=np.float64)
        py = np.array([-1, 0, 1, -1, -1, 0, 1, -1], dtype=np.float64)
        bits = point_in_polygon_bits(
            np.array([0.0, 1.0]), np.array([0.0, 1.0]),
            [0, 2], [0, 4, 8], px, py,
        )
        assert bits[0] == 1
        assert bits[1] == 0

    def test_two_unclosed_rings(self):
        px = np.array([-1, 1, 0, -1, 3, 5, 4, 3], dtype=np.float64)
        py = np.array([-1, 0, 0.5, 1, -1, 0, 0.5, 1], dtype=np.float64)
        bits = point_in_polygon_bits(
            np.array([0.0, 1.0]), np.array([0.0, 1.0]),
            [0, 2], [0, 4, 8], px, py,
        )
        assert bits[0] == 1
        assert bits[1] == 0

    def test_on_edge_is_outside(self):
        # contains_properly: a vertex / edge point is NOT inside
        hits = point_in_polygon_pairs(
            np.array([-1.0, 0.0]), np.array([-1.0, 0.0]),
            np.array([0, 0]),
            self.tri["poly_offsets"], self.tri["ring_offsets"],
            self.tri["px"], self.tri["py"],
        )
        assert not hits[0]  # vertex
        assert hits[1]  # interior


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
class TestQuadtreeGolden:
    def _build(self, dtype):
        x = np.asarray(G.SMALL_POINTS_X, dtype=dtype)
        y = np.asarray(G.SMALL_POINTS_Y, dtype=dtype)
        p = G.SMALL_PARAMS
        return build_quadtree(
            x, y, p["x_min"], p["x_max"], p["y_min"], p["y_max"],
            p["scale"], p["max_depth"], p["max_size"],
        )

    def test_quadtree_structure(self, dtype):
        _, qt = self._build(dtype)
        g = G.QUADTREE_GOLDEN
        np.testing.assert_array_equal(qt.key, g["key"])
        np.testing.assert_array_equal(qt.level, g["level"])
        np.testing.assert_array_equal(qt.is_internal_node, np.array(g["is_internal_node"], bool))
        np.testing.assert_array_equal(qt.length, g["length"])
        np.testing.assert_array_equal(qt.offset, g["offset"])

    def test_polygon_bbox_join(self, dtype):
        _, qt = self._build(dtype)
        pv = _poly_vertex_ranges()
        minx, miny, maxx, maxy = _bounding_boxes(pv, G.SMALL_POLY_XS, G.SMALL_POLY_YS)
        p = G.SMALL_PARAMS
        bbox_off, quad_off = join_quadtree_and_bounding_boxes(
            qt, minx, miny, maxx, maxy,
            p["x_min"], p["x_max"], p["y_min"], p["y_max"], p["scale"], p["max_depth"],
        )
        np.testing.assert_array_equal(bbox_off, G.POLY_BBOX_JOIN_GOLDEN["bbox_offset"])
        np.testing.assert_array_equal(quad_off, G.POLY_BBOX_JOIN_GOLDEN["quad_offset"])

    def test_linestring_bbox_join(self, dtype):
        _, qt = self._build(dtype)
        # linestrings = the 4 rings as independent linestrings, expanded 2.0
        minx, miny, maxx, maxy = _bounding_boxes(
            G.SMALL_RING_OFFSETS, G.SMALL_POLY_XS, G.SMALL_POLY_YS, expansion=2.0
        )
        p = G.SMALL_PARAMS
        bbox_off, quad_off = join_quadtree_and_bounding_boxes(
            qt, minx, miny, maxx, maxy,
            p["x_min"], p["x_max"], p["y_min"], p["y_max"], p["scale"], p["max_depth"],
        )
        np.testing.assert_array_equal(bbox_off, G.LINE_BBOX_JOIN_GOLDEN["bbox_offset"])
        np.testing.assert_array_equal(quad_off, G.LINE_BBOX_JOIN_GOLDEN["quad_offset"])

    def test_quadtree_point_in_polygon(self, dtype):
        order, qt = self._build(dtype)
        pv = _poly_vertex_ranges()
        minx, miny, maxx, maxy = _bounding_boxes(pv, G.SMALL_POLY_XS, G.SMALL_POLY_YS)
        p = G.SMALL_PARAMS
        bbox_off, quad_off = join_quadtree_and_bounding_boxes(
            qt, minx, miny, maxx, maxy,
            p["x_min"], p["x_max"], p["y_min"], p["y_max"], p["scale"], p["max_depth"],
        )
        poly_idx, point_idx = quadtree_point_in_polygon(
            bbox_off, quad_off, qt, order,
            np.asarray(G.SMALL_POINTS_X, dtype=dtype),
            np.asarray(G.SMALL_POINTS_Y, dtype=dtype),
            G.SMALL_POLY_OFFSETS, G.SMALL_RING_OFFSETS,
            np.asarray(G.SMALL_POLY_XS, dtype=dtype),
            np.asarray(G.SMALL_POLY_YS, dtype=dtype),
        )
        np.testing.assert_array_equal(poly_idx, G.QT_PIP_GOLDEN["polygon_index"])
        np.testing.assert_array_equal(point_idx, G.QT_PIP_GOLDEN["point_index"])

    def test_quadtree_nearest_linestring(self, dtype):
        order, qt = self._build(dtype)
        minx, miny, maxx, maxy = _bounding_boxes(
            G.SMALL_RING_OFFSETS, G.SMALL_POLY_XS, G.SMALL_POLY_YS, expansion=2.0
        )
        p = G.SMALL_PARAMS
        bbox_off, quad_off = join_quadtree_and_bounding_boxes(
            qt, minx, miny, maxx, maxy,
            p["x_min"], p["x_max"], p["y_min"], p["y_max"], p["scale"], p["max_depth"],
        )
        pt, ln, dist = quadtree_point_to_nearest_linestring(
            bbox_off, quad_off, qt, order,
            np.asarray(G.SMALL_POINTS_X, dtype=dtype),
            np.asarray(G.SMALL_POINTS_Y, dtype=dtype),
            G.SMALL_RING_OFFSETS,
            np.asarray(G.SMALL_POLY_XS, dtype=dtype),
            np.asarray(G.SMALL_POLY_YS, dtype=dtype),
        )
        np.testing.assert_array_equal(pt, G.NEAREST_GOLDEN_POINT_INDEX)
        np.testing.assert_array_equal(ln, G.NEAREST_GOLDEN_LINESTRING_INDEX)
        expected = (
            G.NEAREST_GOLDEN_DIST_F32 if dtype == np.float32 else G.NEAREST_GOLDEN_DIST_F64
        )
        # f32 golden values embed CUDA FMA contraction; plain f32 NumPy
        # math reproduces them to ~2e-5 relative.  f64 matches to 1e-12.
        rtol = 5e-5 if dtype == np.float32 else 1e-12
        np.testing.assert_allclose(dist, np.asarray(expected, dtype=dtype), rtol=rtol)


class TestHausdorff:
    def test_values(self):
        xs = np.array([0, 1, 2, 3, 1, 3, 5, 6, 5, 4, 7, 4], dtype=np.float64)
        ys = np.array([1, 2, 3, 5, 7, 0, 2, 3, 6, 1, 3, 6], dtype=np.float64)
        offs = np.array([0, 5, 9])
        m = directed_hausdorff(xs, ys, offs)
        expected = np.array(
            [
                [0.000000, 4.123106, 4.000000],
                [3.605551, 0.000000, 1.414214],
                [4.472136, 1.414214, 0.000000],
            ]
        )
        np.testing.assert_allclose(m, expected, atol=1e-6)

    def test_count_one(self):
        m = directed_hausdorff(
            np.array([0.0, 0.0]), np.array([0.0, 1.0]), np.array([0, 1])
        )
        np.testing.assert_allclose(m, [[0, 1], [1, 0]])
