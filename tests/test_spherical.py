"""Spherical (geodesic) point-in-polygon
(reference detail/algorithm/is_point_in_polygon.cuh:104-185)."""

import numpy as np
import pandas as pd
import pytest

from cuspatial_spark.geometry import PolygonArrays
from cuspatial_spark.kernels.spherical import point_in_polygon_spherical_pairs


def _poly(rings):
    part_offsets = [0, len(rings)]
    ring_offsets, lon, lat = [0], [], []
    for r in rings:
        for x, y in r:
            lon.append(x)
            lat.append(y)
        ring_offsets.append(len(lon))
    return PolygonArrays(part_offsets, ring_offsets, lon, lat)


class TestSphericalKernel:
    def test_agrees_with_planar_near_equator(self):
        """Small low-latitude polygons are locally flat: geodesic and
        planar classification agree away from edges."""
        from cuspatial_spark.kernels.pip import _pip_one_polygon

        rng = np.random.default_rng(7)
        square = _poly([[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]])
        lon = rng.uniform(-1, 3, 500)
        lat = rng.uniform(-1, 3, 500)
        got = point_in_polygon_spherical_pairs(
            lon, lat, np.zeros(500, dtype=np.int64),
            square.part_offsets, square.ring_offsets, square.x, square.y,
        )
        want = _pip_one_polygon(lon, lat, square.ring_offsets[0:2], square.x, square.y)
        # exclude a thin band near the boundary where curvature shifts
        # the geodesic edge relative to the planar chord
        margin = 0.05
        interior = (
            (np.abs(lon - 0) > margin) & (np.abs(lon - 2) > margin)
            & (np.abs(lat - 0) > margin) & (np.abs(lat - 2) > margin)
        )
        assert (got[interior] == want[interior]).all()

    def test_polar_cap(self):
        """A ring at latitude 80 encircling the north pole: planar
        lon/lat treatment cannot represent this region, the geodesic
        test can — points above 80N are inside, below are outside."""
        cap = _poly([[(lon, 80.0) for lon in range(0, 360, 30)] + [(0.0, 80.0)]])
        lons = np.array([10.0, 100.0, 250.0, 10.0, 200.0])
        lats = np.array([85.0, 89.0, 83.0, 70.0, 40.0])
        got = point_in_polygon_spherical_pairs(
            lons, lats, np.zeros(5, dtype=np.int64),
            cap.part_offsets, cap.ring_offsets, cap.x, cap.y,
        )
        assert list(got) == [True, True, True, False, False]

    def test_dateline_spanning(self):
        """A small square straddling the antimeridian (175E..185E):
        geodesic arcs have no seam at lon=180."""
        sq = _poly([[(175.0, -2.0), (-175.0, -2.0), (-175.0, 2.0),
                     (175.0, 2.0), (175.0, -2.0)]])
        lons = np.array([179.0, -179.0, 170.0, 0.0])
        lats = np.array([0.0, 0.0, 0.0, 0.0])
        got = point_in_polygon_spherical_pairs(
            lons, lats, np.zeros(4, dtype=np.int64),
            sq.part_offsets, sq.ring_offsets, sq.x, sq.y,
        )
        assert list(got) == [True, True, False, False]

    def test_unclosed_ring_same_as_closed(self):
        closed = _poly([[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]])
        unclosed = _poly([[(0, 0), (2, 0), (2, 2), (0, 2)]])
        lon = np.array([1.0, 3.0, 1.0])
        lat = np.array([1.0, 1.0, 2.5])
        for poly in (closed, unclosed):
            got = point_in_polygon_spherical_pairs(
                lon, lat, np.zeros(3, dtype=np.int64),
                poly.part_offsets, poly.ring_offsets, poly.x, poly.y,
            )
            assert list(got) == [True, False, False]


class TestSphericalOperator:
    def test_spark_operator(self, spark):
        from cuspatial_spark.operators.pairwise import (
            pairwise_point_in_polygon_spherical,
        )

        cap = _poly([[(lon, 80.0) for lon in range(0, 360, 30)] + [(0.0, 80.0)]])
        pdf = pd.DataFrame(
            {
                "id": [0, 1, 2],
                "lon": [10.0, 200.0, 100.0],
                "lat": [85.0, 40.0, 89.0],
                "polygon_index": [0, 0, 0],
            }
        )
        got = (
            pairwise_point_in_polygon_spherical(spark.createDataFrame(pdf), cap)
            .orderBy("id")
            .toPandas()
        )
        assert list(got["in_polygon"]) == [True, False, True]
