"""from_geopandas / from_wkt ingestion (reference
io/geopandas_reader.py:27-140 bucketing semantics), including a
round-trip through the distributed PIP join."""

import numpy as np
import pytest

from cuspatial_spark.io import from_geopandas, from_wkt
from cuspatial_spark.io.geopandas import LINESTRING, MULTIPOINT, NONE, POINT, POLYGON


@pytest.fixture(scope="module")
def layers():
    wkts = [
        "POINT (1 2)",
        "MULTIPOINT ((0 0), (1 1), (2 2))",
        "LINESTRING (0 0, 4 0, 4 4)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
        None,
        "POINT (5 5)",
    ]
    return from_geopandas(from_wkt(wkts))


class TestIngestion:
    def test_meta(self, layers):
        np.testing.assert_array_equal(
            layers.feature_types, [POINT, MULTIPOINT, LINESTRING, POLYGON, NONE, POINT]
        )
        np.testing.assert_array_equal(layers.union_offsets, [0, 0, 0, 0, -1, 1])

    def test_layers(self, layers):
        np.testing.assert_array_equal(layers.point_x, [1.0, 5.0])
        assert len(layers.multipoints) == 1
        np.testing.assert_array_equal(layers.multipoints.x, [0, 1, 2])
        assert len(layers.linestrings) == 1
        np.testing.assert_array_equal(layers.linestrings.x, [0, 4, 4])
        assert len(layers.polygons) == 1
        # exterior + one hole
        np.testing.assert_array_equal(layers.polygons.part_offsets, [0, 2])
        np.testing.assert_array_equal(layers.polygons.ring_offsets, [0, 5, 10])

    def test_multipolygon_duck_typed(self):
        from cuspatial_spark.io.geopandas import _Geom, _parse_ring

        part1 = _Geom("Polygon", exterior=_Geom("LinearRing", coords=_parse_ring("0 0, 1 0, 1 1, 0 0")), interiors=[])
        part2 = _Geom("Polygon", exterior=_Geom("LinearRing", coords=_parse_ring("5 5, 6 5, 6 6, 5 5")), interiors=[])
        mp = _Geom("MultiPolygon", geoms=[part1, part2])
        got = from_geopandas([mp])
        assert list(got.feature_types) == [POLYGON]
        # both parts' rings belong to the one layer entry
        np.testing.assert_array_equal(got.polygons.part_offsets, [0, 2])
        np.testing.assert_array_equal(got.polygons.ring_offsets, [0, 4, 8])

    def test_roundtrip_through_pip_join(self, spark):
        """WKT polygons + WKT points -> layers -> distributed PIP join
        (the naturalearth-shaped usage: load, then join)."""
        from cuspatial_spark.plans import point_in_polygon_join

        polys = from_geopandas(
            from_wkt(
                [
                    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
                    "POLYGON ((5 5, 8 5, 8 8, 5 8, 5 5))",
                ]
            )
        ).polygons
        pts = from_geopandas(
            from_wkt(["POINT (1 1)", "POINT (6 6)", "POINT (4.5 4.5)"])
        ).points_df(spark)
        got = (
            point_in_polygon_join(
                pts.withColumnRenamed("row_id", "point_id"),
                polys,
                x_min=0.0, x_max=8.0, y_min=0.0, y_max=8.0,
                max_depth=6, tile_level=2, keep_columns=["point_id"],
            )
            .orderBy("point_id")
            .toPandas()
        )
        assert list(zip(got["point_id"], got["polygon_id"])) == [(0, 0), (1, 1)]

    def test_hole_excludes_points(self, spark, layers):
        """The parsed hole is honored by the PIP kernel."""
        from cuspatial_spark.operators import point_in_polygon
        import pandas as pd

        pts = spark.createDataFrame(
            pd.DataFrame({"point_id": [0, 1], "x": [5.0, 2.0], "y": [5.0, 2.0]})
        )
        got = (
            point_in_polygon(pts, layers.polygons, result_prefix="in_")
            .orderBy("point_id")
            .toPandas()
        )
        assert list(got["in_0"]) == [False, True]  # (5,5) in hole, (2,2) in
