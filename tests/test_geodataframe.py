"""GeoDataFrame frame-level surface: reset_index (reference
geodataframe.py:240-321, single-level) and the payload-carrying
spatial_join convenience packaging the flagship containment join."""

import numpy as np
import pytest

from cuspatial_spark import GeoSeries
from cuspatial_spark.geodataframe import GeoDataFrame


WKTS = [
    "POINT (1.0 1.0)",
    "POINT (3.0 3.0)",
    "POINT (9.0 9.0)",
    "POINT (2.0 3.0)",
]
SQ = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
TRI = "POLYGON ((5 5, 10 5, 10 10, 5 5))"


def _frame(spark, index=None):
    return GeoDataFrame(
        spark,
        {
            "name": ["a", "b", "c", "d"],
            "weight": [1.5, 2.5, 3.5, 4.5],
            "geometry": GeoSeries.from_wkt(spark, WKTS),
        },
        index=index,
    )


class TestResetIndex:
    def test_default_range_index(self, spark):
        gdf = _frame(spark)
        assert gdf.index == [0, 1, 2, 3]

    def test_drop_true_reindexes(self, spark):
        gdf = _frame(spark, index=[10, 20, 30, 40])
        out = gdf.reset_index(drop=True)
        assert out.index == [0, 1, 2, 3]
        assert out.columns == ["name", "weight", "geometry"]
        assert out["name"] == ["a", "b", "c", "d"]
        assert out["geometry"].to_wkt() == WKTS

    def test_drop_false_inserts_index_column(self, spark):
        gdf = _frame(spark, index=[10, 20, 30, 40])
        out = gdf.reset_index()
        assert out.columns[0] == "index"
        assert out["index"] == [10, 20, 30, 40]
        assert out.index == [0, 1, 2, 3]
        assert out["geometry"].to_wkt() == WKTS

    def test_existing_index_column_raises(self, spark):
        gdf = GeoDataFrame(
            spark,
            {
                "index": [7, 8],
                "geometry": GeoSeries.from_wkt(spark, WKTS[:2]),
            },
            index=[10, 20],
        )
        with pytest.raises(ValueError, match="already exists"):
            gdf.reset_index()
        out = gdf.reset_index(drop=True)  # drop path still fine
        assert out["index"] == [7, 8]

    def test_bad_index_length_raises(self, spark):
        gdf = _frame(spark)
        with pytest.raises(ValueError, match="length"):
            gdf.index = [1, 2]
        with pytest.raises(ValueError, match="length"):
            _frame(spark, index=[1])


class TestSpatialJoin:
    def test_payload_carried_through(self, spark):
        gdf = _frame(spark)
        polys = GeoSeries.from_wkt(spark, [SQ, TRI])
        out = gdf.spatial_join(polys, "geometry").orderBy("row_id")
        rows = out.collect()
        assert set(out.columns) >= {"row_id", "name", "weight", "polygon_index"}
        got = {(r.name, r.polygon_index) for r in rows}
        # points (1,1),(3,3),(2,3) in square 0; (9,9) in triangle 1
        assert got == {("a", 0), ("b", 0), ("d", 0), ("c", 1)}
        w = {r.name: r.weight for r in rows}
        assert w == {"a": 1.5, "b": 2.5, "c": 3.5, "d": 4.5}

    def test_accepts_polygon_layer_and_bbox_override(self, spark):
        gdf = _frame(spark)
        layer = GeoSeries.from_wkt(spark, [SQ, TRI]).layers.polygon_flat_layer()
        out = gdf.spatial_join(
            layer, "geometry", x_min=0, x_max=16, y_min=0, y_max=16
        )
        assert out.count() == 4

    def test_partial_bound_override_derives_the_rest(self, spark):
        """A partial x_min override must not silently leave the other
        bounds at the join's [0,1] defaults."""
        gdf = _frame(spark)
        polys = GeoSeries.from_wkt(spark, [SQ, TRI])
        out = gdf.spatial_join(polys, "geometry", x_min=-200.0)
        got = {(r.name, r.polygon_index) for r in out.collect()}
        assert got == {("a", 0), ("b", 0), ("d", 0), ("c", 1)}

    def test_non_point_geometry_raises(self, spark):
        gdf = GeoDataFrame(
            spark,
            {"v": [1], "geometry": GeoSeries.from_wkt(spark, [SQ])},
        )
        polys = GeoSeries.from_wkt(spark, [SQ])
        with pytest.raises(ValueError, match="POINT"):
            gdf.spatial_join(polys, "geometry")
