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
        # round 3: true geometry_offset level — each part keeps its own
        # ring set, the geometry spans parts 0..2
        np.testing.assert_array_equal(got.pg_geom_offsets, [0, 2])
        np.testing.assert_array_equal(got.polygons.part_offsets, [0, 1, 2])
        np.testing.assert_array_equal(got.polygons.ring_offsets, [0, 4, 8])
        # predicate view flattens back to one even-odd entry
        flat = got.polygon_flat_layer()
        np.testing.assert_array_equal(flat.part_offsets, [0, 2])

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


WKTS = [
    "POINT (1.5 2.25)",
    "MULTIPOINT ((0.0 0.0), (1.0 2.0), (3.5 4.5))",
    "LINESTRING (0.0 0.0, 1.0 1.0, 2.0 0.5)",
    "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0), (1.0 1.0, 2.0 1.0, 1.5 2.0, 1.0 1.0))",
    None,
    "POINT (7.0 -3.125)",
]


class TestExportHelpers:
    def test_to_wkt_round_trip(self):
        """from_wkt -> layers -> to_wkt -> layers reproduces every
        coordinate array exactly (values, not strings, are the
        invariant)."""
        import numpy as np
        from cuspatial_spark.io.geopandas import from_geopandas, from_wkt, to_wkt

        a = from_geopandas(from_wkt(WKTS))
        b = from_geopandas(from_wkt(to_wkt(a)))
        assert to_wkt(b) == to_wkt(a)
        np.testing.assert_array_equal(a.feature_types, b.feature_types)
        np.testing.assert_array_equal(a.point_x, b.point_x)
        np.testing.assert_array_equal(a.polygons.x, b.polygons.x)
        np.testing.assert_array_equal(a.polygons.ring_offsets, b.polygons.ring_offsets)
        np.testing.assert_array_equal(a.linestrings.x, b.linestrings.x)
        np.testing.assert_array_equal(a.multipoints.x, b.multipoints.x)

    def test_sizes(self):
        import numpy as np
        from cuspatial_spark.io.geopandas import from_geopandas, from_wkt

        layers = from_geopandas(from_wkt(WKTS))
        # point=1, multipoint=3, linestring=3, polygon=4+4 ring vertices,
        # missing=0, point=1
        np.testing.assert_array_equal(layers.sizes(), [1, 3, 3, 8, 0, 1])

    def test_iloc(self):
        from cuspatial_spark.io.geopandas import from_geopandas, from_wkt, to_wkt

        layers = from_geopandas(from_wkt(WKTS))
        sub = layers.iloc([3, 0, 5])
        assert to_wkt(sub) == [to_wkt(layers)[i] for i in (3, 0, 5)]

    def test_align(self):
        import numpy as np
        from cuspatial_spark.io.geopandas import align

        idx, pa, pb = align([10, 20, 40], [20, 30, 40])
        np.testing.assert_array_equal(idx, [10, 20, 30, 40])
        np.testing.assert_array_equal(pa, [0, 1, -1, 2])
        np.testing.assert_array_equal(pb, [-1, 0, 1, 2])

    def test_to_geopandas_gated(self):
        """to_geopandas needs shapely/geopandas; in this sandbox it must
        raise ImportError (the dependency-free exports are to_wkt /
        to_geoms)."""
        import pytest
        from cuspatial_spark.io.geopandas import from_geopandas, from_wkt, to_geopandas

        layers = from_geopandas(from_wkt(["POINT (0.0 0.0)"]))
        try:
            import geopandas  # noqa: F401
            has_gpd = True
        except ImportError:
            has_gpd = False
        if has_gpd:
            gs = to_geopandas(layers)
            assert gs.iloc[0].x == 0.0
        else:
            with pytest.raises(ImportError):
                to_geopandas(layers)


class TestMultiPartIngestion:
    def test_wkt_roundtrip_multi(self, spark=None):
        from cuspatial_spark.io.geopandas import from_geopandas, from_wkt, to_wkt

        wkts = [
            "MULTILINESTRING ((0.0 0.0, 1.0 0.0), (10.0 0.0, 11.0 1.0))",
            "MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0)), "
            "((5.0 5.0, 7.0 5.0, 6.0 7.0, 5.0 5.0), "
            "(5.5 5.5, 6.0 6.0, 6.5 5.5, 5.5 5.5)))",
            "LINESTRING (0.0 0.0, 2.0 2.0)",
            "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0))",
        ]
        layers = from_geopandas(from_wkt(wkts))
        assert to_wkt(layers) == wkts
        # part structure: geometry 0 has 2 chains, geometry 1 has 1
        assert list(layers.ls_geom_offsets) == [0, 2, 3]
        assert list(layers.pg_geom_offsets) == [0, 2, 3]
        # sizes count all parts' vertices
        assert list(layers.sizes()) == [4, 12, 2, 4]

    def test_no_phantom_bridge_distance(self, spark):
        """Round-2 gap: MultiLineString parts used to be concatenated
        into one chain, adding a phantom segment between parts that
        corrupted distances.  distance((5,5), MLS((0 0,1 0),(10 0,11 0)))
        must be sqrt(4^2+5^2), not 5 (the bridge's answer)."""
        import numpy as np

        from cuspatial_spark import GeoSeries

        a = GeoSeries.from_wkt(spark, ["POINT (5.0 5.0)"])
        b = GeoSeries.from_wkt(
            spark, ["MULTILINESTRING ((0.0 0.0, 1.0 0.0), (10.0 0.0, 11.0 0.0))"]
        )
        d = [r.distance for r in a.distance(b).collect()]
        assert d == [np.sqrt(16.0 + 25.0)]

    def test_multipolygon_distance_and_predicates(self, spark):
        from cuspatial_spark import GeoSeries

        pts = GeoSeries.from_wkt(
            spark, ["POINT (0.5 0.25)", "POINT (6.0 5.5)", "POINT (3.0 3.0)"]
        )
        mp = "MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0)), ((5.0 5.0, 7.0 5.0, 6.0 7.0, 5.0 5.0)))"
        polys = GeoSeries.from_wkt(spark, [mp, mp, mp])
        d = [r.distance for r in pts.distance(polys).orderBy("row_id").collect()]
        assert d[0] == 0.0 and d[1] == 0.0 and d[2] > 0
        # predicates run over the flattened even-odd view
        w = [r.within for r in pts.within(polys).orderBy("row_id").collect()]
        assert w == [True, True, False]

    def test_multilinestring_predicates(self, spark):
        import pytest

        from cuspatial_spark import GeoSeries

        a = GeoSeries.from_wkt(spark, ["POINT (0.0 0.0)", "POINT (5.0 5.0)"])
        b = GeoSeries.from_wkt(
            spark, ["MULTILINESTRING ((0.0 0.0, 1.0 0.0), (2.0 0.0, 3.0 0.0))"] * 2
        )
        assert [r.distance for r in a.distance(b).orderBy("row_id").collect()] == [
            0.0, pytest.approx(np.hypot(2.0, 5.0))
        ]
        # intersects/disjoint answer via the distance closure
        assert [r.intersects for r in a.intersects(b).orderBy("row_id").collect()] == [True, False]
        assert [r.disjoint for r in a.disjoint(b).orderBy("row_id").collect()] == [False, True]
        # other predicates over multi-part chains still raise clearly
        with pytest.raises(NotImplementedError, match="multi-part"):
            a.touches(b)
