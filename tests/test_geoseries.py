"""GeoSeries facade tests — reference-style usage: build from WKT,
call aligned pairwise methods, get (row_id, value) frames back."""

import numpy as np
import pytest

from cuspatial_spark import GeoSeries


def _vals(df, col):
    return [r[col] for r in df.orderBy("row_id").collect()]


def test_point_point_distance_and_equals(spark):
    a = GeoSeries.from_wkt(spark, ["POINT (0 0)", "POINT (1 1)"])
    b = GeoSeries.from_wkt(spark, ["POINT (3 4)", "POINT (1 1)"])
    assert _vals(a.distance(b), "distance") == [5.0, 0.0]
    assert _vals(a.geom_equals(b), "geom_equals") == [False, True]
    assert _vals(a.intersects(b), "intersects") == [False, True]


def test_point_polygon_methods(spark):
    pts = GeoSeries.from_wkt(spark, ["POINT (2 2)", "POINT (2 0)", "POINT (9 9)"])
    sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    polys = GeoSeries.from_wkt(spark, [sq, sq, sq])
    assert _vals(pts.within(polys), "within") == [True, False, False]
    assert _vals(pts.touches(polys), "touches") == [False, True, False]
    assert _vals(polys.covers(pts), "covers") == [True, True, False]
    d = _vals(pts.distance(polys), "distance")
    assert d[0] == 0.0 and d[1] == 0.0 and d[2] == pytest.approx(np.sqrt(50))


def test_linestring_methods(spark):
    a = GeoSeries.from_wkt(
        spark, ["LINESTRING (0 0, 4 0)", "LINESTRING (0 0, 4 0)"]
    )
    b = GeoSeries.from_wkt(
        spark, ["LINESTRING (4 0, 0 0)", "LINESTRING (1 -1, 1 1)"]
    )
    assert _vals(a.geom_equals(b), "geom_equals") == [True, False]
    assert _vals(a.crosses(b), "crosses") == [False, True]
    assert _vals(a.covers(b), "covers") == [True, False]


def test_polygon_polygon_methods(spark):
    a = GeoSeries.from_wkt(
        spark,
        ["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"] * 3,
    )
    b = GeoSeries.from_wkt(
        spark,
        [
            "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",   # inside
            "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))",   # overlaps
            "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))",  # disjoint
        ],
    )
    assert _vals(a.contains(b), "contains") == [True, False, False]
    assert _vals(a.overlaps(b), "overlaps") == [False, True, False]
    assert _vals(a.disjoint(b), "disjoint") == [False, False, True]
    d = _vals(a.distance(b), "distance")
    assert d[0] == 0.0 and d[1] == 0.0 and d[2] == pytest.approx(np.sqrt(72))


def test_multipoint_methods(spark):
    a = GeoSeries.from_wkt(spark, ["MULTIPOINT ((0 0), (1 1))"])
    b = GeoSeries.from_wkt(spark, ["MULTIPOINT ((1 1), (0 0))"])
    assert _vals(a.geom_equals(b), "geom_equals") == [True]
    assert _vals(a.distance(b), "distance") == [0.0]


def test_mixed_point_linestring(spark):
    pts = GeoSeries.from_wkt(spark, ["POINT (2 0)", "POINT (0 0)", "POINT (2 2)"])
    ls = GeoSeries.from_wkt(spark, ["LINESTRING (0 0, 4 0)"] * 3)
    assert _vals(pts.within(ls), "within") == [True, False, False]
    assert _vals(pts.touches(ls), "touches") == [False, True, False]
    assert _vals(pts.distance(ls), "distance") == [0.0, 0.0, 2.0]


def test_sizes_iloc_roundtrip(spark):
    gs = GeoSeries.from_wkt(
        spark,
        ["POINT (1 2)", "POINT (3 4)", "POINT (5 6)"],
    )
    np.testing.assert_array_equal(gs.sizes, [1, 1, 1])
    sub = gs.iloc([2, 0])
    assert sub.to_wkt() == ["POINT (5.0 6.0)", "POINT (1.0 2.0)"]


def test_errors(spark):
    a = GeoSeries.from_wkt(spark, ["POINT (0 0)"])
    b = GeoSeries.from_wkt(spark, ["POINT (0 0)", "POINT (1 1)"])
    # align=True (reference default) auto-aligns unequal lengths; only
    # align=False keeps the strict positional contract
    with pytest.raises(ValueError, match="length mismatch"):
        a.distance(b, align=False)


def test_mixed_kind_series(spark):
    """Mixed-kind union series (reference GeoColumn union,
    tests/conftest.py:19-64 shape restricted to the four single-part
    kinds): per-kind sub-dispatch must agree with running each
    homogeneous slice separately."""
    mixed_wkt = [
        "POINT (-1 0)",
        "MULTIPOINT ((1 2), (3 4))",
        "LINESTRING (11 12, 13 14)",
        "POLYGON ((35 36, 38 36, 41 39, 41 42, 35 36))",
        "POINT (9 10)",
        "LINESTRING (31 32, 33 34)",
    ]
    rhs_wkt = [
        "POINT (-1 0)",                                   # equal point
        "MULTIPOINT ((1 2), (3 4))",                      # equal mp
        "LINESTRING (11 12, 13 14)",                      # equal ls
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",            # far square
        "POINT (9 14)",                                   # 4 above
        "LINESTRING (31 34, 33 36)",                      # parallel offset
    ]
    a = GeoSeries.from_wkt(spark, mixed_wkt)
    b = GeoSeries.from_wkt(spark, rhs_wkt)
    assert a.kind == "mixed" and b.kind == "mixed"
    got_d = _vals(a.distance(b).orderBy("row_id"), "distance")
    got_eq = _vals(a.geom_equals(b).orderBy("row_id"), "geom_equals")
    got_int = _vals(a.intersects(b).orderBy("row_id"), "intersects")
    got_dis = _vals(a.disjoint(b).orderBy("row_id"), "disjoint")
    # oracle: run each homogeneous slice through single-kind series
    for i, (lw, rw) in enumerate(zip(mixed_wkt, rhs_wkt)):
        sa = GeoSeries.from_wkt(spark, [lw])
        sb = GeoSeries.from_wkt(spark, [rw])
        assert got_d[i] == _vals(sa.distance(sb), "distance")[0], i
        assert got_eq[i] == _vals(sa.geom_equals(sb), "geom_equals")[0], i
        assert got_int[i] == _vals(sa.intersects(sb), "intersects")[0], i
        assert got_dis[i] == _vals(sa.disjoint(sb), "disjoint")[0], i
    # spot truths
    assert got_eq == [True, True, True, False, False, False]
    assert got_d[4] == 4.0


def test_mixed_vs_single_kind(spark):
    """Mixed lhs against a homogeneous rhs: cross-kind cells dispatch
    per group."""
    a = GeoSeries.from_wkt(spark, ["POINT (2 0)", "LINESTRING (0 1, 4 1)"])
    square = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    b = GeoSeries.from_wkt(spark, [square, square])
    assert _vals(a.within(b).orderBy("row_id"), "within") == [False, True]
    assert _vals(a.intersects(b).orderBy("row_id"), "intersects") == [True, True]
    assert _vals(a.distance(b).orderBy("row_id"), "distance") == [0.0, 0.0]


def test_geodataframe_facade(spark):
    """GeoDataFrame: payload + geometry columns, point lifting, WKT
    export (reference geodataframe.py:21-110 surface)."""
    import numpy as np

    from cuspatial_spark import GeoDataFrame
    from cuspatial_spark.io.geopandas import from_wkt

    gdf = GeoDataFrame(spark, {
        "name": ["a", "b", "c"],
        "geom": from_wkt(["POINT (1 1)", "POINT (5 5)", "POINT (2 3)"]),
        "zone": from_wkt(["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"] * 3),
    })
    assert len(gdf) == 3
    assert gdf.geometry_columns == ["geom", "zone"]
    assert gdf["name"] == ["a", "b", "c"]
    # pairwise predicate between two geometry columns
    got = [r.within for r in gdf["geom"].within(gdf["zone"]).orderBy("row_id").collect()]
    assert got == [True, False, True]
    # point column lifts into a Spark frame for distributed joins
    pdf = gdf.points_df("geom").orderBy("row_id").toPandas()
    assert list(pdf["x"]) == [1.0, 5.0, 2.0] and list(pdf["name"]) == ["a", "b", "c"]
    wkt = gdf.to_wkt()
    assert wkt["geom"][0] == "POINT (1.0 1.0)"
    import pytest
    with pytest.raises(ValueError, match="length"):
        GeoDataFrame(spark, {"a": [1, 2], "g": from_wkt(["POINT (0 0)"])})
