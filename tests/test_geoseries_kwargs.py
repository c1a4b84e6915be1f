"""Reference kwargs parity for the GeoSeries surface: ``align``
(geoseries.py:1400-1476 distance, :1009-1476 predicates), ``allpairs``
and ``mode`` (contains family, :1009-1063 +
contains_geometry_processor.py:160-240), ``.loc`` label indexing
(:147-221), and GeoArrow dense-union export (geocolumn.py:68-78)."""

import math

import numpy as np
import pytest

from cuspatial_spark import GeoSeries


def _vals(df, col):
    return [r[col] for r in df.orderBy("row_id").collect()]


SQ = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"


# ----------------------------------------------------------------- align


def test_distance_align_reference_doctest(spark):
    # the reference's own distance/align example (geoseries.py:1444-1459)
    lines = GeoSeries.from_wkt(
        spark, ["LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3)"]
    )
    polys = GeoSeries.from_wkt(
        spark,
        [
            "POLYGON ((0 0, 1 1, 1 0, 0 0))",
            "POLYGON ((2 2, 3 3, 3 2, 2 2))",
        ],
        index=[1, 0],
    )
    unaligned = _vals(lines.distance(polys, align=False), "distance")
    assert unaligned == [0.0, 0.0]
    aligned = _vals(lines.distance(polys, align=True), "distance")
    assert aligned[0] == pytest.approx(math.sqrt(2))
    assert aligned[1] == pytest.approx(math.sqrt(2))


def test_distance_align_missing_rows_nan(spark):
    a = GeoSeries.from_wkt(spark, ["POINT (0 0)"], index=[0])
    b = GeoSeries.from_wkt(spark, ["POINT (1 1)", "POINT (2 2)"], index=[0, 1])
    out = _vals(a.distance(b), "distance")  # align=True default
    assert out[0] == pytest.approx(math.sqrt(2))
    assert out[1] is None or math.isnan(out[1])


def test_predicate_align_default_true(spark):
    # unequal lengths no longer raise for align=True predicates:
    # unmatched labels answer False
    pts = GeoSeries.from_wkt(spark, ["POINT (2 2)"], index=[0])
    polys = GeoSeries.from_wkt(spark, [SQ, SQ], index=[0, 1])
    out = _vals(pts.within(polys), "within")
    assert out == [True, False]


def test_predicate_align_reorders_by_index(spark):
    pts = GeoSeries.from_wkt(
        spark, ["POINT (2 2)", "POINT (9 9)"], index=[0, 1]
    )
    # polygon containing (9 9) carries label 1, so aligned within is
    # True for both rows; positional (align=False) is False for both
    far = "POLYGON ((8 8, 10 8, 10 10, 8 10, 8 8))"
    polys = GeoSeries.from_wkt(spark, [far, SQ], index=[1, 0])
    assert _vals(pts.within(polys, align=True), "within") == [True, True]
    assert _vals(pts.within(polys, align=False), "within") == [False, False]


def test_contains_align_default_false(spark):
    # contains keeps the reference's align=False default: unequal
    # lengths raise
    polys = GeoSeries.from_wkt(spark, [SQ])
    pts = GeoSeries.from_wkt(spark, ["POINT (2 2)", "POINT (9 9)"])
    with pytest.raises(ValueError, match="align"):
        polys.contains(pts).collect()
    assert _vals(polys.contains(pts, align=True), "contains") == [True, False]


# -------------------------------------------------------------- allpairs


def test_contains_allpairs(spark):
    polys = GeoSeries.from_wkt(
        spark,
        [SQ, "POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10))"],
    )
    pts = GeoSeries.from_wkt(
        spark,
        ["POINT (1 1)", "POINT (11 11)", "POINT (2 2)", "POINT (50 50)"],
    )
    out = polys.contains(pts, allpairs=True).collect()
    pairs = sorted((r["point_indices"], r["polygon_indices"]) for r in out)
    assert pairs == [(0, 0), (1, 1), (2, 0)]


def test_contains_allpairs_excludes_boundary(spark):
    polys = GeoSeries.from_wkt(spark, [SQ])
    pts = GeoSeries.from_wkt(spark, ["POINT (2 0)", "POINT (2 2)"])
    out = polys.contains(pts, allpairs=True).collect()
    pairs = sorted((r["point_indices"], r["polygon_indices"]) for r in out)
    assert pairs == [(1, 0)]  # the on-edge point (2 0) is excluded


def test_contains_allpairs_with_align_missing_rows(spark):
    # align introduces a missing polygon row (label 1 has no polygon):
    # it yields no pairs; indices stay positional over the aligned rows
    polys = GeoSeries.from_wkt(spark, [SQ], index=[0])
    pts = GeoSeries.from_wkt(
        spark, ["POINT (1 1)", "POINT (2 2)"], index=[0, 1]
    )
    out = polys.contains(pts, align=True, allpairs=True).collect()
    pairs = sorted((r["point_indices"], r["polygon_indices"]) for r in out)
    assert pairs == [(0, 0), (1, 0)]


def test_contains_allpairs_empty_side(spark):
    # zero valid rows on either side must yield an EMPTY pair frame
    # with the contract schema, not a min()-of-empty crash
    polys = GeoSeries.from_wkt(spark, [SQ])
    no_pts = GeoSeries.from_wkt(spark, [])
    out = polys.contains(no_pts, allpairs=True)
    assert out.columns == ["point_indices", "polygon_indices"]
    assert out.count() == 0
    no_polys = GeoSeries.from_wkt(spark, [])
    pts = GeoSeries.from_wkt(spark, ["POINT (1 1)"])
    out2 = no_polys.contains(pts, allpairs=True)
    assert out2.count() == 0


def test_contains_allpairs_requires_polygon_point(spark):
    a = GeoSeries.from_wkt(spark, ["POINT (0 0)"])
    b = GeoSeries.from_wkt(spark, ["POINT (0 0)"])
    with pytest.raises(NotImplementedError):
        a.contains(b, allpairs=True)


# ------------------------------------------------------------------ mode


def test_contains_mode_basic_count(spark):
    polys = GeoSeries.from_wkt(spark, [SQ, SQ, SQ])
    mps = GeoSeries.from_wkt(
        spark,
        [
            "MULTIPOINT ((1 1), (2 2), (3 3))",   # 3 inside
            "MULTIPOINT ((1 1), (9 9))",          # 1 inside
            "MULTIPOINT ((2 0), (9 9))",          # boundary pt excluded
        ],
    )
    assert _vals(polys.contains(mps, mode="basic_count"), "contains") == [3, 1, 0]
    assert _vals(polys.contains(mps, mode="basic_any"), "contains") == [
        True, True, False,
    ]
    assert _vals(polys.contains(mps, mode="basic_none"), "contains") == [
        False, False, True,
    ]
    assert _vals(polys.contains(mps, mode="basic_all"), "contains") == [
        True, False, False,
    ]


def test_contains_mode_linestring_vertices(spark):
    polys = GeoSeries.from_wkt(spark, [SQ, SQ])
    lines = GeoSeries.from_wkt(
        spark,
        [
            "LINESTRING (1 1, 2 2, 3 3)",  # all 3 vertices inside
            "LINESTRING (1 1, 9 9)",       # 1 of 2 inside
        ],
    )
    assert _vals(
        polys.contains_properly(lines, mode="basic_count"), "contains_properly"
    ) == [3, 1]
    assert _vals(
        polys.contains_properly(lines, mode="basic_all"), "contains_properly"
    ) == [True, False]


def test_contains_mode_invalid(spark):
    polys = GeoSeries.from_wkt(spark, [SQ])
    pts = GeoSeries.from_wkt(spark, ["POINT (1 1)"])
    with pytest.raises(ValueError, match="mode"):
        polys.contains(pts, mode="bogus")
    with pytest.raises(NotImplementedError):
        pts.contains(pts, mode="basic_count")


# ------------------------------------------------------------------- loc


def test_loc_scalar_list_mask(spark):
    s = GeoSeries.from_wkt(
        spark,
        ["POINT (0 0)", "POINT (1 1)", "POINT (2 2)"],
        index=[10, 20, 30],
    )
    one = s.loc[20]
    assert len(one) == 1 and one.to_wkt() == ["POINT (1.0 1.0)"]
    two = s.loc[[30, 10]]
    assert list(two.index) == [30, 10]
    assert two.to_wkt() == ["POINT (2.0 2.0)", "POINT (0.0 0.0)"]
    masked = s.loc[np.array([True, False, True])]
    assert list(masked.index) == [10, 30]
    with pytest.raises(KeyError):
        s.loc[99]


def test_scalar_broadcast(spark):
    # reference geoseries.py:1461-1476: a bare geometry broadcasts to
    # self's length and index (WKT-string scalars accepted too)
    pts = GeoSeries.from_wkt(spark, ["POINT (0 0)", "POINT (3 4)"])
    assert _vals(pts.distance("POINT (0 0)"), "distance") == [0.0, 5.0]
    pts2 = GeoSeries.from_wkt(spark, ["POINT (1 1)", "POINT (9 9)"])
    assert _vals(pts2.within(SQ), "within") == [True, False]
    with pytest.raises(TypeError, match="GeoSeries"):
        pts.distance(42)


def test_point_indices(spark):
    s = GeoSeries.from_wkt(
        spark,
        ["LINESTRING (0 0, 1 1, 2 0)", "LINESTRING (5 5, 6 6)"],
        index=[7, 9],
    )
    assert list(s.point_indices) == [7, 7, 7, 9, 9]
    pts = GeoSeries.from_wkt(spark, ["POINT (0 0)", "POINT (1 1)"])
    assert list(pts.point_indices) == [0, 1]
    mixed = GeoSeries.from_wkt(spark, ["POINT (0 0)", "LINESTRING (0 0, 1 1)"])
    with pytest.raises(TypeError):
        mixed.point_indices


def test_isna_notna(spark):
    s = GeoSeries.from_wkt(spark, ["POINT (0 0)", None, "POINT (1 1)"])
    assert list(s.isna()) == [False, True, False]
    assert list(s.notna()) == [True, False, True]


def test_type_accessors(spark):
    # reference GeoColumnAccessor family (geoseries.py:224-341)
    s = GeoSeries.from_wkt(
        spark,
        [
            "POINT (1 2)",
            "LINESTRING (0 0, 1 1, 2 0)",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "MULTIPOINT ((5 5), (6 6))",
        ],
        index=[10, 11, 12, 13],
    )
    assert list(s.points.x) == [1.0] and list(s.points.y) == [2.0]
    assert list(s.points.xy) == [1.0, 2.0]
    assert list(s.lines.x) == [0.0, 1.0, 2.0]
    assert list(s.lines.part_offset) == [0, 3]
    assert list(s.lines.geometry_offset) == [0, 1]
    assert list(s.lines.point_indices()) == [11, 11, 11]
    assert list(s.polygons.ring_offset) == [0, 5]
    assert list(s.polygons.part_offset) == [0, 1]
    assert list(s.polygons.point_indices()) == [12] * 5
    assert list(s.multipoints.geometry_offset) == [0, 2]
    assert list(s.multipoints.xy) == [5.0, 5.0, 6.0, 6.0]
    assert list(s.multipoints.point_indices()) == [13, 13]
    with pytest.raises(AttributeError):
        s.points.geometry_offset


# -------------------------------------------------------------- GeoArrow


def test_to_arrow_roundtrip(spark):
    import pyarrow as pa

    wkts = [
        "POINT (1 2)",
        "MULTIPOINT ((0 0), (1 1))",
        "LINESTRING (0 0, 1 1, 2 0)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
    ]
    s = GeoSeries.from_wkt(spark, wkts)
    arr = s.to_arrow()
    assert isinstance(arr, pa.UnionArray)
    # reference layout: dense union, children [points, mpoints, lines,
    # polygons], type codes = Feature_Enum values
    assert arr.type.mode == "dense"
    assert [f.name for f in arr.type] == ["points", "mpoints", "lines", "polygons"]
    assert arr.type_codes.to_pylist() == [0, 1, 2, 2, 3, 3]

    back = GeoSeries.from_arrow(spark, arr)
    assert back.to_wkt() == s.to_wkt()


def test_to_arrow_none_rows_roundtrip(spark):
    """NONE rows ride as null child entries (dense-union type codes
    can't be -1); from_arrow decodes them back to missing rows."""
    wkts = ["POINT (0 0)", None, "LINESTRING (0 0, 1 1)", None]
    s = GeoSeries.from_wkt(spark, wkts)
    arr = s.to_arrow()
    assert arr.type_codes.to_pylist() == [0, 0, 2, 0]
    back = GeoSeries.from_arrow(spark, arr)
    got = back.to_wkt()
    assert got[1] is None and got[3] is None
    assert got[0].startswith("POINT") and got[2].startswith("LINESTRING")
    assert list(back.isna()) == [False, True, False, True]


# ------------------------------------------- empty multipoint guard


def test_empty_multipoint_never_equals_point(spark):
    import pandas as pd

    from cuspatial_spark.geometry import MultipointArrays
    from cuspatial_spark.operators.binpreds import multipoint_equals_point

    mps = MultipointArrays([0, 0, 1], [5.0], [5.0])  # row 0 EMPTY, row 1 {(5,5)}
    df = spark.createDataFrame(
        pd.DataFrame({"x": [5.0, 5.0], "y": [5.0, 5.0], "multipoint_index": [0, 1]})
    )
    out = [
        r["result"]
        for r in multipoint_equals_point(df, mps).orderBy("multipoint_index").collect()
    ]
    assert out == [False, True]


# -------------------------------------------- review-pass regressions


def test_align_rejects_duplicate_labels(spark):
    a = GeoSeries.from_wkt(spark, ["POINT (0 0)", "POINT (1 1)"], index=[0, 0])
    b = GeoSeries.from_wkt(spark, ["POINT (0 0)", "POINT (1 1)"], index=[0, 1])
    with pytest.raises(ValueError, match="duplicate"):
        a.align(b)
    with pytest.raises(ValueError, match="duplicate"):
        a.distance(b)  # align=True default routes through align


def test_loc_missing_label_not_masked_by_duplicate(spark):
    s = GeoSeries.from_wkt(
        spark, ["POINT (0 0)", "POINT (1 1)", "POINT (2 2)"], index=[10, 10, 20]
    )
    with pytest.raises(KeyError, match="99"):
        s.loc[[10, 99]]
    assert len(s.loc[[10]]) == 2  # duplicated label returns both rows


def test_empty_series_pairwise_returns_empty(spark):
    a = GeoSeries.from_wkt(spark, [])
    b = GeoSeries.from_wkt(spark, [])
    out = a.distance(b)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["row_id", "distance"]
    p = a.intersects(b)
    assert p.count() == 0


def test_contains_mode_missing_rows_false(spark):
    # a label present only on the polys side pairs with a missing rhs:
    # EVERY boolean mode answers False for it (basic_count answers 0)
    polys = GeoSeries.from_wkt(spark, [SQ, SQ], index=[0, 1])
    mps = GeoSeries.from_wkt(spark, ["MULTIPOINT ((1 1), (2 2))"], index=[0])
    for mode, expect in [
        ("basic_none", [False, False]),
        ("basic_any", [True, False]),
        ("basic_all", [True, False]),
        ("basic_count", [2, 0]),
    ]:
        got = _vals(polys.contains(mps, align=True, mode=mode), "contains")
        assert got == expect, (mode, got)


def test_geodataframe_to_arrow(spark):
    import pyarrow as pa

    from cuspatial_spark.geodataframe import GeoDataFrame

    geom = GeoSeries.from_wkt(spark, ["POINT (1 2)", "LINESTRING (0 0, 1 1)"])
    gdf = GeoDataFrame(spark, {"name": ["a", "b"], "geometry": geom})
    t = gdf.to_arrow()
    assert isinstance(t, pa.Table)
    assert t.column_names == ["name", "geometry"]
    assert t.column("name").to_pylist() == ["a", "b"]
    back = GeoSeries.from_arrow(spark, t.column("geometry").combine_chunks())
    assert back.to_wkt() == geom.to_wkt()


def test_reference_surface_parity_extras(spark):
    """feature_types/type/column_type, reset_index, to_pandas, and the
    series-level from_*_xy constructors (reference geoseries.py
    :113-145, :465, :670-825, :933-1007)."""
    s = GeoSeries.from_wkt(
        spark, ["POINT (1 2)", "LINESTRING (0 0, 1 1)"], index=[5, 9]
    )
    assert list(s.feature_types) == [0, 2]
    assert list(s.type) == ["Point", "Linestring"]
    assert list(s.type.index) == [5, 9]
    assert s.column_type == "mixed"

    flat = s.reset_index(drop=True)
    assert list(flat.index) == [0, 1]
    gdf = s.reset_index()
    assert gdf["index"] == [5, 9] or list(gdf["index"]) == [5, 9]

    pds = s.to_pandas()
    assert list(pds.index) == [5, 9] and pds.iloc[0].geom_type == "Point"

    pts = GeoSeries.from_points_xy(spark, [0.0, 0.0, 3.0, 4.0])
    assert pts.to_wkt() == ["POINT (0.0 0.0)", "POINT (3.0 4.0)"]
    assert _vals(pts.distance("POINT (0 0)"), "distance") == [0.0, 5.0]

    mps = GeoSeries.from_multipoints_xy(spark, [0, 0, 1, 1, 2, 2], [0, 2, 3])
    assert mps.kind == "multipoint" and list(mps.sizes) == [2, 1]

    ls = GeoSeries.from_linestrings_xy(
        spark, [0, 0, 1, 1, 2, 2, 3, 3], [0, 2, 4], [0, 1, 2]
    )
    assert ls.kind == "linestring"
    assert ls.to_wkt() == ["LINESTRING (0.0 0.0, 1.0 1.0)", "LINESTRING (2.0 2.0, 3.0 3.0)"]

    pg = GeoSeries.from_polygons_xy(
        spark, [0, 0, 4, 0, 4, 4, 0, 4, 0, 0], [0, 5], [0, 1], [0, 1]
    )
    assert pg.kind == "polygon"
    assert _vals(pg.contains(GeoSeries.from_points_xy(spark, [2.0, 2.0])), "contains") == [True]
