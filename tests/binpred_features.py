"""Reference binary-predicate feature corpus — DATA-ONLY port of
/root/reference/python/cuspatial/cuspatial/testing/test_geometries.py
(the fixtures behind binpred_test_dispatch.py), re-serialized as WKT.

`EXPECTED` holds hand-derived truths under THIS engine's documented
conventions (boundary-inclusive non-proper contains/covers/within for
(linestring|polygon, polygon); ray-cast within for points, which is
why within is not asserted for points sitting on a vertical edge or
corner — parity there requires the ULP kernel path).  Predicates not
listed for a feature are still property-checked by the sweep.
"""

SQ = "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"  # reference point_polygon

FEATURES = {
    # ---- point-point
    "point-point-disjoint": ("point", "POINT (0 0)", "point", "POINT (1 0)"),
    "point-point-equal": ("point", "POINT (0 0)", "point", "POINT (0 0)"),
    # ---- point-linestring
    "point-linestring-disjoint": ("point", "POINT (0 0)", "linestring", "LINESTRING (1 0, 2 0)"),
    "point-linestring-point": ("point", "POINT (0 0)", "linestring", "LINESTRING (0 0, 2 0)"),
    "point-linestring-edge": ("point", "POINT (0.5 0)", "linestring", "LINESTRING (0 0, 1 0)"),
    # ---- point-polygon
    "point-polygon-disjoint": ("point", "POINT (-0.5 0.5)", "polygon", SQ),
    "point-polygon-point": ("point", "POINT (0 0)", "polygon", SQ),
    "point-polygon-edge": ("point", "POINT (0.5 0)", "polygon", SQ),
    "point-polygon-in": ("point", "POINT (0.5 0.5)", "polygon", SQ),
    # ---- linestring-linestring
    "linestring-linestring-disjoint": ("linestring", "LINESTRING (0 0, 1 0)", "linestring", "LINESTRING (0 1, 1 1)"),
    "linestring-linestring-same": ("linestring", "LINESTRING (0 0, 1 0)", "linestring", "LINESTRING (0 0, 1 0)"),
    "linestring-linestring-covers": ("linestring", "LINESTRING (0 0, 1 1)", "linestring", "LINESTRING (0.25 0.25, 0.5 0.5)"),
    "linestring-linestring-touches": ("linestring", "LINESTRING (0 0, 0 1)", "linestring", "LINESTRING (0 0, 1 0)"),
    "linestring-linestring-touch-interior": ("linestring", "LINESTRING (0 1, 0 0, 1 0)", "linestring", "LINESTRING (0 0, 1 1)"),
    "linestring-linestring-touch-edge": ("linestring", "LINESTRING (0 0, 1 0)", "linestring", "LINESTRING (0.5 0, 0.5 1)"),
    "linestring-linestring-touch-edge-twice": ("linestring", "LINESTRING (0 0, 1 1, 2 2)", "linestring", "LINESTRING (0.25 0.25, 1 0, 0.5 0.5)"),
    "linestring-linestring-crosses": ("linestring", "LINESTRING (0.5 0, 0.5 1)", "linestring", "LINESTRING (0 0.5, 1 0.5)"),
    "linestring-linestring-touch-and-cross": ("linestring", "LINESTRING (0 0, 1 1)", "linestring", "LINESTRING (0.5 0.5, 1 0.1, -1 0.1)"),
    # ---- linestring-polygon
    "linestring-polygon-disjoint": ("linestring", "LINESTRING (-0.5 0, -0.5 1)", "polygon", SQ),
    "linestring-polygon-touch-point": ("linestring", "LINESTRING (-1 0, 0 0)", "polygon", SQ),
    "linestring-polygon-touch-edge": ("linestring", "LINESTRING (-1 0.5, 0 0.5)", "polygon", SQ),
    "linestring-polygon-overlap-edge": ("linestring", "LINESTRING (0 0, 0 1)", "polygon", SQ),
    "linestring-polygon-intersect-edge": ("linestring", "LINESTRING (-0.5 0, 0.5 0)", "polygon", SQ),
    "linestring-polygon-intersect-inner-edge": ("linestring", "LINESTRING (0.25 0, 0.75 0)", "polygon", SQ),
    "linestring-polygon-point-interior": ("linestring", "LINESTRING (0 0, 1 1)", "polygon", SQ),
    "linestring-polygon-edge-interior": ("linestring", "LINESTRING (0.5 0, 0.5 1)", "polygon", SQ),
    "linestring-polygon-in": ("linestring", "LINESTRING (0.5 0.25, 0.5 0.75)", "polygon", SQ),
    "linestring-polygon-in-out": ("linestring", "LINESTRING (0.5 0.5, 0.5 -0.5)", "polygon", SQ),
    "linestring-polygon-crosses": ("linestring", "LINESTRING (0.5 1.25, 0.5 -0.25)", "polygon", SQ),
    "linestring-polygon-cross-concave-edge": ("linestring", "LINESTRING (0.5 0, 0.5 1)", "polygon", "POLYGON ((0 0, 0 1, 0.3 0.4, 1 1, 1 0, 0 0))"),
    "linestring-polygon-half-in": ("linestring", "LINESTRING (0 0, 0.25 0, 0.5 0.5, 0.75 0, 1 0)", "polygon", SQ),
    "linestring-polygon-half-out": ("linestring", "LINESTRING (0 0, 0.25 0, 0.5 -0.5, 0.75 0, 1 0)", "polygon", SQ),
    "linestring-polygon-two-edges": ("linestring", "LINESTRING (0 1, 0 0, 1 0)", "polygon", SQ),
    "linestring-polygon-edge-to-interior": ("linestring", "LINESTRING (0 1, 0 0, 1 0.5)", "polygon", SQ),
    "linestring-polygon-edge-cross-to-exterior": ("linestring", "LINESTRING (0 1, 0 0, 1.5 0.5)", "polygon", SQ),
    # ---- polygon-polygon
    "polygon-polygon-disjoint": ("polygon", "POLYGON ((0 2, 0 3, 1 3, 0 2))", "polygon", SQ),
    "polygon-polygon-touch-point": ("polygon", "POLYGON ((0 1, 0 2, 1 2, 0 1))", "polygon", SQ),
    "polygon-polygon-touch-edge": ("polygon", "POLYGON ((0.25 1, 0.25 2, 1.25 2, 0.25 1))", "polygon", SQ),
    "polygon-polygon-overlap-edge": ("polygon", "POLYGON ((0 1, 0 2, 1 2, 0 1))", "polygon", SQ),
    "polygon-polygon-overlap-inside-edge": ("polygon", "POLYGON ((0 0, 1 0, 1 1, 0 0))", "polygon", "POLYGON ((0.25 0.25, 0.5 0.5, 0 0.5, 0.25 0.25))"),
    "polygon-polygon-point-inside": ("polygon", "POLYGON ((0.5 0.5, 0.5 1.5, 1.5 1.5, 0.5 0.5))", "polygon", SQ),
    "polygon-polygon-point-outside": ("polygon", "POLYGON ((0.25 0.75, 0.25 1.25, 0.75 0.75, 0.25 0.75))", "polygon", SQ),
    "polygon-polygon-in-out-point": ("polygon", "POLYGON ((0.5 0.5, 0.5 1.5, 1 1, 0.5 0.5))", "polygon", SQ),
    "polygon-polygon-in-point-point": ("polygon", "POLYGON ((0 0, 0 1, 0.5 0.5, 0 0))", "polygon", SQ),
    "polygon-polygon-contained": ("polygon", "POLYGON ((0.25 0.25, 0.75 0.75, 0.75 0.25, 0.25 0.25))", "polygon", SQ),
    "polygon-polygon-same": ("polygon", SQ, "polygon", SQ),
}

# hand-derived truths under this engine's documented conventions
EXPECTED = {
    "point-point-disjoint": {"disjoint": True, "geom_equals": False},
    "point-point-equal": {"geom_equals": True, "within": True, "contains": True, "covers": True},
    "point-linestring-disjoint": {"disjoint": True},
    "point-linestring-point": {"touches": True, "within": False, "intersects": True},
    "point-linestring-edge": {"within": True, "touches": False},
    "point-polygon-disjoint": {"disjoint": True},
    # (0,0) sits on a corner adjoining a vertical edge: ray-cast parity
    # is unspecified there, so only the exact boundary-distance
    # predicates are asserted
    "point-polygon-point": {"touches": True, "intersects": True},
    "point-polygon-edge": {"touches": True, "within": False, "intersects": True},
    "point-polygon-in": {"within": True, "touches": False},
    "linestring-linestring-disjoint": {"disjoint": True},
    "linestring-linestring-same": {"geom_equals": True, "covers": True, "within": True},
    "linestring-linestring-covers": {"covers": True, "geom_equals": False, "crosses": False},
    "linestring-linestring-touches": {"touches": True, "crosses": False},
    "linestring-linestring-touch-interior": {"touches": True, "crosses": False},
    "linestring-linestring-touch-edge": {"touches": True, "crosses": False},
    "linestring-linestring-touch-edge-twice": {"touches": True, "crosses": False},
    "linestring-linestring-crosses": {"crosses": True, "touches": False},
    "linestring-linestring-touch-and-cross": {"crosses": True},
    "linestring-polygon-disjoint": {"disjoint": True},
    "linestring-polygon-touch-point": {"touches": True, "crosses": False, "within": False},
    "linestring-polygon-touch-edge": {"touches": True, "crosses": False, "within": False},
    # boundary-inclusive convention: a chain lying ON the boundary is
    # both within (non-proper) and touches
    "linestring-polygon-overlap-edge": {"within": True, "touches": True, "crosses": False},
    "linestring-polygon-intersect-edge": {"touches": True, "within": False, "crosses": False},
    "linestring-polygon-intersect-inner-edge": {"within": True, "touches": True},
    "linestring-polygon-point-interior": {"within": True, "touches": False, "crosses": False},
    "linestring-polygon-edge-interior": {"within": True, "touches": False},
    "linestring-polygon-in": {"within": True, "touches": False, "crosses": False},
    "linestring-polygon-in-out": {"crosses": True, "within": False, "touches": False},
    "linestring-polygon-crosses": {"crosses": True, "within": False},
    "linestring-polygon-cross-concave-edge": {"crosses": True},
    "linestring-polygon-half-in": {"within": True, "crosses": False, "touches": False},
    "linestring-polygon-half-out": {"touches": True, "within": False, "crosses": False},
    "linestring-polygon-two-edges": {"within": True, "touches": True},
    "linestring-polygon-edge-to-interior": {"within": True, "touches": False},
    "linestring-polygon-edge-cross-to-exterior": {"crosses": True, "within": False},
    "polygon-polygon-disjoint": {"disjoint": True},
    "polygon-polygon-touch-point": {"touches": True, "overlaps": False},
    "polygon-polygon-touch-edge": {"touches": True, "overlaps": False},
    "polygon-polygon-overlap-edge": {"touches": True, "overlaps": False},
    "polygon-polygon-overlap-inside-edge": {"touches": True, "overlaps": False},
    "polygon-polygon-point-inside": {"overlaps": True, "touches": False},
    "polygon-polygon-point-outside": {"overlaps": True, "touches": False},
    "polygon-polygon-in-out-point": {"overlaps": True, "touches": False},
    "polygon-polygon-in-point-point": {"within": True, "overlaps": False},
    "polygon-polygon-contained": {"within": True, "overlaps": False, "touches": False},
    "polygon-polygon-same": {"geom_equals": True, "contains": True, "covers": True, "within": True, "overlaps": False, "touches": False},
}
