"""Dispatch-matrix sweep for operators/binpred_dispatch.binpred —
modeled on the reference's binpred_test_dispatch.py sweep: engineered
feature fixtures with hand-derived truth per (predicate, type, type)
combo."""

import pandas as pd
import pytest

from cuspatial_spark.geometry import (
    LinestringArrays,
    MultipointArrays,
    PolygonArrays,
)
from cuspatial_spark.operators.binpred_dispatch import binpred

# polygons: P0 big square, P1 inside P0, P2 overlaps P0, P3 edge-touches
# P0, P4 disjoint, P5 == P0 (rotated ring start, reversed winding)
POLYS = PolygonArrays(
    [0, 1, 2, 3, 4, 5, 6],
    [0, 5, 10, 15, 20, 25, 30],
    [0, 4, 4, 0, 0,  1, 2, 2, 1, 1,  2, 6, 6, 2, 2,  4, 8, 8, 4, 4,
     10, 11, 11, 10, 10,  4, 4, 0, 0, 4],
    [0, 0, 4, 4, 0,  1, 1, 2, 2, 1,  2, 2, 6, 6, 2,  0, 0, 4, 4, 0,
     10, 10, 11, 11, 10,  4, 0, 0, 4, 4],
)

# linestrings: L0 bottom edge of P0, L1 inside P0, L2 crosses P0,
# L3 subchain of L0, L4 reverse of L0, L5 disjoint
LINES = LinestringArrays(
    [0, 2, 4, 6, 8, 10, 12],
    [0.0, 4.0,  1.0, 3.0,  -1.0, 5.0,  0.0, 2.0,  4.0, 0.0,  10.0, 12.0],
    [0.0, 0.0,  1.0, 3.0,   2.0, 2.0,  0.0, 0.0,  0.0, 0.0,   0.0,  0.0],
)

# multipoints: M0 inside P0, M1 on P0's boundary corners, M2 mixed
# in/out, M3 == M0 permuted
MPS = MultipointArrays(
    [0, 2, 4, 6, 8],
    [1.0, 2.0,  0.0, 4.0,  1.0, 5.0,  2.0, 1.0],
    [1.0, 2.0,  0.0, 4.0,  1.0, 5.0,  2.0, 1.0],
)


def _run(spark, pred, lk, rk, rows, lhs_layer=None, rhs_layer=None, **kw):
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = binpred(df, pred, lk, rk, lhs_layer, rhs_layer, result="r", **kw)
    return [bool(v) for v in out.orderBy("case").toPandas()["r"]]


# ------------------------------------------------------- point combos


def test_point_point(spark):
    rows = {"case": [0, 1], "x": [1.0, 1.0], "y": [2.0, 2.0],
            "x2": [1.0, 3.0], "y2": [2.0, 2.0]}
    assert _run(spark, "geom_equals", "point", "point", rows) == [True, False]
    assert _run(spark, "intersects", "point", "point", rows) == [True, False]
    assert _run(spark, "disjoint", "point", "point", rows) == [False, True]
    assert _run(spark, "touches", "point", "point", rows) == [False, False]
    assert _run(spark, "crosses", "point", "point", rows) == [False, False]


def test_point_polygon(spark):
    # interior, boundary (bottom edge — horizontal edges are outside
    # under ray-cast parity, the kernel's documented edge semantics),
    # outside of P0
    rows = {"case": [0, 1, 2], "x": [2.0, 2.0, 9.0], "y": [2.0, 0.0, 9.0],
            "polygon_index": [0, 0, 0]}
    assert _run(spark, "within", "point", "polygon", rows, rhs_layer=POLYS) == [True, False, False]
    assert _run(spark, "touches", "point", "polygon", rows, rhs_layer=POLYS) == [False, True, False]
    assert _run(spark, "intersects", "point", "polygon", rows, rhs_layer=POLYS) == [True, True, False]
    assert _run(spark, "disjoint", "point", "polygon", rows, rhs_layer=POLYS) == [False, False, True]
    # repo/reference convention: non-proper contains is boundary-
    # inclusive (== covers); contains_properly is the strict variant
    assert _run(spark, "contains", "polygon", "point", rows, lhs_layer=POLYS) == [True, True, False]
    assert _run(spark, "covers", "polygon", "point", rows, lhs_layer=POLYS) == [True, True, False]
    assert _run(spark, "contains_properly", "polygon", "point", rows, lhs_layer=POLYS) == [True, False, False]


def test_point_linestring(spark):
    # on interior of L0, on endpoint, off the line
    rows = {"case": [0, 1, 2], "x": [2.0, 0.0, 2.0], "y": [0.0, 0.0, 1.0],
            "linestring_index": [0, 0, 0]}
    assert _run(spark, "within", "point", "linestring", rows, rhs_layer=LINES) == [True, False, False]
    assert _run(spark, "touches", "point", "linestring", rows, rhs_layer=LINES) == [False, True, False]
    assert _run(spark, "intersects", "point", "linestring", rows, rhs_layer=LINES) == [True, True, False]
    assert _run(spark, "covers", "linestring", "point", rows, rhs_layer=None, lhs_layer=LINES) == [True, True, False]
    assert _run(spark, "contains", "linestring", "point", rows, lhs_layer=LINES) == [True, False, False]


def test_point_multipoint(spark):
    rows = {"case": [0, 1], "x": [1.0, 3.0], "y": [1.0, 3.0],
            "multipoint_index": [0, 0]}
    assert _run(spark, "within", "point", "multipoint", rows, rhs_layer=MPS) == [True, False]
    assert _run(spark, "intersects", "point", "multipoint", rows, rhs_layer=MPS) == [True, False]
    assert _run(spark, "disjoint", "point", "multipoint", rows, rhs_layer=MPS) == [False, True]


# --------------------------------------------------- multipoint combos


def test_multipoint_polygon(spark):
    rows = {"case": [0, 1, 2], "multipoint_index": [0, 1, 2],
            "polygon_index": [0, 0, 0]}
    assert _run(spark, "within", "multipoint", "polygon", rows, lhs_layer=MPS, rhs_layer=POLYS) == [True, True, False]
    assert _run(spark, "touches", "multipoint", "polygon", rows, lhs_layer=MPS, rhs_layer=POLYS) == [False, True, False]
    assert _run(spark, "covers", "polygon", "multipoint", rows, lhs_layer=POLYS, rhs_layer=MPS) == [True, True, False]
    assert _run(spark, "contains", "polygon", "multipoint", rows, lhs_layer=POLYS, rhs_layer=MPS) == [True, True, False]
    # distance-composed intersects: M2 has one point inside P0
    assert _run(spark, "intersects", "multipoint", "polygon", rows, lhs_layer=MPS, rhs_layer=POLYS) == [True, True, True]


def test_multipoint_linestring(spark):
    # M4 = both points on L0's interior; M5 = endpoints of L0;
    # M6 = one on / one off
    mps = MultipointArrays(
        [0, 2, 4, 6],
        [1.0, 2.0,  0.0, 4.0,  1.0, 9.0],
        [0.0, 0.0,  0.0, 0.0,  0.0, 9.0],
    )
    rows = {"case": [0, 1, 2], "multipoint_index": [0, 1, 2],
            "linestring_index": [0, 0, 0]}
    assert _run(spark, "within", "multipoint", "linestring", rows,
                lhs_layer=mps, rhs_layer=LINES) == [True, True, False]
    assert _run(spark, "covers", "linestring", "multipoint", rows,
                lhs_layer=LINES, rhs_layer=mps) == [True, True, False]
    assert _run(spark, "touches", "multipoint", "linestring", rows,
                lhs_layer=mps, rhs_layer=LINES) == [False, True, False]
    assert _run(spark, "touches", "point", "multipoint",
                {"case": [0], "x": [1.0], "y": [1.0], "multipoint_index": [0]},
                rhs_layer=MPS) == [False]


def test_multipoint_equals(spark):
    rows = {"case": [0, 1], "lhs_index": [0, 0], "rhs_index": [3, 1]}
    assert _run(spark, "geom_equals", "multipoint", "multipoint", rows, lhs_layer=MPS, rhs_layer=MPS) == [True, False]


def test_multipoint_subset(spark):
    # sub = {(1,1)} ⊆ M0 = {(1,1),(2,2)}; not ⊆ M1
    sub = MultipointArrays([0, 1], [1.0], [1.0])
    rows = {"case": [0, 1], "lhs_index": [0, 0], "rhs_index": [0, 1]}
    assert _run(spark, "within", "multipoint", "multipoint", rows,
                lhs_layer=sub, rhs_layer=MPS) == [True, False]
    rows2 = {"case": [0, 1], "lhs_index": [0, 1], "rhs_index": [0, 0]}
    assert _run(spark, "covers", "multipoint", "multipoint", rows2,
                lhs_layer=MPS, rhs_layer=sub) == [True, False]
    rows3 = {"case": [0, 1], "x": [2.0, 3.0], "y": [2.0, 3.0],
             "multipoint_index": [0, 0]}
    assert _run(spark, "covers", "multipoint", "point", rows3,
                lhs_layer=MPS) == [True, False]


# --------------------------------------------------- linestring combos


def test_linestring_linestring(spark):
    # (L0 vs L4 reversed-equal), (L0 covers L3), (L1 vs L2 cross),
    # (L0 vs L5 disjoint), (L0 vs L2 touch at (... L2 passes through
    # y=2: no) -> use L0 vs L1: share no point
    rows = {"case": [0, 1, 2, 3, 4],
            "lhs_index": [0, 0, 1, 0, 0],
            "rhs_index": [4, 3, 2, 5, 1]}
    assert _run(spark, "geom_equals", "linestring", "linestring", rows, lhs_layer=LINES, rhs_layer=LINES) == [True, False, False, False, False]
    assert _run(spark, "covers", "linestring", "linestring", rows, lhs_layer=LINES, rhs_layer=LINES) == [True, True, False, False, False]
    assert _run(spark, "intersects", "linestring", "linestring", rows, lhs_layer=LINES, rhs_layer=LINES) == [True, True, True, False, False]
    assert _run(spark, "crosses", "linestring", "linestring", rows, lhs_layer=LINES, rhs_layer=LINES) == [False, False, True, False, False]
    # within: L3 within L0
    rows_w = {"case": [0, 1], "lhs_index": [3, 5], "rhs_index": [0, 0]}
    assert _run(spark, "within", "linestring", "linestring", rows_w, lhs_layer=LINES, rhs_layer=LINES) == [True, False]


def test_linestring_polygon(spark):
    # L1 inside P0; L2 crosses P0; L0 along P0's bottom edge (touches);
    # L5 disjoint
    rows = {"case": [0, 1, 2, 3],
            "linestring_index": [1, 2, 0, 5],
            "polygon_index": [0, 0, 0, 0]}
    assert _run(spark, "within", "linestring", "polygon", rows, lhs_layer=LINES, rhs_layer=POLYS) == [True, False, True, False]
    assert _run(spark, "crosses", "linestring", "polygon", rows, lhs_layer=LINES, rhs_layer=POLYS) == [False, True, False, False]
    assert _run(spark, "touches", "linestring", "polygon", rows, lhs_layer=LINES, rhs_layer=POLYS) == [False, False, True, False]
    assert _run(spark, "intersects", "linestring", "polygon", rows, lhs_layer=LINES, rhs_layer=POLYS) == [True, True, True, False]
    assert _run(spark, "covers", "polygon", "linestring", rows, lhs_layer=POLYS, rhs_layer=LINES) == [True, False, True, False]
    assert _run(spark, "covers", "linestring", "polygon", rows, lhs_layer=LINES, rhs_layer=POLYS) == [False, False, False, False]


# ------------------------------------------------------ polygon combos


def test_polygon_polygon(spark):
    # (P0 contains P1), (P0 vs P2 overlap), (P0 vs P3 touch),
    # (P0 vs P4 disjoint), (P0 vs P5 equal)
    rows = {"case": [0, 1, 2, 3, 4],
            "lhs_index": [0, 0, 0, 0, 0],
            "rhs_index": [1, 2, 3, 4, 5]}
    assert _run(spark, "contains", "polygon", "polygon", rows, lhs_layer=POLYS, rhs_layer=POLYS) == [True, False, False, False, True]
    assert _run(spark, "overlaps", "polygon", "polygon", rows, lhs_layer=POLYS, rhs_layer=POLYS) == [False, True, False, False, False]
    assert _run(spark, "touches", "polygon", "polygon", rows, lhs_layer=POLYS, rhs_layer=POLYS) == [False, False, True, False, False]
    assert _run(spark, "intersects", "polygon", "polygon", rows, lhs_layer=POLYS, rhs_layer=POLYS) == [True, True, True, False, True]
    assert _run(spark, "disjoint", "polygon", "polygon", rows, lhs_layer=POLYS, rhs_layer=POLYS) == [False, False, False, True, False]
    assert _run(spark, "geom_equals", "polygon", "polygon", rows, lhs_layer=POLYS, rhs_layer=POLYS) == [False, False, False, False, True]
    # within: P1 within P0
    rows_w = {"case": [0, 1], "lhs_index": [1, 2], "rhs_index": [0, 0]}
    assert _run(spark, "within", "polygon", "polygon", rows_w, lhs_layer=POLYS, rhs_layer=POLYS) == [True, False]


def test_contains_properly_matrix(spark):
    # (polygon, multipoint): strictly-inside vs boundary-touching
    rows = {"case": [0, 1], "polygon_index": [0, 0], "multipoint_index": [0, 1]}
    assert _run(spark, "contains_properly", "polygon", "multipoint", rows,
                lhs_layer=POLYS, rhs_layer=MPS) == [True, False]
    # (polygon, linestring): interior L1 yes; boundary L0 no; crossing L2 no
    rows = {"case": [0, 1, 2], "polygon_index": [0, 0, 0],
            "linestring_index": [1, 0, 2]}
    assert _run(spark, "contains_properly", "polygon", "linestring", rows,
                lhs_layer=POLYS, rhs_layer=LINES) == [True, False, False]
    # (polygon, polygon): P1 strictly inside P0; P5 == P0 (boundary) no
    rows = {"case": [0, 1], "lhs_index": [0, 0], "rhs_index": [1, 5]}
    assert _run(spark, "contains_properly", "polygon", "polygon", rows,
                lhs_layer=POLYS, rhs_layer=POLYS) == [True, False]
    # (linestring, point): interior of L0 yes; endpoint no
    rows = {"case": [0, 1], "x": [2.0, 0.0], "y": [0.0, 0.0],
            "linestring_index": [0, 0]}
    assert _run(spark, "contains_properly", "linestring", "point", rows,
                lhs_layer=LINES) == [True, False]
    # (point, point): equality
    rows = {"case": [0, 1], "x": [1.0, 1.0], "y": [1.0, 1.0],
            "x2": [1.0, 2.0], "y2": [1.0, 1.0]}
    assert _run(spark, "contains_properly", "point", "point", rows) == [True, False]


def test_residual_cells_truth(spark):
    """Truth checks for the dispatch cells filled in round 3 (verdict
    task 4): multipoint rows the reference leaves NotImplemented get
    real set semantics; reference-impossible rows answer False."""
    # within (mp, pt) / covers (pt, mp): all mp points equal the point
    mp_eq = MultipointArrays([0, 2, 3], [1.0, 1.0, 1.0], [1.0, 1.0, 1.0])
    rows = {"case": [0, 1], "multipoint_index": [0, 0],
            "x": [1.0, 2.0], "y": [1.0, 2.0]}
    assert _run(spark, "within", "multipoint", "point", rows,
                lhs_layer=mp_eq) == [True, False]
    assert _run(spark, "covers", "point", "multipoint", rows,
                rhs_layer=mp_eq) == [True, False]
    # contains / contains_properly (mp, pt): set membership
    rows2 = {"case": [0, 1], "multipoint_index": [0, 0],
             "x": [2.0, 3.0], "y": [2.0, 3.0]}
    assert _run(spark, "contains", "multipoint", "point", rows2,
                lhs_layer=MPS) == [True, False]
    assert _run(spark, "contains_properly", "multipoint", "point", rows2,
                lhs_layer=MPS) == [True, False]
    # contains_properly (pt, mp): reference is intersection-based
    assert _run(spark, "contains_properly", "point", "multipoint", rows2,
                rhs_layer=MPS) == [True, False]
    # contains (mp, mp): superset
    sub = MultipointArrays([0, 1], [1.0], [1.0])
    rows3 = {"case": [0, 1], "lhs_index": [0, 1], "rhs_index": [0, 0]}
    assert _run(spark, "contains", "multipoint", "multipoint", rows3,
                lhs_layer=MPS, rhs_layer=sub) == [True, False]
    # contains / contains_properly (ls, mp): on-chain with interior rules
    mps_ln = MultipointArrays(
        [0, 2, 4, 6],
        [1.0, 2.0,  0.0, 4.0,  1.0, 0.0],
        [0.0, 0.0,  0.0, 0.0,  0.0, 0.0],
    )  # M0 both interior of L0; M1 = endpoints; M2 = interior + endpoint
    rows4 = {"case": [0, 1, 2], "multipoint_index": [0, 1, 2],
             "linestring_index": [0, 0, 0]}
    assert _run(spark, "contains", "linestring", "multipoint", rows4,
                lhs_layer=LINES, rhs_layer=mps_ln) == [True, False, True]
    assert _run(spark, "contains_properly", "linestring", "multipoint", rows4,
                lhs_layer=LINES, rhs_layer=mps_ln) == [True, False, False]
    # contains_properly (ls, ls): reference is equals-based
    rows5 = {"case": [0, 1], "lhs_index": [0, 0], "rhs_index": [4, 3]}
    assert _run(spark, "contains_properly", "linestring", "linestring", rows5,
                lhs_layer=LINES, rhs_layer=LINES) == [True, False]
    # overlaps (mp, mp): shared point + proper difference both ways
    a = MultipointArrays([0, 2, 4, 6], [1.0, 2.0, 1.0, 2.0, 5.0, 6.0],
                         [1.0, 2.0, 1.0, 2.0, 5.0, 6.0])
    b = MultipointArrays([0, 2], [2.0, 3.0], [2.0, 3.0])
    rows6 = {"case": [0, 1, 2], "lhs_index": [0, 1, 2], "rhs_index": [0, 0, 0]}
    # a0={(1,1),(2,2)} vs b={(2,2),(3,3)}: overlap; a1 same as a0: overlap;
    # a2={(5,5),(6,6)}: disjoint
    assert _run(spark, "overlaps", "multipoint", "multipoint", rows6,
                lhs_layer=a, rhs_layer=b) == [True, True, False]
    # subset is NOT overlap
    rows7 = {"case": [0], "lhs_index": [0], "rhs_index": [0]}
    assert _run(spark, "overlaps", "multipoint", "multipoint", rows7,
                lhs_layer=MPS, rhs_layer=sub) == [False]
    # reference-impossible cells answer False instead of raising
    rows8 = {"case": [0], "x": [1.0], "y": [1.0], "multipoint_index": [0],
             "linestring_index": [0], "polygon_index": [0],
             "lhs_index": [0], "rhs_index": [0]}
    assert _run(spark, "contains", "point", "polygon", rows8, rhs_layer=POLYS) == [False]
    assert _run(spark, "contains", "linestring", "polygon", rows8,
                lhs_layer=LINES, rhs_layer=POLYS) == [False]
    assert _run(spark, "within", "linestring", "point", rows8, lhs_layer=LINES) == [False]
    assert _run(spark, "covers", "multipoint", "polygon", rows8,
                lhs_layer=MPS, rhs_layer=POLYS) == [False]


def test_full_matrix_never_raises(spark):
    """Every (predicate x lhs_kind x rhs_kind) cell answers: the
    reference dispatch has an entry for all 160 combos
    (core/binpreds/binpred_dispatch.py:11-40) and a migrating user
    must get a boolean column, never NotImplementedError."""
    from itertools import product

    from cuspatial_spark.operators.binpred_dispatch import PREDICATES

    kinds = {
        "point": None,
        "multipoint": MPS,
        "linestring": LINES,
        "polygon": POLYS,
    }
    rows = {"case": [0], "x": [1.0], "y": [1.0], "x2": [1.0], "y2": [1.0],
            "multipoint_index": [0], "linestring_index": [0],
            "polygon_index": [0], "lhs_index": [0], "rhs_index": [0]}
    df = spark.createDataFrame(pd.DataFrame(rows))
    lazy = []
    for p, lk, rk in product(PREDICATES, kinds, kinds):
        out = binpred(df, p, lk, rk, kinds[lk], kinds[rk], result="r")
        lazy.append((p, lk, rk, out))
    for p, lk, rk, out in lazy:
        got = out.select("r").collect()
        assert len(got) == 1 and got[0]["r"] in (True, False), (p, lk, rk)
