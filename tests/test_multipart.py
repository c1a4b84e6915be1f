"""Multi-part geometry (multilinestring / multipolygon) support:
pairwise distances min-reduce over parts, bounding boxes flatten parts
(reference core/spatial/distance.py:243-314 multilinestring branches,
core/spatial/bounding.py:19-80 part flattening), and the quadtree join
family raises the reference's single-part validation error
(core/spatial/join.py:71-74,317-320)."""

import numpy as np
import pandas as pd
import pytest

from cuspatial_spark.geometry import (
    LinestringArrays,
    MultiLinestringArrays,
    MultipointArrays,
    MultiPolygonArrays,
    PolygonArrays,
)
from cuspatial_spark.operators import pairwise as pw
from cuspatial_spark.operators.distance import pairwise_point_linestring_distance
from cuspatial_spark.operators.dispatch import distance


def _random_mls(rng, n, max_parts=3, pts_per=4):
    """Random multilinestring layer + the per-geometry part ranges."""
    parts_per = rng.integers(1, max_parts + 1, size=n)
    geometry_offsets = np.concatenate(([0], np.cumsum(parts_per)))
    n_parts = int(geometry_offsets[-1])
    part_offsets = np.arange(n_parts + 1, dtype=np.int64) * pts_per
    xs = rng.uniform(0, 10, n_parts * pts_per)
    ys = rng.uniform(0, 10, n_parts * pts_per)
    return MultiLinestringArrays(geometry_offsets, LinestringArrays(part_offsets, xs, ys))


def _random_mpoly(rng, n, max_parts=3):
    """Random multipolygon layer of triangles."""
    parts_per = rng.integers(1, max_parts + 1, size=n)
    geometry_offsets = np.concatenate(([0], np.cumsum(parts_per)))
    n_parts = int(geometry_offsets[-1])
    part_offsets = np.arange(n_parts + 1, dtype=np.int64)  # 1 ring per part
    ring_offsets = np.arange(n_parts + 1, dtype=np.int64) * 4
    cx = rng.uniform(1, 9, n_parts)
    cy = rng.uniform(1, 9, n_parts)
    xs = np.stack([cx - 0.5, cx + 0.5, cx, cx - 0.5], axis=1).ravel()
    ys = np.stack([cy - 0.5, cy - 0.5, cy + 0.5, cy - 0.5], axis=1).ravel()
    return MultiPolygonArrays(
        geometry_offsets, PolygonArrays(part_offsets, ring_offsets, xs, ys)
    )


def _seg_dist(px, py, ax, ay, bx, by):
    abx, aby = bx - ax, by - ay
    l2 = abx * abx + aby * aby
    t = np.clip(((px - ax) * abx + (py - ay) * aby) / np.where(l2 == 0, 1, l2), 0, 1)
    qx, qy = ax + t * abx, ay + t * aby
    return np.hypot(px - qx, py - qy)


def _segs_cross(ax, ay, bx, by, cx, cy, dx, dy):
    d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    d2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
    d3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
    d4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
    return (d1 * d2 < 0) and (d3 * d4 < 0)


def _brute_ls_dist(la, lb):
    """Min distance between two vertex chains: 0 if any segment pair
    crosses, else min endpoint-to-segment distance."""
    best = np.inf
    ax, ay = la
    bx, by = lb
    for i in range(len(ax) - 1):
        for j in range(len(bx) - 1):
            if _segs_cross(ax[i], ay[i], ax[i + 1], ay[i + 1],
                           bx[j], by[j], bx[j + 1], by[j + 1]):
                return 0.0
            best = min(
                best,
                _seg_dist(ax[i], ay[i], bx[j], by[j], bx[j + 1], by[j + 1]),
                _seg_dist(ax[i + 1], ay[i + 1], bx[j], by[j], bx[j + 1], by[j + 1]),
                _seg_dist(bx[j], by[j], ax[i], ay[i], ax[i + 1], ay[i + 1]),
                _seg_dist(bx[j + 1], by[j + 1], ax[i], ay[i], ax[i + 1], ay[i + 1]),
            )
    return best


def _geom_chains(mls, g):
    po = mls.parts.part_offsets
    for p in range(mls.geometry_offsets[g], mls.geometry_offsets[g + 1]):
        s, e = int(po[p]), int(po[p + 1])
        yield mls.parts.x[s:e], mls.parts.y[s:e]


class TestMultiLinestringDistance:
    def test_mls_mls_matches_brute(self, spark):
        rng = np.random.default_rng(41)
        n = 25
        lhs = _random_mls(rng, n)
        rhs = _random_mls(rng, n)
        df = spark.createDataFrame(
            pd.DataFrame({"id": range(n), "lhs_index": range(n), "rhs_index": range(n)})
        )
        got = pw.pairwise_linestring_distance(df, lhs, rhs).orderBy("id").toPandas()
        want = [
            min(
                _brute_ls_dist(a, b)
                for a in _geom_chains(lhs, i)
                for b in _geom_chains(rhs, i)
            )
            for i in range(n)
        ]
        np.testing.assert_allclose(got["distance"], want, rtol=1e-12)

    def test_mls_single_ls_mixed_sides(self, spark):
        rng = np.random.default_rng(42)
        n = 20
        lhs = _random_mls(rng, n)
        pts_per = 4
        part_offsets = np.arange(n + 1, dtype=np.int64) * pts_per
        rhs = LinestringArrays(
            part_offsets, rng.uniform(0, 10, n * pts_per), rng.uniform(0, 10, n * pts_per)
        )
        df = spark.createDataFrame(
            pd.DataFrame({"id": range(n), "lhs_index": range(n), "rhs_index": range(n)})
        )
        got = pw.pairwise_linestring_distance(df, lhs, rhs).orderBy("id").toPandas()
        want = []
        for i in range(n):
            s, e = int(part_offsets[i]), int(part_offsets[i + 1])
            b = (rhs.x[s:e], rhs.y[s:e])
            want.append(min(_brute_ls_dist(a, b) for a in _geom_chains(lhs, i)))
        np.testing.assert_allclose(got["distance"], want, rtol=1e-12)

    def test_point_mls_distance(self, spark):
        rng = np.random.default_rng(43)
        n = 20
        mls = _random_mls(rng, 5)
        xs, ys = rng.uniform(0, 10, n), rng.uniform(0, 10, n)
        df = spark.createDataFrame(
            pd.DataFrame({"id": range(n), "x": xs, "y": ys,
                          "linestring_index": np.arange(n) % 5})
        )
        got = pairwise_point_linestring_distance(df, mls).orderBy("id").toPandas()
        for i in range(n):
            chains = list(_geom_chains(mls, i % 5))
            want = min(
                _seg_dist(xs[i], ys[i], cx[j], cy[j], cx[j + 1], cy[j + 1])
                for cx, cy in chains for j in range(len(cx) - 1)
            )
            assert got["distance"].iloc[i] == pytest.approx(want, rel=1e-12)

    def test_multipoint_mls_distance(self, spark):
        rng = np.random.default_rng(44)
        mls = _random_mls(rng, 5)
        mp = MultipointArrays([0, 2, 4], rng.uniform(0, 10, 4), rng.uniform(0, 10, 4))
        df = spark.createDataFrame(
            pd.DataFrame({"id": [0, 1], "multipoint_index": [0, 1],
                          "linestring_index": [0, 1]})
        )
        got = pw.pairwise_multipoint_linestring_distance(df, mp, mls).orderBy("id").toPandas()
        for i in range(2):
            s, e = int(mp.part_offsets[i]), int(mp.part_offsets[i + 1])
            want = min(
                _seg_dist(mp.x[k], mp.y[k], cx[j], cy[j], cx[j + 1], cy[j + 1])
                for k in range(s, e)
                for cx, cy in _geom_chains(mls, i)
                for j in range(len(cx) - 1)
            )
            assert got["distance"].iloc[i] == pytest.approx(want, rel=1e-12)


class TestMultiPolygonDistance:
    def test_point_mpoly_matches_min_over_parts(self, spark):
        rng = np.random.default_rng(45)
        mpoly = _random_mpoly(rng, 6)
        n = 30
        xs, ys = rng.uniform(0, 10, n), rng.uniform(0, 10, n)
        df = spark.createDataFrame(
            pd.DataFrame({"id": range(n), "x": xs, "y": ys,
                          "polygon_index": np.arange(n) % 6})
        )
        got = pw.pairwise_point_polygon_distance(df, mpoly).orderBy("id").toPandas()
        # oracle: min over the single-part kernel per part
        part_df = []
        go = mpoly.geometry_offsets
        for i in range(n):
            g = i % 6
            for p in range(go[g], go[g + 1]):
                part_df.append((i, xs[i], ys[i], int(p)))
        pdf = pd.DataFrame(part_df, columns=["id", "x", "y", "polygon_index"])
        per_part = (
            pw.pairwise_point_polygon_distance(
                spark.createDataFrame(pdf), mpoly.parts
            ).toPandas().groupby("id")["distance"].min()
        )
        np.testing.assert_allclose(got.set_index("id")["distance"], per_part, rtol=0, atol=0)

    def test_mpoly_mpoly_and_dispatch(self, spark):
        rng = np.random.default_rng(46)
        lhs = _random_mpoly(rng, 8)
        rhs = _random_mpoly(rng, 8)
        df = spark.createDataFrame(
            pd.DataFrame({"id": range(8), "lhs_index": range(8), "rhs_index": range(8)})
        )
        got = pw.pairwise_polygon_distance(df, lhs, rhs).orderBy("id").toPandas()
        via_dispatch = (
            distance(df, "polygon", "polygon", lhs, rhs).orderBy("id").toPandas()
        )
        np.testing.assert_allclose(got["distance"], via_dispatch["distance"], rtol=0, atol=0)
        # oracle for pair 0: min over part pairs via single-part kernel
        go_l, go_r = lhs.geometry_offsets, rhs.geometry_offsets
        rows = [
            (int(a), int(b))
            for a in range(go_l[0], go_l[1])
            for b in range(go_r[0], go_r[1])
        ]
        pdf = pd.DataFrame(rows, columns=["lhs_index", "rhs_index"])
        per_part = pw.pairwise_polygon_distance(
            spark.createDataFrame(pdf), lhs.parts, rhs.parts
        ).toPandas()["distance"].min()
        assert got["distance"].iloc[0] == per_part


class TestMultipartBboxesAndValidation:
    def test_bounding_boxes_flatten_parts(self):
        rng = np.random.default_rng(47)
        mls = _random_mls(rng, 10)
        minx, miny, maxx, maxy = mls.bounding_boxes(0.5)
        for g in range(10):
            xs = np.concatenate([c[0] for c in _geom_chains(mls, g)])
            ys = np.concatenate([c[1] for c in _geom_chains(mls, g)])
            assert minx[g] == xs.min() - 0.5 and maxx[g] == xs.max() + 0.5
            assert miny[g] == ys.min() - 0.5 and maxy[g] == ys.max() + 0.5
        mpoly = _random_mpoly(rng, 10)
        minx, miny, maxx, maxy = mpoly.bounding_boxes()
        s, e = mpoly.vertex_ranges()
        for g in range(10):
            assert minx[g] == mpoly.parts.x[s[g]:e[g]].min()
            assert maxy[g] == mpoly.parts.y[s[g]:e[g]].max()

    def test_quadtree_join_family_rejects_multipart(self, spark):
        from cuspatial_spark.operators import point_in_polygon
        from cuspatial_spark.plans import (
            point_in_polygon_join,
            point_to_nearest_linestring_join,
        )

        rng = np.random.default_rng(48)
        mpoly = _random_mpoly(rng, 3)
        mls = _random_mls(rng, 3)
        pts = spark.createDataFrame(pd.DataFrame({"x": [1.0], "y": [1.0]}))
        with pytest.raises(ValueError, match="multi-part"):
            point_in_polygon_join(pts, mpoly, x_min=0, x_max=10, y_min=0, y_max=10)
        with pytest.raises(ValueError, match="multi-part"):
            point_to_nearest_linestring_join(
                pts, mls, expansion_radius=1.0, x_min=0, x_max=10, y_min=0, y_max=10
            )
        with pytest.raises(ValueError, match="multi-part"):
            point_in_polygon(pts, mpoly)


class TestReferenceDistanceFixtures:
    """The reference's test_pairwise_point_polygon_distance one-pair /
    two-pair fixture shapes (tests/spatial/distance/
    test_pairwise_point_polygon_distance.py:35-107), hand-derived
    expectations in place of its geopandas oracle, run through the
    GeoSeries facade (point & multipoint x polygon & multipolygon)."""

    TRI = "POLYGON ((0.0 1.0, 1.0 0.0, -1.0 0.0, 0.0 1.0))"
    DIAMOND = "POLYGON ((0.0 1.0, 1.0 0.0, 0.0 -1.0, -1.0 0.0, 0.0 1.0))"
    SQ2 = "POLYGON ((-4.0 -4.0, -4.0 -5.0, -5.0 -5.0, -5.0 -4.0, -5.0 -5.0, -4.0 -4.0))"
    MP_TRI2 = ("MULTIPOLYGON (((-2.0 0.0, -1.0 0.0, -1.0 -1.0, -2.0 0.0)), "
               "((1.0 0.0, 2.0 0.0, 1.0 -1.0, 1.0 0.0)))")

    def _d(self, spark, lhs_wkts, rhs_wkts):
        from cuspatial_spark import GeoSeries

        a = GeoSeries.from_wkt(spark, lhs_wkts)
        b = GeoSeries.from_wkt(spark, rhs_wkts)
        return [r.distance for r in a.distance(b).orderBy("row_id").collect()]

    def test_one_pair_cases(self, spark):
        got = self._d(
            spark,
            ["POINT (0.0 0.0)", "POINT (0.0 0.0)",
             "MULTIPOINT ((1.0 1.0), (2.0 2.0))",
             "MULTIPOINT ((1.0 1.0), (2.0 2.0))"],
            [self.TRI, self.MP_TRI2, self.TRI, self.MP_TRI2],
        )
        assert got[0] == 0.0                                  # on the edge
        assert got[1] == pytest.approx(1.0, rel=1e-12)        # min over parts
        assert got[2] == pytest.approx(2 ** -0.5, rel=1e-12)  # to x+y=1
        assert got[3] == pytest.approx(1.0, rel=1e-12)        # (1,1)->(1,0)

    def test_two_pair_cases(self, spark):
        mpoly_rhs0 = (
            "MULTIPOLYGON (((0.0 1.0, 1.0 0.0, -1.0 0.0, 0.0 1.0)), "
            "((0.0 1.0, 1.0 0.0, 0.0 -1.0, -1.0 0.0, 0.0 1.0)))"
        )
        mpoly_rhs1 = (
            "MULTIPOLYGON (((-4.0 -4.0, -4.0 -5.0, -5.0 -5.0, -5.0 -4.0, -5.0 -5.0, -4.0 -4.0)), "
            "((-2.0 0.0, -2.0 -2.0, 0.0 -2.0, 0.0 0.0, -2.0 0.0)))"
        )
        got = self._d(
            spark,
            ["POINT (0.0 0.0)", "POINT (3.0 -3.0)",
             "POINT (0.0 0.0)", "POINT (3.0 -3.0)",
             "MULTIPOINT ((1.0 1.0), (2.0 2.0))",
             "MULTIPOINT ((3.0 3.0), (4.0 4.0))",
             "MULTIPOINT ((1.0 1.0), (2.0 2.0))",
             "MULTIPOINT ((3.0 3.0), (4.0 4.0))"],
            [self.TRI, self.SQ2,
             mpoly_rhs0, mpoly_rhs1,
             self.TRI, self.SQ2,
             mpoly_rhs0, mpoly_rhs1],
        )
        assert got[0] == 0.0
        assert got[1] == pytest.approx(np.sqrt(50.0), rel=1e-12)
        assert got[2] == 0.0                                   # inside diamond
        assert got[3] == pytest.approx(np.sqrt(10.0), rel=1e-12)
        assert got[4] == pytest.approx(2 ** -0.5, rel=1e-12)
        assert got[5] == pytest.approx(np.sqrt(98.0), rel=1e-12)
        assert got[6] == pytest.approx(2 ** -0.5, rel=1e-12)
        assert got[7] == pytest.approx(np.sqrt(18.0), rel=1e-12)
