"""Multipoint distance family (reference pairwise_point_distance
multipoint branches, core/spatial/distance.py:169-240 +
distance_dispatch.py multipoint rows) — NumPy brute-force random
oracle in the role of the reference's geopandas oracle
(tests/spatial/distance/test_pairwise_point_distance.py:29-62)."""

import numpy as np
import pandas as pd
import pytest

from cuspatial_spark.geometry import (
    LinestringArrays,
    MultipointArrays,
    PolygonArrays,
)
from cuspatial_spark.operators import pairwise as pw
from cuspatial_spark.operators.dispatch import distance


def _random_mp(rng, n, max_pts=5):
    sizes = rng.integers(1, max_pts + 1, size=n)
    offsets = np.concatenate(([0], np.cumsum(sizes)))
    total = offsets[-1]
    return MultipointArrays(offsets, rng.uniform(0, 10, total), rng.uniform(0, 10, total))


def _brute_mp_mp(lhs, rhs, a, b):
    ls, le = lhs.part_offsets[a], lhs.part_offsets[a + 1]
    rs, re = rhs.part_offsets[b], rhs.part_offsets[b + 1]
    d2 = (lhs.x[ls:le, None] - rhs.x[None, rs:re]) ** 2 + (
        lhs.y[ls:le, None] - rhs.y[None, rs:re]
    ) ** 2
    return np.sqrt(d2.min())


class TestMultipointDistance:
    def test_multipoint_multipoint_random(self, spark):
        rng = np.random.default_rng(11)
        lhs = _random_mp(rng, 40)
        rhs = _random_mp(rng, 40)
        df = spark.createDataFrame(
            pd.DataFrame({"id": range(40), "lhs_index": range(40), "rhs_index": range(40)})
        )
        got = pw.pairwise_multipoint_distance(df, lhs, rhs).orderBy("id").toPandas()
        want = [_brute_mp_mp(lhs, rhs, i, i) for i in range(40)]
        np.testing.assert_allclose(got["distance"], want, rtol=0, atol=0)

    def test_point_multipoint(self, spark):
        rng = np.random.default_rng(12)
        mp = _random_mp(rng, 10)
        xs = rng.uniform(0, 10, 30)
        ys = rng.uniform(0, 10, 30)
        df = spark.createDataFrame(
            pd.DataFrame(
                {"id": range(30), "x": xs, "y": ys, "multipoint_index": np.arange(30) % 10}
            )
        )
        got = pw.pairwise_point_multipoint_distance(df, mp).orderBy("id").toPandas()
        for i in range(30):
            m = i % 10
            s, e = mp.part_offsets[m], mp.part_offsets[m + 1]
            want = np.sqrt(((mp.x[s:e] - xs[i]) ** 2 + (mp.y[s:e] - ys[i]) ** 2).min())
            assert got["distance"].iloc[i] == want

    def test_multipoint_linestring_and_polygon(self, spark):
        mp = MultipointArrays([0, 2, 4], [0.0, 5.0, 0.5, 9.0], [2.0, 5.0, 0.5, 9.0])
        lines = LinestringArrays([0, 2], [0.0, 4.0], [0.0, 0.0])
        square = PolygonArrays(
            [0, 1], [0, 5], [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0]
        )
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "id": [0, 1],
                    "multipoint_index": [0, 1],
                    "linestring_index": [0, 0],
                    "polygon_index": [0, 0],
                }
            )
        )
        gl = pw.pairwise_multipoint_linestring_distance(df, mp, lines).orderBy("id").toPandas()
        # mp0: (0,2) is 2 above the segment; (5,5) clamps to (4,0) -> sqrt(26)
        assert gl["distance"].iloc[0] == 2.0
        # mp1: (0.5,0.5) is 0.5 above; (9,9) far
        assert gl["distance"].iloc[1] == 0.5
        gp = pw.pairwise_multipoint_polygon_distance(df, mp, square).orderBy("id").toPandas()
        assert gp["distance"].iloc[0] == 1.0  # (0,2) is 1 above the top edge
        assert gp["distance"].iloc[1] == 0.0  # (0.5,0.5) inside

    def test_dispatcher_multipoint_rows(self, spark):
        rng = np.random.default_rng(13)
        lhs = _random_mp(rng, 10)
        rhs = _random_mp(rng, 10)
        df = spark.createDataFrame(
            pd.DataFrame({"id": range(10), "lhs_index": range(10), "rhs_index": range(10)})
        )
        got = (
            distance(df, "multipoint", "multipoint", lhs, rhs)
            .orderBy("id")
            .toPandas()
        )
        want = [_brute_mp_mp(lhs, rhs, i, i) for i in range(10)]
        np.testing.assert_allclose(got["distance"], want, rtol=0, atol=0)
        # swapped combos route to the same kernels
        dfp = spark.createDataFrame(
            pd.DataFrame(
                {"id": [0], "x": [0.0], "y": [0.0], "multipoint_index": [0],
                 "linestring_index": [0], "polygon_index": [0]}
            )
        )
        lines = LinestringArrays([0, 2], [0.0, 3.0], [0.0, 0.0])
        square = PolygonArrays(
            [0, 1], [0, 5], [2.0, 3.0, 3.0, 2.0, 2.0], [0.0, 0.0, 1.0, 1.0, 0.0]
        )
        mp1 = MultipointArrays([0, 1], [3.0], [4.0])
        assert distance(dfp, "point", "multipoint", None, mp1).collect()[0]["distance"] == 5.0
        # mp (3,4) vs segment (0,0)-(3,0): clamps to (3,0) -> 4
        assert distance(dfp, "multipoint", "linestring", mp1, lines).collect()[0]["distance"] == 4.0
        # mp (3,4) vs square x[2,3] y[0,1]: nearest corner (3,1) -> 3
        assert distance(dfp, "multipoint", "polygon", mp1, square).collect()[0]["distance"] == 3.0
