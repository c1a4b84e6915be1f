"""Spark-level operator tests: parity with the reference goldens when
run single-partition, plus distributed tile-join equivalence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuspatial_spark import LinestringArrays, PolygonArrays, operators as ops
from cuspatial_spark.plans import point_in_polygon_join, point_to_nearest_linestring_join

from . import golden_fixtures as G


@pytest.fixture(scope="module")
def small_points(spark):
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(71, dtype=np.int64),
            "x": np.asarray(G.SMALL_POINTS_X, dtype=np.float64),
            "y": np.asarray(G.SMALL_POINTS_Y, dtype=np.float64),
        }
    )
    return spark.createDataFrame(pdf).repartition(1).withColumn("part_id", F.lit(0)).cache()


@pytest.fixture(scope="module")
def small_polygons():
    xy = np.empty(2 * len(G.SMALL_POLY_XS))
    xy[::2] = G.SMALL_POLY_XS
    xy[1::2] = G.SMALL_POLY_YS
    return PolygonArrays.from_polygons_xy(xy, G.SMALL_RING_OFFSETS, G.SMALL_POLY_OFFSETS)


@pytest.fixture(scope="module")
def small_linestrings():
    xy = np.empty(2 * len(G.SMALL_POLY_XS))
    xy[::2] = G.SMALL_POLY_XS
    xy[1::2] = G.SMALL_POLY_YS
    return LinestringArrays.from_linestrings_xy(xy, G.SMALL_RING_OFFSETS)


P = G.SMALL_PARAMS


class TestQuadtreeOnPoints:
    def test_golden_table(self, spark, small_points):
        _, qt = ops.quadtree_on_points(
            small_points, P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        )
        got = qt.toPandas()
        g = G.QUADTREE_GOLDEN
        np.testing.assert_array_equal(got["key"], g["key"])
        np.testing.assert_array_equal(got["level"], g["level"])
        np.testing.assert_array_equal(got["is_internal_node"], np.array(g["is_internal_node"], bool))
        np.testing.assert_array_equal(got["length"], g["length"])
        np.testing.assert_array_equal(got["offset"], g["offset"])


class TestQuadtreePipelineParity:
    def test_bbox_join_golden(self, spark, small_points, small_polygons):
        pairs = ops.join_quadtree_and_bounding_boxes(
            small_points, small_polygons.bounding_boxes(),
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        ).toPandas()
        np.testing.assert_array_equal(pairs["bbox_offset"], G.POLY_BBOX_JOIN_GOLDEN["bbox_offset"])
        np.testing.assert_array_equal(pairs["quad_offset"], G.POLY_BBOX_JOIN_GOLDEN["quad_offset"])

    def test_quadtree_pip_golden(self, spark, small_points, small_polygons):
        got = ops.quadtree_point_in_polygon(
            small_points, small_polygons,
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        ).toPandas()
        np.testing.assert_array_equal(got["polygon_index"], G.QT_PIP_GOLDEN["polygon_index"])
        np.testing.assert_array_equal(got["point_index"], G.QT_PIP_GOLDEN["point_index"])

    def test_nearest_linestring_golden(self, spark, small_points, small_linestrings):
        got = ops.quadtree_point_to_nearest_linestring(
            small_points, small_linestrings, 2.0,
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        ).toPandas()
        np.testing.assert_array_equal(got["point_index"], G.NEAREST_GOLDEN_POINT_INDEX)
        np.testing.assert_array_equal(got["linestring_index"], G.NEAREST_GOLDEN_LINESTRING_INDEX)
        np.testing.assert_allclose(got["distance"], G.NEAREST_GOLDEN_DIST_F64, rtol=1e-12)


class TestFloat32OperatorParity:
    """f32 end-to-end at the SPARK operator layer (not just kernels):
    FloatType point columns + float32 geometry layers through the full
    quadtree pipeline, against the reference's f32 goldens
    (test_spatial_join.py parametrizes every operator over both
    dtypes, :216,:254)."""

    @pytest.fixture(scope="class")
    def f32_points(self, spark):
        from pyspark.sql.types import (
            FloatType,
            LongType,
            StructField,
            StructType,
        )

        pdf = pd.DataFrame(
            {
                "point_id": np.arange(71, dtype=np.int64),
                "x": np.asarray(G.SMALL_POINTS_X, dtype=np.float32),
                "y": np.asarray(G.SMALL_POINTS_Y, dtype=np.float32),
            }
        )
        schema = StructType(
            [
                StructField("point_id", LongType(), False),
                StructField("x", FloatType(), False),
                StructField("y", FloatType(), False),
            ]
        )
        return (
            spark.createDataFrame(pdf, schema=schema)
            .repartition(1)
            .withColumn("part_id", F.lit(0))
            .cache()
        )

    @pytest.fixture(scope="class")
    def f32_polygons(self):
        xy = np.empty(2 * len(G.SMALL_POLY_XS), dtype=np.float32)
        xy[::2] = np.asarray(G.SMALL_POLY_XS, dtype=np.float32)
        xy[1::2] = np.asarray(G.SMALL_POLY_YS, dtype=np.float32)
        return PolygonArrays.from_polygons_xy(xy, G.SMALL_RING_OFFSETS, G.SMALL_POLY_OFFSETS)

    @pytest.fixture(scope="class")
    def f32_linestrings(self):
        xy = np.empty(2 * len(G.SMALL_POLY_XS), dtype=np.float32)
        xy[::2] = np.asarray(G.SMALL_POLY_XS, dtype=np.float32)
        xy[1::2] = np.asarray(G.SMALL_POLY_YS, dtype=np.float32)
        return LinestringArrays.from_linestrings_xy(xy, G.SMALL_RING_OFFSETS)

    def test_layer_dtype_preserved(self, f32_polygons, f32_linestrings):
        assert f32_polygons.x.dtype == np.float32
        assert f32_linestrings.x.dtype == np.float32

    def test_quadtree_pip_golden_f32(self, spark, f32_points, f32_polygons):
        got = ops.quadtree_point_in_polygon(
            f32_points, f32_polygons,
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        ).toPandas()
        np.testing.assert_array_equal(got["polygon_index"], G.QT_PIP_GOLDEN["polygon_index"])
        np.testing.assert_array_equal(got["point_index"], G.QT_PIP_GOLDEN["point_index"])

    def test_nearest_linestring_golden_f32(self, spark, f32_points, f32_linestrings):
        got = ops.quadtree_point_to_nearest_linestring(
            f32_points, f32_linestrings, 2.0,
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        ).toPandas()
        np.testing.assert_array_equal(got["point_index"], G.NEAREST_GOLDEN_POINT_INDEX)
        np.testing.assert_array_equal(got["linestring_index"], G.NEAREST_GOLDEN_LINESTRING_INDEX)
        # f32 goldens embed CUDA FMA contraction; plain f32 NumPy
        # matches to 5e-5 (same bound as the kernel-level goldens)
        np.testing.assert_allclose(got["distance"], G.NEAREST_GOLDEN_DIST_F32, rtol=5e-5)
        # and the math genuinely ran in f32: the f64 goldens differ
        # from these beyond f32 resolution for at least some rows
        assert not np.allclose(got["distance"], G.NEAREST_GOLDEN_DIST_F64, rtol=1e-9)

    def test_brute_pip_f32(self, spark, f32_points, f32_polygons):
        got = (
            ops.point_in_polygon(f32_points, f32_polygons, result_prefix="p")
            .orderBy("point_id")
            .toPandas()
        )
        # golden point_index is in Morton-sorted space; map back
        from cuspatial_spark.kernels.quadtree import build_quadtree

        order, _ = build_quadtree(
            np.asarray(G.SMALL_POINTS_X), np.asarray(G.SMALL_POINTS_Y),
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        )
        expected = {
            (p, order[i])
            for p, i in zip(G.QT_PIP_GOLDEN["polygon_index"], G.QT_PIP_GOLDEN["point_index"])
        }
        got_pairs = {
            (j, r.point_id)
            for _, r in got.iterrows()
            for j in range(4)
            if r[f"p{j}"]
        }
        assert got_pairs == expected


class TestBruteForcePIP:
    def test_small_fixture(self, spark, small_points, small_polygons):
        got = (
            ops.point_in_polygon(small_points, small_polygons, result_prefix="p")
            .orderBy("point_id")
            .toPandas()
        )
        # cross-check against the quadtree golden pairs
        expected_pairs = set(
            zip(G.QT_PIP_GOLDEN["polygon_index"], G.QT_PIP_GOLDEN["point_index"])
        )
        # golden point_index is in Morton-sorted space; map back
        from cuspatial_spark.kernels.quadtree import build_quadtree

        order, _ = build_quadtree(
            np.asarray(G.SMALL_POINTS_X), np.asarray(G.SMALL_POINTS_Y),
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        )
        expected_orig = {(p, order[i]) for p, i in expected_pairs}
        got_pairs = {
            (j, r.point_id)
            for _, r in got.iterrows()
            for j in range(4)
            if r[f"p{j}"]
        }
        assert got_pairs == expected_orig


class TestTileJoinPlanShape:
    def test_jvm_refine_plan_is_shuffle_free(self, spark, small_polygons):
        """The 100-TB plan contract: scan -> codegen Morton keys ->
        broadcast joins (tile filter + segment table) -> codegen
        ray-cast filter.  No shuffle of the points side, no Python."""
        pdf = pd.DataFrame(
            {
                "point_id": np.arange(1000, dtype=np.int64),
                "x": np.random.default_rng(1).uniform(0, 8, 1000),
                "y": np.random.default_rng(2).uniform(0, 8, 1000),
            }
        )
        out = point_in_polygon_join(
            spark.createDataFrame(pdf), small_polygons,
            x_min=0.0, x_max=8.0, y_min=0.0, y_max=8.0,
            max_depth=10, tile_level=4, keep_columns=["point_id"],
            refine="jvm",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 2  # tile filter + segs
        assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
        # only broadcast exchanges; nothing repartitions the point side
        assert "Exchange hashpartitioning" not in plan
        assert "Exchange rangepartitioning" not in plan


class TestDistributedTileJoin:
    def test_matches_parity_pipeline(self, spark, small_polygons):
        # multi-partition points; result must equal the golden pair set
        pdf = pd.DataFrame(
            {
                "point_id": np.arange(71, dtype=np.int64),
                "x": np.asarray(G.SMALL_POINTS_X, dtype=np.float64),
                "y": np.asarray(G.SMALL_POINTS_Y, dtype=np.float64),
            }
        )
        pts = spark.createDataFrame(pdf).repartition(8)
        got = point_in_polygon_join(
            pts, small_polygons,
            x_min=P["x_min"], x_max=P["x_max"], y_min=P["y_min"], y_max=P["y_max"],
            max_depth=8, tile_level=3,
        ).toPandas()
        from cuspatial_spark.kernels.quadtree import build_quadtree

        order, _ = build_quadtree(
            np.asarray(G.SMALL_POINTS_X), np.asarray(G.SMALL_POINTS_Y),
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        )
        expected = {
            (p, order[i])
            for p, i in zip(G.QT_PIP_GOLDEN["polygon_index"], G.QT_PIP_GOLDEN["point_index"])
        }
        assert set(zip(got["polygon_id"], got["point_id"])) == expected

    def test_nearest_join(self, spark, small_linestrings):
        pdf = pd.DataFrame(
            {
                "point_id": np.arange(71, dtype=np.int64),
                "x": np.asarray(G.SMALL_POINTS_X, dtype=np.float64),
                "y": np.asarray(G.SMALL_POINTS_Y, dtype=np.float64),
            }
        )
        pts = spark.createDataFrame(pdf).repartition(8)
        got = (
            point_to_nearest_linestring_join(
                pts, small_linestrings, expansion_radius=2.0,
                x_min=P["x_min"], x_max=P["x_max"], y_min=P["y_min"], y_max=P["y_max"],
                max_depth=8, tile_level=2,
            )
            .orderBy("point_id")
            .toPandas()
        )
        # map golden (sorted-space point_index) back to original ids
        from cuspatial_spark.kernels.quadtree import build_quadtree

        order, _ = build_quadtree(
            np.asarray(G.SMALL_POINTS_X), np.asarray(G.SMALL_POINTS_Y),
            P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        )
        golden = pd.DataFrame(
            {
                "point_id": order[np.asarray(G.NEAREST_GOLDEN_POINT_INDEX)],
                "distance": G.NEAREST_GOLDEN_DIST_F64,
            }
        ).sort_values("point_id")
        assert len(got) == 71
        np.testing.assert_allclose(got["distance"], golden["distance"], rtol=1e-9)

    def test_edge_exact_forces_kernel_semantics(self, spark):
        """edge_exact=True pins the Arrow-kernel refine: a point lying
        exactly ON a polygon edge is deterministically excluded (the
        reference's ULP on-edge semantics), regardless of the
        layer-size-based jvm/kernel auto choice."""
        square = PolygonArrays([0, 1], [0, 5],
                               [0.0, 4.0, 4.0, 0.0, 0.0],
                               [0.0, 0.0, 4.0, 4.0, 0.0])
        pdf = pd.DataFrame({
            "point_id": [0, 1, 2],
            "x": [0.0, 2.0, 9.0],   # on left edge / inside / outside
            "y": [2.0, 2.0, 9.0],
        })
        pts = spark.createDataFrame(pdf)
        got = point_in_polygon_join(
            pts, square, x_min=0, x_max=10, y_min=0, y_max=10,
            max_depth=8, tile_level=2, edge_exact=True,
        ).toPandas()
        assert set(got["point_id"]) == {1}

    @pytest.mark.parametrize("refine", ["jvm", "kernel"])
    def test_nearest_join_progressive_equals_single_shot(self, spark, refine):
        # Dense layer (64 linestrings over a 8x8 AOI) with an AOI-sized
        # expansion radius: progressive radius widening must return the
        # identical (point -> nearest line, distance) assignment as the
        # single-shot join, for both refine paths.
        rng = np.random.default_rng(33)
        n_lines, pts_per = 64, 4
        offs = np.arange(n_lines + 1, dtype=np.int64) * pts_per
        base = rng.uniform(0, 8, size=(n_lines, 2))
        walk = base[:, None, :] + rng.uniform(-0.5, 0.5, size=(n_lines, pts_per, 2)).cumsum(axis=1)
        lines = LinestringArrays(offs, walk[:, :, 0].ravel().copy(), walk[:, :, 1].ravel().copy())
        npts = 500
        pdf = pd.DataFrame(
            {
                "point_id": np.arange(npts, dtype=np.int64),
                "x": rng.uniform(0, 8, npts),
                "y": rng.uniform(0, 8, npts),
            }
        )
        pts = spark.createDataFrame(pdf).repartition(8)
        kw = dict(
            expansion_radius=16.0, x_min=0.0, x_max=8.0, y_min=0.0, y_max=8.0,
            max_depth=8, tile_level=3, keep_columns=["point_id"], refine=refine,
        )
        single = (
            point_to_nearest_linestring_join(pts, lines, progressive=False, **kw)
            .orderBy("point_id").toPandas()
        )
        prog = (
            point_to_nearest_linestring_join(pts, lines, progressive=True, **kw)
            .orderBy("point_id").toPandas()
        )
        assert len(single) == len(prog) == npts
        assert list(single["linestring_id"]) == list(prog["linestring_id"])
        np.testing.assert_allclose(single["distance"], prog["distance"], rtol=0, atol=0)


class TestExpressions:
    def test_spatial_window(self, spark):
        pdf = pd.DataFrame({"x": [0.0, 1.0, 2.0, 3.0], "y": [0.0, 1.0, 2.0, 3.0]})
        df = spark.createDataFrame(pdf)
        got = ops.points_in_spatial_window(df, 0, 3, 0, 3).toPandas()
        # strict bounds: (0,0) and (3,3) excluded
        assert sorted(got["x"]) == [1.0, 2.0]

    def test_haversine_fixture(self, spark):
        # reference doctest fixture (core/spatial/distance.py:118-143)
        pdf = pd.DataFrame(
            {
                "id": [0, 1, 2, 3],
                "lon1": [0.0, 1.0, 0.0, 1.0],
                "lat1": [0.0, 0.0, 1.0, 1.0],
                "lon2": [2.0] * 4,
                "lat2": [2.0] * 4,
            }
        )
        got = (
            ops.haversine_distance(
                spark.createDataFrame(pdf), "lon1", "lat1", "lon2", "lat2"
            )
            .orderBy("id")
            .toPandas()
        )
        np.testing.assert_allclose(
            got["haversine_km"],
            [314.474805, 248.629315, 248.568719, 157.225432],
            rtol=1e-8,
        )

    def test_morton_key_expr_matches_kernel(self, spark):
        from cuspatial_spark.plans import assign_tiles
        from cuspatial_spark.kernels.zorder import point_keys

        rng = np.random.default_rng(7)
        pdf = pd.DataFrame({"x": rng.uniform(0, 8, 500), "y": rng.uniform(0, 8, 500)})
        df = assign_tiles(
            spark.createDataFrame(pdf), "x", "y", 0, 8, 0, 8, 1.0, 3, 2
        )
        got = df.toPandas()
        exp = point_keys(got["x"].to_numpy(), got["y"].to_numpy(), 0, 8, 0, 8, 1.0, 3)
        np.testing.assert_array_equal(got["morton_key"], exp.astype(np.int64))
        np.testing.assert_array_equal(got["tile"], exp.astype(np.int64) >> 2)


class TestTrajectory:
    def test_distances_and_speeds_fixture(self, spark):
        # reference doctest (core/trajectory.py:196-212)
        pdf = pd.DataFrame(
            {
                "object_id": [0, 1, 0, 1],
                "x": [0.0, 0.0, 1.0, 1.0],
                "y": [0.0, 0.0, 1.0, 1.0],
                "timestamp": pd.to_datetime([0, 0, 10000, 10000], unit="ms"),
            }
        )
        got = (
            ops.trajectory_distances_and_speeds(spark.createDataFrame(pdf))
            .orderBy("object_id")
            .toPandas()
        )
        np.testing.assert_allclose(got["distance"], [1414.213562, 1414.213562], rtol=1e-9)
        np.testing.assert_allclose(got["speed"], [141.421356, 141.421356], rtol=1e-8)

    def test_summary_fuses_bbox_and_speeds(self, spark):
        rng = np.random.default_rng(11)
        pdf = pd.DataFrame(
            {
                "object_id": rng.integers(0, 20, 400),
                "x": rng.uniform(0, 8, 400),
                "y": rng.uniform(0, 8, 400),
                "timestamp": pd.to_datetime(
                    rng.integers(0, 10**7, 400), unit="ms"
                ),
            }
        )
        df = spark.createDataFrame(pdf)
        got = ops.trajectory_summary(df).orderBy("object_id").toPandas()
        boxes = ops.trajectory_bounding_boxes(
            df.withColumnRenamed("timestamp", "ts"), x="x", y="y"
        ).orderBy("object_id").toPandas()
        speeds = (
            ops.trajectory_distances_and_speeds(df).orderBy("object_id").toPandas()
        )
        for c in ("minx", "miny", "maxx", "maxy"):
            np.testing.assert_allclose(got[c], boxes[c])
        np.testing.assert_allclose(got["distance"], speeds["distance"], rtol=1e-12)
        np.testing.assert_allclose(got["speed"], speeds["speed"], rtol=1e-12)
        # the whole summary rides ONE object-id shuffle
        plan = (
            ops.trajectory_summary(df)._jdf.queryExecution().executedPlan().toString()
        )
        import re

        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


class TestHausdorffSpark:
    def test_values(self, spark):
        pdf = pd.DataFrame(
            {
                "space_id": [0] * 5 + [1] * 4 + [2] * 3,
                "x": [0, 1, 2, 3, 1, 3, 5, 6, 5, 4, 7, 4],
                "y": [1, 2, 3, 5, 7, 0, 2, 3, 6, 1, 3, 6],
            }
        )
        got = (
            ops.directed_hausdorff_distance(spark.createDataFrame(pdf), space="space_id")
            .orderBy("space_i", "space_j")
            .toPandas()
        )
        m = got["distance"].to_numpy().reshape(3, 3)
        expected = np.array(
            [
                [0.000000, 4.123106, 4.000000],
                [3.605551, 0.000000, 1.414214],
                [4.472136, 1.414214, 0.000000],
            ]
        )
        np.testing.assert_allclose(m, expected, atol=1e-6)


class TestDeriveTrajectories:
    def test_sorted_objects_and_offsets(self, spark):
        # reference doctest shape (core/trajectory.py:44-61)
        pdf = pd.DataFrame(
            {
                "object_id": [1, 0, 1, 0],
                "x": [1.0, 0.0, 3.0, 2.0],
                "y": [1.0, 0.0, 3.0, 2.0],
                "timestamp": pd.to_datetime([1, 0, 3, 2], unit="ms"),
            }
        )
        objects, offsets = ops.derive_trajectories(spark.createDataFrame(pdf))
        got = objects.toPandas()
        assert list(got["object_id"]) == [0, 0, 1, 1]
        assert list(got["x"]) == [0.0, 2.0, 1.0, 3.0]
        off = offsets.toPandas()
        assert list(off["object_id"]) == [0, 1]
        assert list(off["offset"]) == [0, 2]


class TestDistanceDispatcher:
    def test_point_point_and_polygon(self, spark, small_polygons):
        from cuspatial_spark.operators.dispatch import distance

        pdf = pd.DataFrame(
            {"x": [0.0], "y": [0.0], "x2": [3.0], "y2": [4.0]}
        )
        got = distance(spark.createDataFrame(pdf), "point", "point").toPandas()
        np.testing.assert_allclose(got["distance"], [5.0])

        pdf2 = pd.DataFrame({"x": [0.0], "y": [0.0], "polygon_index": [0]})
        got2 = distance(
            spark.createDataFrame(pdf2), "point", "polygon", rhs_layer=small_polygons
        ).toPandas()
        assert got2["distance"].iloc[0] > 0

        with pytest.raises(NotImplementedError):
            distance(spark.createDataFrame(pdf), "point", "raster")


class TestGlobalQuadtree:
    def test_matches_golden_multi_partition(self, spark):
        from cuspatial_spark.operators.indexing import quadtree_on_points_global

        pdf = pd.DataFrame(
            {
                "x": np.asarray(G.SMALL_POINTS_X, dtype=np.float64),
                "y": np.asarray(G.SMALL_POINTS_Y, dtype=np.float64),
            }
        )
        pts = spark.createDataFrame(pdf).repartition(8)  # distributed input
        got = quadtree_on_points_global(
            pts, P["x_min"], P["x_max"], P["y_min"], P["y_max"],
            P["scale"], P["max_depth"], P["max_size"],
        )
        g = G.QUADTREE_GOLDEN
        np.testing.assert_array_equal(got["key"], g["key"])
        np.testing.assert_array_equal(got["level"], g["level"])
        np.testing.assert_array_equal(got["is_internal_node"], np.array(g["is_internal_node"], bool))
        np.testing.assert_array_equal(got["length"], g["length"])
        np.testing.assert_array_equal(got["offset"], g["offset"])

    def test_matches_kernel_on_random(self, spark):
        from cuspatial_spark.kernels.quadtree import build_quadtree
        from cuspatial_spark.operators.indexing import quadtree_on_points_global

        rng = np.random.default_rng(33)
        pdf = pd.DataFrame({"x": rng.uniform(0, 8, 5000), "y": rng.uniform(0, 8, 5000)})
        depth, msize, scale = 5, 60, 8 / (1 << 5)
        got = quadtree_on_points_global(
            spark.createDataFrame(pdf).repartition(16), 0, 8, 0, 8, scale, depth, msize
        )
        _, qt = build_quadtree(pdf["x"].to_numpy(), pdf["y"].to_numpy(), 0, 8, 0, 8, scale, depth, msize)
        np.testing.assert_array_equal(got["key"], qt.key)
        np.testing.assert_array_equal(got["level"], qt.level)
        np.testing.assert_array_equal(got["length"], qt.length)
        np.testing.assert_array_equal(got["offset"], qt.offset)

    def test_depth_guard_clamps_deep_builds(self, spark):
        """max_depth 15 over scattered points would collect ~n_points
        cells; the guard must clamp to a level whose occupied-cell
        count fits max_driver_cells and still build a valid tree."""
        import warnings

        from cuspatial_spark.operators.indexing import quadtree_on_points_global

        rng = np.random.default_rng(34)
        n = 20000
        pdf = pd.DataFrame({"x": rng.uniform(0, 8, n), "y": rng.uniform(0, 8, n)})
        depth = 15
        scale = 8 / ((1 << depth) + 2)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = quadtree_on_points_global(
                spark.createDataFrame(pdf).repartition(8),
                0, 8, 0, 8, scale, depth, 100,
                max_driver_cells=2000,
            )
            assert any("clamping build to depth" in str(x.message) for x in w)
        # structural validity: leaf lengths partition the point count
        # (internal-node length counts children, reference semantics)
        leaves = got[~got["is_internal_node"]]
        assert leaves["length"].sum() == n
        # clamped depth must be < requested and cells bounded
        assert got["level"].max() < depth - 1
        assert len(got) <= 4 * 2000
