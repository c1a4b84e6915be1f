"""Plan-shape regression tests — pin the physical-plan invariants the
100-TB design depends on, so a future edit that silently introduces a
shuffle, a Python stage, or a non-broadcast join in a hot path fails
CI instead of failing at scale.

These assert on `executedPlan` strings: crude but effective — the
invariants are categorical (operator present/absent), not cosmetic.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def pts(spark):
    rng = np.random.default_rng(7)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "page_id": np.arange(20000),
                "x": rng.uniform(0, 8, 20000),
                "y": rng.uniform(0, 8, 20000),
            }
        )
    )


@pytest.fixture()
def polys():
    from tests.golden_fixtures import (
        SMALL_POLY_OFFSETS,
        SMALL_POLY_XS,
        SMALL_POLY_YS,
        SMALL_RING_OFFSETS,
    )

    from cuspatial_spark.geometry import PolygonArrays

    return PolygonArrays(
        SMALL_POLY_OFFSETS, SMALL_RING_OFFSETS, SMALL_POLY_XS, SMALL_POLY_YS
    )


class TestFlagshipJoinPlan:
    def test_jvm_refine_no_point_shuffle_no_python(self, spark, pts, polys):
        """The flagship broadcast tile join: scan -> codegen project ->
        BroadcastHashJoin -> JVM refine.  NO Exchange of the point
        side, NO Python stage anywhere."""
        from cuspatial_spark.plans import point_in_polygon_join

        out = point_in_polygon_join(
            pts, polys, x_min=0, x_max=8, y_min=0, y_max=8,
            max_depth=12, tile_level=4, refine="jvm",
        )
        plan = _plan(out)
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "MapInPandas" not in plan and "Python" not in plan

    def test_kernel_refine_single_arrow_stage(self, spark, pts, polys):
        """The exact-edge kernel path: same broadcast filter, exactly
        one Arrow (MapInPandas) refine stage, still no point shuffle."""
        from cuspatial_spark.plans import point_in_polygon_join

        out = point_in_polygon_join(
            pts, polys, x_min=0, x_max=8, y_min=0, y_max=8,
            max_depth=12, tile_level=4, refine="kernel",
        )
        plan = _plan(out)
        assert plan.count("MapInPandas") == 1
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan

    def test_assign_tiles_pure_codegen(self, spark, pts):
        """Morton/tile keys are Catalyst bit expressions: a single
        Project over the source — no shuffle, no Python, no join."""
        from cuspatial_spark.plans import assign_tiles

        out = assign_tiles(pts, "x", "y", 0, 8, 0, 8,
                           scale=8 / (1 << 12), max_depth=12, tile_level=4)
        plan = _plan(out)
        assert "Exchange" not in plan
        assert "Python" not in plan and "MapInPandas" not in plan
        assert "Join" not in plan


class TestPipelineOpPlans:
    def test_spatial_window_is_raw_filter(self, spark, pts):
        """points_in_spatial_window must stay a bare Catalyst filter
        (pushdown-compatible) — no shuffle, no Python."""
        from cuspatial_spark.operators import points_in_spatial_window

        out = points_in_spatial_window(pts, 1.0, 7.0, 1.0, 7.0)
        plan = _plan(out)
        assert "Exchange" not in plan and "Python" not in plan

    def test_text_analysis_zero_shuffle(self, spark):
        """language_id / quality / token_count / fingerprint are one
        codegen scan — zero shuffles, zero Python."""
        from cuspatial_spark.textops.analysis import (
            document_fingerprint,
            language_id,
            quality_score,
            token_count,
        )

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["the a of", "le la et"]})
        )
        for fn in (language_id, quality_score, token_count, document_fingerprint):
            plan = _plan(fn(docs))
            assert "Exchange" not in plan, fn.__name__
            assert "Python" not in plan and "MapInPandas" not in plan, fn.__name__

    def test_minhash_zero_shuffle_when_prepartitioned(self, spark):
        """MinHash signatures: the r6 explode + codegen-md5 + groupBy
        shape reuses an id-hash partitioning (no Exchange beyond the
        caller's own repartition); unpartitioned input pays exactly
        one narrow (id, hash) exchange.  No Python either way."""
        from cuspatial_spark.textops.dedup import minhash_signatures

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e f", "b c d e f g"]})
        )
        plan = _plan(minhash_signatures(docs.repartition(4, "doc_id")))
        # the only exchange is the caller's explicit repartition — the
        # groupBy itself adds none (no ENSURE_REQUIREMENTS exchange)
        assert plan.count("Exchange") == 1
        assert "ENSURE_REQUIREMENTS" not in plan
        assert "Python" not in plan and "MapInPandas" not in plan
        plan2 = _plan(minhash_signatures(docs))
        assert plan2.count("Exchange") == 1
        assert "Python" not in plan2 and "MapInPandas" not in plan2

    def test_ivf_topk_single_required_shuffle(self, spark):
        """IVF ANN: broadcast bucket join + WindowGroupLimit pre-prune;
        the only hash shuffle is the per-query window."""
        from cuspatial_spark.similarity.ann import ivf_topk

        rng = np.random.default_rng(3)
        emb = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": np.arange(50),
                    "embedding": [rng.normal(size=8).tolist() for _ in range(50)],
                }
            )
        )
        cts = rng.normal(size=(4, 8))
        out = ivf_topk(emb, emb.where(F.col("vec_id") < 3), cts, k=3, nprobe=2)
        plan = _plan(out)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
        assert "WindowGroupLimit" in plan
        # exactly one hash-partition exchange: the per-query window
        assert plan.count("Exchange hashpartitioning") == 1

    def test_asof_join_single_key_shuffle_no_python(self, spark):
        """As-of join: the union-and-carry plan pays exactly one
        hash-partition exchange (the key window) — no range-join
        cartesian/nested-loop, no Python stage."""
        from cuspatial_spark.operators import asof_join

        l = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2], "t": [5.0, 6.0], "ev": ["a", "b"]})
        )
        r = spark.createDataFrame(
            pd.DataFrame({"k": [1, 2], "t": [4.0, 9.0], "v": [1.0, 2.0]})
        )
        plan = _plan(asof_join(l, r, on="k", left_time="t", right_time="t"))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "Python" not in plan and "MapInPandas" not in plan
        assert plan.count("Exchange hashpartitioning") == 1

    def test_decontam_broadcast_semi_join_no_corpus_shuffle(self, spark):
        """Decontamination: the corpus side reaches the broadcast
        semi-join without an Exchange; the only hash shuffles are the
        hit-count groupBy and the totals join."""
        from cuspatial_spark.textops.decontam import decontaminate

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d", "c d e f"]})
        )
        ev = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": ["c d e"]}))
        plan = _plan(decontaminate(docs, ev, n=2))
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan and "MapInPandas" not in plan
        assert "CartesianProduct" not in plan


class TestSegmentTableVectorization:
    """The NumPy-vectorized broadcast segment tables must emit exactly
    the rows the original per-vertex Python loops produced (VERDICT r5
    item 7)."""

    def test_polygon_segments_match_loop(self, spark):
        import numpy as np

        from cuspatial_spark.geometry import PolygonArrays
        from cuspatial_spark.plans.tile_join import _polygon_segments_df

        # two polygons: a triangle with an explicit ring-closing dup
        # vertex (degenerate segment must be dropped) and a square
        polys = PolygonArrays(
            [0, 1, 2],
            [0, 4, 8],
            [0.0, 2.0, 1.0, 0.0, 5.0, 7.0, 7.0, 5.0],
            [0.0, 0.0, 2.0, 0.0, 5.0, 5.0, 7.0, 7.0],
        )
        got = _polygon_segments_df(spark, polys).orderBy("__poly_idx").collect()

        def loop_rows():
            po, ro = polys.part_offsets, polys.ring_offsets
            px, py = polys.x, polys.y
            rows = []
            for p in range(len(polys)):
                segs = []
                for r in range(po[p], po[p + 1]):
                    s, e = int(ro[r]), int(ro[r + 1])
                    for i in range(s, e):
                        prev = e - 1 if i == s else i - 1
                        ax, ay, bx, by = px[i], py[i], px[prev], py[prev]
                        if ax == bx and ay == by:
                            continue
                        segs.append((float(ax), float(ay), float(bx), float(by)))
                rows.append((int(p), int(polys.ids[p]), segs))
            return rows

        expect = loop_rows()
        assert len(got) == len(expect)
        for g, (p, pid, segs) in zip(got, expect):
            assert g["__poly_idx"] == p and g["polygon_id"] == pid
            assert [tuple(s) for s in g["__segs"]] == segs

    def test_linestring_segments_match_loop(self, spark):
        from cuspatial_spark.geometry import LinestringArrays
        from cuspatial_spark.plans.tile_join import _linestring_segments_df

        lines = LinestringArrays(
            [0, 3, 7],
            [0.0, 1.0, 2.0, 4.0, 4.5, 5.0, 6.0],
            [0.0, 1.5, 0.5, 4.0, 4.25, 5.0, 4.0],
        )
        got = _linestring_segments_df(spark, lines).orderBy("__line_idx").collect()
        po, lx, ly = lines.part_offsets, lines.x, lines.y
        for g, li in zip(got, range(len(lines))):
            expect = [
                (float(lx[i]), float(ly[i]), float(lx[i + 1]), float(ly[i + 1]))
                for i in range(int(po[li]), int(po[li + 1]) - 1)
            ]
            assert [tuple(s) for s in g["__segs"]] == expect
