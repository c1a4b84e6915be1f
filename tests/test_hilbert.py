"""Hilbert-curve cell-key tests: kernel goldens + properties, and the
pure-Catalyst expression chain vs the kernel."""

import numpy as np
import pandas as pd

from cuspatial_spark.kernels.hilbert import d2xy, xy2d


def test_order1_golden():
    # canonical U: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
    np.testing.assert_array_equal(
        xy2d(1, np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0])), [0, 1, 2, 3]
    )


def test_order2_golden():
    xs = np.array([0, 1, 1, 0, 0, 0, 1, 1, 2, 2, 3, 3, 3, 2, 2, 3])
    ys = np.array([0, 0, 1, 1, 2, 3, 3, 2, 2, 3, 3, 2, 1, 1, 0, 0])
    np.testing.assert_array_equal(xy2d(2, xs, ys), np.arange(16))


def test_round_trip_and_adjacency():
    """d2xy inverts xy2d, and consecutive indices are edge-adjacent
    cells — the locality property that motivates Hilbert over Morton
    for range partitioning."""
    for order in (3, 5, 8):
        d = np.arange(1 << (2 * order))
        x, y = d2xy(order, d)
        np.testing.assert_array_equal(xy2d(order, x, y), d)
        steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
        assert (steps == 1).all()


def test_morton_vs_hilbert_locality():
    """Mean jump distance between key-consecutive cells: Hilbert is
    exactly 1; Morton jumps diagonally (mean > 1)."""
    from cuspatial_spark.kernels.zorder import z_order

    order = 6
    n = 1 << order
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    mk = np.argsort(z_order(ii, jj), kind="stable")
    m_steps = np.abs(np.diff(ii[mk])) + np.abs(np.diff(jj[mk]))
    hk = np.argsort(xy2d(order, ii, jj), kind="stable")
    h_steps = np.abs(np.diff(ii[hk])) + np.abs(np.diff(jj[hk]))
    assert h_steps.mean() == 1.0
    assert m_steps.mean() > 1.0


def test_spark_expr_matches_kernel(spark):
    from cuspatial_spark.functions import with_hilbert_key

    rng = np.random.default_rng(11)
    order = 8
    xs = rng.integers(0, 1 << order, 5000)
    ys = rng.integers(0, 1 << order, 5000)
    df = spark.createDataFrame(pd.DataFrame({"i": xs, "j": ys}))
    got = with_hilbert_key(df, "i", "j", order).orderBy("i", "j").toPandas()
    np.testing.assert_array_equal(
        got.hilbert_key.values, xy2d(order, got.i.values, got.j.values)
    )


def test_spark_plan_is_linear(spark):
    """The level chain must not collapse into one exponential
    expression: physical plan node count stays O(order)."""
    from cuspatial_spark.functions import with_hilbert_key
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        (F.col("id") % 16).alias("i"), (F.col("id") % 13).alias("j")
    )
    plan = (
        with_hilbert_key(df, "i", "j", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Project") < 40
