"""Range/interval join (operators/interval.py): binned equi-join +
refine vs a DuckDB BETWEEN-predicate oracle; plan shape (no cartesian
product); left-join and validation edges."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cuspatial_spark.operators.interval import interval_join


def _fixture(spark, n_pts=400, n_iv=60):
    pts = spark.range(n_pts).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 2654435761 % 99991) / 99991.0 * 1000.0).alias("v"),
    )
    iv = spark.range(n_iv).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 40503 % 9973) / 9973.0 * 950.0).alias("s"),
    ).select(
        "iid", "s", (F.col("s") + 5.0 + (F.col("iid") % 7) * 15.0).alias("e")
    )
    return pts, iv


class TestIntervalJoin:
    def _oracle(self, pts, iv, how="inner"):
        con = duckdb.connect()
        con.register("p", pts.toPandas())
        con.register("i", iv.toPandas())
        j = "JOIN" if how == "inner" else "LEFT JOIN"
        return sorted(
            map(
                tuple,
                con.execute(
                    f"SELECT p.pid, p.v, i.iid, i.s, i.e FROM p {j} i"
                    " ON p.v BETWEEN i.s AND i.e"
                ).fetchall(),
            ),
            key=str,
        )

    def test_inner_matches_between_oracle(self, spark):
        pts, iv = _fixture(spark)
        out = interval_join(pts, iv, "v", "s", "e")
        got = sorted(map(tuple, out.collect()), key=str)
        want = self._oracle(pts, iv)
        assert got == want and len(got) > 100  # fixture really overlaps

    def test_left_keeps_unmatched_points(self, spark):
        pts, iv = _fixture(spark, n_pts=150, n_iv=10)
        out = interval_join(pts, iv, "v", "s", "e", how="left")
        got = sorted(map(tuple, out.collect()), key=str)
        want = self._oracle(pts, iv, how="left")
        assert got == want
        assert out.where(F.col("iid").isNull()).count() > 0

    def test_explicit_bin_width_and_broadcast_plan(self, spark):
        pts, iv = _fixture(spark)
        out = interval_join(pts, iv, "v", "s", "e", bin_width=50.0,
                            broadcast_intervals=True)
        got = sorted(map(tuple, out.collect()), key=str)
        assert got == self._oracle(pts, iv)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan

    def test_validation(self, spark):
        pts, iv = _fixture(spark, 10, 5)
        with pytest.raises(ValueError):
            interval_join(pts, iv, "v", "s", "e", bin_width=-1.0)
        with pytest.raises(ValueError):
            interval_join(pts, iv, "v", "s", "e", how="outer")
        with pytest.raises(ValueError):
            interval_join(pts, pts.withColumnRenamed("pid", "x"), "v", "s", "e")

    def test_degenerate_and_inverted_intervals(self, spark):
        pts = spark.createDataFrame([(0, 10.0), (1, 20.0)], "pid: long, v: double")
        iv = spark.createDataFrame(
            [(0, 10.0, 10.0), (1, 30.0, 5.0)], "iid: long, s: double, e: double"
        )
        out = interval_join(pts, iv, "v", "s", "e", bin_width=1.0).collect()
        # point-width interval matches its exact value; inverted dropped
        assert [(r["pid"], r["iid"]) for r in out] == [(0, 0)]
