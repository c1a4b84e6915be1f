"""As-of join (operators/asof.py): semantics vs DuckDB's native ASOF
JOIN plus edge cases (ties, tolerance, forward direction, empty right,
multi-key)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuspatial_spark.operators import asof_join


def _left(spark):
    rows = [
        (1, 10.0, "a"), (1, 20.0, "b"), (1, 5.0, "c"),
        (2, 15.0, "d"), (2, 7.0, "e"),
        (3, 50.0, "f"),          # key with no right rows
    ]
    return spark.createDataFrame(rows, "k: long, t: double, ev: string")


def _right(spark):
    rows = [
        (1, 4.0, 100.0), (1, 10.0, 110.0), (1, 18.0, 120.0),
        (2, 7.0, 200.0), (2, 30.0, 210.0),
    ]
    return spark.createDataFrame(rows, "k: long, t: double, v: double")


class TestAsofJoin:
    def test_backward_matches_duckdb_asof(self, spark):
        out = asof_join(
            _left(spark), _right(spark), on="k", left_time="t", right_time="t"
        )
        got = sorted(
            (r["k"], r["t"], r["ev"], r["right_t"], r["right_v"])
            for r in out.collect()
        )
        con = duckdb.connect()
        con.register("l", _left(spark).toPandas())
        con.register("r", _right(spark).toPandas())
        want = sorted(
            map(
                tuple,
                con.execute(
                    """
            SELECT l.k, l.t, l.ev, r.t AS right_t, r.v AS right_v
            FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t
            """
                ).fetchall(),
            )
        )
        # DuckDB returns NaN-free None rows for misses, same as ours
        norm = lambda rows: [
            tuple(None if pd.isna(x) else x for x in row) for row in rows
        ]
        assert norm(got) == norm(want)
        # tie at t=10 matches the right row taken at the same instant
        row10 = [r for r in got if r[1] == 10.0 and r[0] == 1][0]
        assert row10[3] == 10.0 and row10[4] == 110.0
        # key 3 has no right rows -> nulls
        row3 = [r for r in got if r[0] == 3][0]
        assert row3[3] is None and row3[4] is None

    def test_tolerance_nulls_stale_matches(self, spark):
        out = asof_join(
            _left(spark), _right(spark), on="k",
            left_time="t", right_time="t", tolerance=2.0,
        )
        got = {(r["k"], r["t"]): r["right_v"] for r in out.collect()}
        assert got[(1, 5.0)] == 100.0        # gap 1.0 <= 2.0
        assert got[(1, 10.0)] == 110.0       # gap 0
        assert got[(1, 20.0)] == 120.0       # gap exactly 2.0: inclusive keep
        assert got[(2, 15.0)] is None        # nearest is 7.0, gap 8 > 2
        assert got[(3, 50.0)] is None        # no right rows at all
        assert out.count() == 6

    def test_forward_direction(self, spark):
        out = asof_join(
            _left(spark), _right(spark), on="k",
            left_time="t", right_time="t", direction="forward",
        )
        got = {(r["k"], r["t"]): (r["right_t"], r["right_v"]) for r in out.collect()}
        assert got[(1, 5.0)] == (10.0, 110.0)     # next at-or-after
        assert got[(1, 20.0)] == (None, None)     # nothing after 18
        assert got[(2, 15.0)] == (30.0, 210.0)
        assert got[(3, 50.0)] == (None, None)

    def test_rejects_bad_direction(self, spark):
        with pytest.raises(ValueError):
            asof_join(_left(spark), _right(spark), on="k", direction="sideways")

    def test_multi_key_and_timestamp_type(self, spark):
        l = spark.createDataFrame(
            [(1, "x", "2024-01-01 00:00:10"), (1, "y", "2024-01-01 00:00:10")],
            "k: long, sub: string, ts: string",
        ).withColumn("ts", F.to_timestamp("ts"))
        r = spark.createDataFrame(
            [(1, "x", "2024-01-01 00:00:05", 1.0),
             (1, "y", "2024-01-01 00:00:20", 2.0)],
            "k: long, sub: string, ts: string, v: double",
        ).withColumn("ts", F.to_timestamp("ts"))
        out = asof_join(l, r, on=["k", "sub"], left_time="ts", right_time="ts")
        got = {r["sub"]: r["right_v"] for r in out.collect()}
        assert got == {"x": 1.0, "y": None}

    def test_rejects_left_column_collision(self, spark):
        """Synthesized output names (__at, __side, right_<col>) must
        not silently collide with existing left columns (ADVICE r5)."""
        left = spark.createDataFrame(
            [(1, 10.0, 99.0)], "k: long, t: double, right_v: double"
        )
        right = spark.createDataFrame(
            [(1, 4.0, 100.0)], "k: long, t: double, v: double"
        )
        with pytest.raises(ValueError, match="collision"):
            asof_join(left, right, on="k", left_time="t", right_time="t")
