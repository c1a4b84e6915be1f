"""As-of (most-recent-at-or-before) join — the temporal join Spark's
built-in operators lack.

Joins every left row to the single right row with the greatest
``right_time <= left_time`` per key (direction="backward"; "forward"
mirrors it).  The classic uses: enrich events with the latest
reference snapshot (crawl page -> latest robots.txt fetch, trade ->
last quote, trajectory point -> most recent calibration).

Distributed shape — the union-and-carry trick, NOT a range join:

1. Tag and UNION the two inputs on a common (key, time) spine —
   row-local, no shuffle.
2. One window over ``(key) ORDER BY (time, side)`` carries the latest
   right payload forward with ``last(..., ignorenulls=True)`` — the
   single hash shuffle of the operator, keyed on the join key.
3. Keep the left rows; a tolerance filter nulls out matches older
   than ``tolerance`` (row-local arithmetic on the carried time).

A range-join formulation (``l.t BETWEEN r.t AND r.t + tol``) explodes
candidate pairs quadratically inside hot keys; the union form moves
each row exactly once regardless of skew.  DuckDB's native ``ASOF
JOIN`` replays the semantics exactly (see the driver oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    tolerance=None,
    direction: str = "backward",
    right_prefix: str = "right_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload columns of
    the matching ``right`` row (renamed ``right_<col>``, including
    ``right_<right_time>``) or nulls when no right row qualifies.

    ``direction="backward"`` matches the greatest ``right_time <=
    left_time``; ``"forward"`` the smallest ``right_time >=
    left_time``.  Ties on the timestamp prefer the right row (the
    snapshot taken at the same instant is visible).  ``tolerance``
    (in the time column's units — seconds for timestamps) bounds the
    staleness: matches further away are nulled.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_time]
    rt = right_prefix + right_time
    # synthesized names must not collide with existing left columns —
    # a silent collision yields ambiguous duplicate output columns
    # (ADVICE r5)
    synthesized = {"__at", "__side", rt, *(right_prefix + c for c in payload)}
    clash = synthesized.intersection(left.columns)
    if clash:
        raise ValueError(
            "asof_join output column collision with left columns: "
            f"{sorted(clash)}; rename the left columns or pass a "
            "different right_prefix"
        )

    l_side = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__at"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_time].dataType).alias(rt),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(right_prefix + c)
            for c in payload
        ],
    )
    r_side = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys
        ],
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__at"),
        F.lit(0).alias("__side"),
        F.col(right_time).alias(rt),
        *[F.col(c).alias(right_prefix + c) for c in payload],
    ).select(*l_side.columns)  # align column order for union

    u = l_side.unionByName(r_side)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal time (__side 0 < 1)
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__at").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__at").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = [
        F.last(rt, ignorenulls=True).over(w).alias(rt),
        *[
            F.last(right_prefix + c, ignorenulls=True).over(w).alias(
                right_prefix + c
            )
            for c in payload
        ],
    ]
    out = (
        u.select(
            *[c for c in left.columns],
            "__side",
            "__at",
            *carried,
        )
        .where(F.col("__side") == 1)
        .drop("__side")
    )
    if tolerance is not None:
        gap = (
            F.col("__at").cast("double") - F.col(rt).cast("double")
            if direction == "backward"
            else F.col(rt).cast("double") - F.col("__at").cast("double")
        )
        keep = gap <= F.lit(float(tolerance))
        out = out.select(
            *[c for c in left.columns],
            "__at",
            *[
                F.when(keep, F.col(rt)).alias(rt),
                *[
                    F.when(keep, F.col(right_prefix + c)).alias(right_prefix + c)
                    for c in payload
                ],
            ],
        )
    return out.drop("__at")
