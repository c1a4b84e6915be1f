"""Range (interval) join — match scalar values to the intervals that
contain them, without the quadratic blowup of a raw range predicate.

``points.join(intervals, s <= v AND v <= e)`` plans as a broadcast
nested-loop or cartesian filter: every point is tested against every
interval.  This operator is the 1-D analogue of the engine's spatial
tile join: pick a bin width, assign each point its single bin
(row-local), explode each interval to the bins it covers (row-local,
replication = interval_length / bin_width + 1), equi-join on the bin,
and refine with the exact predicate.  Each (point, interval) pair
meets in EXACTLY one bin — the point's — so no dedup pass is needed.

Scale shape: one hash shuffle on the bin key (or zero when the
interval side broadcasts); replication is bounded by
``len/bin_width + 1`` per interval, so a bin width near the typical
interval length keeps the exploded side within ~2x of its input.
Hot bins (clustered points) are uniform-key-salted by AQE's skew
handling; a pathological giant interval replicates linearly and
should be pre-split by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bin_width: float | str = "auto",
    how: str = "inner",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """All (point row, interval row) pairs with ``start <= value <=
    end`` (inclusive both ends).  Output = point columns + interval
    columns (names must not collide, except none are shared).

    ``bin_width="auto"`` estimates the median interval length with one
    ``approxQuantile`` pass over the interval side (driver-side
    scalar; at production scale feed a known width instead).
    ``how="left"`` keeps pointless rows with nulls on the interval
    side.  ``broadcast_intervals`` skips the shuffle when the exploded
    interval side is small.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how!r}")
    shared = set(points.columns) & set(intervals.columns)
    if shared:
        raise ValueError(f"column name collision between sides: {sorted(shared)}")
    if bin_width == "auto":
        q = intervals.select(
            (F.col(end_col) - F.col(start_col)).cast("double").alias("__len")
        ).approxQuantile("__len", [0.5], 0.01)
        bin_width = max(float(q[0]) if q else 1.0, 1e-12)
    elif isinstance(bin_width, str):
        raise ValueError(f"bin_width must be a number or 'auto': {bin_width!r}")
    elif bin_width <= 0:
        raise ValueError(f"bin_width must be positive: {bin_width}")

    w = float(bin_width)
    pb = points.withColumn(
        "__bin", F.floor(F.col(value_col).cast("double") / F.lit(w)).cast("long")
    )
    ib = intervals.where(F.col(start_col) <= F.col(end_col)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / F.lit(w)).cast("long"),
                F.floor(F.col(end_col).cast("double") / F.lit(w)).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        ib = F.broadcast(ib)
    cond = (
        (pb["__bin"] == ib["__bin"])
        & (ib[start_col] <= pb[value_col])
        & (pb[value_col] <= ib[end_col])
    )
    joined = pb.join(ib, cond, "left" if how == "left" else "inner")
    return joined.select(
        *[pb[c] for c in points.columns], *[ib[c] for c in intervals.columns]
    )
