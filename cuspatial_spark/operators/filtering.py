"""points_in_spatial_window — a pure Catalyst filter.

Reference: core/spatial/filtering.py:11-63 (strict inequalities, bound
swap).  Because this is a plain `where`, predicate pushdown and
partition pruning on tile columns come for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import spatial_window_predicate


def points_in_spatial_window(
    df: DataFrame,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    return df.where(spatial_window_predicate(F.col(x), F.col(y), x_min, x_max, y_min, y_max))
