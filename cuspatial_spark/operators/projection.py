"""sinusoidal_projection — pure column expressions.

Reference: core/spatial/projection.py:17-64 +
detail/projection/sinusoidal_projection.cuh:35-61.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import sinusoidal_x_expr, sinusoidal_y_expr


def sinusoidal_projection(
    df: DataFrame,
    origin_lon: float,
    origin_lat: float,
    lon: str = "lon",
    lat: str = "lat",
    out_x: str = "x",
    out_y: str = "y",
) -> DataFrame:
    if not (-180 <= origin_lon <= 180 and -90 <= origin_lat <= 90):
        raise ValueError("origin must have valid longitude/latitude")
    return df.withColumn(
        out_x, sinusoidal_x_expr(F.col(lon), F.col(lat), origin_lon, origin_lat)
    ).withColumn(out_y, sinusoidal_y_expr(F.col(lat), origin_lat))
