"""Distance operators.

- haversine / pairwise point distance: pure Catalyst expressions
  (whole-stage codegen, no Python).
- point-linestring distance: vectorized Arrow-batched kernel.
- directed Hausdorff: grouped max-of-min; one NumPy kernel call per
  group via applyInPandas (reference core/spatial/distance.py:27-100).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..functions.expressions import EARTH_RADIUS_KM, haversine_expr
from ..geometry import LinestringArrays
from ..kernels.hausdorff import directed_hausdorff
from ..kernels.segment import point_linestring_distance_pairs


def haversine_distance(
    df: DataFrame,
    lon1: str,
    lat1: str,
    lon2: str,
    lat2: str,
    radius: float = EARTH_RADIUS_KM,
    result: str = "haversine_km",
) -> DataFrame:
    """Reference core/spatial/distance.py:103-166 as a column expr."""
    return df.withColumn(
        result, haversine_expr(F.col(lon1), F.col(lat1), F.col(lon2), F.col(lat2), radius)
    )


def pairwise_point_distance(
    df: DataFrame,
    x1: str,
    y1: str,
    x2: str,
    y2: str,
    result: str = "distance",
) -> DataFrame:
    """Single-point rows: plain Euclidean column expression
    (reference core/spatial/distance.py:169-240, single-point case)."""
    dx = F.col(x2) - F.col(x1)
    dy = F.col(y2) - F.col(y1)
    return df.withColumn(result, F.sqrt(dx * dx + dy * dy))


def pairwise_point_linestring_distance(
    df: DataFrame,
    linestrings: LinestringArrays,
    x: str = "x",
    y: str = "y",
    linestring_idx: str = "linestring_index",
    result: str = "distance",
) -> DataFrame:
    """Row i: distance from point to linestrings[linestring_idx[i]]
    (reference core/spatial/distance.py:317-435; multilinestrings are
    expanded to parts and min-reduced inside the batch, same as the
    multi* branches there)."""
    from .pairwise import _min_by_row, _part_pairs, _split_parts

    linestrings, go = _split_parts(linestrings)
    schema = StructType(df.schema.fields + [StructField(result, DoubleType(), False)])
    part_offsets, lx, ly = linestrings.part_offsets, linestrings.x, linestrings.y

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs = pdf[x].to_numpy()
            ys = pdf[y].to_numpy()
            gi = pdf[linestring_idx].to_numpy(dtype=np.int64)
            if go is None:
                d = point_linestring_distance_pairs(
                    xs, ys, gi, part_offsets, lx, ly
                ).astype(np.float64)
            else:
                row, _, rp = _part_pairs(gi, gi, None, go)
                dp = point_linestring_distance_pairs(
                    xs[row], ys[row], rp, part_offsets, lx, ly
                )
                d = _min_by_row(len(pdf), row, dp)
            pdf[result] = d
            yield pdf

    return df.mapInPandas(compute, schema=schema)


HAUSDORFF_SCHEMA = StructType(
    [
        StructField("group", LongType(), False),
        StructField("space_i", LongType(), False),
        StructField("space_j", LongType(), False),
        StructField("distance", DoubleType(), False),
    ]
)


def directed_hausdorff_distance(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    space: str = "space_id",
    group: str | None = None,
) -> DataFrame:
    """Directed Hausdorff between all pairs of spaces, as long-form
    rows (space_i, space_j, distance).  If ``group`` is given, the
    matrix is computed independently per group (each group handled by
    one applyInPandas task — the distributed axis)."""
    gcol = group or "__g"
    pdf_df = df if group else df.withColumn(gcol, F.lit(0))

    def compute(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(space, kind="stable")
        spaces, starts = np.unique(pdf[space].to_numpy(), return_index=True)
        m = directed_hausdorff(pdf[x].to_numpy(), pdf[y].to_numpy(), starts)
        n = len(spaces)
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        return pd.DataFrame(
            {
                "group": np.full(n * n, key[0], dtype=np.int64),
                "space_i": spaces[ii.ravel()],
                "space_j": spaces[jj.ravel()],
                "distance": m.ravel(),
            }
        )

    return pdf_df.groupBy(gcol).applyInPandas(compute, schema=HAUSDORFF_SCHEMA)
