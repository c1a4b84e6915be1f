"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k, queries broadcast; the
  dot product is a left-folded ``F.aggregate`` over ``F.zip_with``
  (JVM-side, deterministic order — engine-portable results).
- ``ivf_topk``: IVF-style scale path — vectors bucketed to their
  nearest centroid (vectorized pandas UDF), search probes only
  ``nprobe`` buckets per query, turning the N x Q cross join into a
  bucket equi-join.  Recall < 1 by design; the tradeoff knob is
  (n_centroids, nprobe).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def norm_expr(a) -> "F.Column":
    """L2 norm of an array<float/double> column, deterministic
    left-to-right fold (the exact _norm_sql oracle expression)."""
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a, b, na=None, nb=None) -> "F.Column":
    """Cosine similarity between two array<float/double> columns,
    deterministic left-to-right fold.  ``na``/``nb`` accept
    PRECOMPUTED norm columns (guide §2.3: a pair join evaluates this
    expression once per PAIR, so hoisting the norms to per-vector
    columns before the join removes two 64-element interpreted folds
    per candidate; the value is bit-identical — same expression,
    evaluated earlier)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    if na is None:
        na = norm_expr(a)
    if nb is None:
        nb = norm_expr(b)
    return dot / (na * nb)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query side against
    the full vector table; rank with a window over each query.
    Returns (query_id, neighbor_id, score, rank)."""
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
    ).withColumn("__nq", norm_expr(F.col("__qvec")))
    joined = (
        vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
        )
        .withColumn("__nv", norm_expr(F.col("__v")))
        .crossJoin(F.broadcast(q))
    )
    scored = joined.select(
        query_id_col,
        "neighbor_id",
        cosine_expr(
            F.col("__v"), F.col("__qvec"), na=F.col("__nv"), nb=F.col("__nq")
        ).alias("score"),
    ).where(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lhs: DataFrame | None = None,
    centroids: np.ndarray | None = None,
    nprobe: int = 2,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, score)
    with cosine >= threshold.

    Two plans:

    - ``centroids=None`` — exact all-pairs verify.  Use only when one
      side is bounded (pass ``lhs`` to restrict the left side, which
      is broadcast); the all-pairs cross join is NOT the 100-TB shape.
    - ``centroids`` given — IVF-bucketed: every vector is assigned to
      its nearest centroid, and additionally *probes* its ``nprobe``
      nearest buckets; candidates are (probe-side x assign-side)
      bucket equi-join rows, then exact cosine verify.  Near-dup
      vectors almost always share a nearest centroid, and the
      two-sided id_a<id_b union means a pair is found if EITHER
      member's probe set covers the other's bucket — the same
      bucket-join shape as LSH banding, never an all-pairs join.
    """
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    ).withColumn("__nb", norm_expr(F.col("__vb")))
    if centroids is None:
        a = (lhs or vectors).select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
        ).withColumn("__na", norm_expr(F.col("__va")))
        cand = F.broadcast(a).crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        cts = centroids.astype(np.float64)
        assigned = _assign_centroids(b, cts, "__vb", "bucket")

        @F.pandas_udf("array<bigint>")
        def probe_buckets(v: pd.Series) -> pd.Series:
            m = np.stack(v.to_numpy()).astype(np.float64)
            d = (m * m).sum(1)[:, None] - 2.0 * m @ cts.T + (cts * cts).sum(1)[None, :]
            idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
            return pd.Series(list(idx.astype(np.int64)))

        probing = (
            (lhs or vectors)
            .select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
            .withColumn("__na", norm_expr(F.col("__va")))
            .withColumn("bucket", F.explode(probe_buckets(F.col("__va"))))
        )
        cand = (
            probing.join(assigned, on="bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        cand.select(
            "id_a",
            "id_b",
            cosine_expr(
                F.col("__va"), F.col("__vb"),
                na=F.col("__na"), nb=F.col("__nb"),
            ).alias("score"),
        )
        .where(F.col("score") >= F.lit(float(threshold)))
    )


def _sample_across_partitions(df: DataFrame, n_rows: int) -> DataFrame:
    """Up to ``ceil(n_rows / n_partitions)`` head rows from EVERY
    partition — a cross-partition bounded sample with no shuffle and
    no count job.  Deterministic for a fixed partitioning (each
    partition contributes its head), unlike ``.sample()`` it needs no
    fraction estimate, and unlike ``.limit()`` it cannot collapse onto
    the first crawl segment of a 100-TB table."""
    import math

    n_parts = max(1, df.rdd.getNumPartitions())
    per_part = max(1, math.ceil(n_rows / n_parts))

    def take_head(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        taken = 0
        for pdf in batches:
            if taken >= per_part:
                return
            pdf = pdf.iloc[: per_part - taken]
            taken += len(pdf)
            yield pdf

    return df.mapInPandas(take_head, schema=df.schema)


def train_centroids(
    vectors: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    sample_rows: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Mini k-means on a driver-side sample — the offline step that
    produces the IVF coarse quantizer.  The sample is a bounded
    collect (``sample_rows``); training is vectorized NumPy Lloyd
    iterations.  At 100 TB you still sample ~1e5 rows; the full table
    is only touched by the (distributed) assignment afterwards.

    The sample is drawn ACROSS partitions (per-partition capped head
    via ``mapInPandas``, no shuffle, no count job) — a plain
    ``.limit()`` would take the first rows of the first partitions,
    which on a real crawl-ordered table is one segment and silently
    degrades the quantizer (and recall) for everything else."""
    frac_df = (
        _sample_across_partitions(vectors.select(vec_col), sample_rows)
        .limit(sample_rows)
        .toPandas()
    )
    m = np.stack(frac_df[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    cts = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        d = (m * m).sum(1)[:, None] - 2.0 * m @ cts.T + (cts * cts).sum(1)[None, :]
        assign = np.argmin(d, axis=1)
        for c in range(len(cts)):
            members = m[assign == c]
            if len(members):
                cts[c] = members.mean(axis=0)
    return cts


def _assign_centroids(df: DataFrame, centroids: np.ndarray, vec_col: str, out: str) -> DataFrame:
    """Nearest-centroid id per row, vectorized over Arrow batches."""
    cts = centroids.astype(np.float64)

    @F.pandas_udf(LongType())
    def assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        m = m.astype(np.float64)
        # (n, c) squared distances via ||x||^2 - 2 x.c + ||c||^2
        d = (m * m).sum(1)[:, None] - 2.0 * m @ cts.T + (cts * cts).sum(1)[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int64))

    return df.withColumn(out, assign(F.col(vec_col)))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-bucketed ANN: vectors join only queries probing their
    bucket.  ``centroids`` is a (C, dim) ndarray (e.g. sampled rows or
    k-means run offline)."""
    cts = centroids.astype(np.float64)

    vec_b = _assign_centroids(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")),
        cts, "__v", "bucket",
    )

    @F.pandas_udf("array<bigint>")
    def probe_buckets(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        d = (m * m).sum(1)[:, None] - 2.0 * m @ cts.T + (cts * cts).sum(1)[None, :]
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(idx.astype(np.int64)))

    q = (
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
        )
        .withColumn("__nq", norm_expr(F.col("__qvec")))
        .withColumn("bucket", F.explode(probe_buckets(F.col("__qvec"))))
    )

    joined = vec_b.withColumn("__nv", norm_expr(F.col("__v"))).join(
        F.broadcast(q), on="bucket"
    )
    scored = joined.select(
        query_id_col,
        "neighbor_id",
        cosine_expr(
            F.col("__v"), F.col("__qvec"), na=F.col("__nv"), nb=F.col("__nq")
        ).alias("score"),
    ).where(F.col(query_id_col) != F.col("neighbor_id"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
