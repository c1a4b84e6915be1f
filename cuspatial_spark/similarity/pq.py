"""Product quantization (PQ) for ANN at memory-compressed scale.

At 100 TB a float32 embedding table does not fit executor memory
alongside anything else: 1e12 docs x 128 dims x 4 B = 512 TB of raw
vectors.  PQ (Jegou, Douze, Schmid 2011 — "Product Quantization for
Nearest Neighbor Search", TPAMI) compresses each vector to ``m``
one-byte codes (m=16 -> 32x for 128-dim float32): the vector is split
into ``m`` subspaces and each sub-vector is replaced by the index of
its nearest centroid in a 256-entry per-subspace codebook.

Query-time scoring is Asymmetric Distance Computation (ADC): a query
builds an (m, 256) lookup table of exact squared distances to every
codebook entry once, then each candidate's approximate distance is
``m`` table lookups + a sum — no decode, no float vector movement.

Spark shapes, and why they scale:

- **Training** (`train_pq`): driver-side k-means per subspace on a
  bounded cross-partition sample (same sampler as IVF) — the corpus
  is never touched by training beyond the sample scan.
- **Encoding** (`pq_encode`): one vectorized Arrow-batched pandas UDF
  pass; output is ``array<tinyint-ish>`` codes (stored as smallint
  for Arrow friendliness), 32x smaller than the input — THIS is the
  table a 100-TB pipeline persists and joins, not the floats.
- **Search** (`pq_topk`): IVF bucket equi-join (reusing the ann.py
  coarse quantizer) restricted to ``nprobe`` buckets per query; ADC
  scoring is a vectorized per-batch NumPy gather; the only shuffle is
  the final per-query top-k window (WindowGroupLimit pre-prunes to k
  rows per map task before it).

Exactness contract (pinned by tests): ADC(query, codes) equals the
true squared distance between the query and the RECONSTRUCTED vector,
bit-for-bit up to float64 summation order — approximation lives
entirely in the quantization, never in the scoring math.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

from .ann import _sample_across_partitions


def train_pq(
    vectors: DataFrame,
    m_subspaces: int = 4,
    n_codes: int = 256,
    vec_col: str = "embedding",
    sample_rows: int = 100_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace k-means codebooks, shape (m, n_codes, dim/m).
    Driver-side Lloyd iterations on a bounded cross-partition sample
    (``ann._sample_across_partitions`` — cannot collapse onto one
    crawl segment the way ``.limit()`` would)."""
    pdf = (
        _sample_across_partitions(vectors.select(vec_col), sample_rows)
        .limit(sample_rows)
        .toPandas()
    )
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    n, dim = mat.shape
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    sub = dim // m_subspaces
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m_subspaces):
        x = mat[:, j * sub : (j + 1) * sub]
        k = min(n_codes, len(x))
        cts = x[rng.choice(len(x), size=k, replace=False)]
        for _ in range(iters):
            d = (
                (x * x).sum(1)[:, None]
                - 2.0 * x @ cts.T
                + (cts * cts).sum(1)[None, :]
            )
            assign = np.argmin(d, axis=1)
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    cts[c] = members.mean(axis=0)
        if k < n_codes:  # tiny sample: pad by repeating entries
            cts = cts[np.arange(n_codes) % k]
        books.append(cts)
    return np.stack(books)  # (m, n_codes, sub)


def _encode_batch(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) float -> (n, m) int16 nearest-codebook indices."""
    m, n_codes, sub = books.shape
    out = np.empty((mat.shape[0], m), dtype=np.int16)
    for j in range(m):
        x = mat[:, j * sub : (j + 1) * sub]
        cts = books[j]
        d = (
            (x * x).sum(1)[:, None]
            - 2.0 * x @ cts.T
            + (cts * cts).sum(1)[None, :]
        )
        out[:, j] = np.argmin(d, axis=1).astype(np.int16)
    return out


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Vector -> m int16 codes, one vectorized Arrow pass.  The
    returned column is what a 100-TB pipeline persists (32x smaller
    than float32 input at m=dim/8, 256 codes)."""
    books = codebooks.astype(np.float64)

    @F.pandas_udf(ArrayType(ShortType()))
    def encode(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        codes = _encode_batch(mat, books)
        return pd.Series(list(codes))

    return df.withColumn(out_col, encode(F.col(vec_col)))


def pq_reconstruct(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) codes -> (n, dim) reconstructed vectors (test utility /
    re-ranking path)."""
    m = codebooks.shape[0]
    return np.concatenate(
        [codebooks[j][codes[:, j]] for j in range(m)], axis=1
    )


PQ_SCORE_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("adc_dist", DoubleType(), False),
    ]
)


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    code_col: str | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """IVF-PQ top-k: coarse IVF buckets bound the candidate set,
    ADC scores the candidates from codes alone.

    ``vectors`` needs either a pre-encoded ``code_col`` (the 100-TB
    path: encode once, persist codes) or ``vec_col`` to encode on the
    fly; likewise ``bucket_col`` skips the coarse assignment — with
    both persisted, search never touches a float vector column.
    Queries stay exact (asymmetric).  Returns (query_id, neighbor_id,
    adc_dist, rank)."""
    from .ann import _assign_centroids

    books = codebooks.astype(np.float64)
    cts = centroids.astype(np.float64)
    m, n_codes, sub = books.shape

    if code_col is None:
        vectors = pq_encode(vectors, books, vec_col, "__code")
        code_col = "__code"
    if bucket_col is None:
        vec_b = _assign_centroids(
            vectors.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(code_col).alias("__c"),
                F.col(vec_col).alias("__v"),
            ),
            cts, "__v", "bucket",
        ).select("neighbor_id", "__c", "bucket")
    else:
        vec_b = vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(code_col).alias("__c"),
            F.col(bucket_col).cast("long").alias("bucket"),
        )

    # query -> nprobe nearest coarse buckets (tiny side, broadcast)
    qpdf = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__q")
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        d = (
            (mat * mat).sum(1)[:, None]
            - 2.0 * mat @ cts.T
            + (cts * cts).sum(1)[None, :]
        )
        order = np.argsort(d, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    q_b = qpdf.withColumn("bucket", F.explode(probe(F.col("__q"))))

    cand = vec_b.join(F.broadcast(q_b), on="bucket").select(
        "query_id", "neighbor_id", "__c", "__q"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables: dict = {}  # query lookup tables built once per query
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf["__c"].to_numpy()).astype(np.int64)
            dists = np.zeros(len(pdf), dtype=np.float64)
            # group rows by query so each LUT is built once per batch
            for qid, idx in pdf.groupby("query_id").indices.items():
                q = np.asarray(pdf["__q"].iloc[idx[0]], dtype=np.float64)
                lut = tables.get(qid)
                if lut is None:
                    lut = np.stack(
                        [
                            (
                                (books[j] - q[j * sub : (j + 1) * sub]) ** 2
                            ).sum(axis=1)
                            for j in range(m)
                        ]
                    )  # (m, n_codes)
                    tables[qid] = lut
                sel = codes[idx]  # (rows, m)
                dists[idx] = lut[np.arange(m)[None, :], sel].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "adc_dist": dists,
                }
            )

    scored = cand.mapInPandas(score, schema=PQ_SCORE_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumnRenamed("query_id", query_id_col)
    )
