"""Deduplication operators for large text corpora.

All hash primitives are md5-based so results are engine-portable
(byte-identical in Spark, DuckDB, Python) and deterministic across
cluster sizes.  Everything except simhash is pure Spark built-ins
(whole-stage codegen; shuffles only on groupBy keys); simhash packs
64 bits per token via a vectorized pandas UDF.

Scale notes (100 TB): shingling explodes ~n_chars rows per doc — the
explode is map-side only; the only shuffles are the groupBy(doc) for
signatures and the band-bucket self-join, whose keys (band hashes) are
uniformly distributed by construction, so no salting is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, canonical_id): canonical_id = min doc id sharing the
    exact text.  One hash-shuffle on md5(text)."""
    return (
        docs.select(id_col, F.md5(F.col(text_col).cast("binary")).alias("__h"))
        .withColumn("canonical_id", F.min(id_col).over(Window.partitionBy("__h")))
        .select(id_col, "canonical_id")
    )


def _shingles(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Distinct character-k-gram shingles per doc (built-ins only)."""
    n = F.greatest(F.length(text_col) - F.lit(k - 1), F.lit(1))
    return (
        docs.select(id_col, text_col)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.col(text_col).substr(i, F.lit(k)),
                )
            ).alias("shingle"),
        )
        .dropDuplicates([id_col, "shingle"])
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_k: int = 8,
) -> DataFrame:
    """MinHash signature per doc: column ``mh{i}`` = min over shingles
    of md5("{i}:" + shingle).  Lexicographic min over hex strings — an
    engine-portable stand-in for integer minhash.

    Computed entirely per-row (`array_min` over a `transform`ed shingle
    sequence): ZERO shuffles and no shingle explosion — min over
    duplicate shingles equals min over distinct ones, so no dedup pass
    is needed either.  One scan at any corpus size.
    """
    n = F.greatest(F.length(text_col) - F.lit(shingle_k - 1), F.lit(1))
    cols = [
        F.array_min(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.md5(
                    F.concat(
                        F.lit(f"{h}:"), F.col(text_col).substr(i, F.lit(shingle_k))
                    ).cast("binary")
                ),
            )
        ).alias(f"mh{h}")
        for h in range(num_hashes)
    ]
    return docs.select(id_col, *cols)


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 8,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) sharing at least
    one LSH band bucket (banding over the minhash signature)."""
    # spread the md5 work before computing signatures: small corpus
    # files often arrive as one partition, which would serialize the
    # whole signature computation onto one core
    spark = docs.sparkSession
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 2, id_col)
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k)
    n_bands = num_hashes // band_size
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat(
                                *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                            ).cast("binary")
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for given (id_a, id_b) pairs:
    |A ∩ B| / |A ∪ B| over distinct shingle sets."""
    sh = _shingles(docs, id_col, text_col, shingle_k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("shingle").alias("shingle"))
    inter = (
        pairs.join(sa, on="id_a")
        .join(sb, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(inter, on=["id_a", "id_b"], how="left")
        .na.fill({"n_inter": 0})
        .join(na, on="id_a")
        .join(nb, on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (md5-derived token
    hashes), computed with a vectorized pandas UDF (NumPy bit
    unpacking — no per-row Python loops over bits)."""
    import hashlib

    @F.pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):  # per-document; inner math vectorized
            toks = t.split()
            if not toks:
                continue
            hashes = np.frombuffer(
                b"".join(hashlib.md5(tok.encode()).digest()[:8] for tok in toks),
                dtype=">u8",
            )
            bits_mat = (hashes[:, None] >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)
            votes = (2 * bits_mat.astype(np.int64) - 1).sum(axis=0)
            val = np.uint64(0)
            val = ((votes >= 0).astype(np.uint64) << np.arange(bits, dtype=np.uint64)).sum(
                dtype=np.uint64
            )
            out[i] = np.int64(val.astype(np.int64))
        return pd.Series(out)

    return docs.select(id_col, simhash_udf(F.col(text_col)).alias("simhash"))
