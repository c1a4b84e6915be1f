"""Streaming near-duplicate detection: the LSH band-bucket candidate
generator (textops.dedup.lsh_candidate_pairs canonical mode) as a
stateful Structured Streaming operator.

Shape, and why it scales to an unbounded crawl:

1. MinHash signatures are the SAME zero-shuffle codegen expressions
   as the batch path (one md5 per shingle, affine permutations) —
   computed on the stream without state.
2. Band buckets explode to (band, bucket) keys; the groupBy on that
   key is the only shuffle.
3. ``applyInPandasWithState`` keeps ONE row of state per live bucket:
   the first-arrived doc id (the bucket's canonical representative).
   Every later arrival in the same bucket emits a (canon_id, doc_id)
   candidate pair — O(m) star pairs per bucket, never the O(m²)
   allpairs blow-up, exactly the batch canonical contract.
4. State is expired by event-time timeout ``horizon`` past each
   bucket's latest activity, so state size is bounded by the number
   of buckets active within the horizon — the only state-safe shape
   at crawl scale.

Differences from batch canonical mode, documented: the canonical
representative is the EARLIEST arrival (ties broken by min id inside
a micro-batch) rather than the global min id, and a pair is emitted
once per band that co-buckets it (at-least-once across bands; feed
the output through ``dropDuplicatesWithinWatermark(['id_a','id_b'])``
or a downstream exact groupBy when exactly-once pairs matter).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

NEARDUP_STATE_SCHEMA = StructType(
    [StructField("canon_id", LongType(), False)]
)

NEARDUP_OUT_SCHEMA = StructType(
    [
        StructField("id_a", LongType(), False),
        StructField("id_b", LongType(), False),
        StructField("band", IntegerType(), False),
        StructField("ts", TimestampType(), False),
    ]
)


def streaming_lsh_neardup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 8,
    watermark: str = "10 minutes",
    horizon_minutes: float = 10.0,
) -> DataFrame:
    """Streaming LSH near-dup candidates: (id_a=bucket canonical,
    id_b=later arrival, band, ts).  See module doc for semantics."""
    from ..textops.dedup import minhash_params, _shingle_hashes, MINHASH_P

    a, b = minhash_params(num_hashes)
    n_bands = num_hashes // band_size

    def perm(ai: int, bi: int):
        return lambda h: (F.lit(ai) * h + F.lit(bi)) % F.lit(MINHASH_P)

    hashed = stream.select(
        id_col, ts_col, _shingle_hashes(text_col, shingle_k).alias("__sh")
    )
    sig_cols = [
        F.array_min(F.transform("__sh", perm(a[i], b[i]))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sig = hashed.select(id_col, ts_col, *sig_cols)
    bands = sig.select(
        id_col,
        ts_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"mh{bi * band_size + j}").cast("string")
                                for j in range(band_size)
                            ],
                        ).alias("bucket"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, ts_col, "bb.band", "bb.bucket")

    horizon_ms = int(horizon_minutes * 60_000)

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            # every column needs an explicit dtype — a default float64
            # 'ts' can mis-coerce the Arrow conversion to the
            # TimestampType output schema on bucket expiry (ADVICE r5)
            yield pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "band": pd.Series([], dtype="int32"),
                    "ts": pd.Series([], dtype="datetime64[ns]"),
                }
            )
            return
        band = int(key[0])
        canon = state.get[0] if state.exists else None
        out_a, out_b, out_ts = [], [], []
        max_ts = None
        # chunks arrive in shuffle order — concat BEFORE sorting so
        # "earliest arrival" is computed over the whole micro-batch
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            # earliest arrival wins; ties inside a batch break by id
            pdf = pdf.sort_values([ts_col, id_col], kind="stable")
            for doc, ts in zip(pdf[id_col], pdf[ts_col]):
                if canon is None:
                    canon = int(doc)
                elif int(doc) != canon:
                    out_a.append(canon)
                    out_b.append(int(doc))
                    out_ts.append(ts)
                max_ts = ts if max_ts is None else max(max_ts, ts)
        if canon is not None:
            state.update((canon,))
        if max_ts is not None:
            # expire the bucket `horizon` past its latest activity
            state.setTimeoutTimestamp(
                int(pd.Timestamp(max_ts).value // 1_000_000) + horizon_ms
            )
        yield pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "band": pd.Series([band] * len(out_a), dtype="int32"),
                "ts": pd.Series(out_ts, dtype="datetime64[ns]"),
            }
        )

    return (
        bands.withWatermark(ts_col, watermark)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            update,
            outputStructType=NEARDUP_OUT_SCHEMA,
            stateStructType=NEARDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
