"""Streaming LSH near-dup: stream-vs-batch candidate parity and
state-shape sanity (one canonical representative per bucket)."""

from __future__ import annotations

import numpy as np
import pandas as pd


A = "the quick brown fox jumps over the lazy dog again and again today"
B = "completely different content about spark structured streaming state"
TEXTS = {
    0: A,
    1: B,
    2: A,                      # near-dup of 0
    3: "unique text number three with nothing shared across the corpus",
    4: B + "!",                # near-dup of 1 (one shingle differs)
    5: A,                      # near-dup of 0
    6: "another standalone document that matches no other row at all",
}


def _source(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": list(TEXTS),
            "text": [TEXTS[i] for i in TEXTS],
            # offset from epoch 0: a ts equal to the initial watermark
            # (0) would be dropped as late before the stateful op
            "ts": pd.to_datetime([10_000 + i for i in TEXTS], unit="s"),
        }
    )
    src = str(tmp_path / "neardup_src")
    spark.createDataFrame(pdf).write.parquet(src)
    return spark.readStream.schema(
        "doc_id bigint, text string, ts timestamp"
    ).parquet(src)


def test_stream_matches_batch_canonical(spark, tmp_path):
    from cuspatial_spark.streaming import streaming_lsh_neardup
    from cuspatial_spark.textops.dedup import lsh_candidate_pairs

    kw = dict(num_hashes=8, band_size=2, shingle_k=4)
    stream = _source(spark, tmp_path)
    out = streaming_lsh_neardup(stream, watermark="1 minute", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_neardup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT DISTINCT id_a, id_b FROM stream_neardup").toPandas()
    stream_pairs = set(zip(got["id_a"], got["id_b"]))

    batch = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(TEXTS), "text": [TEXTS[i] for i in TEXTS]}
        )
    )
    exp = lsh_candidate_pairs(batch, mode="canonical", **kw).toPandas()
    batch_pairs = set(zip(exp["id_a"], exp["id_b"]))

    # ts == doc_id order, so earliest-arrival canon == min-id canon
    assert stream_pairs == batch_pairs
    # sanity: the exact duplicates must be found
    assert (0, 2) in stream_pairs and (0, 5) in stream_pairs


def test_trajectory_sessions(spark, tmp_path):
    """Idle-gap sessionization: pings 40+ minutes apart split into
    separate sessions; bbox and counts per session are exact."""
    from cuspatial_spark.streaming import streaming_trajectory_sessions

    base = 1_000_000
    pdf = pd.DataFrame(
        {
            "object_id": [1, 1, 1, 1, 2],
            "x": [0.0, 1.0, 5.0, 6.0, 9.0],
            "y": [0.0, 2.0, 5.0, 7.0, 9.0],
            "timestamp": pd.to_datetime(
                # obj 1: two pings 60s apart, 40-min gap, two more
                [base, base + 60, base + 2460, base + 2520, base],
                unit="s",
            ),
        }
    )
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema(
        "object_id bigint, x double, y double, timestamp timestamp"
    ).parquet(src)
    sess = streaming_trajectory_sessions(stream, gap="30 minutes")
    q = (
        sess.writeStream.format("memory")
        .queryName("traj_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT * FROM traj_sessions ORDER BY object_id, session_start"
    ).collect()
    assert [(r.object_id, r.n_points) for r in got] == [(1, 2), (1, 2), (2, 1)]
    first = got[0]
    assert (first.x_min, first.x_max, first.y_min, first.y_max) == (0.0, 1.0, 0.0, 2.0)
    second = got[1]
    assert (second.x_min, second.x_max) == (5.0, 6.0)


def test_pairs_never_self_and_ids_ordered_by_arrival(spark, tmp_path):
    from cuspatial_spark.streaming import streaming_lsh_neardup

    stream = _source(spark, tmp_path)
    out = streaming_lsh_neardup(
        stream, watermark="1 minute", num_hashes=8, band_size=2, shingle_k=4
    )
    q = (
        out.writeStream.format("memory")
        .queryName("stream_neardup2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT id_a, id_b FROM stream_neardup2").toPandas()
    assert (got["id_a"] != got["id_b"]).all()
    # canonical side is the earliest arrival -> smaller ts == smaller id here
    assert (got["id_a"] < got["id_b"]).all()
