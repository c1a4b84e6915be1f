"""prepare_corpus: gating correctness, dedup semantics, shuffle budget."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuspatial_spark.textops.pipeline import corpus_signals, prepare_corpus


GOOD = (
    "The analysis of the data and the methods of the survey were "
    "reviewed by the committee and the results of the report were "
    "published in the journal of the society for the record."
)
SPAMMY = ("buy now " * 60).strip()
REPEATED_LINES = "\n".join(["the same line of text appears here"] * 10)
SHORT = "tiny"
NON_EN = (
    "el la de " * 30
    + "resumen de la obra el la de la casa el la de"
)


def _docs(spark):
    rows = [
        (0, GOOD),
        (1, SPAMMY),
        (2, REPEATED_LINES),
        (3, SHORT),
        (4, NON_EN),
        (5, GOOD),          # exact duplicate of 0
        (6, GOOD + " !"),   # near duplicate of 0
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


class TestPrepareCorpus:
    def test_gates_and_exact_dedup(self, spark):
        out = prepare_corpus(
            _docs(spark), min_quality=0.5, max_dup_line_frac=0.3,
            max_top_bigram_frac=0.2, min_tokens=8,
        )
        ids = sorted(r.doc_id for r in out.select("doc_id").collect())
        # spam (top bigram), repeated lines, short all gated; exact
        # duplicate 5 deduped to earliest id 0; near-dup 6 SURVIVES
        # without near_dedup
        assert 0 in ids and 6 in ids
        assert 1 not in ids and 2 not in ids and 3 not in ids and 5 not in ids

    def test_near_dedup_removes_non_canonical(self, spark):
        out = prepare_corpus(
            _docs(spark), near_dedup=True,
            lsh_kwargs=dict(num_hashes=8, band_size=2, shingle_k=4),
        )
        ids = sorted(r.doc_id for r in out.select("doc_id").collect())
        assert 0 in ids and 6 not in ids

    def test_lang_gate(self, spark):
        out = prepare_corpus(
            _docs(spark), min_quality=0.0, max_dup_line_frac=1.0,
            max_top_bigram_frac=1.0, min_tokens=0,
            allowed_langs=("en",),
        )
        langs = {r.lang_pred for r in out.select("lang_pred").collect()}
        assert langs <= {"en"}

    def test_signals_fused_zero_shuffle(self, spark):
        sig = corpus_signals(_docs(spark))
        plan = sig._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "MapInPandas" not in plan

    def test_exact_path_single_shuffle(self, spark):
        out = prepare_corpus(_docs(spark))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # signals + gates fuse; the only Exchange is the dedup window
        assert plan.count("Exchange hashpartitioning") == 1

    def test_signal_columns_present(self, spark):
        out = prepare_corpus(_docs(spark))
        for col in (
            "lang_pred", "quality", "dup_line_frac", "dup_line_char_frac",
            "top_bigram_frac", "dup_bigram_frac", "bpe_n_tokens",
        ):
            assert col in out.columns


class TestPrepareTrainingData:
    def test_decontam_gate_and_packing(self, spark, tmp_path):
        from cuspatial_spark.textops.pipeline import (
            prepare_training_data,
            write_training_shards,
        )

        # doc 7 shares a 13-gram with the eval set; GOOD docs don't
        leaky = GOOD + " the quick brown fox jumps over the lazy dog near the old river bank today"
        docs = _docs(spark).union(
            spark.createDataFrame([(7, leaky)], schema="doc_id: long, text: string")
        )
        ev = spark.createDataFrame(
            [(100, "prefix words the quick brown fox jumps over the lazy dog near the old river bank today suffix")],
            schema="doc_id: long, text: string",
        )
        out = prepare_training_data(docs, eval_docs=ev, seq_len=16, decontam_n=13)
        rows = {r.doc_id: r.asDict() for r in out.collect()}
        assert 7 not in rows            # decontaminated
        assert 0 in rows and 6 in rows  # gates/dedup as before
        # packing invariants over the survivors in id order
        ids = sorted(rows)
        acc = 0
        for i in ids:
            assert rows[i]["start_token"] == acc
            assert rows[i]["seq_first"] == acc // 16
            acc += rows[i]["bpe_n_tokens"]

        # shard writer: deterministic hive layout, id-sorted files
        path = str(tmp_path / "shards")
        write_training_shards(
            out, path, seq_len=16, tokens_per_shard=32, id_col="doc_id"
        )
        back = spark.read.parquet(path)
        assert back.count() == len(ids)
        shards = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
        for i in ids:
            assert shards[i] == rows[i]["seq_first"] // 2  # 32 tok / 16 seq_len
    def test_no_eval_set_skips_decontam(self, spark):
        from cuspatial_spark.textops.pipeline import prepare_training_data

        out = prepare_training_data(_docs(spark), seq_len=64)
        assert "start_token" in out.columns and out.count() > 0
