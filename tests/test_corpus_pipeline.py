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
