"""Gopher-style repetition signals: Spark lambdas vs a pure-Python
reference and vs the DuckDB relational oracle, plus plan shape."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from cuspatial_spark.textops.repetition import (
    repetition_oracle_sql,
    repetition_signals,
)


def py_signals(text: str) -> dict:
    text = text or ""
    lines = text.split("\n")
    lc = Counter(lines)
    n_lines = len(lines)
    n_distinct = len(lc)
    total_chars = sum(len(l) for l in lines)
    dup_chars = sum(len(l) * c for l, c in lc.items() if c >= 2)
    import re

    words = re.split(" +", text.strip())
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    bc = Counter(bigrams)
    n_bg = len(bigrams)
    return {
        "dup_line_frac": (n_lines - n_distinct) / n_lines if n_lines else 0.0,
        "dup_line_char_frac": dup_chars / total_chars if total_chars else 0.0,
        "top_bigram_frac": max(bc.values()) / n_bg if n_bg else 0.0,
        "dup_bigram_frac": sum(c for c in bc.values() if c >= 2) / n_bg
        if n_bg
        else 0.0,
    }


SAMPLES = [
    "unique line one\nunique line two\nunique line three",
    "spam\nspam\nspam\nham",
    "buy now buy now buy now buy now",
    "a b a b a b c d",
    "",
    "single",
    "x\n\n\nx",  # empty-line duplicates count too
    "one two three four five six seven eight",
]


class TestRepetitionSignals:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(SAMPLES)], ["doc_id", "text"]
        )
        rows = repetition_signals(df).orderBy("doc_id").collect()
        for r in rows:
            exp = py_signals(SAMPLES[r.doc_id])
            for k, v in exp.items():
                assert getattr(r, k) == pytest.approx(v, abs=0), (
                    r.doc_id,
                    k,
                    SAMPLES[r.doc_id],
                )

    def test_matches_duckdb_oracle(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(SAMPLES)], ["doc_id", "text"]
        )
        got = {
            r.doc_id: r.asDict()
            for r in repetition_signals(df)
            .select(
                "doc_id",
                "dup_line_frac",
                "dup_line_char_frac",
                "top_bigram_frac",
                "dup_bigram_frac",
            )
            .collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, '{s}')".replace("\n", "' || chr(10) || '")
                for i, s in enumerate(SAMPLES)
            )
            + ") v(doc_id, text)"
        )
        for row in con.execute(repetition_oracle_sql()).fetchall():
            doc_id, *vals = row
            keys = [
                "dup_line_frac",
                "dup_line_char_frac",
                "top_bigram_frac",
                "dup_bigram_frac",
            ]
            for k, v in zip(keys, vals):
                assert got[doc_id][k] == pytest.approx(v, abs=0), (doc_id, k)

    def test_gates_pathological_spam(self, spark):
        df = spark.createDataFrame(
            [(0, "word " * 500), (1, "all distinct words " + " ".join(map(str, range(500))))],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: r for r in repetition_signals(df).collect()}
        assert rows[0].top_bigram_frac > 0.9
        assert rows[1].top_bigram_frac < 0.05

    def test_pure_codegen_plan(self, spark):
        df = spark.createDataFrame([("a\nb",)], ["text"])
        out = repetition_signals(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "MapInPandas" not in plan
