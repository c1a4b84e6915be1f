"""Duplicated n-gram spans: Spark vs pure-Python vs DuckDB parity."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import duckdb
import pandas as pd
import pytest

from cuspatial_spark.textops.spans import (
    duplicated_ngram_oracle_sql,
    duplicated_ngram_spans,
)


def py_spans(texts: dict[int, str], n: int) -> dict[int, tuple[int, int, int]]:
    wins: dict[int, list[str]] = {}
    for d, t in texts.items():
        toks = re.split(" +", (t or "").strip())
        wins[d] = [
            hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
            for i in range(len(toks) - n + 1)
        ]
    cnt = Counter(h for ws in wins.values() for h in ws)
    out = {}
    for d, ws in wins.items():
        flagged = [i for i, h in enumerate(ws) if cnt[h] >= 2]
        spans = 0
        prev = -2
        for i in flagged:
            if i != prev + 1:
                spans += 1
            prev = i
        out[d] = (len(ws), len(flagged), spans)
    return out


SHARED = "one two three four five six seven eight"
TEXTS = {
    0: f"intro words {SHARED} closing remarks here",
    1: f"other document begins {SHARED} and then diverges totally",
    2: "completely unrelated text with nothing repeated anywhere at all ok",
    3: "tiny",
    4: f"{SHARED} {SHARED}",  # self-repeat inside one doc
}
N = 8


class TestDuplicatedNgramSpans:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                [(k, v) for k, v in TEXTS.items()], columns=["doc_id", "text"]
            )
        )
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows, r.n_spans)
            for r in duplicated_ngram_spans(df, n=N).collect()
        }
        assert got == py_spans(TEXTS, N)
        # the shared 8-gram must be flagged in docs 0, 1, 4 — not 2, 3
        assert got[0][1] >= 1 and got[1][1] >= 1 and got[4][1] >= 1
        assert got[2] == (got[2][0], 0, 0)
        assert got[3] == (0, 0, 0)

    def test_matches_duckdb_oracle(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                [(k, v) for k, v in TEXTS.items()], columns=["doc_id", "text"]
            )
        )
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows, r.n_spans, r.n_dup_tokens)
            for r in duplicated_ngram_spans(df, n=N).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(f"({k}, '{v}')" for k, v in TEXTS.items())
            + ") t(doc_id, text)"
        )
        for doc_id, nw, nd, ns, nt in con.execute(
            duplicated_ngram_oracle_sql(n=N)
        ).fetchall():
            assert got[doc_id] == (nw, nd, ns, nt), doc_id
            assert nt == nd + ns * (N - 1)

    def test_span_merging(self, spark):
        # 10 tokens all inside one long duplicated region -> ONE span
        long = "a b c d e f g h i j"
        texts = {0: long, 1: long}
        df = spark.createDataFrame(
            pd.DataFrame([(k, v) for k, v in texts.items()], columns=["doc_id", "text"])
        )
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows, r.n_spans)
            for r in duplicated_ngram_spans(df, n=8).collect()
        }
        assert got[0] == (3, 3, 1) and got[1] == (3, 3, 1)


def py_remove(texts: dict[int, str], n: int) -> dict[int, tuple[str, int]]:
    """Brute-force reference: cut every token covered by a duplicated
    n-window."""
    wins: dict[int, list[str]] = {}
    toks_by: dict[int, list[str]] = {}
    for d, t in texts.items():
        toks = re.split(" +", (t or "").strip()) if (t or "").strip() else []
        toks_by[d] = toks
        wins[d] = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    cnt = Counter(h for ws in wins.values() for h in ws)
    out = {}
    for d, toks in toks_by.items():
        covered = set()
        for i, h in enumerate(wins[d]):
            if cnt[h] >= 2:
                covered.update(range(i, i + n))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[d] = (" ".join(kept), len(toks) - len(kept))
    return out


class TestRemoveDuplicatedSpans:
    def test_matches_bruteforce_reference(self, spark):
        from cuspatial_spark.textops.spans import remove_duplicated_spans

        texts = {
            0: "u1 u2 u3 c1 c2 c3 c4 tail0 x y",   # shares c1..c4 with doc 1
            1: "v1 c1 c2 c3 c4 v2 v3 v4 v5",
            2: "w1 w2 w3 w4 w5 w6 w7 w8 w9",        # clean
            3: "c1 c2 c3 c4 c1 c2 c3 c4 c1 c2 c3 c4",  # self-repeat, one big span
            4: "",                                   # empty
            5: None,                                 # null
        }
        docs = spark.createDataFrame(
            [(d, t) for d, t in texts.items()], schema="doc_id: long, text: string"
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
            for r in remove_duplicated_spans(docs, n=4).collect()
        }
        want = py_remove(texts, 4)
        for d in texts:
            assert got[d] == want[d], f"doc {d}: {got[d]} != {want[d]}"

    def test_dup_token_count_consistent_with_stats(self, spark):
        """n_tokens_removed == duplicated_ngram_spans.n_dup_tokens on
        the same corpus (the closed form IS the covered-token count)."""
        from cuspatial_spark.textops.spans import remove_duplicated_spans

        rows = [(i, " ".join(str((i * j) % 23) for j in range(1, 18)))
                for i in range(60)]
        docs = spark.createDataFrame(rows, schema="doc_id: long, text: string")
        stats = {r["doc_id"]: r["n_dup_tokens"]
                 for r in duplicated_ngram_spans(docs, n=5).collect()}
        removed = {r["doc_id"]: r["n_tokens_removed"]
                   for r in remove_duplicated_spans(docs, n=5).collect()}
        assert stats == removed
        assert sum(stats.values()) > 0  # fixture really has dups
