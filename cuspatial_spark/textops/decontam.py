"""Benchmark decontamination — flag training documents that share any
n-token window with an evaluation/benchmark set.

Training on text that overlaps eval benchmarks inflates reported
metrics (GPT-3 appendix C and Gopher both run exactly this check:
13-gram overlap there; the n is a parameter here).  The leakage-safe
split (operators/graph.py) prevents near-dup TRAIN/EVAL leakage
within the corpus; this operator handles leakage against an EXTERNAL
benchmark set.

Scale shape: the eval side is small by construction (benchmark suites
are 10^4-10^6 documents against a 10^12-document corpus), so its
distinct window-hash set broadcasts; the corpus side is one
row-local window-hash ``transform`` (fuses into the scan), an
explode, a broadcast semi-join, and a groupBy on the document id —
one uniform-key shuffle total.  Set ``broadcast=False`` to fall back
to a shuffle equi-join when the eval set is genuinely huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spans import _window_hashes


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Per-corpus-document contamination stats vs ``eval_docs``:
    ``n_windows`` (n-token windows in the doc), ``n_contaminated``
    (windows whose content appears in ANY eval document), and
    ``contaminated`` (any hit).  Every corpus doc appears in the
    output; tokenization is whitespace, matching
    ``duplicated_ngram_spans``."""
    eval_hashes = (
        eval_docs.select(
            F.explode(_window_hashes(text_col, n)).alias("wh")
        ).distinct()
    )
    if broadcast:
        eval_hashes = F.broadcast(eval_hashes)
    hits = (
        corpus.select(
            id_col, F.explode(_window_hashes(text_col, n)).alias("wh")
        )
        .join(eval_hashes, "wh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    # the totals branch re-reads the scan but does NOT re-hash:
    # n_windows is plain arithmetic on the token count (hashing every
    # window twice would double the dominant per-byte cost)
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " +")
    return (
        corpus.select(
            id_col,
            F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
            .cast("long")
            .alias("n_windows"),
        )
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            "n_windows",
            F.coalesce("n_contaminated", F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_oracle_sql(
    n: int = 8,
    corpus_where: str = "TRUE",
    eval_where: str = "FALSE",
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay: md5 window hashes (same equality classes as the
    xxhash64 keys — counts depend only on hash-equality), semi-join
    against the eval set's distinct windows, group by document."""
    toks = "string_split_regex(trim(coalesce(text, '')), ' +')"
    return f"""
        WITH base AS (
          SELECT {id_col}, {toks} AS toks FROM {table} WHERE {corpus_where}
        ),
        ev AS (
          SELECT {toks} AS toks FROM {table} WHERE {eval_where}
        ),
        evwins AS (
          SELECT DISTINCT
                 md5(array_to_string(toks[u.i : u.i + {n} - 1], ' ')) AS wh
          FROM ev, UNNEST(range(1, len(toks) - {n} + 2)) AS u(i)
          WHERE len(toks) >= {n}
        ),
        wins AS (
          SELECT {id_col},
                 md5(array_to_string(toks[u.i : u.i + {n} - 1], ' ')) AS wh
          FROM base, UNNEST(range(1, len(toks) - {n} + 2)) AS u(i)
          WHERE len(toks) >= {n}
        ),
        hits AS (
          SELECT {id_col}, count(*) AS n_contaminated
          FROM wins WHERE wh IN (SELECT wh FROM evwins)
          GROUP BY {id_col}
        )
        SELECT b.{id_col},
               CAST(greatest(len(b.toks) - {n} + 1, 0) AS BIGINT) AS n_windows,
               CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
               coalesce(h.n_contaminated, 0) > 0 AS contaminated
        FROM base b LEFT JOIN hits h USING ({id_col})
    """
