"""Gopher-style repetition quality signals (Rae et al. 2021, §A1.1):
pretraining corpora gate out documents dominated by repeated lines
and n-grams.  All signals here are pure Spark built-ins evaluated
row-locally — zero shuffles, one pass over the corpus at any scale
(the per-row lambdas are O(L log L) in the row's own line/word count,
never in corpus size).

Deviation from the paper, documented: the n-gram signals are
frequency-weighted (share of n-gram OCCURRENCES) rather than
character-weighted — identical gating behavior on the pathological
inputs these rules exist for, but exactly replayable in portable SQL
(the driver oracle recomputes every signal relationally in DuckDB).

Signals added by ``repetition_signals``:

- ``dup_line_frac``      — duplicated lines / lines
- ``dup_line_char_frac`` — chars in lines whose value occurs >= 2x
                           / chars across all lines
- ``top_bigram_frac``    — occurrences of the most frequent word
                           bigram / total bigrams (ties: the
                           lexicographically smallest bigram)
- ``dup_bigram_frac``    — occurrences of bigrams seen >= 2x / total
                           bigrams

Empty inputs define every fraction as 0.0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))


def _run_stats(sorted_arr: Column) -> Column:
    """Max run length over a SORTED string array, plus the number of
    elements belonging to runs of length >= 2 — one aggregate pass:
    state (prev, run, best, dup)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc, x):
        same = acc["prev"].isNotNull() & (acc["prev"] == x)
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        # when a run reaches 2 it retroactively contributes both
        # elements; each further element adds one
        dup = acc["dup"] + F.when(run == 2, F.lit(2)).otherwise(
            F.when(run > 2, F.lit(1)).otherwise(F.lit(0))
        ).cast("long")
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            dup.alias("dup"),
        )

    return F.aggregate(sorted_arr, zero, step)


def repetition_signals(
    docs: DataFrame, text_col: str = "text", prefix: str = ""
) -> DataFrame:
    """Adds the four repetition fractions (see module doc).  Pure
    codegen: array ops + one aggregate lambda per signal family."""
    t = F.coalesce(F.col(text_col), F.lit(""))

    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    line_stats = _run_stats(F.array_sort(lines))
    total_line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    # chars in duplicated lines: O(L^2) membership check avoided by
    # sorting (line, len) pairs? lines can collide only on equal
    # values, so: sum of length over lines whose value repeats ==
    # aggregate over sorted lines tracking runs with char weights.
    dup_chars = F.aggregate(
        F.array_sort(lines),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("chars"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(
                acc["prev"].isNotNull() & (acc["prev"] == x), acc["run"] + 1
            ).otherwise(F.lit(1)).cast("long").alias("run"),
            (
                acc["chars"]
                + F.when(
                    acc["prev"].isNotNull() & (acc["prev"] == x),
                    F.when(acc["run"] == 1, F.length(x) * 2).otherwise(
                        F.length(x)
                    ),
                ).otherwise(F.lit(0))
            ).cast("long").alias("chars"),
        ),
        lambda acc: acc["chars"],
    )

    words = F.split(F.trim(t), " +")
    bigrams = F.transform(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda w, i: F.concat(w, F.lit(" "), F.element_at(words, i + F.lit(2))),
    )
    n_bigrams = F.size(bigrams)
    bg_stats = _run_stats(F.array_sort(bigrams))

    p = prefix
    return (
        docs.withColumn(
            f"{p}dup_line_frac", _frac(n_lines - n_distinct, n_lines)
        )
        .withColumn(
            f"{p}dup_line_char_frac", _frac(dup_chars, total_line_chars)
        )
        .withColumn(f"{p}top_bigram_frac", _frac(bg_stats["best"], n_bigrams))
        .withColumn(f"{p}dup_bigram_frac", _frac(bg_stats["dup"], n_bigrams))
    )


def repetition_oracle_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """The identical four signals recomputed relationally in DuckDB —
    unnest lines/bigrams, window counts, re-aggregate.  Ties and
    empty-input conventions match repetition_signals exactly."""
    return f"""
        WITH base AS (
          SELECT {id_col}, coalesce(text, '') AS t FROM {table}
        ),
        lines AS (
          SELECT {id_col}, l, length(l) AS nch,
                 count(*) OVER (PARTITION BY {id_col}, l) AS c
          FROM base, UNNEST(string_split(t, chr(10))) AS u(l)
        ),
        line_agg AS (
          SELECT {id_col},
                 count(*) AS n_lines,
                 count(DISTINCT l) AS n_distinct,
                 sum(nch) AS total_chars,
                 sum(CASE WHEN c >= 2 THEN nch ELSE 0 END) AS dup_chars
          FROM lines GROUP BY {id_col}
        ),
        words AS (
          SELECT {id_col}, string_split_regex(trim(t), ' +') AS wl FROM base
        ),
        bigrams AS (
          SELECT {id_col}, wl[u.i] || ' ' || wl[u.i + 1] AS bg
          FROM words, UNNEST(range(1, len(wl))) AS u(i)
        ),
        bg_counts AS (
          SELECT {id_col}, bg, count(*) AS c
          FROM bigrams GROUP BY {id_col}, bg
        ),
        bg_agg AS (
          SELECT {id_col},
                 sum(c) AS n_bigrams,
                 max(c) AS top_c,
                 sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_c
          FROM bg_counts GROUP BY {id_col}
        )
        SELECT b.{id_col},
               CASE WHEN la.n_lines > 0
                    THEN CAST(la.n_lines - la.n_distinct AS DOUBLE) / la.n_lines
                    ELSE 0.0 END AS dup_line_frac,
               CASE WHEN la.total_chars > 0
                    THEN CAST(la.dup_chars AS DOUBLE) / la.total_chars
                    ELSE 0.0 END AS dup_line_char_frac,
               CASE WHEN coalesce(ba.n_bigrams, 0) > 0
                    THEN CAST(ba.top_c AS DOUBLE) / ba.n_bigrams
                    ELSE 0.0 END AS top_bigram_frac,
               CASE WHEN coalesce(ba.n_bigrams, 0) > 0
                    THEN CAST(ba.dup_c AS DOUBLE) / ba.n_bigrams
                    ELSE 0.0 END AS dup_bigram_frac
        FROM base b
        LEFT JOIN line_agg la USING ({id_col})
        LEFT JOIN bg_agg ba USING ({id_col})
    """
