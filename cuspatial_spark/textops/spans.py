"""Duplicated n-gram span detection — the windowed form of
exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better": any n-token span that
appears more than once in the corpus marks its documents for span
removal).

Distributed shape (the suffix-array of the paper does not distribute;
the fixed-window form does, and is what production pipelines run):

1. Per row, hash every n-token window — a row-local ``transform``
   over the token array (zero shuffles, fuses into the scan).
2. Explode to (doc, window_idx, hash); a count window over the hash
   partition marks hashes occurring >= 2 times ANYWHERE in the corpus
   — shuffle #1, keyed on a 64-bit xxhash (uniform, skew-free).
3. Regroup flagged windows per doc — shuffle #2 — and merge
   consecutive window indices into maximal spans with one array
   aggregate (gaps-and-islands, row-local).

Two hash shuffles total, both on uniform keys; nothing is ever
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _window_hashes(text_col: str, n: int):
    """Array of 64-bit hashes of each n-token window (whitespace
    tokens); empty array when the row has fewer than n tokens.

    Each token is xxhash64-ed ONCE, then window keys are an
    xxhash64 fold of the n token hashes (two-long hash per step,
    order-sensitive, pure codegen long arithmetic) — no per-window
    string slice/concat (profiled: the string churn saturated memory
    bandwidth and capped 2→8-core scaling of the decontam/span jobs).
    Dup-window COUNTS
    are what the operators emit, and counts depend only on
    hash-equality classes — identical windows always collide, distinct
    windows collide with probability ~2^-64 — so the md5-based
    relational oracles stay valid; expected spurious collisions are
    ~m^2/2^65 (under 30 across a 10^12-window corpus — measure-zero
    for span removal / contamination flagging)."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " +")
    th = F.transform(toks, lambda t: F.xxhash64(t))

    # r6 (guide §4.1): the window key is ONE multi-argument xxhash64
    # over the n token hashes (order-sensitive streaming — each field
    # seeds the next — so shifted token boundaries never collide),
    # replacing a per-window slice + 8-step xxhash64 fold.  The token
    # hash array is bound through a single-element transform lambda so
    # interpreted higher-order evaluation computes it ONCE per row —
    # referenced inline it would be re-evaluated per window, turning
    # the row cost quadratic in token count.  Hash VALUES change but
    # equality classes (all any consumer reads) are preserved.
    def _windows(a):
        n_win = F.size(a) - F.lit(n - 1)
        return F.when(
            n_win > 0,
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda i: F.xxhash64(
                    *[F.element_at(a, i + F.lit(j)) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    return F.element_at(F.transform(F.array(th), _windows), 1)


def duplicated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span stats: ``n_windows`` (token count
    - n + 1, floored at 0), ``n_dup_windows`` (windows whose n-token
    content appears >= 2 times corpus-wide, self-repeats included),
    and ``n_spans`` (maximal runs of consecutive duplicated windows —
    the spans the Lee et al. procedure would cut).  Every input doc
    appears in the output (zeros when clean)."""
    exploded = docs.select(
        id_col, F.posexplode(_window_hashes(text_col, n)).alias("widx", "wh")
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("wh"))
    flagged = (
        exploded.withColumn("__c", cnt)
        .where(F.col("__c") >= 2)
        .select(id_col, "widx")
    )
    # gaps-and-islands over the sorted flagged indices, row-local
    idxs = F.array_sort(F.collect_list("widx"))
    breaks = F.aggregate(
        idxs,
        F.struct(
            F.lit(-2).cast("long").alias("prev"),
            F.lit(0).cast("long").alias("spans"),
        ),
        lambda acc, i: F.struct(
            i.cast("long").alias("prev"),
            (
                acc["spans"]
                + F.when(i.cast("long") == acc["prev"] + 1, F.lit(0)).otherwise(
                    F.lit(1)
                )
            ).alias("spans"),
        ),
        lambda acc: acc["spans"],
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_windows"), breaks.alias("n_spans")
    )
    # totals re-reads the scan but does NOT re-hash: n_windows is plain
    # arithmetic on the token count (the hash transform would otherwise
    # be computed twice — once per join branch)
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " +")
    totals = docs.select(
        id_col,
        F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
        .cast("long")
        .alias("n_windows"),
    )
    return (
        totals.join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias(
                "n_dup_windows"
            ),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
        # tokens covered by >= 1 duplicated window — what span REMOVAL
        # cuts.  Closed form over the island stats: each island of k
        # consecutive windows covers k + n - 1 tokens, so the total is
        # n_dup_windows + n_spans * (n - 1).  Pure arithmetic, no
        # extra pass.
        .withColumn(
            "n_dup_tokens",
            (F.col("n_dup_windows") + F.col("n_spans") * F.lit(n - 1)).cast(
                "long"
            ),
        )
    )


def duplicated_ngram_oracle_sql(
    n: int = 8, table: str = "documents", id_col: str = "doc_id"
) -> str:
    """The identical computation relationally in DuckDB."""
    return f"""
        WITH base AS (
          SELECT {id_col},
                 string_split_regex(trim(coalesce(text, '')), ' +') AS toks
          FROM {table}
        ),
        wins AS (
          SELECT {id_col}, u.i AS widx,
                 md5(array_to_string(toks[u.i : u.i + {n} - 1], ' ')) AS wh
          FROM base, UNNEST(range(1, len(toks) - {n} + 2)) AS u(i)
          WHERE len(toks) >= {n}
        ),
        flagged AS (
          SELECT {id_col}, widx,
                 count(*) OVER (PARTITION BY wh) AS c
          FROM wins
        ),
        runs AS (
          SELECT {id_col}, widx,
                 widx - row_number() OVER (
                   PARTITION BY {id_col} ORDER BY widx
                 ) AS grp
          FROM flagged WHERE c >= 2
        ),
        per_doc AS (
          SELECT {id_col},
                 count(*) AS n_dup_windows,
                 count(DISTINCT grp) AS n_spans
          FROM runs GROUP BY {id_col}
        )
        SELECT b.{id_col},
               CAST(greatest(len(b.toks) - {n} + 1, 0) AS BIGINT) AS n_windows,
               CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
               CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(coalesce(p.n_dup_windows, 0)
                    + coalesce(p.n_spans, 0) * {n - 1} AS BIGINT) AS n_dup_tokens
        FROM base b LEFT JOIN per_doc p USING ({id_col})
    """


def remove_duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    result: str = "clean_text",
) -> DataFrame:
    """Cut every token covered by a corpus-duplicated n-token window —
    the removal step of Lee et al. 2022 exact-substring dedup (fixed-
    window form).  Returns the input rows plus ``result`` (the cleaned
    text, single-space joined) and ``n_tokens_removed``.

    Scale shape: the same two uniform-hash shuffles as
    :func:`duplicated_ngram_spans` to find each doc's duplicated
    window starts, one ``id_col`` join back onto the corpus, then the
    cut is row-local: flagged starts are merged into maximal islands
    (one fold) and each token position is probed against the island
    list — O(tokens x islands) per row, and islands is the doc's span
    count (a fully-duplicated doc is ONE island), never the window
    count.
    """
    exploded = docs.select(
        id_col, F.posexplode(_window_hashes(text_col, n)).alias("widx", "wh")
    )
    cnt = F.count(F.lit(1)).over(Window.partitionBy("wh"))
    flags = (
        exploded.withColumn("__c", cnt)
        .where(F.col("__c") >= 2)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("widx")).alias("__flags"))
    )
    empty_islands = F.array().cast("array<struct<a: long, b: long>>")
    islands = F.aggregate(
        F.coalesce(F.col("__flags"), F.array().cast("array<int>")),
        F.struct(
            empty_islands.alias("arr"),
            F.lit(-1).cast("long").alias("cs"),
            F.lit(-9).cast("long").alias("prev"),
        ),
        lambda acc, w: F.struct(
            F.when(w.cast("long") == acc["prev"] + 1, acc["arr"]).otherwise(
                F.when(
                    acc["cs"] >= 0,
                    F.concat(
                        acc["arr"],
                        F.array(
                            F.struct(
                                acc["cs"].alias("a"), acc["prev"].alias("b")
                            )
                        ),
                    ),
                ).otherwise(acc["arr"])
            ).alias("arr"),
            F.when(w.cast("long") == acc["prev"] + 1, acc["cs"])
            .otherwise(w.cast("long"))
            .alias("cs"),
            w.cast("long").alias("prev"),
        ),
        lambda acc: F.when(
            acc["cs"] >= 0,
            F.concat(
                acc["arr"],
                F.array(F.struct(acc["cs"].alias("a"), acc["prev"].alias("b"))),
            ),
        ).otherwise(acc["arr"]),
    )
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), " +")
    kept = F.filter(
        toks,
        lambda t, j: ~F.exists(
            F.col("__isl"),
            lambda s: (j.cast("long") >= s["a"])
            & (j.cast("long") <= s["b"] + F.lit(n - 1)),
        ),
    )
    return (
        docs.join(flags, on=id_col, how="left")
        .withColumn("__isl", islands)
        .withColumn("__kept", kept)
        .withColumn(
            "n_tokens_removed",
            F.when(
                F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) == 0,
                F.lit(0),
            )
            .otherwise(F.size(toks) - F.size("__kept"))
            .cast("long"),
        )
        .withColumn(result, F.array_join("__kept", " "))
        .drop("__flags", "__isl", "__kept")
    )
