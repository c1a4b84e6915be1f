"""End-to-end pretraining-corpus preparation pipeline.

Composes the LLM-data operators into the standard gate sequence a
100-TB crawl run needs, with the shuffle budget explicit:

1. **Signals** — language ID, quality score, repetition fractions,
   BPE token count: ALL pure-codegen projections that fuse into the
   scan (zero shuffles — one pass, whole-stage codegen).
2. **Gates** — plain Catalyst filters over the signals (pushed into
   the same stage).
3. **Exact dedup** — earliest doc per md5(text): ONE hash shuffle.
4. **Near dedup** (optional) — LSH canonical pairs mark non-canonical
   docs for removal: band explode + bucket window (one shuffle) and a
   left-anti join back on id.

Total: one pass + 1 shuffle (exact only) or ~3 shuffles (with LSH) —
no stage touches the corpus twice, nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .analysis import language_id, quality_score
from .bpe import DEFAULT_MERGES, bpe_tokenize
from .repetition import repetition_signals


def corpus_signals(
    docs: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """All quality/repetition/language/token signals as ONE fused
    projection (zero shuffles)."""
    out = language_id(docs, text_col)
    out = quality_score(out, text_col)
    out = repetition_signals(out, text_col)
    out = bpe_tokenize(out, merges or DEFAULT_MERGES, text_col)
    return out


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    allowed_langs: tuple[str, ...] | None = None,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    min_tokens: int = 8,
    near_dedup: bool = False,
    lsh_kwargs: dict | None = None,
    c4: bool = False,
    pii: bool = False,
) -> DataFrame:
    """Gate + dedup a raw document table into a training corpus.

    Returns the surviving rows with every signal column attached
    (lang_pred, quality, dup_line_frac, dup_line_char_frac,
    top_bigram_frac, dup_bigram_frac, bpe_n_tokens).  With ``c4``,
    the C4 line/page filters run FIRST (pages failing the page gate
    drop; surviving pages are line-cleaned in place) and with ``pii``
    the final text is PII-redacted (clean.py) — both stay inside the
    same fused scan projection, so the shuffle budget in the module
    doc is unchanged.  See module doc for the shuffle budget."""
    if c4:
        from .clean import c4_clean

        docs = (
            c4_clean(docs, text_col=text_col)
            .where(F.col("c4_page_keep"))
            .drop(text_col, "c4_page_keep")
            .withColumnRenamed("c4_text", text_col)
        )
    sig = corpus_signals(docs, text_col)
    if pii:
        from .clean import pii_scrub

        sig = pii_scrub(sig, text_col=text_col, result="clean_text")
    gated = sig.where(
        (F.col("quality") >= F.lit(float(min_quality)))
        & (F.col("dup_line_frac") <= F.lit(float(max_dup_line_frac)))
        & (F.col("top_bigram_frac") <= F.lit(float(max_top_bigram_frac)))
        & (F.col("bpe_n_tokens") >= F.lit(int(min_tokens)))
    )
    if allowed_langs is not None:
        gated = gated.where(F.col("lang_pred").isin(list(allowed_langs)))

    # exact dedup: earliest id per content hash — one shuffle
    w = Window.partitionBy(F.md5(F.col(text_col).cast("binary"))).orderBy(
        F.col(id_col)
    )
    deduped = (
        gated.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    if near_dedup:
        from .dedup import lsh_candidate_pairs

        pairs = lsh_candidate_pairs(
            deduped.select(id_col, text_col),
            id_col=id_col,
            text_col=text_col,
            mode="canonical",
            **(lsh_kwargs or {}),
        )
        # id_b is every non-canonical bucket member: drop it.  The
        # canonical (min id) survivor of each near-dup cluster stays.
        deduped = deduped.join(
            pairs.select(F.col("id_b").alias(id_col)).distinct(),
            on=id_col,
            how="left_anti",
        )
    return deduped


def prepare_training_data(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    decontam_n: int = 13,
    shuffle_seed: int | None = None,
    **corpus_kwargs,
) -> DataFrame:
    """The full gate sequence from raw crawl table to packed training
    rows: signals + quality gates + dedup (:func:`prepare_corpus`),
    benchmark decontamination against ``eval_docs`` (13-gram overlap
    by default — the GPT-3/Gopher setting; decontam.py), then
    GPT-style concat-and-chunk sequence assignment (packing.py) over
    the surviving docs' BPE token counts.

    Returns the surviving docs with every signal column plus
    ``start_token`` / ``seq_first`` / ``seq_last`` / ``n_seqs``.
    Shuffle budget on top of :func:`prepare_corpus`: one broadcast
    semi-join (decontam — zero shuffles of the corpus side) + the
    packing range shuffle.  Feed the result to
    :func:`write_training_shards` to materialize.
    """
    from .decontam import decontaminate
    from .packing import pack_sequences

    corpus = prepare_corpus(docs, id_col=id_col, text_col=text_col, **corpus_kwargs)
    if eval_docs is not None:
        flags = decontaminate(
            corpus.select(id_col, text_col),
            eval_docs,
            n=decontam_n,
            id_col=id_col,
            text_col=text_col,
        )
        corpus = corpus.join(
            flags.where(~F.col("contaminated")).select(id_col),
            on=id_col,
            how="left_semi",
        )
    packed = pack_sequences(
        corpus.select(id_col, "bpe_n_tokens"),
        seq_len=seq_len,
        weight_col="bpe_n_tokens",
        id_col=id_col,
        shuffle_seed=shuffle_seed,
    ).drop("bpe_n_tokens")
    return corpus.join(packed, on=id_col)


def write_training_shards(
    packed: DataFrame,
    path: str,
    seq_len: int = 2048,
    tokens_per_shard: int = 512 * 1024 * 1024,
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> None:
    """Materialize packed training rows as size-bounded, deterministic
    shards: shard k holds the docs whose first token falls in
    ``[k * tokens_per_shard, (k+1) * tokens_per_shard)``, stored as
    one Hive partition directory (``shard=k``) with rows in id order.

    A trainer streams shard directories independently; because shard
    boundaries are pure arithmetic on ``start_token``, the layout is a
    deterministic function of the corpus — re-running the job bit-
    reproduces it.  Cost: ONE range shuffle on (shard, id); every
    output file covers a contiguous token range, so file sizes are
    bounded by ``tokens_per_shard`` regardless of doc-length skew.
    """
    seqs_per_shard = max(tokens_per_shard // seq_len, 1)
    out = packed.withColumn(
        "shard",
        F.floor(F.col("seq_first") / F.lit(seqs_per_shard)).cast("long"),
    )
    (
        out.repartitionByRange("shard", id_col)
        .sortWithinPartitions("shard", id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
