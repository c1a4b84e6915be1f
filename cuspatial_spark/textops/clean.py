"""C4-style page cleaning + PII scrubbing — pure-codegen text gates.

The line/page heuristics follow the public C4 recipe (Raffel et al.
2020, "Exploring the Limits of Transfer Learning", Appendix C): keep
lines that end in terminal punctuation and carry at least five words,
drop lines mentioning javascript, and drop whole pages that contain
"lorem ipsum" or a curly brace or fewer than three sentences.  PII
scrubbing redacts emails / IPv4s / phone numbers the way RefinedWeb /
Dolma-style pipelines do before training.

Everything here is a chain of Spark built-ins (split / filter /
array_join / regexp_replace) — zero Python stages, zero shuffles; the
whole gate fuses into the scan projection, so at 100 TB it is a
map-only pass whose cost is linear in corpus bytes.  Every regex is
written in the Java-regex / RE2 common subset so a DuckDB oracle can
replay the identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common subset — no lookarounds, no backrefs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b([0-9]{1,3}\.)(([0-9]{1,3})\.){2}[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9() .-]{6,}[0-9]"

TERMINAL_RE = '[.!?"]$'


def _word_count(line: Column) -> Column:
    """Words in a single-space-normalized line: spaces + 1 (0 for
    empty).  Kept to space arithmetic (not regex split) so the oracle
    side is a trivially identical expression."""
    t = F.trim(line)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
    result: str = "c4_text",
) -> DataFrame:
    """C4 line + page filters as one fused projection.

    Adds ``result`` (the line-filtered text), ``c4_n_lines_kept``,
    and ``c4_page_keep`` (False when the RAW page contains "lorem
    ipsum" / "{" or the kept lines carry fewer than ``min_sentences``
    terminal punctuation marks).  Rows are NOT dropped — gate with
    ``.where("c4_page_keep")`` so the signal stays inspectable."""
    raw = F.col(text_col)
    lines = F.split(raw, "\n")
    kept = F.filter(
        lines,
        lambda l: (_word_count(l) >= F.lit(int(min_words)))
        & F.trim(l).rlike(TERMINAL_RE)
        & ~F.lower(l).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sentences = F.length(F.regexp_replace(clean, "[^.!?]", ""))
    page_keep = (
        ~F.lower(raw).contains("lorem ipsum")
        & ~raw.contains("{")
        & (n_sentences >= F.lit(int(min_sentences)))
    )
    return (
        docs.withColumn(result, clean)
        .withColumn("c4_n_lines_kept", F.size(kept).cast("long"))
        .withColumn("c4_page_keep", page_keep)
    )


def pii_scrub(
    docs: DataFrame,
    text_col: str = "text",
    result: str = "scrubbed",
    count: bool = True,
) -> DataFrame:
    """Redact emails -> <EMAIL>, IPv4s -> <IP>, phone numbers ->
    <PHONE> (applied in that order: email local parts may contain
    digits a later phone pass must not see).  With ``count``, emits
    ``n_emails`` / ``n_ips`` / ``n_phones`` redaction counts from the
    pre-redaction text — the audit trail a compliance pass needs."""
    t = F.col(text_col)
    out = docs
    if count:
        out = (
            out.withColumn(
                "n_emails",
                F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).cast("long"),
            )
            .withColumn(
                "n_ips",
                F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0))).cast("long"),
            )
        )
    scrub = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    scrub = F.regexp_replace(scrub, IPV4_RE, "<IP>")
    if count:
        out = out.withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(scrub, F.lit(PHONE_RE), F.lit(0))).cast(
                "long"
            ),
        )
    scrub = F.regexp_replace(scrub, PHONE_RE, "<PHONE>")
    return out.withColumn(result, scrub)


def synth_messy_pages(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    result: str = "page",
) -> DataFrame:
    """Deterministic messy multi-line pages from the clean synthetic
    corpus — the fixture side of the clean_text oracle (mirrors
    synth_images / synth_audio): page g is built from closed-form
    pieces a SQL oracle replays verbatim.

    line 1: first 40 chars of text + '.'           (kept by C4)
    line 2: next 30 chars, no terminal punct       (dropped)
    line 3 (g%3==0):  email sentence               (kept; redacted)
    line 4 (g%4==0):  IPv4 sentence                (kept; redacted)
    line 5 (g%5==0):  javascript notice            (dropped)
    line 6 (g%6==0):  phone sentence               (kept; redacted)
    line 7 (g%7==0):  'var x = {'                  (page dropped: brace)
    line 8 (g%11==0): 'lorem ipsum dolor sit amet.' (page dropped)
    plus two more kept sentences so clean pages pass min_sentences."""
    g = F.col(id_col).cast("long")
    t = F.col(text_col)
    nl = F.lit("\n")

    def opt(cond: Column, piece: Column) -> Column:
        return F.when(cond, F.concat(nl, piece)).otherwise(F.lit(""))

    page = F.concat(
        F.concat(F.substring(t, 1, 40), F.lit(".")),
        F.concat(nl, F.substring(t, 41, 30)),
        opt(g % 3 == 0, F.concat(F.lit("Contact me at user"), g.cast("string"), F.lit("@example.com for more details today."))),
        opt(g % 4 == 0, F.concat(F.lit("Served from host "), (g % 256).cast("string"), F.lit(".0.113.7 in the test lab rack."))),
        opt(g % 5 == 0, F.lit("please enable javascript to view this page properly.")),
        opt(g % 6 == 0, F.concat(F.lit("You can call +1 (555) 867-"), F.lpad((g % 10000).cast("string"), 4, "0"), F.lit(" right now please."))),
        opt(g % 7 == 0, F.lit("var x = {")),
        opt(g % 11 == 0, F.lit("lorem ipsum dolor sit amet.")),
        F.concat(nl, F.substring(t, 71, 35), F.lit("!")),
        F.concat(nl, F.substring(t, 106, 35), F.lit("?")),
    )
    return docs.withColumn(result, page)


def synth_messy_pages_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB CTE body replaying synth_messy_pages verbatim."""
    return f"""
      SELECT {id_col},
             substr({text_col}, 1, 40) || '.'
             || chr(10) || substr({text_col}, 41, 30)
             || CASE WHEN {id_col} % 3 = 0 THEN chr(10) || 'Contact me at user' || {id_col} || '@example.com for more details today.' ELSE '' END
             || CASE WHEN {id_col} % 4 = 0 THEN chr(10) || 'Served from host ' || ({id_col} % 256) || '.0.113.7 in the test lab rack.' ELSE '' END
             || CASE WHEN {id_col} % 5 = 0 THEN chr(10) || 'please enable javascript to view this page properly.' ELSE '' END
             || CASE WHEN {id_col} % 6 = 0 THEN chr(10) || 'You can call +1 (555) 867-' || lpad(CAST({id_col} % 10000 AS VARCHAR), 4, '0') || ' right now please.' ELSE '' END
             || CASE WHEN {id_col} % 7 = 0 THEN chr(10) || 'var x = {{' ELSE '' END
             || CASE WHEN {id_col} % 11 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
             || chr(10) || substr({text_col}, 71, 35) || '!'
             || chr(10) || substr({text_col}, 106, 35) || '?'
             AS page
      FROM {table}
    """


def clean_text_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> str:
    """Full DuckDB oracle for the clean_text driver query: replays
    synth_messy_pages, the C4 line/page filters, and the PII scrub
    chain with the IDENTICAL regexes and application order."""
    wc = (
        "CASE WHEN length(trim(l)) = 0 THEN 0 "
        "ELSE length(trim(l)) - length(replace(trim(l), ' ', '')) + 1 END"
    )
    email, ipv4, phone = EMAIL_RE, IPV4_RE, PHONE_RE
    return (
        "WITH pages AS (" + synth_messy_pages_sql(table, id_col, text_col) + "),\n"
        "c4 AS (\n"
        "  SELECT " + id_col + ", page,\n"
        "         list_filter(string_split(page, chr(10)),\n"
        "           l -> " + wc + " >= " + str(min_words) + "\n"
        "                AND regexp_matches(trim(l), '[.!?\"]$')\n"
        "                AND NOT contains(lower(l), 'javascript')) AS kept\n"
        "  FROM pages\n"
        "),\n"
        "joined AS (\n"
        "  SELECT " + id_col + ", page,\n"
        "         array_to_string(kept, chr(10)) AS c4_text,\n"
        "         CAST(len(kept) AS BIGINT) AS c4_n_lines_kept\n"
        "  FROM c4\n"
        "),\n"
        "scrub AS (\n"
        "  SELECT " + id_col + ", c4_n_lines_kept,\n"
        "         NOT contains(lower(page), 'lorem ipsum')\n"
        "           AND NOT contains(page, '{')\n"
        "           AND length(regexp_replace(c4_text, '[^.!?]', '', 'g')) >= "
        + str(min_sentences) + " AS c4_page_keep,\n"
        "         CAST(len(regexp_extract_all(c4_text, '" + email + "')) AS BIGINT) AS n_emails,\n"
        "         CAST(len(regexp_extract_all(c4_text, '" + ipv4 + "')) AS BIGINT) AS n_ips,\n"
        "         regexp_replace(regexp_replace(c4_text, '" + email + "', '<EMAIL>', 'g'),\n"
        "                        '" + ipv4 + "', '<IP>', 'g') AS after_ip\n"
        "  FROM joined\n"
        ")\n"
        "SELECT " + id_col + ", c4_n_lines_kept, c4_page_keep, n_emails, n_ips,\n"
        "       CAST(len(regexp_extract_all(after_ip, '" + phone + "')) AS BIGINT) AS n_phones,\n"
        "       regexp_replace(after_ip, '" + phone + "', '<PHONE>', 'g') AS clean_text\n"
        "FROM scrub"
    )
