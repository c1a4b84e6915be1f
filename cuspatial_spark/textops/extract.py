"""HTML -> text extraction for Common-Crawl-style web pages.

The engine's input table is (url, warc_ts, html:binary, text:string,
lang) — BASELINE.json input_hint — and the per-row invariant is that
the extracted text is **byte-identical per url** to the reference
``text`` column.  ``extract_text`` is that extractor: strip comments,
script/style subtrees, markup tags, then decode the five standard
character entities.  It is a pure Catalyst ``regexp_replace`` chain —
whole-stage codegen, zero shuffles, no Python — so it runs at scan
speed on any corpus size and composes with predicate pushdown on the
surrounding columns.

``wrap_html`` is the inverse used by tests and the driver oracle: it
entity-encodes a text column and embeds it in deterministic,
doc-varying HTML boilerplate (attributes, comments, a <script> and a
<style> subtree whose bodies contain fake tags and entities).  Because
wrap then extract must return the original bytes, the driver oracle
for the ``extract_text`` query is simply ``SELECT doc_id, text`` — a
value-hash match proves byte-identity row-for-row, which is exactly
the north-rule invariant ("byte-identical extracted text per url").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decode order matters: named/numeric entities first, ampersand LAST
# (the encoder applies '&' -> '&amp;' FIRST for the same reason).
_ENTITY_DECODE = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def encode_entities(col: Column) -> Column:
    """HTML-escape a text column (the wrap direction)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    for ent, ch in _ENTITY_DECODE[:-1]:
        out = F.replace(out, F.lit(ch), F.lit(ent))
    return out


def decode_entities(col: Column) -> Column:
    out = col
    for ent, ch in _ENTITY_DECODE:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def extract_text_expr(html: Column) -> Column:
    """The extractor as a single column expression over a string (or
    binary UTF-8) html column."""
    s = html.cast("string")
    # 1. comments (may contain fake tags / entities)
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    # 2. script/style subtrees: their text content is code, not text
    s = F.regexp_replace(s, r"(?si)<script\b[^>]*>.*?</script>", "")
    s = F.regexp_replace(s, r"(?si)<style\b[^>]*>.*?</style>", "")
    # 3. every remaining markup tag
    s = F.regexp_replace(s, r"(?s)<[^>]*>", "")
    # 4. entities back to bytes
    return decode_entities(s)


def extract_text(
    pages: DataFrame, html_col: str = "html", result: str = "extracted_text"
) -> DataFrame:
    """Adds ``result`` = extracted text of ``html_col``.  Pure codegen;
    one scan, zero shuffles at any corpus size."""
    return pages.withColumn(result, extract_text_expr(F.col(html_col)))


def wrap_html(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    result: str = "html",
) -> DataFrame:
    """Deterministically embeds ``text_col`` into adversarial HTML:
    entity-encoded body text, a doc-varying title attribute, an HTML
    comment, and <script>/<style> subtrees containing fake tags and
    entities that a naive tag-stripper would corrupt.  Inverse of
    ``extract_text`` by construction."""
    i = F.col(id_col).cast("string")
    body = encode_entities(F.col(text_col))
    html = F.concat(
        F.lit('<html><head><meta charset="utf-8"/><script type="text/javascript">'),
        F.lit('var t = "<fake>&amp;</fake>"; if (1 < 2) { x('), i, F.lit("); }"),
        F.lit("</script><style>.c{content:'<nope>'}</style></head>"),
        F.lit("<!-- crawl ts "), i, F.lit(' --><body class="doc" data-id="'), i,
        F.lit('"><h1 title="&quot;q&quot;"></h1><p>'),
        body,
        F.lit("</p><br/></body></html>"),
    )
    return docs.withColumn(result, html.cast("binary"))
