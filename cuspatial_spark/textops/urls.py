"""URL canonicalization + URL-keyed dedup — webtext pipeline ops.

A Common-Crawl-style corpus keys everything on `url` (the north-rule
input shape: url, warc_ts, html, text, lang), and raw crawl URLs are
noisy: mixed-case schemes/hosts, default ports, `www.` prefixes,
tracking parameters, fragments, trailing slashes.  Canonicalization
is the first dedup stage — it collapses the crawl-noise variants of
one resource BEFORE any content hashing, at scan speed.

Spark-first: the whole transform is a chain of built-in string /
regexp / higher-order-array expressions (whole-stage codegen, zero
shuffles, no Python).  The rules implemented (deliberately simple,
deterministic, and SQL-replayable for the driver oracle):

- scheme and host lowercase; `www.` prefix dropped;
- default ports stripped (`:80` for http, `:443` for https);
- fragment dropped;
- tracking query params removed (`utm_*`, `fbclid`, `gclid`),
  remaining params kept IN ORDER (reordering would conflate
  semantically different URLs on servers that care);
- empty query dropped; trailing slash removed from non-root paths;
  empty path becomes `/`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[^=]*|fbclid|gclid)(=.*)?$"


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of ``url`` as a Catalyst expression chain."""
    u = F.regexp_replace(url, r"#.*$", "")  # drop fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).otherwise(hostport)
    host = F.regexp_replace(host, r"^(www\.)+", "")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING),
    )
    newq = F.array_join(params, "&")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(path != "/", F.regexp_replace(path, r"/$", "")).otherwise(path)
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(newq != "", F.concat(F.lit("?"), newq)).otherwise(F.lit("")),
    )
    # schemeless input has no well-defined host split — pass it
    # through untouched rather than emit garbage; this also makes the
    # transform idempotent (canonical output always has a scheme)
    return F.when(scheme == "", url).otherwise(canonical)


def canonical_url(
    df: DataFrame, url_col: str = "url", out: str = "canonical_url"
) -> DataFrame:
    """Append the canonical URL column (pure codegen, zero shuffles)."""
    return df.withColumn(out, canonical_url_expr(F.col(url_col)))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    order_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL — the crawl's first dedup stage.

    Keeper = the row with the minimum ``order_col`` (e.g. warc_ts:
    earliest capture wins; defaults to the url string itself for
    determinism).  One hash shuffle on the canonical key — the same
    scale shape as textops.dedup.exact_dedup."""
    from pyspark.sql import Window

    keyed = canonical_url(df, url_col)
    order = F.col(order_col) if order_col else F.col(url_col)
    w = Window.partitionBy("canonical_url").orderBy(order)
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def host_expr(url: Column) -> Column:
    """Host of a canonical URL (``scheme://host...``) — codegen
    regexp; empty string for schemeless passthrough rows."""
    return F.regexp_extract(url, r"^[a-z0-9+.-]+://([^/?]*)", 1)


def host_stats(
    df: DataFrame, url_col: str = "canonical_url"
) -> DataFrame:
    """Per-host crawl aggregates over a canonicalized URL column:
    ``(host, host_rows, host_urls)`` — total captures and distinct
    resources.  ``host_rows / host_urls`` is the host's recrawl
    factor; ``host_rows`` alone is the domain-share signal quality
    pipelines cap on (no single host should dominate a corpus).

    One partial-aggregated hash shuffle on host; the distinct count
    is exact (two-phase, per-host).  Host keys are Zipf-skewed on a
    real crawl — the aggregate handles that (partial combine folds
    each mapper's popular hosts first), but consumers joining the
    result back should let AQE/broadcast pick the strategy, which
    `with_host_signals` does by default."""
    keyed = df.withColumn("host", host_expr(F.col(url_col)))
    return keyed.groupBy("host").agg(
        F.count(F.lit(1)).alias("host_rows"),
        F.countDistinct(url_col).alias("host_urls"),
    )


def with_host_signals(
    df: DataFrame, url_col: str = "canonical_url"
) -> DataFrame:
    """Attach each row's host-level aggregates as columns
    (host, host_rows, host_urls) — the domain-balance features a
    sampling/filter stage reads.  Two scans of ``df`` (one for the
    stats aggregate, one for the join); the stats side shrinks to
    one row per host, so at 100 TB the join is hosts-vs-corpus and
    AQE turns it into a broadcast for any realistic host count."""
    keyed = df.withColumn("host", host_expr(F.col(url_col)))
    return keyed.join(host_stats(df, url_col), "host")


def host_sample(
    df: DataFrame,
    cap: int,
    url_col: str = "canonical_url",
    order_col: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per host — the domain-balance cap a
    corpus applies so no site dominates training data.  Keepers are
    the ``cap`` smallest rows by ``order_col`` (defaults to the URL
    string), so the result is deterministic.

    Skew is the whole problem here: host keys on a real crawl are
    Zipf-distributed, and a naive window over ``host`` lands a hot
    host's every row on one reduce task.  This runs TWO phases, the
    same shape as the trajectory prefix-sum: phase 1 windows over
    (host, salt) — salt = a hash of the order key mod ``n_salts`` —
    which splits a hot host across ``n_salts`` tasks and keeps only
    ``cap`` rows per salt; phase 2 windows over host on the
    <= cap * n_salts survivors.  The global top-``cap`` by order is
    always contained in the union of per-salt top-``cap``s, so the
    result is identical to the one-phase window while the second
    shuffle moves O(hosts * cap * n_salts) rows, not the corpus."""
    from pyspark.sql import Window

    keyed = df.withColumn("host", host_expr(F.col(url_col)))
    order = F.col(order_col) if order_col else F.col(url_col)
    salt = F.pmod(F.xxhash64(order.cast("string")), F.lit(n_salts))
    w1 = Window.partitionBy("host", salt).orderBy(order)
    pruned = (
        keyed.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= cap)
        .drop("__r1")
    )
    w2 = Window.partitionBy("host").orderBy(order)
    return (
        pruned.withColumn("host_rank", F.row_number().over(w2))
        .where(F.col("host_rank") <= cap)
    )
