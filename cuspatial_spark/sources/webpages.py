"""Synthetic Common-Crawl-style web-pages source.

Input shape per BASELINE.json input_hint:
  (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Generated fully distributed (spark.range -> column expressions, no
driver-side data), deterministic in the id — so the same table is
reproducible at any parallelism, which is what makes the byte-identity
("identity extractor") invariant testable: text must survive every
pipeline stage byte-for-byte per url.

``geotag_points`` derives the lon/lat geotag from the url hash —
uniform over the AOI — with pure-JVM arithmetic (portable to any SQL
engine for oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "pt"]


def synth_webpages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic n-row web-pages table."""
    df = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    i = F.col("id")
    text = F.concat(
        F.lit("token"), (i * 7919 % 104729).cast("string"),
        F.lit(" page body "), F.md5(i.cast("string").cast("binary")),
        F.lit(" tail "), (i % 997).cast("string"),
    )
    lang = F.element_at(
        F.array(*[F.lit(la) for la in LANGS]), (i % len(LANGS) + 1).cast("int")
    )
    return df.select(
        F.concat(F.lit("https://site-"), (i % 1000).cast("string"),
                 F.lit(".example/page/"), i.cast("string")).alias("url"),
        (F.lit(1735689600) + i).cast("timestamp").alias("warc_ts"),  # 2025-01-01 + i sec
        F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")).cast("binary").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def geotag_points(
    pages: DataFrame,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    url_col: str = "url",
) -> DataFrame:
    """Adds (x, y) geotag columns derived from two independent md5
    slices of the url, uniform over the AOI.  Pure JVM expressions;
    conv(hex, 16, 10) on 12 hex chars stays well inside bigint."""
    h1 = F.conv(F.substring(F.md5(F.col(url_col).cast("binary")), 1, 12), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5(F.col(url_col).cast("binary")), 13, 12), 16, 10).cast("bigint")
    span = float(2 ** 48)
    x = F.lit(float(x_min)) + (h1 / F.lit(span)) * F.lit(float(x_max - x_min))
    y = F.lit(float(y_min)) + (h2 / F.lit(span)) * F.lit(float(y_max - y_min))
    return pages.withColumn("x", x).withColumn("y", y)
