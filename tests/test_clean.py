"""C4-style cleaning + PII scrubbing: filter semantics, redaction,
plan shape."""

import pytest
from pyspark.sql import functions as F

from cuspatial_spark.textops.clean import c4_clean, pii_scrub, synth_messy_pages


def _one(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


class TestC4Clean:
    def test_keeps_terminal_punct_five_word_lines(self, spark):
        page = "\n".join([
            "This line has five words.",          # kept
            "Too short.",                          # dropped: < 5 words
            "this line has no terminal punct",     # dropped
            'He said "stop right there now."',     # kept
            "Another good line ends here!",        # kept
            "is this a kept question line?",       # kept
        ])
        r = c4_clean(_one(spark, page)).collect()[0]
        assert r.c4_n_lines_kept == 4
        assert r.c4_page_keep
        assert "Too short." not in r.c4_text

    def test_javascript_lines_dropped(self, spark):
        page = "Please enable JavaScript to see this page.\nA perfectly fine sentence right here."
        r = c4_clean(_one(spark, page)).collect()[0]
        assert r.c4_n_lines_kept == 1
        assert "JavaScript" not in r.c4_text

    def test_brace_page_dropped(self, spark):
        page = "A perfectly fine sentence right here.\nfunction f() { return 1; }"
        r = c4_clean(_one(spark, page)).collect()[0]
        assert not r.c4_page_keep

    def test_lorem_ipsum_page_dropped(self, spark):
        page = "Lorem Ipsum dolor sit amet text.\nA perfectly fine sentence right here."
        assert not c4_clean(_one(spark, page)).collect()[0].c4_page_keep

    def test_min_sentences_page_gate(self, spark):
        page = "Only one good sentence lives here."
        r = c4_clean(_one(spark, page)).collect()[0]
        assert r.c4_n_lines_kept == 1
        assert not r.c4_page_keep  # < 3 sentences
        assert c4_clean(
            _one(spark, page), min_sentences=1
        ).collect()[0].c4_page_keep

    def test_empty_text(self, spark):
        r = c4_clean(_one(spark, "")).collect()[0]
        assert r.c4_n_lines_kept == 0
        assert not r.c4_page_keep
        assert r.c4_text == ""


class TestPiiScrub:
    def test_email_redacted_and_counted(self, spark):
        r = pii_scrub(_one(spark, "mail bob.smith+tag@sub.example.org now")).collect()[0]
        assert r.scrubbed == "mail <EMAIL> now"
        assert r.n_emails == 1 and r.n_ips == 0 and r.n_phones == 0

    def test_ipv4_redacted(self, spark):
        r = pii_scrub(_one(spark, "from 192.168.10.7 today")).collect()[0]
        assert r.scrubbed == "from <IP> today"
        assert r.n_ips == 1

    def test_phone_redacted(self, spark):
        r = pii_scrub(_one(spark, "call +1 (555) 867-5309 now")).collect()[0]
        assert r.scrubbed == "call <PHONE> now"
        assert r.n_phones == 1

    def test_email_digits_not_double_counted_as_phone(self, spark):
        r = pii_scrub(_one(spark, "x 12345678@example.com y")).collect()[0]
        assert r.scrubbed == "x <EMAIL> y"
        assert r.n_emails == 1 and r.n_phones == 0

    def test_plain_text_untouched(self, spark):
        t = "no personal data in this sentence at all"
        r = pii_scrub(_one(spark, t)).collect()[0]
        assert r.scrubbed == t
        assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)


class TestPlanShape:
    def test_zero_shuffles_zero_python(self, spark):
        """The whole synth -> c4 -> pii chain must fuse into the scan:
        no Exchange, no Python stages — the 100-TB invariant."""
        docs = spark.range(0, 100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("word "), F.col("id").cast("string")).alias("text"),
        )
        out = pii_scrub(
            c4_clean(synth_messy_pages(docs), text_col="page"),
            text_col="c4_text",
            result="clean_text",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "MapInPandas" not in plan


class TestPipelineIntegration:
    def test_prepare_corpus_c4_pii_gates(self, spark):
        from cuspatial_spark.textops.pipeline import prepare_corpus

        good = (
            "The quick brown fox jumps over the lazy dog today.\n"
            "A second proper sentence of the page lives here.\n"
            "And a third one to pass the sentence gate, yes."
        )
        braces = good + "\nvar x = {"
        rows = [(0, good), (1, braces), (2, good)]  # 2 duplicates of good
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = prepare_corpus(
            docs, min_quality=0.0, min_tokens=1, c4=True, pii=True
        )
        ids = sorted(r.doc_id for r in out.collect())
        assert ids == [0]  # brace page gated, duplicate deduped
        assert "clean_text" in out.columns


class TestStreamingClean:
    def test_streaming_c4_pii_matches_batch(self, spark, tmp_path):
        """c4_clean + pii_scrub are stateless codegen, so the ingest
        pipeline with c4/pii on drains a stream to exactly the batch
        rows — including the page-gate drops and redacted text."""
        from pyspark.sql import functions as F

        from cuspatial_spark.streaming.ingest import ingest_pages
        from cuspatial_spark.textops.clean import synth_messy_pages
        from cuspatial_spark.textops.extract import wrap_html

        docs = spark.range(400).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
        )
        pages = synth_messy_pages(docs).select("doc_id", "page")
        pages = wrap_html(pages, text_col="page", id_col="doc_id")
        src_df = pages.select(
            F.concat(F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
                     F.lit(".example/p/"), F.col("doc_id").cast("string")).alias("url"),
            F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
            F.col("html").cast("binary").alias("html"),
            F.col("page").alias("text"),
            F.lit("en").alias("lang"),
        )
        src = str(tmp_path / "messy_pages")
        src_df.write.parquet(src)
        static = spark.read.parquet(src)
        stream = spark.readStream.schema(static.schema).parquet(src)

        kw = dict(
            x_min=0.0, x_max=8.0, y_min=0.0, y_max=8.0,
            scale=8.0 / 258, max_depth=8, tile_level=3,
            c4=True, pii=True,
        )
        q = (
            ingest_pages(stream, **kw)
            .writeStream.format("memory").queryName("clean_ingest")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT url, clean_text FROM clean_ingest"
        ).toPandas()
        want = ingest_pages(static, **kw).select("url", "clean_text").toPandas()
        # some pages fail the C4 page gate, none slip through
        assert 0 < len(want) < 400
        assert len(got) == len(want)
        assert set(zip(got.url, got.clean_text)) == set(zip(want.url, want.clean_text))
        # redaction really happened in the streamed rows
        assert not got.clean_text.str.contains("@").any()
