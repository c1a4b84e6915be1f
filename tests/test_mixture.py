"""Temperature-weighted mixture sampling (textops/mixture.py):
rate math, deterministic Bernoulli, copy fan-out, and an in-test
DuckDB oracle replay of the full md5-uniform pipeline."""

import math

import pytest
from pyspark.sql import functions as F

from cuspatial_spark.textops.mixture import (
    mixture_rates,
    sample_mixture,
    mixture_oracle_suffix_sql,
)


def _corpus(spark, sizes):
    rows = []
    i = 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, schema="doc_id: long, host: string")


class TestMixtureRates:
    def test_alpha_one_is_identity(self, spark):
        docs = _corpus(spark, {"a": 100, "b": 10})
        r = {x["domain"]: x["rate"] for x in mixture_rates(docs, "host", alpha=1.0).collect()}
        assert r["a"] == pytest.approx(1.0) and r["b"] == pytest.approx(1.0)

    def test_alpha_smoothing_upsamples_tail(self, spark):
        docs = _corpus(spark, {"a": 1000, "b": 10})
        r = {x["domain"]: x["rate"] for x in mixture_rates(docs, "host", alpha=0.5).collect()}
        # closed form: z = sqrt(1000) + sqrt(10); rate_d = N * c^-0.5 / z
        z = math.sqrt(1000) + math.sqrt(10)
        assert r["a"] == pytest.approx(1010 / math.sqrt(1000) / z)
        assert r["b"] == pytest.approx(1010 / math.sqrt(10) / z)
        assert r["b"] > 1.0 > r["a"]

    def test_budget_and_cap(self, spark):
        docs = _corpus(spark, {"a": 100, "b": 2})
        r = {x["domain"]: x["rate"] for x in
             mixture_rates(docs, "host", alpha=0.0, total_rows=40, max_rate=3.0).collect()}
        # alpha=0: equal mass per domain -> 20 rows each; b capped at 3 epochs
        assert r["a"] == pytest.approx(0.2)
        assert r["b"] == pytest.approx(3.0)

    def test_rejects_bad_alpha(self, spark):
        with pytest.raises(ValueError):
            mixture_rates(_corpus(spark, {"a": 1}), "host", alpha=1.5)


class TestSampleMixture:
    def test_copies_deterministic_and_expected(self, spark):
        docs = _corpus(spark, {"a": 400, "b": 50})
        rates = mixture_rates(docs, "host", alpha=0.3)
        out = sample_mixture(docs, rates, "host", seed=7)
        again = sample_mixture(docs, rates, "host", seed=7)
        a = sorted(map(tuple, out.select("doc_id", "copy").collect()))
        b = sorted(map(tuple, again.select("doc_id", "copy").collect()))
        assert a == b  # bit-reproducible
        # expected output size == input size (re-balancing mixture);
        # binomial tolerance
        n = out.count()
        assert abs(n - 450) < 60
        # tail domain really is upsampled: some doc has copy >= 1
        assert out.where((F.col("host") == "b") & (F.col("copy") >= 1)).count() > 0

    def test_duckdb_oracle_replay_exact(self, spark):
        import duckdb

        docs = _corpus(spark, {"a": 120, "b": 30, "c": 6})
        rates = mixture_rates(docs, "host", alpha=0.4, max_rate=4.0)
        out = sample_mixture(docs, rates, "host", seed=3)
        got = sorted(map(tuple, out.select("doc_id", "host", "copy").collect()))

        con = duckdb.connect()
        con.register("docs_pd", docs.toPandas())
        con.register("rates_pd", rates.select("domain", "rate").toPandas())
        suffix = mixture_oracle_suffix_sql("docs", "rates", "host", seed=3)
        q = f"WITH docs AS (SELECT * FROM docs_pd), rates AS (SELECT * FROM rates_pd), {suffix}"
        want = sorted(map(tuple, con.execute(q).fetchall()))
        assert got == [(int(a), b, int(c)) for a, b, c in want]
