"""Benchmark decontamination (textops/decontam.py) and GPT-style
sequence packing (textops/packing.py).

Decontamination mirrors the n-gram overlap checks in GPT-3 appendix C
/ Gopher; packing mirrors concat-and-chunk training-sequence
assembly.  Both also carry driver oracles (``decontam``,
``bpe_tokens``); these tests pin the edge cases the sf-corpus can't
exercise (short docs, empty sides, doc-spanning cuts).
"""

import pytest
from pyspark.sql import functions as F

from cuspatial_spark.textops.decontam import decontaminate
from cuspatial_spark.textops.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id: long, text: string")


class TestDecontaminate:
    def test_overlap_flags_only_matching_windows(self, spark):
        corpus = _docs(
            spark,
            [
                (1, "a b c d e f"),      # shares window "b c d" with eval
                (2, "x y z w v u"),      # no overlap
                (3, "b c d b c d"),      # two contaminated windows + clean ones
            ],
        )
        ev = _docs(spark, [(100, "q b c d r")])
        out = {
            r["doc_id"]: r.asDict()
            for r in decontaminate(corpus, ev, n=3).collect()
        }
        assert out[1]["n_windows"] == 4
        assert out[1]["n_contaminated"] == 1 and out[1]["contaminated"]
        assert out[2]["n_contaminated"] == 0 and not out[2]["contaminated"]
        # doc 3: windows (b c d), (c d b), (d b c), (b c d) -> 2 hits
        assert out[3]["n_windows"] == 4 and out[3]["n_contaminated"] == 2

    def test_short_docs_and_empty_eval(self, spark):
        corpus = _docs(spark, [(1, "a b"), (2, ""), (3, None)])
        ev = _docs(spark, []).where(F.lit(False))
        out = {r["doc_id"]: r.asDict() for r in decontaminate(corpus, ev, n=3).collect()}
        # every corpus doc appears even with zero windows / empty eval set
        assert set(out) == {1, 2, 3}
        assert all(r["n_windows"] == 0 and not r["contaminated"] for r in out.values())

    def test_shuffle_fallback_matches_broadcast(self, spark):
        rows = [(i, " ".join(str((i * 7 + j) % 13) for j in range(10))) for i in range(40)]
        corpus = _docs(spark, rows[:30])
        ev = _docs(spark, rows[25:])
        a = sorted(map(tuple, decontaminate(corpus, ev, n=4, broadcast=True).collect()))
        b = sorted(map(tuple, decontaminate(corpus, ev, n=4, broadcast=False).collect()))
        assert a == b
        assert any(r[3] for r in a)  # the 5 shared docs contaminate


class TestPackSequences:
    def test_concat_and_chunk_assignment(self, spark):
        counts = spark.createDataFrame(
            [(1, 3), (2, 5), (3, 0), (4, 9)], schema="doc_id: long, n_tokens: long"
        )
        out = {r["doc_id"]: r.asDict() for r in pack_sequences(counts, seq_len=4).collect()}
        # stream: doc1 tokens [0,3) doc2 [3,8) doc3 [8,8) doc4 [8,17)
        assert out[1]["start_token"] == 0 and (out[1]["seq_first"], out[1]["seq_last"]) == (0, 0)
        assert out[2]["start_token"] == 3 and (out[2]["seq_first"], out[2]["seq_last"]) == (0, 1)
        # empty doc occupies no tokens; pinned to the sequence at its offset
        assert out[3]["start_token"] == 8 and out[3]["n_seqs"] == 1
        assert out[4]["start_token"] == 8 and (out[4]["seq_first"], out[4]["seq_last"]) == (2, 4)
        assert out[4]["n_seqs"] == 3

    def test_prefix_sum_spans_partitions(self, spark):
        n = 500
        counts = spark.range(n).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
        ).repartition(13)
        out = pack_sequences(counts, seq_len=32).orderBy("doc_id").collect()
        acc = 0
        for i, r in enumerate(out):
            assert r["start_token"] == acc, f"row {i}"
            assert r["seq_first"] == acc // 32
            acc += i % 7 + 1
        assert len(out) == n

    def test_null_and_negative_weights_clamp_to_zero(self, spark):
        counts = spark.createDataFrame(
            [(1, 4), (2, None), (3, -7), (4, 2)], schema="doc_id: long, n_tokens: long"
        )
        out = {r["doc_id"]: r.asDict() for r in pack_sequences(counts, seq_len=4).collect()}
        assert out[2]["start_token"] == 4 and out[3]["start_token"] == 4
        assert out[4]["start_token"] == 4 and out[4]["n_tokens"] == 2

    def test_rejects_bad_seq_len(self, spark):
        counts = spark.createDataFrame([(1, 4)], schema="doc_id: long, n_tokens: long")
        with pytest.raises(ValueError):
            pack_sequences(counts, seq_len=0)

    def test_shuffled_order_matches_sql_oracle(self, spark):
        import duckdb

        n = 300
        counts = spark.range(n).select(
            F.col("id").alias("doc_id"), (F.col("id") % 11 + 1).alias("n_tokens")
        ).repartition(7)
        out = pack_sequences(counts, seq_len=64, shuffle_seed=42)
        got = sorted(map(tuple, out.collect()))

        from cuspatial_spark.textops.packing import pack_oracle_suffix_sql

        con = duckdb.connect()
        con.register("counts_pd", counts.toPandas())
        suffix = pack_oracle_suffix_sql("counts", seq_len=64, shuffle_seed=42)
        q = f"WITH counts AS (SELECT * FROM counts_pd), {suffix}"
        want = sorted(map(tuple, con.execute(q).fetchall()))
        assert got == [tuple(int(v) for v in r) for r in want]

        # the shuffle really permutes: some doc's start differs from
        # the id-order packing, while the total token stream is equal
        plain = {r["doc_id"]: r["start_token"]
                 for r in pack_sequences(counts, seq_len=64).collect()}
        shuf = {r["doc_id"]: r["start_token"] for r in out.collect()}
        assert any(plain[i] != shuf[i] for i in plain)
        assert sum(r[1] for r in got) == sum(i % 11 + 1 for i in range(n))


class TestPackingProperties:
    """Hypothesis sweep of the packing invariants — NumPy replays the
    exclusive prefix sum / chunk arithmetic for arbitrary weight
    multisets (the sf corpus and unit fixtures can't cover e.g. runs
    of zeros at cut boundaries or single giant docs)."""

    def test_random_weights_match_numpy_reference(self, spark):
        from hypothesis import given, settings, strategies as st
        import numpy as np

        @settings(max_examples=12, deadline=None)
        @given(
            st.lists(
                st.one_of(st.integers(-3, 40), st.none()),
                min_size=1, max_size=60,
            ),
            st.integers(1, 17),
        )
        def check(weights, seq_len):
            counts = spark.createDataFrame(
                [(i, w) for i, w in enumerate(weights)],
                schema="doc_id: long, n_tokens: long",
            ).repartition(5)
            got = {
                r["doc_id"]: r.asDict()
                for r in pack_sequences(counts, seq_len=seq_len).collect()
            }
            w = np.array([max(x or 0, 0) for x in weights], dtype=np.int64)
            starts = np.concatenate([[0], np.cumsum(w)[:-1]])
            for i in range(len(weights)):
                r = got[i]
                assert r["start_token"] == starts[i]
                assert r["seq_first"] == starts[i] // seq_len
                assert r["seq_last"] == max(starts[i] + w[i] - 1, starts[i]) // seq_len
                assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1

        check()
