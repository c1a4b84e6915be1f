"""leakage_safe_split: cluster-coherent train/val/test assignment."""

from __future__ import annotations

import pandas as pd
import pytest

from cuspatial_spark.operators.graph import leakage_safe_split


def _docs(spark, n=60):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(n))})
    )


def _pairs(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"])
    )


class TestLeakageSafeSplit:
    def test_every_doc_assigned_once(self, spark):
        out = leakage_safe_split(
            _docs(spark), _pairs(spark, [(0, 1), (1, 2), (10, 11)])
        ).toPandas()
        assert sorted(out.doc_id) == list(range(60))
        assert set(out.split) <= {"train", "val", "test"}
        assert out.canonical_id.notna().all()

    def test_cluster_members_share_split_and_canonical(self, spark):
        # one 4-chain, one pair, rest singletons
        out = (
            leakage_safe_split(
                _docs(spark), _pairs(spark, [(3, 7), (7, 21), (21, 40), (5, 9)])
            )
            .toPandas()
            .set_index("doc_id")
        )
        chain = out.loc[[3, 7, 21, 40]]
        assert set(chain.canonical_id) == {3}
        assert len(set(chain.split)) == 1
        pair = out.loc[[5, 9]]
        assert set(pair.canonical_id) == {5}
        assert len(set(pair.split)) == 1
        # singletons are their own canonical
        assert out.loc[2, "canonical_id"] == 2

    def test_matches_closed_form_hash(self, spark):
        out = (
            leakage_safe_split(_docs(spark), _pairs(spark, [(0, 1)]))
            .toPandas()
            .set_index("doc_id")
        )
        p = 1000003
        for d in range(60):
            canon = 0 if d in (0, 1) else d
            u = (canon % p) * 2654435761 % p / p
            want = "train" if u < 0.9 else ("val" if u < 0.95 else "test")
            assert out.loc[d, "split"] == want, d

    def test_custom_weights_and_validation(self, spark):
        docs, pairs = _docs(spark, 40), _pairs(spark, [(0, 1)])
        out = leakage_safe_split(
            docs, pairs, weights={"a": 0.5, "b": 0.5}
        ).toPandas()
        assert set(out.split) <= {"a", "b"}
        with pytest.raises(ValueError):
            leakage_safe_split(docs, pairs, weights={"a": 0.5, "b": 0.4})
        with pytest.raises(ValueError):
            leakage_safe_split(docs, pairs, weights={})
        with pytest.raises(ValueError):
            leakage_safe_split(docs, pairs, weights={"a": 1.5, "b": -0.5})

    def test_single_bucket(self, spark):
        out = leakage_safe_split(
            _docs(spark, 10), _pairs(spark, [(0, 1)]), weights={"all": 1.0}
        ).toPandas()
        assert set(out.split) == {"all"}
