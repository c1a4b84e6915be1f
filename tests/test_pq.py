"""IVF-PQ: ADC exactness contract, end-to-end recall, encode shape.

The load-bearing test is ADC == exact squared distance to the
RECONSTRUCTED vector — approximation must live in quantization only,
never in scoring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cuspatial_spark.similarity.pq import (
    pq_encode,
    pq_reconstruct,
    pq_topk,
    train_pq,
)


DIM = 8


def _clustered(n_per: int = 40, n_clusters: int = 5, seed: int = 7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, DIM)) * 5.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(size=(n_per, DIM)) * 0.3
        for p in pts:
            rows.append((vid, [float(v) for v in p]))
            vid += 1
    return rows


def _df(spark, rows, id_name="vec_id"):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[id_name, "embedding"])
    )


class TestPQ:
    def test_adc_equals_reconstructed_distance(self, spark):
        rows = _clustered()
        vecs = _df(spark, rows)
        books = train_pq(vecs, m_subspaces=4, n_codes=16, sample_rows=500)
        assert books.shape == (4, 16, DIM // 4)

        coded = pq_encode(vecs, books).orderBy("vec_id").collect()
        codes = np.stack([np.asarray(r.pq_code) for r in coded]).astype(np.int64)
        recon = pq_reconstruct(codes, books)

        queries = rows[:3]
        from cuspatial_spark.similarity.ann import train_centroids

        cts = train_centroids(vecs, n_centroids=5, sample_rows=500)
        out = pq_topk(
            vecs, _df(spark, queries, "query_id"), books, cts,
            k=len(rows), nprobe=5,
        ).collect()
        by_pair = {(r.query_id, r.neighbor_id): r.adc_dist for r in out}
        for qid, qvec in queries:
            q = np.asarray(qvec)
            for r in out:
                if r.query_id != qid:
                    continue
                exact = float(((q - recon[r.neighbor_id]) ** 2).sum())
                assert by_pair[(qid, r.neighbor_id)] == pytest.approx(
                    exact, rel=1e-9, abs=1e-9
                )

    def test_full_probe_matches_reconstructed_brute_force(self, spark):
        """With nprobe=all buckets, pq_topk must EXACTLY equal brute
        force over the reconstructed vectors (ADC is exact on
        reconstructions; tie-break neighbor_id asc)."""
        rows = _clustered()
        vecs = _df(spark, rows)
        books = train_pq(vecs, m_subspaces=4, n_codes=32, sample_rows=500)
        from cuspatial_spark.similarity.ann import train_centroids

        cts = train_centroids(vecs, n_centroids=5, sample_rows=500)
        queries = rows[::40][:5]  # one per cluster

        got = pq_topk(
            vecs, _df(spark, queries, "query_id"), books, cts, k=5, nprobe=5
        ).collect()
        coded = pq_encode(vecs, books).orderBy("vec_id").collect()
        codes = np.stack([np.asarray(r.pq_code) for r in coded]).astype(np.int64)
        recon = pq_reconstruct(codes, books)
        for qid, qvec in queries:
            q = np.asarray(qvec)
            d = ((recon - q) ** 2).sum(1)
            order = np.lexsort((np.arange(len(d)), d))[:5].tolist()
            mine = [
                r.neighbor_id
                for r in sorted(
                    (r for r in got if r.query_id == qid),
                    key=lambda r: r.rank,
                )
            ]
            assert mine == order

    def test_recall_vs_raw_brute_force(self, spark):
        """Raw recall with nprobe=2: a loose floor — tight clusters
        make within-cluster neighbor order quantization-noise-bound,
        so this bounds sanity, not precision (the exactness contract
        lives in the tests above)."""
        rows = _clustered()
        vecs = _df(spark, rows)
        books = train_pq(vecs, m_subspaces=4, n_codes=32, sample_rows=500)
        from cuspatial_spark.similarity.ann import train_centroids

        cts = train_centroids(vecs, n_centroids=5, sample_rows=500)
        queries = rows[::40][:5]
        got = pq_topk(
            vecs, _df(spark, queries, "query_id"), books, cts, k=5, nprobe=2
        ).collect()
        mat = np.stack([np.asarray(v) for _, v in rows])
        hits = total = 0
        for qid, qvec in queries:
            q = np.asarray(qvec)
            exact = set(np.argsort(((mat - q) ** 2).sum(1))[:5].tolist())
            approx = {r.neighbor_id for r in got if r.query_id == qid}
            hits += len(exact & approx)
            total += 5
        # the query point itself must always be found
        assert all(
            qid in {r.neighbor_id for r in got if r.query_id == qid}
            for qid, _ in queries
        )
        assert hits / total >= 0.4

    def test_precoded_path_matches_on_the_fly(self, spark):
        rows = _clustered(n_per=20)
        vecs = _df(spark, rows)
        books = train_pq(vecs, m_subspaces=2, n_codes=16, sample_rows=500)
        from cuspatial_spark.similarity.ann import train_centroids

        cts = train_centroids(vecs, n_centroids=4, sample_rows=500)
        queries = rows[:2]
        a = pq_topk(
            vecs, _df(spark, queries, "query_id"), books, cts, k=3, nprobe=4
        ).collect()
        pre = pq_encode(vecs, books, out_col="pq_code")
        b = pq_topk(
            pre, _df(spark, queries, "query_id"), books, cts, k=3, nprobe=4,
            code_col="pq_code",
        ).collect()
        assert sorted([(r.query_id, r.rank, r.neighbor_id) for r in a]) == sorted(
            [(r.query_id, r.rank, r.neighbor_id) for r in b]
        )
        # fully persisted path: codes + buckets, no float column read
        from cuspatial_spark.similarity.ann import _assign_centroids

        stored = _assign_centroids(pre, cts, "embedding", "bucket").select(
            "vec_id", "pq_code", "bucket"
        )
        c = pq_topk(
            stored, _df(spark, queries, "query_id"), books, cts, k=3,
            nprobe=4, code_col="pq_code", bucket_col="bucket",
        ).collect()
        assert sorted([(r.query_id, r.rank, r.neighbor_id) for r in a]) == sorted(
            [(r.query_id, r.rank, r.neighbor_id) for r in c]
        )

    def test_dim_not_divisible_raises(self, spark):
        rows = [(0, [0.0] * 6)]
        with pytest.raises(ValueError, match="divisible"):
            train_pq(_df(spark, rows), m_subspaces=4, sample_rows=10)
