"""Tests for the training-data pipeline layer: dedup, similarity,
text analysis, multimodal plumbing, streaming, checkpoint/resume."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",  # exact dup of 0
                "the quick brown fox jumps over a lazy dog",  # near dup
                "el perro de la casa es muy grande y la gata",
                "der hund und die katze sind in der wohnung",
                "completely different content about spark engines",
            ],
        }
    )
    return spark.createDataFrame(pdf).cache()


class TestDedup:
    def test_exact_duplicates(self, spark, docs):
        from cuspatial_spark.textops import exact_duplicates

        got = exact_duplicates(docs).orderBy("doc_id").toPandas()
        assert list(got["canonical_id"]) == [0, 0, 2, 3, 4, 5]

    def test_minhash_identical_docs_same_signature(self, spark, docs):
        from cuspatial_spark.textops import minhash_signatures

        sig = minhash_signatures(docs, num_hashes=4).orderBy("doc_id").toPandas()
        assert (sig.iloc[0, 1:] == sig.iloc[1, 1:]).all()
        assert not (sig.iloc[0, 1:] == sig.iloc[5, 1:]).all()

    def test_lsh_finds_near_dups(self, spark, docs):
        from cuspatial_spark.textops import lsh_candidate_pairs

        pairs = lsh_candidate_pairs(docs, num_hashes=4, band_size=2).toPandas()
        got = set(zip(pairs["id_a"], pairs["id_b"]))
        assert (0, 1) in got  # exact dups always collide
        assert (0, 2) in got or (1, 2) in got  # near dup should band-collide
        assert (0, 5) not in got

    def test_ngram_jaccard(self, spark, docs):
        from cuspatial_spark.textops import ngram_jaccard_pairs

        pairs = spark.createDataFrame(
            pd.DataFrame({"id_a": [0, 0], "id_b": [1, 5]})
        )
        got = ngram_jaccard_pairs(docs, pairs).orderBy("id_b").toPandas()
        assert got["jaccard"].iloc[0] == 1.0  # identical text
        assert got["jaccard"].iloc[1] < 0.1

    def test_lsh_canonical_mode_bounds_hot_buckets(self, spark):
        """A boilerplate cluster of m near-identical docs must emit
        O(m) pairs in canonical mode (vs m^2 allpairs), with the same
        connected components."""
        from cuspatial_spark.textops import lsh_candidate_pairs

        m = 200
        pdf = pd.DataFrame(
            {
                "doc_id": range(m + 2),
                "text": ["identical boilerplate page content here"] * m
                + ["totally unrelated document about engines", "another singleton"],
            }
        )
        df = spark.createDataFrame(pdf)
        canon = lsh_candidate_pairs(
            df, num_hashes=4, band_size=2, mode="canonical"
        ).toPandas()
        # star per bucket: every cluster member pairs only with doc 0
        assert len(canon) == m - 1
        assert set(canon["id_a"]) == {0}
        assert set(canon["id_b"]) == set(range(1, m))

    def test_simhash_hamming(self, spark, docs):
        from cuspatial_spark.textops import simhash

        got = simhash(docs).orderBy("doc_id").toPandas()
        h = got["simhash"].to_numpy(dtype=np.int64)
        assert h[0] == h[1]  # identical docs
        d_near = bin(int(h[0]) ^ int(h[2]) & 0xFFFFFFFFFFFFFFFF).count("1")
        d_far = bin(int(h[0]) ^ int(h[5]) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert d_near < d_far


class TestSimilarity:
    def test_brute_force_topk_matches_numpy(self, spark):
        from cuspatial_spark.similarity import brute_force_topk

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(50, 16)).astype(np.float32)
        pdf = pd.DataFrame(
            {"vec_id": range(50), "embedding": [v.tolist() for v in vecs]}
        )
        df = spark.createDataFrame(pdf)
        got = (
            brute_force_topk(df, df.where(F.col("vec_id") < 3), k=4)
            .orderBy("query_id", "rank")
            .toPandas()
        )
        # numpy oracle
        v = vecs.astype(np.float64)
        sims = (v @ v.T) / (
            np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
        )
        for q in range(3):
            s = sims[q].copy()
            s[q] = -np.inf
            top = np.argsort(-s, kind="stable")[:4]
            got_q = got[got["query_id"] == q]["neighbor_id"].to_numpy()
            np.testing.assert_array_equal(got_q, top)

    def test_cosine_near_dup_brute_and_ivf(self, spark):
        from cuspatial_spark.similarity import (
            cosine_near_dup_pairs,
            train_centroids,
        )

        rng = np.random.default_rng(7)
        base = rng.normal(size=(30, 16)).astype(np.float32)
        # 10 engineered near-dups: tiny perturbations of the first 10
        dups = base[:10] + rng.normal(size=(10, 16)).astype(np.float32) * 0.01
        vecs = np.concatenate([base, dups])
        pdf = pd.DataFrame(
            {"vec_id": range(40), "embedding": [v.tolist() for v in vecs]}
        )
        df = spark.createDataFrame(pdf)
        brute = cosine_near_dup_pairs(df, threshold=0.99).toPandas()
        want = {(i, 30 + i) for i in range(10)}
        assert set(zip(brute.id_a, brute.id_b)) == want
        # IVF-bucketed path finds the same pairs (near-dups share buckets)
        cts = train_centroids(df, 8, sample_rows=40)
        ivf = cosine_near_dup_pairs(df, threshold=0.99, centroids=cts, nprobe=2).toPandas()
        got = set(zip(ivf.id_a, ivf.id_b))
        assert got <= want and len(got) >= 9  # recall >= 0.9, no false pairs

    def test_ivf_topk_recall(self, spark):
        from cuspatial_spark.similarity import brute_force_topk, ivf_topk

        rng = np.random.default_rng(4)
        # clustered vectors so IVF buckets are meaningful
        centers = rng.normal(size=(4, 16)) * 5
        vecs = np.concatenate(
            [c + rng.normal(size=(25, 16)) * 0.5 for c in centers]
        ).astype(np.float32)
        pdf = pd.DataFrame(
            {"vec_id": range(100), "embedding": [v.tolist() for v in vecs]}
        )
        df = spark.createDataFrame(pdf)
        q = df.where(F.col("vec_id") < 5)
        exact = brute_force_topk(df, q, k=3).toPandas()
        approx = ivf_topk(df, q, centroids=centers, k=3, nprobe=2).toPandas()
        e = set(zip(exact["query_id"], exact["neighbor_id"]))
        a = set(zip(approx["query_id"], approx["neighbor_id"]))
        recall = len(e & a) / len(e)
        assert recall >= 0.8


class TestAnalysis:
    def test_language_id(self, spark, docs):
        from cuspatial_spark.textops import language_id

        got = language_id(docs).orderBy("doc_id").toPandas()
        assert got["lang_pred"].iloc[0] == "en"
        assert got["lang_pred"].iloc[3] == "es"
        assert got["lang_pred"].iloc[4] == "de"

    def test_token_count(self, spark, docs):
        from cuspatial_spark.textops import token_count

        got = token_count(docs).orderBy("doc_id").toPandas()
        assert got["n_tokens"].iloc[0] == 9

    def test_fingerprint_robust_to_identity(self, spark, docs):
        from cuspatial_spark.textops import document_fingerprint

        got = document_fingerprint(docs).orderBy("doc_id").toPandas()
        assert got["fingerprint"].iloc[0] == hashlib.md5(
            b"the quick brown fox jumps over the lazy dog"
        ).hexdigest()
        assert got["fingerprint"].iloc[0] == got["fingerprint"].iloc[1]


class TestMultimodal:
    def test_metadata_and_decode(self, spark):
        from cuspatial_spark.multimodal import binary_metadata, decode_features

        pdf = pd.DataFrame(
            {
                "id": [0, 1],
                "payload": [b"\x89PNG\r\n fake image bytes", b"<html><body>x</body></html>"],
            }
        )
        df = spark.createDataFrame(pdf)
        meta = binary_metadata(df).orderBy("id").toPandas()
        assert list(meta["payload_format"]) == ["png", "html"]
        feats = decode_features(df).toPandas()
        assert len(feats) == 2
        assert (feats["n_bytes"] == meta["payload_bytes"]).all()

    def test_decode_stub_raises_on_empty(self):
        from cuspatial_spark.multimodal import _decode_stub

        with pytest.raises(ValueError):
            _decode_stub(b"")


class TestShuffleJoin:
    def test_matches_broadcast_path(self, spark):
        from cuspatial_spark.plans import point_in_polygon_join
        from cuspatial_spark.plans.shuffle_join import point_in_polygon_join_shuffle
        from tests import golden_fixtures as G
        from cuspatial_spark.geometry import PolygonArrays

        xy = np.empty(2 * len(G.SMALL_POLY_XS))
        xy[::2] = G.SMALL_POLY_XS
        xy[1::2] = G.SMALL_POLY_YS
        polys = PolygonArrays.from_polygons_xy(xy, G.SMALL_RING_OFFSETS, G.SMALL_POLY_OFFSETS)

        pts = spark.createDataFrame(
            pd.DataFrame(
                {
                    "point_id": np.arange(71),
                    "x": np.asarray(G.SMALL_POINTS_X),
                    "y": np.asarray(G.SMALL_POINTS_Y),
                }
            )
        ).repartition(4)

        # polygon layer as a DataFrame (per-feature rows)
        rows = []
        ro = np.asarray(G.SMALL_RING_OFFSETS)
        for p in range(4):
            s, e = ro[p], ro[p + 1]
            seg_xy = np.empty(2 * (e - s))
            seg_xy[::2] = np.asarray(G.SMALL_POLY_XS)[s:e]
            seg_xy[1::2] = np.asarray(G.SMALL_POLY_YS)[s:e]
            rows.append((p, [0, int(e - s)], seg_xy.tolist()))
        poly_df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["polygon_id", "ring_offsets", "xy"])
        )

        kw = dict(x_min=0, x_max=8, y_min=0, y_max=8, max_depth=8, tile_level=3)
        bcast = point_in_polygon_join(pts, polys, keep_columns=["point_id"], **kw).toPandas()
        for salt in (0, 4):
            shuf = point_in_polygon_join_shuffle(
                pts, poly_df, keep_columns=["point_id"], salt=salt, **kw
            ).toPandas()
            assert set(zip(shuf["polygon_id"], shuf["point_id"])) == set(
                zip(bcast["polygon_id"], bcast["point_id"])
            )


class TestStreaming:
    def test_tile_counts_and_pip(self, spark, tmp_path):
        from cuspatial_spark.streaming import streaming_pip_join, streaming_tile_counts
        from cuspatial_spark.geometry import PolygonArrays
        from tests import golden_fixtures as G

        # write a small parquet source then stream it with availableNow
        pdf = pd.DataFrame(
            {
                "point_id": np.arange(71),
                "x": np.asarray(G.SMALL_POINTS_X),
                "y": np.asarray(G.SMALL_POINTS_Y),
                "ts": pd.to_datetime(np.arange(71), unit="s"),
            }
        )
        src = str(tmp_path / "stream_src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = spark.readStream.schema(
            "point_id bigint, x double, y double, ts timestamp"
        ).parquet(src)

        counts = streaming_tile_counts(
            stream, "x", "y", "ts", 0, 8, 0, 8, 1.0, 3, 1, window="1 minute"
        )
        q = (
            counts.writeStream.format("memory")
            .queryName("tile_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql("SELECT sum(n_points) AS n FROM tile_counts").collect()
        assert got[0]["n"] == 71

        xy = np.empty(2 * len(G.SMALL_POLY_XS))
        xy[::2] = G.SMALL_POLY_XS
        xy[1::2] = G.SMALL_POLY_YS
        polys = PolygonArrays.from_polygons_xy(xy, G.SMALL_RING_OFFSETS, G.SMALL_POLY_OFFSETS)
        joined = streaming_pip_join(
            stream, polys, x_min=0, x_max=8, y_min=0, y_max=8,
            max_depth=8, tile_level=3, keep_columns=["point_id"],
        )
        q2 = (
            joined.writeStream.format("memory")
            .queryName("stream_pip")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(60)
        n = spark.sql("SELECT count(*) AS n FROM stream_pip").collect()[0]["n"]
        assert n == 19  # golden pair count


    def test_streaming_exact_dedup(self, spark, tmp_path):
        from cuspatial_spark.streaming import streaming_exact_dedup

        pdf = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": ["aaa", "bbb", "aaa", "ccc", "bbb"],
                "ts": pd.to_datetime([0, 1, 2, 3, 4], unit="s"),
            }
        )
        src = str(tmp_path / "dedup_src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = spark.readStream.schema(
            "doc_id bigint, text string, ts timestamp"
        ).parquet(src)
        deduped = streaming_exact_dedup(stream, watermark="1 minute")
        q = (
            deduped.writeStream.format("memory")
            .queryName("stream_dedup")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql("SELECT text FROM stream_dedup").toPandas()
        assert sorted(got["text"]) == ["aaa", "bbb", "ccc"]


class TestMultimodalPlumbing:
    def test_frame_sampling_and_resize(self, spark):
        from cuspatial_spark.multimodal import resize_features, sample_frames

        pdf = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "payload": [bytes(range(64)), b"\x10" * 7],
            }
        )
        df = spark.createDataFrame(pdf)
        frames = sample_frames(df, n_frames=4).orderBy("payload_md5", "frame_idx").toPandas()
        # 64-byte payload -> 4 frames of 16 bytes; 7-byte -> 4 ragged frames
        assert len(frames) == 8
        assert frames.groupby("payload_md5")["frame_bytes"].sum().tolist() in ([64, 7], [7, 64])
        thumbs = resize_features(df, size=16).toPandas()
        assert all(len(t) == 16 for t in thumbs["thumb"])
        # constant payload -> constant thumbnail
        const = thumbs[thumbs["thumb"].apply(lambda t: set(t) == {16.0})]
        assert len(const) == 1


class TestCheckpointedJob:
    def test_resume_skips_completed(self, spark, tmp_path):
        from cuspatial_spark.ops import CheckpointedJob

        df = spark.range(1000).withColumn("v", F.col("id") * 2)
        out = str(tmp_path / "job_out")
        job = CheckpointedJob(spark, out, key_col="id", n_buckets=4)
        r1 = job.run(df, lambda d: d.where(F.col("v") % 4 == 0))
        assert len(r1["ran"]) == 4
        r2 = job.run(df, lambda d: d.where(F.col("v") % 4 == 0))
        assert r2["ran"] == [] and r2["skipped"] == [0, 1, 2, 3]
        total = spark.read.parquet(f"{out}/bucket=*").count()
        assert total == 500

    def test_kernel_metrics(self, spark, tmp_path):
        from cuspatial_spark.ops import KernelMetrics

        m = KernelMetrics.create(spark)

        def double(batches):
            for pdf in batches:
                yield pdf

        df = spark.range(100).mapInPandas(m.wrap(double), schema="id: long")
        assert df.count() == 100
        snap = m.snapshot()
        assert snap["rows_in"] == 100 and snap["rows_out"] == 100


class TestTiledWriter:
    def test_write_prune_roundtrip(self, spark, tmp_path):
        from cuspatial_spark.sources.writer import read_tiled, write_tiled

        rng = np.random.default_rng(9)
        pdf = pd.DataFrame(
            {"point_id": np.arange(2000), "x": rng.uniform(0, 8, 2000), "y": rng.uniform(0, 8, 2000)}
        )
        path = str(tmp_path / "tiled")
        write_tiled(
            spark.createDataFrame(pdf), path, "x", "y", 0, 8, 0, 8,
            max_depth=10, tile_level=2,
        )
        back = read_tiled(spark, path)
        assert back.count() == 2000
        # tile predicate must prune partitions (directory key)
        one = back.where(F.col("tile") == 0)
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(tile" in plan or "tile#" in plan
        # every row in tile 0 is in the first quadrant cell [0,4)x[0,4)
        got = one.toPandas()
        assert (got["x"] < 4.0).all() and (got["y"] < 4.0).all()
        # round-trip preserves payload
        assert set(back.toPandas()["point_id"]) == set(range(2000))

    def test_hilbert_cluster_same_content(self, spark, tmp_path):
        """cluster='hilbert' changes only file layout: same rows, same
        tile directory keys, pruning intact, and a hilbert_key column
        consistent with the kernel."""
        from cuspatial_spark.kernels.hilbert import xy2d
        from cuspatial_spark.sources.writer import read_tiled, write_tiled

        rng = np.random.default_rng(10)
        pdf = pd.DataFrame(
            {"point_id": np.arange(1000), "x": rng.uniform(0, 8, 1000), "y": rng.uniform(0, 8, 1000)}
        )
        path = str(tmp_path / "tiled_h")
        write_tiled(
            spark.createDataFrame(pdf), path, "x", "y", 0, 8, 0, 8,
            max_depth=8, tile_level=2, cluster="hilbert",
        )
        back = read_tiled(spark, path).toPandas()
        assert set(back["point_id"]) == set(range(1000))
        scale = 8 / ((1 << 8) + 2)
        ii = np.minimum(np.floor(back["x"] / scale), 255).astype(np.int64)
        jj = np.minimum(np.floor(back["y"] / scale), 255).astype(np.int64)
        np.testing.assert_array_equal(back["hilbert_key"].to_numpy(), xy2d(8, ii, jj))
        got = read_tiled(spark, path).where(F.col("tile") == 0).toPandas()
        assert (got["x"] < 4.0).all() and (got["y"] < 4.0).all()


class TestIvfTrainer:
    def test_train_and_search(self, spark):
        from cuspatial_spark.similarity import brute_force_topk, ivf_topk
        from cuspatial_spark.similarity.ann import train_centroids

        rng = np.random.default_rng(13)
        centers = rng.normal(size=(4, 16)) * 5
        vecs = np.concatenate(
            [c + rng.normal(size=(30, 16)) * 0.5 for c in centers]
        ).astype(np.float32)
        pdf = pd.DataFrame({"vec_id": range(120), "embedding": [v.tolist() for v in vecs]})
        df = spark.createDataFrame(pdf)
        cts = train_centroids(df, 4, sample_rows=120, iters=8)
        assert cts.shape == (4, 16)
        q = df.where(F.col("vec_id") < 5)
        exact = brute_force_topk(df, q, k=3).toPandas()
        approx = ivf_topk(df, q, centroids=cts, k=3, nprobe=1).toPandas()
        e = set(zip(exact["query_id"], exact["neighbor_id"]))
        a = set(zip(approx["query_id"], approx["neighbor_id"]))
        assert len(e & a) / len(e) >= 0.8

    def test_sample_spans_partitions(self, spark):
        """Partition-skewed fixture: cluster A fills partition 0,
        cluster B partition 1.  The old ``.limit(sample_rows)`` path
        provably collapses here (first-partition rows only -> no B
        centroid -> nprobe=1 recall on B queries near zero); the
        cross-partition sampler must place centroids in BOTH clusters."""
        from cuspatial_spark.similarity.ann import train_centroids

        rng = np.random.default_rng(5)
        a = rng.normal(size=(60, 8)) * 0.3 + 10.0
        b = rng.normal(size=(60, 8)) * 0.3 - 10.0
        pdf = pd.DataFrame(
            {
                "vec_id": range(120),
                "embedding": [v.tolist() for v in np.concatenate([a, b])],
            }
        )
        # repartitionByRange on vec_id keeps cluster A in the first
        # partition and cluster B in the second — crawl-segment skew
        df = spark.createDataFrame(pdf).repartitionByRange(2, "vec_id")
        cts = train_centroids(df, 2, sample_rows=60, iters=8)
        means = cts.mean(axis=1)
        assert (means > 5).any() and (means < -5).any()


class TestTiledTable:
    def test_commit_time_travel_prune(self, spark, tmp_path):
        from cuspatial_spark.sources.table import TiledTable

        t = TiledTable(str(tmp_path / "table"))
        rng = np.random.default_rng(21)
        df1 = spark.createDataFrame(pd.DataFrame({
            "point_id": np.arange(500),
            "x": rng.uniform(0, 4, 500), "y": rng.uniform(0, 4, 500)}))
        df2 = spark.createDataFrame(pd.DataFrame({
            "point_id": np.arange(500, 900),
            "x": rng.uniform(4, 8, 400), "y": rng.uniform(4, 8, 400)}))
        v1 = t.commit(df1, "x", "y", 0, 8, 0, 8, source="batch-1")
        v2 = t.commit(df2, "x", "y", 0, 8, 0, 8, source="batch-2")
        assert (v1, v2) == (1, 2)

        # time travel: v1 sees only the first batch; latest sees both
        assert t.read(spark, version=1).count() == 500
        assert t.read(spark).count() == 900
        ids = set(r.point_id for r in t.read(spark).select("point_id").collect())
        assert ids == set(range(900))

        # manifest-level pruning: a window wholly inside batch-1's
        # bounds must skip snapshot 2 (its plan reads one directory)
        pruned = t.read(spark, window=(0.0, 3.0, 0.0, 3.0))
        assert pruned.count() == 500

        # lineage chain
        h = t.history()
        assert [m["version"] for m in h] == [1, 2]
        assert h[1]["parent"] == 1 and h[0]["source"] == "batch-1"
        assert h[0]["rows"] == 500 and h[1]["rows"] == 400
        assert h[0]["bounds"]["x_hi"] <= 4.0

    def test_crash_safe_publish(self, spark, tmp_path):
        """An orphan data directory without a manifest is invisible."""
        import os
        from cuspatial_spark.sources.table import TiledTable

        t = TiledTable(str(tmp_path / "table2"))
        df = spark.createDataFrame(pd.DataFrame({
            "point_id": [0, 1], "x": [1.0, 2.0], "y": [1.0, 2.0]}))
        t.commit(df, "x", "y", 0, 8, 0, 8)
        # simulate a crashed second commit: data written, no manifest
        os.makedirs(os.path.join(str(tmp_path / "table2"), "data", "snap-00002"))
        assert t.current_version() == 1
        assert t.read(spark).count() == 2

    def test_concurrent_commit_never_overwrites(self, spark, tmp_path):
        """Two committers racing on the same version: the loser must
        NOT replace the winner's manifest (fail-if-exists publish) —
        it retries with the next version instead."""
        import json
        import os
        from cuspatial_spark.sources.table import TiledTable

        t = TiledTable(str(tmp_path / "table3"))
        df = spark.createDataFrame(pd.DataFrame({
            "point_id": [0, 1], "x": [1.0, 2.0], "y": [1.0, 2.0]}))
        t.commit(df, "x", "y", 0, 8, 0, 8)
        # simulate a concurrent winner publishing v2 mid-commit: the
        # manifest for version 2 appears before our commit publishes
        winner = dict(json.load(open(t._manifest_path(1))))
        winner["version"] = 2
        with open(t._manifest_path(2), "w") as f:
            json.dump(winner, f)
        got = t.commit(df, "x", "y", 0, 8, 0, 8)
        assert got == 3  # retried past the conflict
        assert json.load(open(t._manifest_path(2)))["snapshot_dir"] == winner["snapshot_dir"]
        assert t.current_version() == 3


    def test_publish_without_hardlinks(self, spark, tmp_path, monkeypatch):
        """Filesystems that cannot hard-link (or raise EPERM instead of
        FileExistsError) must fall back to the O_CREAT|O_EXCL publish
        and still refuse to overwrite a racing winner's manifest."""
        import errno
        import json
        import os
        from cuspatial_spark.sources import table as tbl

        t = tbl.TiledTable(str(tmp_path / "table4"))
        df = spark.createDataFrame(pd.DataFrame({
            "point_id": [0, 1], "x": [1.0, 2.0], "y": [1.0, 2.0]}))

        def no_link(src, dst):
            raise OSError(errno.EPERM, "hard links not supported")

        monkeypatch.setattr(tbl.os, "link", no_link)
        assert t.commit(df, "x", "y", 0, 8, 0, 8) == 1
        assert t.read(spark).count() == 2
        assert t.history()[0]["rows"] == 2
        # race on the fallback path: v2 appears before our publish
        winner = dict(json.load(open(t._manifest_path(1))))
        winner["version"] = 2
        with open(t._manifest_path(2), "w") as f:
            json.dump(winner, f)
        assert t.commit(df, "x", "y", 0, 8, 0, 8) == 3
        assert json.load(open(t._manifest_path(2))) == winner

    def test_crashed_fallback_publish_is_adopted(self, spark, tmp_path, monkeypatch):
        """A zero-size manifest left by a committer killed between the
        O_EXCL claim and the content write must not wedge the table:
        current_version skips it and the next commit adopts the slot."""
        import errno
        import os
        import time as _t
        from cuspatial_spark.sources import table as tbl

        t = tbl.TiledTable(str(tmp_path / "table5"))
        df = spark.createDataFrame(pd.DataFrame({
            "point_id": [0, 1], "x": [1.0, 2.0], "y": [1.0, 2.0]}))
        t.commit(df, "x", "y", 0, 8, 0, 8)
        # simulate the crash: an empty claimed manifest for v2, old
        crashed = t._manifest_path(2)
        open(crashed, "w").close()
        old = _t.time() - 60
        os.utime(crashed, (old, old))
        assert t.current_version() == 1  # empty claim is not a version
        assert t.read(spark).count() == 2  # table stays readable

        def no_link(src_, dst):
            raise OSError(errno.EPERM, "no hard links")

        monkeypatch.setattr(tbl.os, "link", no_link)
        assert t.commit(df, "x", "y", 0, 8, 0, 8) == 2  # adopted the slot
        assert t.history()[1]["rows"] == 2

    def test_stale_claim_recovery_single_winner(self, spark, tmp_path, monkeypatch):
        """Two committers recovering the same stale empty claim must
        not both publish that version: RENAME is the atomic arbiter.
        Simulated lost race — our rename of the stale claim raises
        FileNotFoundError because 'the other recoverer' already renamed
        it away and republished v2; we must move to a FRESH version,
        never overwrite theirs."""
        import errno
        import json
        import os
        import time as _t
        from cuspatial_spark.sources import table as tbl

        t = tbl.TiledTable(str(tmp_path / "table6"))
        df = spark.createDataFrame(pd.DataFrame({
            "point_id": [0, 1], "x": [1.0, 2.0], "y": [1.0, 2.0]}))
        t.commit(df, "x", "y", 0, 8, 0, 8)
        stale = t._manifest_path(2)
        open(stale, "w").close()
        old = _t.time() - 60
        os.utime(stale, (old, old))

        def no_link(src_, dst):
            raise OSError(errno.EPERM, "no hard links")

        winner = dict(json.load(open(t._manifest_path(1))))
        winner["version"] = 2
        winner["snapshot_dir"] = winner["snapshot_dir"] + "-other"
        real_rename = os.rename

        def racing_rename(src, dst, *a, **kw):
            if os.path.abspath(src) == os.path.abspath(stale):
                # the other recoverer wins the arbiter: renames the
                # claim away and republishes v2 before our rename
                with open(stale, "w") as f:
                    json.dump(winner, f)
                raise FileNotFoundError(errno.ENOENT, "lost the race", src)
            return real_rename(src, dst, *a, **kw)

        monkeypatch.setattr(tbl.os, "link", no_link)
        monkeypatch.setattr(tbl.os, "rename", racing_rename)
        got = t.commit(df, "x", "y", 0, 8, 0, 8)
        assert got == 3  # never claims the version the winner took
        assert json.load(open(stale))["snapshot_dir"] == winner["snapshot_dir"]
        assert t.current_version() == 3

    def test_stale_claim_rename_spares_fresh_publish(self, spark, tmp_path,
                                                     monkeypatch):
        """If a frozen writer's publish lands between our stat (empty,
        old) and our rename, the renamed file is NON-empty: the
        recoverer must put it back and take a fresh version — the
        published snapshot must never vanish from history."""
        import errno
        import json
        import os
        import time as _t
        from cuspatial_spark.sources import table as tbl

        t = tbl.TiledTable(str(tmp_path / "table6b"))
        df = spark.createDataFrame(pd.DataFrame({
            "point_id": [0, 1], "x": [1.0, 2.0], "y": [1.0, 2.0]}))
        t.commit(df, "x", "y", 0, 8, 0, 8)
        stale = t._manifest_path(2)
        open(stale, "w").close()
        old = _t.time() - 60
        os.utime(stale, (old, old))

        def no_link(src_, dst):
            raise OSError(errno.EPERM, "no hard links")

        winner = dict(json.load(open(t._manifest_path(1))))
        winner["version"] = 2
        winner["snapshot_dir"] = winner["snapshot_dir"] + "-frozen"
        real_rename = os.rename
        fired = []

        def racing_rename(src, dst, *a, **kw):
            if os.path.abspath(src) == os.path.abspath(stale) and not fired:
                # the frozen writer's os.replace lands first: the
                # file we rename away is their real manifest
                fired.append(True)
                with open(stale, "w") as f:
                    json.dump(winner, f)
            return real_rename(src, dst, *a, **kw)

        monkeypatch.setattr(tbl.os, "link", no_link)
        monkeypatch.setattr(tbl.os, "rename", racing_rename)
        got = t.commit(df, "x", "y", 0, 8, 0, 8)
        assert got == 3
        # the frozen writer's v2 manifest was restored, not deleted
        assert json.load(open(stale))["snapshot_dir"] == winner["snapshot_dir"]
        assert t.current_version() == 3
        # history() resolves root-relative dirs to absolute paths
        assert t.history()[1]["snapshot_dir"] == t._resolve(winner["snapshot_dir"])

    def test_fallback_publish_is_whole(self, spark, tmp_path, monkeypatch):
        """The no-hardlink publish path must expose the manifest whole
        (claim file stays empty until one atomic replace) — a reader
        polling the file must only ever see zero bytes or valid JSON."""
        import errno
        import json
        import os
        from cuspatial_spark.sources import table as tbl

        t = tbl.TiledTable(str(tmp_path / "table7"))
        df = spark.createDataFrame(pd.DataFrame({
            "point_id": [0, 1], "x": [1.0, 2.0], "y": [1.0, 2.0]}))

        def no_link(src_, dst):
            raise OSError(errno.EPERM, "no hard links")

        seen = []
        real_replace = os.replace

        def spying_replace(src, dst, *a, **kw):
            # at replace time the destination is the claim: empty
            if os.path.exists(dst):
                seen.append(os.path.getsize(dst))
            return real_replace(src, dst, *a, **kw)

        monkeypatch.setattr(tbl.os, "link", no_link)
        monkeypatch.setattr(tbl.os, "replace", spying_replace)
        assert t.commit(df, "x", "y", 0, 8, 0, 8) == 1
        assert seen == [0]  # claim never written in place
        assert json.load(open(t._manifest_path(1)))["rows"] == 2


class TestIngestPipeline:
    def test_streaming_ingest_matches_batch(self, spark, tmp_path):
        """The full web-ingest pipeline (extract -> gates -> geotag ->
        tile/PIP) drains a stream to exactly the rows the identical
        batch plan produces, and extraction stays byte-identical."""
        import tests.golden_fixtures as G
        from cuspatial_spark.geometry import PolygonArrays
        from cuspatial_spark.sources.webpages import synth_webpages
        from cuspatial_spark.streaming.ingest import ingest_pages

        src = str(tmp_path / "pages")
        synth_webpages(spark, 3000, partitions=4).write.parquet(src)
        static = spark.read.parquet(src)
        stream = spark.readStream.schema(static.schema).parquet(src)

        xy = np.empty(2 * len(G.SMALL_POLY_XS))
        xy[::2] = G.SMALL_POLY_XS
        xy[1::2] = G.SMALL_POLY_YS
        polys = PolygonArrays.from_polygons_xy(
            xy, G.SMALL_RING_OFFSETS, G.SMALL_POLY_OFFSETS
        )
        kw = dict(
            x_min=0.0, x_max=8.0, y_min=0.0, y_max=8.0,
            scale=8.0 / 258, max_depth=8, tile_level=3,
            polygons=polys, keep_columns=["url", "text", "extracted_text"],
        )

        q = (
            ingest_pages(stream, **kw)
            .writeStream.format("memory").queryName("ingest")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM ingest").toPandas()
        want = ingest_pages(static, **kw).toPandas()
        assert len(got) == len(want) > 0
        assert set(zip(got.url, got.polygon_id)) == set(zip(want.url, want.polygon_id))
        # byte-identity invariant survives the streaming plan
        assert (got.text == got.extracted_text).all()

    def test_ingest_gates_filter(self, spark):
        """Quality/language gates are real filters (and the gated tile
        pipeline adds no shuffle)."""
        from cuspatial_spark.textops.extract import wrap_html
        from cuspatial_spark.streaming.ingest import ingest_pages

        texts = (
            ["the fast engine and the scan of the table"] * 6
            + ["el perro de la casa es muy grande y la gata"] * 3
            + ["x"] * 2  # too short: fails the quality gate
        )
        pages = wrap_html(
            spark.createDataFrame(
                pd.DataFrame(
                    {
                        "doc_id": range(len(texts)),
                        "url": [f"https://s.example/{i}" for i in range(len(texts))],
                        "text": texts,
                    }
                )
            )
        )
        kw = dict(x_min=0.0, x_max=8.0, y_min=0.0, y_max=8.0,
                  scale=8.0 / 258, max_depth=8, tile_level=3)
        assert ingest_pages(pages, **kw).count() == 11
        en_only = ingest_pages(pages, langs=["en"], min_quality=0.1, **kw)
        assert en_only.count() == 6
        plan = en_only._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # gate + tile assign: zero shuffles


class TestUrlOps:
    def test_canonical_url_rules(self, spark):
        """Each canonicalization rule in isolation + combined."""
        from cuspatial_spark.textops.urls import canonical_url

        cases = [
            ("HTTP://Example.COM/a", "http://example.com/a"),
            ("https://www.example.com:443/a/", "https://example.com/a"),
            ("http://example.com:80/", "http://example.com/"),
            ("http://example.com:8080/a", "http://example.com:8080/a"),
            ("https://example.com/a#frag", "https://example.com/a"),
            ("https://example.com/a?utm_source=x&b=1&gclid=z", "https://example.com/a?b=1"),
            ("https://example.com/a?utm_campaign", "https://example.com/a"),
            ("https://example.com", "https://example.com/"),
            ("https://example.com/a?b=1&c=2", "https://example.com/a?b=1&c=2"),
            ("https://www.www.example.com/a", "https://example.com/a"),
        ]
        df = spark.createDataFrame(
            pd.DataFrame({"url": [c[0] for c in cases]})
        )
        out = [r["canonical_url"] for r in canonical_url(df).collect()]
        assert out == [c[1] for c in cases]

    def test_url_dedup_keeps_earliest(self, spark):
        from cuspatial_spark.textops.urls import url_dedup

        df = spark.createDataFrame(pd.DataFrame({
            "url": [
                "https://WWW.site.com/x?utm_source=a",
                "https://site.com/x",
                "https://site.com/y",
            ],
            "ts": [2, 1, 3],
        }))
        out = url_dedup(df, order_col="ts").orderBy("canonical_url").collect()
        assert [(r["canonical_url"], r["ts"]) for r in out] == [
            ("https://site.com/x", 1),
            ("https://site.com/y", 3),
        ]

    def test_canonical_url_plan_is_codegen(self, spark):
        """Zero shuffles, no Python: the plan must be a single
        whole-stage-codegen project over the scan."""
        from cuspatial_spark.textops.urls import canonical_url

        df = spark.createDataFrame(pd.DataFrame({"url": ["http://a.com/x"]}))
        plan = canonical_url(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "MapInPandas" not in plan

    def test_streaming_url_dedup(self, spark, tmp_path):
        """Canonical-url streaming dedup: crawl-noise variants of one
        resource collapse to a single kept row (first arrival)."""
        from cuspatial_spark.streaming import streaming_url_dedup

        pdf = pd.DataFrame(
            {
                "url": [
                    "https://WWW.site.com/x?utm_source=a",
                    "https://site.com/x",
                    "HTTPS://site.com:443/x#frag",
                    "https://site.com/y",
                ],
                "warc_ts": pd.to_datetime([0, 1, 2, 3], unit="s"),
            }
        )
        src = str(tmp_path / "url_dedup_src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = spark.readStream.schema(
            "url string, warc_ts timestamp"
        ).parquet(src)
        deduped = streaming_url_dedup(stream, watermark="1 minute")
        q = (
            deduped.writeStream.format("memory")
            .queryName("stream_url_dedup")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql("SELECT url FROM stream_url_dedup").toPandas()
        assert len(got) == 2  # one per canonical resource (x and y)

    def test_canonical_url_idempotent(self, spark):
        """canonical(canonical(u)) == canonical(u) over a combinatorial
        sweep of schemes, hosts, ports, paths, queries, and fragments;
        schemeless input passes through untouched."""
        import itertools

        from cuspatial_spark.textops.urls import canonical_url

        urls = [
            f"{s}{h}{p}{path}{q}{frag}"
            for s, h, p, path, q, frag in itertools.product(
                ["http://", "HTTPS://", "https://WWW.", ""],
                ["Example.com", "sub.ex.org"],
                ["", ":443", ":80", ":8080"],
                ["", "/", "/A/b/", "/x"],
                ["", "?utm_source=1", "?a=1&utm_x=2&b=3", "?utm_a&utm_b"],
                ["", "#frag"],
            )
        ]
        df = spark.createDataFrame(pd.DataFrame({"url": urls}))
        once = canonical_url(df).select(
            F.col("canonical_url").alias("url"), F.col("url").alias("orig")
        )
        twice = canonical_url(once)
        rows = twice.collect()
        bad = [r for r in rows if r["canonical_url"] != r["url"]]
        assert not bad, bad[:5]
        # schemeless inputs are untouched
        for r in rows:
            if "://" not in r["orig"]:
                assert r["url"] == r["orig"]


class TestHostStats:
    def _crawl(self, spark):
        rows = [
            # a.com: 3 captures of 2 resources (recrawl factor 1.5)
            (0, "https://WWW.a.com/p1"),
            (1, "https://a.com:443/p1"),
            (2, "https://a.com/p2"),
            # b.org: 1 capture
            (3, "http://b.org/only"),
        ]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_host_stats_counts(self, spark):
        from cuspatial_spark.textops.urls import canonical_url, host_stats

        got = {
            r["host"]: (r["host_rows"], r["host_urls"])
            for r in host_stats(canonical_url(self._crawl(spark))).collect()
        }
        assert got == {"a.com": (3, 2), "b.org": (1, 1)}

    def test_with_host_signals_attaches_per_row(self, spark):
        from cuspatial_spark.textops.urls import canonical_url, with_host_signals

        out = with_host_signals(canonical_url(self._crawl(spark))).collect()
        assert len(out) == 4
        for r in out:
            if r["host"] == "a.com":
                assert (r["host_rows"], r["host_urls"]) == (3, 2)
            else:
                assert (r["host_rows"], r["host_urls"]) == (1, 1)

    def test_host_expr_codegen_only(self, spark):
        """host extraction adds no shuffle and no Python stage."""
        from cuspatial_spark.textops.urls import canonical_url, host_expr
        from pyspark.sql import functions as F

        df = canonical_url(self._crawl(spark)).withColumn(
            "host", host_expr(F.col("canonical_url"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestHostSample:
    def _skewed(self, spark, n_hot=200, n_cold=5):
        rows = [(i, f"https://hot.com/p{i}") for i in range(n_hot)]
        rows += [(1000 + i, f"https://cold{i}.org/x") for i in range(n_cold)]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_cap_and_determinism(self, spark):
        from cuspatial_spark.textops.urls import canonical_url, host_sample

        df = canonical_url(self._skewed(spark))
        out = host_sample(df, cap=3, order_col="doc_id").toPandas()
        hot = out[out.host == "hot.com"].sort_values("host_rank")
        # exactly cap rows, the cap smallest doc_ids, ranked 1..cap
        assert list(hot.doc_id) == [0, 1, 2]
        assert list(hot.host_rank) == [1, 2, 3]
        # cold hosts keep their single row
        assert len(out) == 3 + 5

    def test_two_phase_equals_one_phase(self, spark):
        """The salted two-phase result must equal a plain window —
        for every salting width."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from cuspatial_spark.textops.urls import (
            canonical_url,
            host_expr,
            host_sample,
        )

        df = canonical_url(self._skewed(spark, n_hot=57, n_cold=3))
        w = Window.partitionBy(
            host_expr(F.col("canonical_url"))
        ).orderBy("doc_id")
        expect = (
            df.withColumn("host_rank", F.row_number().over(w))
            .where(F.col("host_rank") <= 4)
            .select("doc_id", "host_rank")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for n_salts in (1, 2, 16):
            got = (
                host_sample(df, cap=4, order_col="doc_id", n_salts=n_salts)
                .select("doc_id", "host_rank")
                .toPandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            assert got.equals(expect), n_salts
