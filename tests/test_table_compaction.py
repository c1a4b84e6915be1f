"""TiledTable maintenance: compact() (Iceberg rewrite-data-files) and
expire_snapshots() (tombstoned storage reclaim)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from cuspatial_spark.sources.table import TiledTable


def _batch(spark, lo, n, seed):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(pd.DataFrame({
        "point_id": np.arange(lo, lo + n),
        "x": rng.uniform(0, 8, n), "y": rng.uniform(0, 8, n)}))


def _files(snap_dir):
    return glob.glob(os.path.join(snap_dir, "**", "*.parquet"), recursive=True)


@pytest.fixture(scope="module")
def _table3_template(spark, tmp_path_factory):
    """A table with three overlapping-tile appends (small-file state),
    built once — tables are plain directories, so each test clones it."""
    root = tmp_path_factory.mktemp("table3") / "t"
    t = TiledTable(str(root))
    for k in range(3):
        t.commit(_batch(spark, 300 * k, 300, seed=k), "x", "y", 0, 8, 0, 8,
                 source=f"batch-{k}")
    return str(root)


@pytest.fixture()
def table3(_table3_template, tmp_path):
    import shutil

    dst = str(tmp_path / "t")
    shutil.copytree(_table3_template, dst)
    return TiledTable(dst)


class TestCompact:
    def test_content_identical_files_reduced(self, spark, table3):
        t = table3
        before = t.read(spark).select("point_id").toPandas()
        pre_files = sum(len(_files(m["snapshot_dir"])) for m in t.history())

        v = t.compact(spark)
        assert v == 4
        m = t.history()[-1]
        assert m["compacted_through"] == 3 and m["rows"] == 900

        after = t.read(spark).select("point_id").toPandas()
        assert sorted(after.point_id) == sorted(before.point_id)
        # the effective view now reads ONE snapshot with fewer files
        # than the three appends combined
        assert len(_files(m["snapshot_dir"])) < pre_files

    def test_read_uses_single_snapshot(self, spark, table3):
        t = table3
        t.compact(spark)
        plan = t.read(spark)._jdf.queryExecution().executedPlan().toString()
        # no Union of three appends — a single parquet scan
        assert "Union" not in plan

    def test_time_travel_below_compaction(self, spark, table3):
        t = table3
        t.compact(spark)
        assert t.read(spark, version=1).count() == 300
        assert t.read(spark, version=2).count() == 600

    def test_appends_after_compaction_visible(self, spark, table3):
        t = table3
        t.compact(spark)
        t.commit(_batch(spark, 900, 100, seed=9), "x", "y", 0, 8, 0, 8)
        assert t.read(spark).count() == 1000
        # and the pre-append view is still exactly the compacted set
        assert t.read(spark, version=4).count() == 900

    def test_second_compaction_supersedes_first(self, spark, table3):
        t = table3
        t.compact(spark)                                   # v4 covers 1-3
        t.commit(_batch(spark, 900, 100, seed=9), "x", "y", 0, 8, 0, 8)  # v5
        v6 = t.compact(spark)                              # covers 1-5
        assert v6 == 6
        assert t.history()[-1]["compacted_through"] == 5
        assert t.read(spark).count() == 1000
        plan = t.read(spark)._jdf.queryExecution().executedPlan().toString()
        assert "Union" not in plan

    def test_window_prune_after_compaction(self, spark, tmp_path):
        t = TiledTable(str(tmp_path / "tw"))
        rng = np.random.default_rng(5)
        left = spark.createDataFrame(pd.DataFrame({
            "point_id": np.arange(200),
            "x": rng.uniform(0, 3, 200), "y": rng.uniform(0, 3, 200)}))
        t.commit(left, "x", "y", 0, 8, 0, 8)
        t.compact(spark)
        # window wholly outside the data bounds prunes the base snapshot
        assert t.read(spark, window=(6.0, 8.0, 6.0, 8.0)).count() == 0
        assert t.read(spark, window=(0.0, 3.5, 0.0, 3.5)).count() == 200


class TestRelocatable:
    def test_moved_table_reads(self, spark, table3, tmp_path):
        """Manifests store root-relative data dirs (like Iceberg), so a
        moved/renamed table directory stays readable."""
        import shutil

        moved = str(tmp_path / "moved")
        shutil.move(table3.path, moved)
        t2 = TiledTable(moved)
        assert t2.read(spark).count() == 900
        assert t2.compact(spark) == 4


class TestExpire:
    def test_expire_reclaims_and_tombstones(self, spark, table3):
        t = table3
        t.compact(spark)  # v4 covers 1-3
        expired = t.expire_snapshots()
        assert expired == [1, 2, 3]
        h = t.history()
        assert [m.get("expired", False) for m in h] == [True, True, True, False]
        for m in h[:3]:
            assert not os.path.exists(m["snapshot_dir"])
        # the live view is untouched
        assert t.read(spark).count() == 900

    def test_expired_time_travel_raises(self, spark, table3):
        t = table3
        t.compact(spark)
        t.expire_snapshots()
        with pytest.raises(RuntimeError, match="expired"):
            t.read(spark, version=2).count()

    def test_expire_noop_without_compaction(self, spark, table3):
        assert table3.expire_snapshots() == []
        assert table3.read(spark).count() == 900

    def test_superseded_compaction_expired(self, spark, table3):
        t = table3
        t.compact(spark)                                    # v4 covers 1-3
        t.commit(_batch(spark, 900, 100, seed=9), "x", "y", 0, 8, 0, 8)  # v5
        t.compact(spark)                                    # v6 covers 1-5
        expired = t.expire_snapshots()
        # appends 1,2,3,5 covered; compaction 4 superseded
        assert expired == [1, 2, 3, 4, 5]
        assert t.read(spark).count() == 1000
        # idempotent
        assert t.expire_snapshots() == []
