"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Headline metric: spatial-join pairs/sec of the distributed
tile-filtered point-in-polygon join (the flagship pipeline), reported
as `value` = total wall seconds across headline queries and
`pairs_per_sec` alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "pip_join",
    "tile_assign",
    "nearest_linestring",
    "spatial_window",
    "trajectory_speeds",
    "hausdorff",
    "exact_dedup",
    "minhash",
    "lsh_pairs",
    "token_count",
    "quality",
    "ann_topk",
    "knn",
    # round 2 additions: scan-speed HTML->text extraction (north-rule
    # byte-identity invariant) and raster->vector rectangle decomposition
    "extract_text",
    "vectorize",
    # round 3: multi-part pairwise distances (batch-level part
    # expansion + min reduce) and geodesic point-in-polygon
    "multipart_distance",
    "spherical_pip",
]


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("cuspatial_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS) * 2, 8)))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "250000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: spin up Python workers / JIT / parquet footer caches so
    # per-query timings measure the queries, not session cold start
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    spark.range(1000).mapInPandas(lambda it: it, schema="id: long").count()

    qs = E.queries()
    timings = {}
    pair_count = 0
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        best = None
        # best-of-2: the sandbox host has measured multi-x external
        # tenant contention swings (BASELINE.md reconciliation); the
        # min is the better estimator of engine cost
        for _ in range(2):
            t0 = time.perf_counter()
            # noop sink evaluates every output column — count() would
            # let Catalyst prune expression-only results
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        if name == "pip_join":
            pair_count = df.count()

    # steady-state flagship throughput: big cached synthetic input so
    # per-query fixed costs stop dominating (the sf0.1 tables are small
    # enough that session overhead is most of each timing above)
    from pyspark.sql import functions as F

    from cuspatial_spark.plans import point_in_polygon_join

    n_big = int(os.environ.get("BENCH_STEADY_ROWS", "32000000"))
    big = (
        spark.range(0, n_big, 1, int(CPUS) * 4)
        .select(
            F.col("id").alias("page_id"),
            ((F.col("id") * 2654435761 % 104729) / 104729.0 * 8.0).alias("x"),
            ((F.col("id") * 97003 % 999983) / 999983.0 * 8.0).alias("y"),
        )
        .cache()
    )
    big.count()
    import __spark_entry__ as E2

    job = point_in_polygon_join(
        big, E2._polygons(), x_min=0, x_max=8, y_min=0, y_max=8,
        max_depth=12, tile_level=5, keep_columns=["page_id"],
    )
    big_pairs = job.count()  # warmup
    t0 = time.perf_counter()
    job.write.format("noop").mode("overwrite").save()
    steady_sec = time.perf_counter() - t0
    big.unpersist()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "pairs_per_sec": round(pair_count / timings["pip_join"], 1) if timings.get("pip_join") else None,
        "pip_join_pairs": pair_count,
        "steady_state_rows": n_big,
        "steady_state_sec": round(steady_sec, 3),
        "steady_state_rows_per_sec": round(n_big / steady_sec, 1),
        "steady_state_pairs_per_sec": round(big_pairs / steady_sec, 1),
        "cpus": int(CPUS),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
