"""N -> 4N scaling-efficiency evidence (BASELINE.json north_rule).

Runs the IDENTICAL flagship job — distributed tile-filtered
point-in-polygon join over a cached geotagged-pages table — at two
local parallelism levels (default local[8] vs local[32]) in separate
JVMs.  The input DataFrame is materialized (cached) before timing, so
the measurement isolates the join engine (tile assignment + broadcast
filter + vectorized PIP refine), which is what must scale on a real
cluster where the scan is storage-bound.

Efficiency definition (cores n -> m, m = 4n):
    eff = (rate_m / rate_n) / (m / n)  =  T_n / (4 * T_m)

Usage:
    python tools/scaling_bench.py            # parent: runs both, prints JSON
    python tools/scaling_bench.py --child 8  # child mode (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("SCALING_N_PAGES", "256000000"))
GRID = int(os.environ.get("SCALING_POLY_GRID", "5"))  # GRID^2 x 4 polygons
LEVELS = tuple(int(v) for v in os.environ.get('SCALING_LEVELS', '8,32').split(','))
# 'pip' = flagship tile-filtered PIP join; 'extract' = HTML->text
# extraction over the synthetic web-pages table (scan/CPU-bound
# codegen regexp chain — the north rule's other half); 'bpe' = the
# round-5 merge-table BPE tokenizer (codegen replace chain) over a
# synthetic text column
JOB = os.environ.get("SCALING_JOB", "pip")
N_EXTRACT = int(os.environ.get("SCALING_N_EXTRACT", "4000000"))
N_BPE = int(os.environ.get("SCALING_N_BPE", "4000000"))
# 'semdedup': cluster-bounded semantic pruning over a synthetic
# embedding table — K centroids >> cores so the per-cluster sweep
# tasks saturate every level being compared
N_SEMDEDUP = int(os.environ.get("SCALING_N_SEMDEDUP", "400000"))
K_SEMDEDUP = int(os.environ.get("SCALING_K_SEMDEDUP", "256"))
# 'traindata': benchmark decontamination (broadcast semi-join of eval
# window hashes) + sequence packing (two-level range-partitioned
# prefix sum) over a synthetic corpus — the round-5 train-data tail
N_TRAIN = int(os.environ.get("SCALING_N_TRAIN", "2000000"))
RUNS = int(os.environ.get("SCALING_RUNS", "3"))  # min-of-N per level
AOI = dict(x_min=0.0, x_max=8.0, y_min=0.0, y_max=8.0)


def _scaled_polygons():
    """The 4-polygon reference layer shrunk and replicated on a
    GRID x GRID lattice -> 4*GRID^2 polygons with modest overlap
    (candidate factor a few per point, like a real admin-boundary
    layer)."""
    import numpy as np

    import __spark_entry__ as E
    from cuspatial_spark.geometry import PolygonArrays

    po = np.asarray(E.POLY_OFFSETS)
    ro = np.asarray(E.RING_OFFSETS)
    # shrink the 19-vertex 4-polygon layer into a [0, 1.6)^2 stamp
    xs = np.asarray(E.POLY_X) / 5.0
    ys = np.asarray(E.POLY_Y) / 5.0
    all_po, all_ro, all_x, all_y = [0], [0], [], []
    for gi in range(GRID):
        for gj in range(GRID):
            dx = gi * (8.0 / GRID)
            dy = gj * (8.0 / GRID)
            for p in range(len(po) - 1):
                all_po.append(all_po[-1] + (po[p + 1] - po[p]))
            for r in range(len(ro) - 1):
                all_ro.append(all_ro[-1] + (ro[r + 1] - ro[r]))
            all_x.append(xs + dx)
            all_y.append(ys + dy)
    return PolygonArrays(
        np.asarray(all_po), np.asarray(all_ro),
        np.concatenate(all_x), np.concatenate(all_y),
    )


def _points(spark, n, partitions):
    """Geotagged pages with pure-arithmetic (cheap, codegen) geotags;
    page_id stands in for the url key."""
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, partitions)
    return df.select(
        F.col("id").alias("page_id"),
        ((F.col("id") * 2654435761 % 104729) / 104729.0 * 8.0).alias("x"),
        ((F.col("id") * 97003 % 999983) / 999983.0 * 8.0).alias("y"),
    )


def run_child(cpus: int) -> None:
    from pyspark.sql import SparkSession

    from cuspatial_spark.plans import point_in_polygon_join

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "250000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if JOB == "extract":
        from pyspark.sql import functions as F

        from cuspatial_spark.sources.webpages import synth_webpages
        from cuspatial_spark.textops.extract import extract_text

        pages = synth_webpages(spark, N_EXTRACT, partitions=cpus * 4).cache()
        pages.count()
        # sum(length(extracted)) forces full evaluation of the regexp
        # chain (count() would prune the projection).  The aggregate
        # Dataset must be REBUILT per run: re-collecting one Dataset
        # reuses its shuffle-map output and skips the whole map stage.
        def job():
            return extract_text(pages, "html").agg(
                F.sum(F.length("extracted_text")).alias("total")
            )

        job().collect()  # warmup
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            total = job().collect()[0]["total"]
            runs.append(time.perf_counter() - t0)
        dt = min(runs)
        print(json.dumps({"cpus": cpus, "seconds": round(dt, 3),
                          "all_runs": [round(r, 3) for r in runs],
                          "rows": N_EXTRACT, "bytes_out": int(total),
                          "rows_per_sec": round(N_EXTRACT / dt, 1)}))
        spark.stop()
        return

    if JOB == "bpe":
        from pyspark.sql import functions as F

        from cuspatial_spark.textops.bpe import DEFAULT_MERGES, bpe_tokenize

        docs = (
            spark.range(0, N_BPE, 1, cpus * 4)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("the query window sort order column scan "),
                    (F.col("id") % 97).cast("string"),
                    F.lit(" group by key then join and merge the value vector hash line "),
                    (F.col("id") % 13).cast("string"),
                ).alias("text"),
            )
            .cache()
        )
        docs.count()

        def job():
            return bpe_tokenize(docs, DEFAULT_MERGES).agg(
                F.sum("bpe_n_tokens").alias("total")
            )

        job().collect()  # warmup
        runs = []
        total = 0
        for _ in range(RUNS):
            t0 = time.perf_counter()
            total = job().collect()[0]["total"]
            runs.append(time.perf_counter() - t0)
        dt = min(runs)
        print(json.dumps({"cpus": cpus, "seconds": round(dt, 3),
                          "all_runs": [round(r, 3) for r in runs],
                          "rows": N_BPE, "tokens": int(total),
                          "rows_per_sec": round(N_BPE / dt, 1),
                          "tokens_per_sec": round(total / dt, 1)}))
        spark.stop()
        return

    if JOB == "semdedup":
        import numpy as np
        from pyspark.sql import functions as F

        from cuspatial_spark.similarity import semantic_dedup

        dim = 64
        i = F.col("id")
        # xxhash64-mixed coordinates: iid-uniform-ish in [-1, 1), so
        # clusters balance across the K centroids and the sweep load
        # spreads — a linear-congruential law here repeats with short
        # period and degenerates the benchmark into duplicate soup
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(i, j), F.lit(2000)).cast("double") / 1000.0
                - 1.0
            ),
        )
        emb = (
            spark.range(0, N_SEMDEDUP, 1, cpus * 4)
            .select(i.alias("vec_id"), vec.alias("embedding"))
            .cache()
        )
        emb.count()
        rng = np.random.default_rng(11)
        cts = rng.uniform(-1.0, 1.0, size=(K_SEMDEDUP, dim))

        def job():
            return semantic_dedup(
                emb, centroids=cts, threshold=0.95
            ).agg(F.sum(F.col("is_kept").cast("long")).alias("kept"))

        job().collect()  # warmup
        runs = []
        kept = 0
        for _ in range(RUNS):
            t0 = time.perf_counter()
            kept = job().collect()[0]["kept"]
            runs.append(time.perf_counter() - t0)
        dt = min(runs)
        print(json.dumps({"cpus": cpus, "seconds": round(dt, 3),
                          "all_runs": [round(r, 3) for r in runs],
                          "rows": N_SEMDEDUP, "kept": int(kept),
                          "clusters": K_SEMDEDUP,
                          "rows_per_sec": round(N_SEMDEDUP / dt, 1)}))
        spark.stop()
        return

    if JOB == "traindata":
        from pyspark.sql import functions as F

        from cuspatial_spark.textops.decontam import decontaminate
        from cuspatial_spark.textops.packing import pack_sequences

        corpus = (
            spark.range(0, N_TRAIN, 1, cpus * 4)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    # 7 shared lead tokens: every 8-window crossing the
                    # lead includes the per-doc phrase id, so overlap
                    # with the eval set is ONLY via matching phrase ids
                    F.lit("alpha beta gamma delta epsilon zeta eta phrase"),
                    (F.col("id") % 5003).cast("string"),
                    F.lit(" iota kappa lambda mu nu xi omicron pi tail "),
                    (F.col("id") % 211).cast("string"),
                ).alias("text"),
            )
            .cache()
        )
        corpus.count()
        # eval phrase ids < 400 -> ~8% of corpus docs contaminated
        ev = (
            spark.range(0, 2000)
            .select(
                F.concat(
                    F.lit("evaltok "),
                    F.lit("alpha beta gamma delta epsilon zeta eta phrase"),
                    (F.col("id") % 400).cast("string"),
                ).alias("text")
            )
        )

        def job():
            flags = decontaminate(corpus, ev, n=8)
            counts = (
                corpus.join(
                    flags.where(~F.col("contaminated")).select("doc_id"),
                    "doc_id",
                    "left_semi",
                )
                .select(
                    "doc_id",
                    F.size(F.split("text", " +")).cast("long").alias("n_tokens"),
                )
            )
            return pack_sequences(counts, seq_len=512).agg(
                F.sum("n_seqs").alias("seqs"), F.max("seq_last").alias("last")
            )

        job().collect()  # warmup
        runs = []
        last = 0
        for _ in range(RUNS):
            t0 = time.perf_counter()
            last = job().collect()[0]["last"]
            runs.append(time.perf_counter() - t0)
        dt = min(runs)
        print(json.dumps({"cpus": cpus, "seconds": round(dt, 3),
                          "all_runs": [round(r, 3) for r in runs],
                          "rows": N_TRAIN, "last_seq": int(last),
                          "rows_per_sec": round(N_TRAIN / dt, 1)}))
        spark.stop()
        return

    polys = _scaled_polygons()
    pts = _points(spark, N_PAGES, partitions=cpus * 4).cache()
    pts.count()  # materialize input before timing

    job = point_in_polygon_join(
        pts, polys, **AOI, max_depth=12, tile_level=5, keep_columns=["page_id"],
    )
    job.count()  # warmup: python workers, codegen, broadcast
    runs = []
    pairs = 0
    for _ in range(RUNS):
        t0 = time.perf_counter()
        pairs = job.count()
        runs.append(time.perf_counter() - t0)
    dt = min(runs)
    print(json.dumps({"cpus": cpus, "seconds": round(dt, 3),
                      "all_runs": [round(r, 3) for r in runs], "pairs": pairs,
                      "rows": N_PAGES, "rows_per_sec": round(N_PAGES / dt, 1),
                      "pairs_per_sec": round(pairs / dt, 1)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        run_child(int(sys.argv[2]))
        return
    from bench import _cpu_gauge

    n, m = min(LEVELS), max(LEVELS)
    # hardware capacity gauge at BOTH parallelism levels, before and
    # after the measured runs: this VM does not deliver m/n-x compute
    # for an m/n-x vCPU step (virtualized frequency/steal + external
    # tenants; see BASELINE.md calibrations), so raw wall-clock
    # efficiency is bounded by hw_capacity_ratio/(m/n), not by 1.
    hw = {c: _cpu_gauge(c, dur=0.4) for c in (n, m)}
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    for c in (n, m):
        hw[c] = max(hw[c], _cpu_gauge(c, dur=0.4))
    eff = results[n]["seconds"] / ((m / n) * results[m]["seconds"])
    cap_ratio = hw[m] / hw[n]
    print(json.dumps({
        "job": {
            "pip": "tile-filtered point-in-polygon join (cached input)",
            "extract": "HTML->text extraction (cached input)",
            "bpe": "merge-table BPE tokenization (cached input)",
            "semdedup": "SemDeDup cluster sweep (cached input)",
            "traindata": "decontamination + sequence packing (cached input)",
        }[JOB],
        "rows": {"pip": N_PAGES, "extract": N_EXTRACT, "bpe": N_BPE,
                 "semdedup": N_SEMDEDUP, "traindata": N_TRAIN}[JOB],
        f"local[{n}]": results[n],
        f"local[{m}]": results[m],
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8",
        "pass": eff >= 0.8,
        "hw_capacity_gauge": {str(c): round(hw[c], 1) for c in (n, m)},
        "hw_capacity_ratio": round(cap_ratio, 3),
        "capacity_normalized_efficiency": round(
            results[n]["seconds"] / results[m]["seconds"] / cap_ratio, 3
        ),
    }))


if __name__ == "__main__":
    main()
