"""Extra benchmark harness for optimization work (guide §1).

NOT part of the driver contract — bench.py is frozen.  This harness:
  * times any subset of headline queries with the noop sink, N repeats,
    min-reduced (same methodology as bench.py);
  * optionally dumps .explain("formatted") for each query to a directory.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plans OUTDIR] [q1 q2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: bench.py HEADLINE)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="", help="filename suffix for plan files, e.g. _before")
    ap.add_argument("--no-time", action="store_true", help="plans only, skip timing")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import bench as B
    import __spark_entry__ as E

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cuspatial_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "250000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    spark.read.parquet(f"{args.sf}/events.parquet").count()
    spark.range(1000).mapInPandas(lambda it: it, schema="id: long").count()

    names = args.queries or B.HEADLINE
    qs = E.queries()
    timings = {}
    samples = {}
    for name in names:
        df = qs[name](spark, args.sf)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best, ss = None, []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            ss.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        samples[name] = ss
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {best:.3f}  {ss}", file=sys.stderr)

    out = {
        "sf_dir": args.sf,
        "reps": args.reps,
        "total_min_sec": round(sum(timings.values()), 3),
        "queries_min": timings,
        "queries_samples": samples,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
