"""Clean-window probe for the lsh_pairs/minhash drift question
(round-4 VERDICT task 6): time ONLY those two queries (plus the cpu
gauge) and fold the mins into BENCH_CALIBRATION.json.  Run
opportunistically across a session; the min over runs is the
best-window estimate this box can give."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = (sys.argv[1] if len(sys.argv) > 1 else "minhash,lsh_pairs").split(",")


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from bench import CALIB_PATH, _cpu_gauge

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-drift")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.range(1000).mapInPandas(lambda it: it, schema="id: long").count()

    qs = E.queries()
    gauge = _cpu_gauge(32)
    out = {"gauge": round(gauge, 1)}
    for name in QUERIES:
        df = qs[name](spark, SF_DIR)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)

    calib = json.load(open(CALIB_PATH))
    qb = calib["query_best_sec"]
    for name in QUERIES:
        if name not in qb or out[name] < qb[name]:
            qb[name] = out[name]
    best_g = calib.get("gauge_best_iters_per_sec")
    calib["gauge_best_iters_per_sec"] = round(max(best_g or 0, gauge), 1)
    with open(CALIB_PATH, "w") as f:
        json.dump(calib, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
