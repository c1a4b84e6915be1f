"""Job runner: checkpoint/resume + per-partition lineage and metrics.

The 10^12-document job shape (BASELINE north_rule) needs three ops
properties the plain DataFrame API doesn't give you:

1. **Resumability** — the input keyspace is split into hash buckets;
   each bucket is one self-contained write whose completion is recorded
   in a manifest file next to the output.  A re-run skips completed
   buckets, so a preempted 100 TB job continues where it stopped.
   (On Iceberg this would be snapshot-based; parquet + manifest keeps
   the same contract without the table-format dependency.)
2. **Lineage** — every manifest entry records the bucket predicate,
   input fingerprint, row counts and wall time: which output partition
   came from which input slice, auditable after the fact.
3. **Kernel metrics** — Spark accumulators incremented inside the
   Arrow-batched kernels (rows in, pairs out, kernel seconds), read
   back per job and written into the manifest.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KernelMetrics:
    """Accumulator bundle passed into kernel map functions."""

    rows_in: "object"
    rows_out: "object"
    kernel_sec: "object"

    @classmethod
    def create(cls, spark: SparkSession) -> "KernelMetrics":
        sc = spark.sparkContext
        return cls(sc.accumulator(0), sc.accumulator(0), sc.accumulator(0.0))

    def wrap(self, map_fn):
        """Wrap a mapInPandas generator fn so every batch updates the
        accumulators (works inside Python workers)."""
        rows_in, rows_out, kernel_sec = self.rows_in, self.rows_out, self.kernel_sec

        def wrapped(batches):
            def counted():
                for pdf in batches:
                    rows_in.add(len(pdf))
                    yield pdf

            t0 = time.perf_counter()
            for out in map_fn(counted()):
                rows_out.add(len(out))
                yield out
            kernel_sec.add(time.perf_counter() - t0)

        return wrapped

    def snapshot(self) -> dict:
        return {
            "rows_in": self.rows_in.value,
            "rows_out": self.rows_out.value,
            "kernel_sec": round(self.kernel_sec.value, 3),
        }


class CheckpointedJob:
    """Bucket-wise checkpointed writer with a lineage manifest.

    >>> job = CheckpointedJob(spark, out_dir, key_col="event_id", n_buckets=16)
    >>> job.run(lambda bucket_df: my_pipeline(bucket_df))   # resumable
    """

    def __init__(
        self,
        spark: SparkSession,
        output_dir: str,
        key_col: str,
        n_buckets: int = 16,
        input_fingerprint: str = "",
    ):
        self.spark = spark
        self.output_dir = output_dir
        self.key_col = key_col
        self.n_buckets = n_buckets
        self.input_fingerprint = input_fingerprint
        self.manifest_path = os.path.join(output_dir, "_manifest.jsonl")
        os.makedirs(output_dir, exist_ok=True)

    def completed_buckets(self) -> set[int]:
        done = set()
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    entry = json.loads(line)
                    if entry.get("status") == "ok":
                        done.add(entry["bucket"])
        return done

    def run(self, source: DataFrame, transform, metrics: KernelMetrics | None = None) -> dict:
        """Run transform(bucket_df) -> DataFrame for every incomplete
        bucket; each bucket's output lands in its own subdirectory and
        is fsync'd before the manifest records it (write-then-commit)."""
        done = self.completed_buckets()
        ran = []
        bucketed = source.withColumn(
            "__bucket", F.pmod(F.hash(F.col(self.key_col)), F.lit(self.n_buckets))
        )
        for b in range(self.n_buckets):
            if b in done:
                continue
            t0 = time.perf_counter()
            part = bucketed.where(F.col("__bucket") == b).drop("__bucket")
            out = transform(part)
            path = os.path.join(self.output_dir, f"bucket={b}")
            out.write.mode("overwrite").parquet(path)
            n = self.spark.read.parquet(path).count()
            entry = {
                "bucket": b,
                "status": "ok",
                "rows": n,
                "seconds": round(time.perf_counter() - t0, 3),
                "predicate": f"pmod(hash({self.key_col}), {self.n_buckets}) = {b}",
                "input_fingerprint": self.input_fingerprint,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            if metrics is not None:
                entry["kernel_metrics"] = metrics.snapshot()
            with open(self.manifest_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
                f.flush()
                os.fsync(f.fileno())
            ran.append(b)
        return {"ran": ran, "skipped": sorted(done), "manifest": self.manifest_path}
