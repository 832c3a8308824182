"""Per-partition lineage + row-count metrics (north_rule requirement).

The reference records per-file wall times via the TimeIt decorator
(OptimizeRasters.py:245-282) and flushes them to CSV (:2094-2108). The
Spark analog: per-STAGE, per-PARTITION row counts captured with
``spark_partition_id()`` plus driver-side wall clock, appended to a
metrics parquet. Partition counts come from a cheap count-only pass over
the stage input (column-pruned scan — no payload movement).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = ("run_id STRING, stage STRING, partition_id INT, "
                  "rows BIGINT, wall_ms BIGINT")


def metrics_path(workdir: str) -> str:
    return os.path.join(workdir, "metrics")


def partition_counts(df: DataFrame) -> DataFrame:
    return (df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows")))


def record_stage(spark: SparkSession, workdir: str, run_id: str,
                 stage: str, counts: list[tuple[int, int]],
                 wall_ms: int) -> None:
    rows = [(run_id, stage, int(p), int(n), int(wall_ms))
            for (p, n) in counts] or [(run_id, stage, -1, 0, int(wall_ms))]
    out = spark.createDataFrame(rows, METRICS_SCHEMA)
    out.write.mode("append").parquet(metrics_path(workdir))


class StageTimer:
    """Context manager: time a stage and append its lineage rows.

    Partition counts are SNAPSHOTTED at stage entry (one column-pruned
    count job) — the stage body may mutate inputs the lazy plan references
    (ledger swap), so deferring evaluation would read torn state."""

    def __init__(self, spark: SparkSession, workdir: str, run_id: str,
                 stage: str, df: DataFrame):
        self.spark, self.workdir = spark, workdir
        self.run_id, self.stage = run_id, stage
        self._counts = [(r["partition_id"], r["rows"])
                        for r in partition_counts(df).collect()]

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            wall = int((time.perf_counter() - self.t0) * 1000)
            record_stage(self.spark, self.workdir, self.run_id, self.stage,
                         self._counts, wall)
        return False


def read_metrics(spark: SparkSession, workdir: str) -> DataFrame | None:
    p = metrics_path(workdir)
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p)
