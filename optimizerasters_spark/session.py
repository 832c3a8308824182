"""SparkSession factory with scale-oriented defaults.

The reference (OptimizeRasters.py:3848, :6692-6709) hand-rolls a 10-thread
pool; here parallelism is Spark's job. The confs below are the ones that
matter at 100 TB: AQE (runtime coalesce + skew-join splitting), a shuffle
partition count sized for the local harness but overridable via
``spark.sql.shuffle.partitions`` at submit time, and Arrow for every
pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "optimizerasters-spark",
              master: str | None = None,
              shuffle_partitions: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the tiling engine.

    On a real cluster this is invoked via ``spark-submit --py-files`` and
    ``master`` is left to the submitter; locally it defaults to
    ``local[$SPARK_GRAFT_CPUS]`` (or all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions",
                shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
