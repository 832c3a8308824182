#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric = wall seconds of the flagship pipeline (dedup -> tile ->
PIP join -> per-tile counts); also reports pages/sec throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run_noop_count(df):
    return df.count()


def main() -> None:
    from optimizerasters_spark import contract
    from optimizerasters_spark.operators import dedup, spatial
    from optimizerasters_spark.pages import synth_boundaries, synth_pages
    from optimizerasters_spark.session import get_spark

    spark = get_spark("oraspark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=str(max(int(CPUS) * 2, 8)))
    spark.sparkContext.setLogLevel("ERROR")

    n_pages = synth_pages(spark, SF_DIR).count()  # warms up JVM + file scan

    timings: dict[str, float] = {}

    def bench(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # flagship end-to-end: dedup -> tile -> PIP -> aggregate
    def flagship():
        pages = dedup.dedup_latest(synth_pages(spark, SF_DIR))
        tiled = spatial.with_tiles(pages)
        joined = spatial.pip_join(tiled, synth_boundaries(spark), how="inner")
        from pyspark.sql import functions as F
        (joined.groupBy("polygon_id", "tile_x", "tile_y")
         .agg(F.count(F.lit(1)).alias("page_count"))
         .write.mode("overwrite").format("noop").save())

    bench("flagship_e2e", flagship)

    for qname in ["tile_assign", "tile_counts_pyramid", "pip_join",
                  "knn_per_cell", "dedup_latest"]:
        q = contract.QUERIES[qname]
        bench(qname, lambda q=q: q(spark, SF_DIR)
              .write.mode("overwrite").format("noop").save())

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "flagship_pipeline_sec",
        "value": timings["flagship_e2e"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "total_sec": total,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / timings["flagship_e2e"], 1),
        "cpus": int(CPUS),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
