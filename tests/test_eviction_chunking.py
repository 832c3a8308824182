"""A8 eviction action (CleanMRFCache delete pass) and the -queuelength
task-granularity knob."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from optimizerasters_spark.engine import Engine, JobConf
from optimizerasters_spark.operators import windows


def test_apply_eviction_deletes_selected_victims(spark, tmp_path):
    """Oldest-first cumulative selection until 30% of bytes are freed,
    then the delete pass removes exactly the victims."""
    cache = tmp_path / "cache"
    cache.mkdir()
    rows = []
    for i in range(20):
        p = cache / f"f{i:02d}.mrf_cache"
        p.write_bytes(b"x" * 100)
        rows.append((str(p), 100, i))  # atime ascending with i
    df = spark.createDataFrame(rows, "path string, size bigint, atime bigint")
    victims = windows.cumulative_until_target(
        df, ["atime", "path"], "size", target_num=3, target_den=10)
    victim_paths = {r["path"] for r in victims.select("path").collect()}
    assert len(victim_paths) == 6  # floor(20 * 0.3)
    n = windows.apply_eviction(victims)
    assert n == 6
    remaining = {str(p) for p in cache.iterdir()}
    assert remaining == {str(cache / f"f{i:02d}.mrf_cache")
                         for i in range(20)} - victim_paths
    # idempotent: re-applying on already-deleted paths removes nothing
    assert windows.apply_eviction(victims) == 0


def test_queue_length_bounds_task_granularity(spark, sf_dir, tmp_path):
    """queue_length=N must cap pages per write task: the batch output
    directory carries ceil(n_pages / N) partitions."""
    wd = str(tmp_path / "qljob")
    eng = Engine(JobConf(sf_dir=sf_dir, workdir=wd, queue_length=50))
    res = eng.run(spark)
    assert res["ledger"].where(F.col("processed") != "yes").count() == 0
    batch_dirs = [d for d in os.listdir(os.path.join(wd, "page_tiles"))
                  if d.startswith("batch=")]
    assert batch_dirs
    parts = [f for f in os.listdir(
        os.path.join(wd, "page_tiles", batch_dirs[0]))
        if f.startswith("part-")]
    n_pages = 500  # sf0.001 documents
    assert len(parts) == -(-n_pages // 50)
