"""Checkpoint / lineage ledger — the `.orjob` re-imagined as a table.

Reference semantics (studied at OptimizeRasters.py):
  * row statuses COPIED/PROCESSED/UPLOADED in {'yes','no',''} (:100-110)
  * dedup on add (Report.addFile :1908-1917)
  * whole-file rewrite on snapshot (Report.write :2068-2092)
  * resume skips rows already 'yes' (:1807-1815); retryall clears (:2001-2011)

Here the ledger is a parquet table keyed by ``url``. Updates are
read-merge-overwrite with an atomic directory swap — the local stand-in for
an Iceberg ``MERGE INTO`` (which is the cluster deployment path; the call
sites are isolated in this module so swapping the storage layer is a
one-file change).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = ("url STRING, copied STRING, processed STRING, "
                 "uploaded STRING, updated_run STRING")
STATUS_COLS = ("copied", "processed", "uploaded")
YES, NO, UNDEF = "yes", "no", ""  # CRPT_YES/NO/UNDEFINED


def ledger_path(workdir: str) -> str:
    return os.path.join(workdir, "ledger")


def _current_version_dir(workdir: str) -> str | None:
    base = ledger_path(workdir)
    ptr = os.path.join(base, "CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    d = os.path.join(base, name)
    return d if os.path.isdir(d) else None


def read_ledger(spark: SparkSession, workdir: str) -> DataFrame | None:
    d = _current_version_dir(workdir)
    if d is None:
        return None
    return spark.read.parquet(d)


def init_ledger(spark: SparkSession, workdir: str, keys: DataFrame,
                key_col: str = "url") -> DataFrame:
    """Create the ledger with every key pending (''), deduplicated —
    Report.addFile's duplicate rejection."""
    led = (keys.select(F.col(key_col).alias("url")).dropDuplicates(["url"])
           .withColumn("copied", F.lit(UNDEF))
           .withColumn("processed", F.lit(UNDEF))
           .withColumn("uploaded", F.lit(UNDEF))
           .withColumn("updated_run", F.lit("init")))
    _atomic_overwrite(led, ledger_path(workdir))
    return read_ledger(spark, workdir)


def merge_status(spark: SparkSession, workdir: str, done_keys: DataFrame,
                 status_col: str, value: str = YES,
                 run_id: str = "") -> None:
    """MERGE: set ``status_col=value`` for the given keys (by url).
    Read-merge-swap; Iceberg MERGE INTO at cluster scale."""
    assert status_col in STATUS_COLS
    cur = read_ledger(spark, workdir)
    upd = done_keys.select(F.col("url")).dropDuplicates(["url"]) \
        .withColumn("_hit", F.lit(1))
    merged = (cur.join(upd, "url", "left")
              .withColumn(status_col,
                          F.when(F.col("_hit") == 1, F.lit(value))
                           .otherwise(F.col(status_col)))
              .withColumn("updated_run",
                          F.when(F.col("_hit") == 1, F.lit(run_id))
                           .otherwise(F.col("updated_run")))
              .drop("_hit"))
    _atomic_overwrite(merged, ledger_path(workdir))


def upsert_status(spark: SparkSession, workdir: str, done_keys: DataFrame,
                  status_col: str, value: str = YES,
                  run_id: str = "") -> None:
    """MERGE with insert: keys absent from the ledger are added (other
    statuses ''), present keys get ``status_col=value``. The streaming
    ingest path uses this — new pages appear mid-stream."""
    assert status_col in STATUS_COLS
    cur = read_ledger(spark, workdir)
    upd = done_keys.select("url").dropDuplicates(["url"])
    fresh = upd.withColumn("copied", F.lit(UNDEF)) \
               .withColumn("processed", F.lit(UNDEF)) \
               .withColumn("uploaded", F.lit(UNDEF)) \
               .withColumn("updated_run", F.lit(run_id))
    fresh = fresh.withColumn(status_col, F.lit(value))
    if cur is None:
        _atomic_overwrite(fresh, ledger_path(workdir))
        return
    kept = cur.join(upd, "url", "left_anti")
    merged_existing = (cur.join(upd.withColumn("_hit", F.lit(1)), "url")
                       .withColumn(status_col, F.lit(value))
                       .withColumn("updated_run", F.lit(run_id))
                       .drop("_hit"))
    _atomic_overwrite(kept.unionByName(merged_existing)
                      .unionByName(fresh.join(cur.select("url"), "url",
                                              "left_anti")),
                      ledger_path(workdir))


def clear_statuses(spark: SparkSession, workdir: str) -> None:
    """retryall (reference :2001-2011): reset every status to pending."""
    cur = read_ledger(spark, workdir)
    if cur is None:
        return
    reset = cur
    for c in STATUS_COLS:
        reset = reset.withColumn(c, F.lit(UNDEF))
    _atomic_overwrite(reset, ledger_path(workdir))


def pending(work: DataFrame, led: DataFrame | None,
            status_col: str = "processed", key_col: str = "url"
            ) -> DataFrame:
    """Anti-join: rows whose ledger status is not 'yes'."""
    if led is None:
        return work
    done = led.where(F.col(status_col) == YES).select("url")
    return work.join(done, work[key_col] == done["url"], "left_anti")


def has_failures(led: DataFrame) -> bool:
    """Report.hasFailures (:2058-2066)."""
    cond = None
    for c in STATUS_COLS:
        p = F.col(c) == NO
        cond = p if cond is None else (cond | p)
    return led.where(cond).limit(1).count() > 0


def _atomic_overwrite(df: DataFrame, path: str) -> None:
    """Commit a new IMMUTABLE snapshot version and flip the CURRENT
    pointer atomically (os.replace) — the local twin of an Iceberg
    snapshot commit. Plans built against older versions keep reading
    their own immutable directories (reader isolation); a crash between
    write and pointer flip leaves the previous version current (no torn
    state). ``vacuum()`` reclaims superseded versions between runs."""
    os.makedirs(path, exist_ok=True)
    vname = f"v-{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(os.path.join(path, vname))
    ptr_tmp = os.path.join(path, f".CURRENT.tmp-{uuid.uuid4().hex[:6]}")
    with open(ptr_tmp, "w") as f:
        f.write(vname)
    os.replace(ptr_tmp, os.path.join(path, "CURRENT"))


def vacuum(workdir: str) -> int:
    """Drop all snapshot versions except CURRENT. Safe between runs
    (no live plans) — the Iceberg expire-snapshots analog."""
    base = ledger_path(workdir)
    if not os.path.isdir(base):
        return 0
    cur = _current_version_dir(workdir)
    cur_name = os.path.basename(cur) if cur else None
    n = 0
    for name in os.listdir(base):
        if name == "CURRENT" or name == cur_name:
            continue
        full = os.path.join(base, name)
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
            n += 1
    return n
