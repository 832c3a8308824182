"""Window / ordered operators (SURVEY.md §2.5-2.6).

  * A8 free-space target scan — CleanMRFCache.py:168-196: oldest-first
    cumulative size until the target is freed -> running SUM() OVER
    (ORDER BY ...) + threshold. Money/size kept in integer cents so the
    cumulative comparison is exact and engine-independent.
  * A7 per-file timing pivot — TimeIt (:245-282) + writeTimeItReport
    (:2094-2108): rows of (entity, stage, seconds) -> one row per entity
    with a column per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def cumulative_until_target(events: DataFrame, order_cols: list[str],
                            amount_col: str, target_num: int,
                            target_den: int) -> DataFrame:
    """Rows (in order) whose running total stays <= total * num/den.

    Exact integer arithmetic: amounts must already be integral (cents).
    A global ordered window is a single-partition sort — correct for the
    reference's cache-clean use case (one cache dir); for distributed use
    the caller pre-partitions by cache root and orders within."""
    w = Window.orderBy(*[F.col(c) for c in order_cols]) \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy()
    return (events
            .withColumn("cum_amount", F.sum(amount_col).over(w))
            .withColumn("total_amount", F.sum(amount_col).over(tot))
            .where(F.col("cum_amount") * target_den <=
                   F.col("total_amount") * target_num)
            .drop("total_amount"))


def cumulative_until_target_distributed(events: DataFrame,
                                        order_cols: list[str],
                                        amount_col: str, target_num: int,
                                        target_den: int) -> DataFrame:
    """Distributed form of ``cumulative_until_target`` — identical
    rows, NO partition-less window.

    Two-phase prefix sum: range-partition on the order columns, run the
    running sum per partition (the window is partitioned by
    spark_partition_id, so each partition sorts independently —
    parallel), then add per-partition offsets computed from the tiny
    totals table (O(#partitions) rows; its cumulative window is bounded
    by the shuffle-partition count). The range Exchange feeds both the
    local-cumsum branch and the totals branch, so Catalyst computes it
    once (ReusedExchange). Use this when the ordered relation is large
    (fleet-wide cache eviction across cache roots); the simple form
    remains for the reference's one-cache-dir case."""
    ordered = [F.col(c) for c in order_cols]
    staged = (events.repartitionByRange(*ordered)
              .withColumn("_pid", F.spark_partition_id()))
    w_local = Window.partitionBy("_pid").orderBy(*ordered) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = staged.withColumn("_local_cum",
                              F.sum(amount_col).over(w_local))
    totals = staged.groupBy("_pid").agg(F.sum(amount_col).alias("_t"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding,
                                               -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_t").over(Window.partitionBy()).alias("_total"))
    return (local.join(F.broadcast(offsets), "_pid")
            .withColumn("cum_amount", F.col("_off") + F.col("_local_cum"))
            .where(F.col("cum_amount") * target_den <=
                   F.col("_total") * target_num)
            .drop("_pid", "_local_cum", "_off", "_total"))


def apply_eviction(victims: DataFrame, path_col: str = "path") -> int:
    """A8 action: DELETE the selected victim files (CleanMRFCache.py
    :168-196 removes oldest-first until the space target is met; the
    selection is ``cumulative_until_target``, this applies it).

    foreachPartition — a distributed side-effect sink: each executor
    deletes its shard of paths; genuinely imperative work, so this is
    one of the few sanctioned non-DataFrame spots. Missing files are
    tolerated (another worker or the OS may have raced us — the
    reference ignores unlink errors the same way). Returns the number
    of files actually removed (accumulator-counted)."""
    sc = victims.sparkSession.sparkContext
    acc = sc.accumulator(0)

    def rm(rows):
        import os
        n = 0
        for r in rows:
            try:
                os.remove(r[path_col])
                n += 1
            except FileNotFoundError:
                pass
        acc.add(n)

    victims.select(path_col).foreachPartition(rm)
    return acc.value


def stage_pivot(metrics: DataFrame, entity_col: str, stage_col: str,
                amount_col: str, stages: list[str]) -> DataFrame:
    """A7: explicit stage list keeps the plan static (no extra distinct
    job to discover pivot values)."""
    return (metrics.groupBy(entity_col)
            .pivot(stage_col, stages)
            .sum(amount_col)
            .na.fill(0))


def asof_join(queries: DataFrame, versions: DataFrame,
              key: str = "url", qts_col: str = "q_epoch",
              vts_col: str = "warc_epoch",
              version_id: str = "doc_id") -> DataFrame:
    """As-of join (SURVEY.md J6 done for real): each query row gets the
    LATEST version at or before its timestamp (ties -> lowest id), NULL
    when no version qualifies.

    Shape: one equi-join on the key + ONE max_by aggregation per
    (key, query-ts) — the timestamp predicate folds into the max_by key
    (NULL-keyed rows are skipped), so the shuffle carries one row per
    (key, query) per map task after partial combine; never a window
    over every (query x version) pair and never a range θ-join."""
    q = queries.select(key, qts_col).dropDuplicates([key, qts_col])
    j = q.join(versions, key, "left")
    valid = F.col(vts_col) <= F.col(qts_col)
    # (ts, -id) packed into one BIGINT so the tiebreak is one orderable
    # key on any engine (epoch * 1e8 dominates any id < 1e8)
    ord_key = F.when(valid, F.col(vts_col) * F.lit(100000000) -
                     F.col(version_id))
    picked = F.max_by(
        F.struct(F.col(version_id).alias("vid"),
                 F.col(vts_col).alias("vts")), ord_key)
    return (j.groupBy(key, qts_col)
            .agg(picked.alias("_m"))
            .select(key, qts_col,
                    F.col("_m.vid").alias("matched_id"),
                    F.col("_m.vts").alias("matched_epoch")))
