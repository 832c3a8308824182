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
