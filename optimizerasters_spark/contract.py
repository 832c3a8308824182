"""Driver contract: queries() + oracle_sql() (see __spark_entry__.py).

Every operator from SURVEY.md §2 that is implemented gets BOTH a Spark
DataFrame callable and a DuckDB ANSI-SQL oracle here. Column names/types are
aliased identically on both sides (the driver hashes values after sorting
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimizerasters_spark import tiling
from optimizerasters_spark.pages import (
    BOUNDARIES_CTE, HOT_LAT_MD, HOT_LON_MD, PAGES_CTE, WORLD_H, WORLD_W,
    synth_boundaries, synth_pages,
)
from optimizerasters_spark.operators import dedup, spatial

BLOCK = tiling.DEFAULT_BLOCK_SIZE
PYRAMID_LEVELS = [0, 2, 4, 6, 8, 10]
KNN_QUERIES = [(0, HOT_LON_MD[0], HOT_LAT_MD[0]),
               (1, HOT_LON_MD[1], HOT_LAT_MD[1]),
               (2, HOT_LON_MD[2], HOT_LAT_MD[2])]
KNN_K = 5
KNN_RADIUS_MD = 1000

_W = f"WITH {PAGES_CTE.strip()}"
_WB = f"WITH {PAGES_CTE.strip()}, {BOUNDARIES_CTE.strip()}"

_TILE_SQL = (
    f"CAST(FLOOR(FLOOR(lon_md * {WORLD_W} / 360000) / {BLOCK}) AS INT) AS tile_x, "
    f"CAST(FLOOR(FLOOR(lat_md * {WORLD_H} / 170000) / {BLOCK}) AS INT) AS tile_y"
)


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

def q_pages_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized input itself (parity anchor for everything else)."""
    return synth_pages(spark, sf_dir).select(
        "doc_id", "url", "warc_epoch", "lang", "lon_md", "lat_md")


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = synth_pages(spark, sf_dir)
    return spatial.with_tiles(p).select("doc_id", "tile_x", "tile_y")


def q_tile_counts_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spatial.with_tiles(synth_pages(spark, sf_dir))
    out = spatial.tile_counts_at_levels(p, PYRAMID_LEVELS)
    return out.select(F.col("level").cast("int").alias("level"),
                      F.col("tile_x").cast("int").alias("tile_x"),
                      F.col("tile_y").cast("int").alias("tile_y"),
                      F.col("page_count").cast("bigint").alias("page_count"))


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = synth_pages(spark, sf_dir)
    b = synth_boundaries(spark)
    return spatial.pip_join(p, b, how="inner").select("doc_id", "polygon_id")


def q_pip_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = synth_pages(spark, sf_dir)
    b = synth_boundaries(spark)
    return spatial.pip_join(p, b, how="left").select("doc_id", "polygon_id")


def q_knn_per_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = synth_pages(spark, sf_dir)
    out = spatial.knn_per_query(p, KNN_QUERIES, k=KNN_K,
                                radius_md=KNN_RADIUS_MD)
    return out.select(F.col("query_id").cast("bigint"),
                      F.col("knn_rank").cast("int"),
                      F.col("doc_id").cast("bigint"),
                      F.col("dist2").cast("bigint"))


def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = synth_pages(spark, sf_dir)
    dups = (p.where(F.col("doc_id") % 100 == 0)
            .withColumn("warc_epoch", F.col("warc_epoch") - 86400)
            .withColumn("doc_id", F.col("doc_id") + 1000000))
    allp = p.unionByName(dups)
    out = dedup.dedup_latest(allp)
    return out.select("url", "warc_epoch",
                      F.col("doc_id").cast("bigint").alias("doc_id"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pages_synth": q_pages_synth,
    "tile_assign": q_tile_assign,
    "tile_counts_pyramid": q_tile_counts_pyramid,
    "pip_join": q_pip_join,
    "pip_join_left": q_pip_join_left,
    "knn_per_cell": q_knn_per_cell,
    "dedup_latest": q_dedup_latest,
}


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

ORACLES: dict[str, str] = {
    "pages_synth": f"""
{_W}
SELECT doc_id, url, warc_epoch, lang, lon_md, lat_md FROM pages
""",
    "tile_assign": f"""
{_W}
SELECT doc_id, {_TILE_SQL} FROM pages
""",
    "tile_counts_pyramid": f"""
{_W},
t0 AS (SELECT {_TILE_SQL} FROM pages)
SELECT CAST(l.lv AS INT) AS level,
       CAST(t.tile_x >> l.lv AS INT) AS tile_x,
       CAST(t.tile_y >> l.lv AS INT) AS tile_y,
       CAST(COUNT(*) AS BIGINT) AS page_count
FROM t0 t CROSS JOIN (VALUES (0),(2),(4),(6),(8),(10)) l(lv)
GROUP BY 1, 2, 3
""",
    "pip_join": f"""
{_WB}
SELECT p.doc_id, b.polygon_id
FROM pages p JOIN boundaries b
  ON p.lon_md >= b.lon_lo_md AND p.lon_md < b.lon_hi_md
 AND p.lat_md >= b.lat_lo_md AND p.lat_md < b.lat_hi_md
""",
    "pip_join_left": f"""
{_WB}
SELECT p.doc_id, b.polygon_id
FROM pages p LEFT JOIN boundaries b
  ON p.lon_md >= b.lon_lo_md AND p.lon_md < b.lon_hi_md
 AND p.lat_md >= b.lat_lo_md AND p.lat_md < b.lat_hi_md
""",
    "knn_per_cell": f"""
{_W},
q(query_id, qlon_md, qlat_md) AS (
  VALUES (0, {HOT_LON_MD[0]}, {HOT_LAT_MD[0]}),
         (1, {HOT_LON_MD[1]}, {HOT_LAT_MD[1]}),
         (2, {HOT_LON_MD[2]}, {HOT_LAT_MD[2]})),
cand AS (
  SELECT q.query_id, p.doc_id,
         (p.lon_md - q.qlon_md) * (p.lon_md - q.qlon_md) +
         (p.lat_md - q.qlat_md) * (p.lat_md - q.qlat_md) AS dist2
  FROM pages p CROSS JOIN q
  WHERE p.lon_md BETWEEN q.qlon_md - {KNN_RADIUS_MD} AND q.qlon_md + {KNN_RADIUS_MD}
    AND p.lat_md BETWEEN q.qlat_md - {KNN_RADIUS_MD} AND q.qlat_md + {KNN_RADIUS_MD}
    AND (p.lon_md - q.qlon_md) * (p.lon_md - q.qlon_md) +
        (p.lat_md - q.qlat_md) * (p.lat_md - q.qlat_md)
        <= {KNN_RADIUS_MD * KNN_RADIUS_MD})
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(knn_rank AS INT) AS knn_rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(dist2 AS BIGINT) AS dist2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dist2, doc_id) AS knn_rank
      FROM cand)
WHERE knn_rank <= {KNN_K}
""",
    "dedup_latest": f"""
{_W},
allp AS (
  SELECT url, warc_epoch, doc_id FROM pages
  UNION ALL
  SELECT url, warc_epoch - 86400 AS warc_epoch,
         doc_id + 1000000 AS doc_id
  FROM pages WHERE doc_id % 100 = 0)
SELECT url, warc_epoch, CAST(doc_id AS BIGINT) AS doc_id
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY url
                                   ORDER BY warc_epoch DESC, doc_id) AS rn
      FROM allp)
WHERE rn = 1
""",
}
