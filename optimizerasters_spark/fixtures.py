"""Deterministic auxiliary fixtures derived from driver tables (FIXTURES.md
T3/T4): a synthetic file listing (paths/stems/extensions/sizes), a
checkpoint ledger with pre-seeded statuses, and a raster-extent matrix.
Integer-arithmetic only — Spark and DuckDB derive identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXTS = ["tif", "mrf", "ovr", "aux.xml", "idx", "jpg", "til", "TIF", "rrd",
        "rpb", "ige"]

# pyramid-formula edge matrix (FIXTURES.md T3)
WIDTHS = [256, 511, 512, 513, 1024, 1500, 4096, 40000, 1]
BLOCKS = [512, 256, 1024]


def synth_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File listing: dir by doc_id%7, stem by doc_id%50 (stem collisions
    create sidecar pairs + upload groups), ext by doc_id%11."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    ext = F.element_at(F.array(*[F.lit(e) for e in EXTS]),
                       (i % 11 + 1).cast("int"))
    dir_ = F.concat(F.lit("in/d"), (i % 7).cast("string"))
    stem = F.concat(F.lit("f"), (i % 50).cast("string"))
    return d.select(
        i.alias("doc_id"),
        dir_.alias("dir"),
        stem.alias("stem"),
        ext.alias("ext"),
        F.concat(dir_, F.lit("/"), stem, F.lit("."), ext).alias("path"),
        ((i * 131) % 100000).cast("bigint").alias("size"),
    )


FILES_CTE = """
files AS (
  SELECT doc_id,
    'in/d' || CAST(doc_id % 7 AS VARCHAR) AS dir,
    'f' || CAST(doc_id % 50 AS VARCHAR) AS stem,
    (['tif','mrf','ovr','aux.xml','idx','jpg','til','TIF','rrd','rpb','ige'])
      [CAST(doc_id % 11 AS INT) + 1] AS ext,
    'in/d' || CAST(doc_id % 7 AS VARCHAR) || '/f'
      || CAST(doc_id % 50 AS VARCHAR) || '.'
      || (['tif','mrf','ovr','aux.xml','idx','jpg','til','TIF','rrd','rpb','ige'])
         [CAST(doc_id % 11 AS INT) + 1] AS path,
    CAST((doc_id * 131) % 100000 AS BIGINT) AS size
  FROM documents
)
"""


def synth_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint ledger (T4): copied/processed/uploaded in yes/no/''
    (status enums, OptimizeRasters.py:107-109)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    m = i % 10
    return d.select(
        i.alias("doc_id"),
        F.when(m < 5, "yes").otherwise("").alias("copied"),
        F.when(m < 3, "yes").when(m == 3, "no").otherwise("")
         .alias("processed"),
        F.when(m < 2, "yes").when(m == 2, "no").otherwise("")
         .alias("uploaded"),
    )


LEDGER_CTE = """
ledger AS (
  SELECT doc_id,
    CASE WHEN doc_id % 10 < 5 THEN 'yes' ELSE '' END AS copied,
    CASE WHEN doc_id % 10 < 3 THEN 'yes' WHEN doc_id % 10 = 3 THEN 'no'
         ELSE '' END AS processed,
    CASE WHEN doc_id % 10 < 2 THEN 'yes' WHEN doc_id % 10 = 2 THEN 'no'
         ELSE '' END AS uploaded
  FROM documents
)
"""


def synth_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-extent matrix keyed on part (T3)."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    k = F.col("p_partkey")
    w = F.element_at(F.array(*[F.lit(x) for x in WIDTHS]),
                     (k % 9 + 1).cast("int"))
    h = F.element_at(F.array(*[F.lit(x) for x in WIDTHS]),
                     ((k * 7) % 9 + 1).cast("int"))
    bs = F.element_at(F.array(*[F.lit(x) for x in BLOCKS]),
                      (k % 3 + 1).cast("int"))
    return p.select(k.alias("scene_id"),
                    w.cast("int").alias("width"),
                    h.cast("int").alias("height"),
                    bs.cast("int").alias("blocksize"))


EXTENTS_CTE = """
extents AS (
  SELECT p_partkey AS scene_id,
    CAST(([256,511,512,513,1024,1500,4096,40000,1])
         [CAST(p_partkey % 9 AS INT) + 1] AS INT) AS width,
    CAST(([256,511,512,513,1024,1500,4096,40000,1])
         [CAST((p_partkey * 7) % 9 AS INT) + 1] AS INT) AS height,
    CAST(([512,256,1024])[CAST(p_partkey % 3 AS INT) + 1] AS INT) AS blocksize
  FROM part
)
"""
