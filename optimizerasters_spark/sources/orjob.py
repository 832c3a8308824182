"""`.orjob` job-ledger FILE format source/sink (SURVEY.md §2.1 S6/S12).

Format semantics re-derived from the reference (Report.read
OptimizeRasters.py:1947-2023, Report.write :2068-2092):
  * header lines: ``# key=value`` (CHEADER_PREFIX '#'); '##' = comment;
    empty lines ignored
  * one column-header row ``SOURCE\tCOPIED\tPROCESSED\tUPLOADED``
  * TAB-separated rows; missing trailing fields -> '' (CRPT_UNDEFINED)
  * backslashes in source paths normalized to '/'
  * duplicate sources rejected, first wins (Report.addFile :1908-1917)
  * header ``resume=retryall`` clears every status on read (:2001-2011)

The DISTRIBUTED representation is the parquet/Iceberg ledger
(optimizerasters_spark.ledger); these functions bridge the reference's
file interchange format — read with spark.read.text so a multi-GB job
file still parses in parallel (headers are a tiny driver-side prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COLUMNS = ("source", "copied", "processed", "uploaded")
HEADER_ROW = "SOURCE\tCOPIED\tPROCESSED\tUPLOADED"


def read_orjob(spark: SparkSession, path: str
               ) -> tuple[dict[str, str], DataFrame]:
    """Parse an .orjob file -> (header dict, ledger DataFrame)."""
    lines = spark.read.text(path)
    # headers: tiny by construction — parse driver-side like the reference
    hdr_rows = (lines
                .where(F.col("value").startswith("#") &
                       ~F.col("value").startswith("##"))
                .collect())
    header: dict[str, str] = {}
    for r in hdr_rows:
        body = r["value"][1:].strip()
        if "=" in body:
            k, _, v = body.partition("=")
            k, v = k.strip(), v.strip()
            if k in ("tempinput", "tempoutput") and not v.endswith("/"):
                v += "/"
            if k == "mode":
                v = v.lower()
            header[k] = v
    retryall = header.get("resume", "").lower() == "retryall"

    v = F.trim(F.col("value"))
    data = lines.where(
        (F.length(v) > 0) &
        ~v.startswith("#") &
        (v != F.lit(HEADER_ROW)) &
        ~(v.startswith("SOURCE") & F.col("value").contains("COPIED")))
    parts = F.split(F.col("value"), "\t")
    # F.get is null-safe on short rows (ANSI mode would make getItem
    # throw on ledgers with missing trailing status fields)
    led = data.select(
        F.regexp_replace(F.trim(F.get(parts, 0)), "\\\\", "/")
         .alias("source"),
        *[F.trim(F.coalesce(F.get(parts, i), F.lit("")))
          .alias(c) for i, c in ((1, "copied"), (2, "processed"),
                                 (3, "uploaded"))])
    led = led.where(F.col("source") != "")
    # duplicate rejection: first occurrence wins; file order = line order,
    # keyed deterministically via the source itself (dup rows in real
    # ledgers are full duplicates)
    led = led.dropDuplicates(["source"])
    if retryall:
        led = led.select("source", F.lit("").alias("copied"),
                         F.lit("").alias("processed"),
                         F.lit("").alias("uploaded"))
    return header, led


def write_orjob(header: dict[str, str], ledger: DataFrame,
                path: str) -> None:
    """Serialize (header, ledger rows) to the reference file format.
    The 'op=createjob' header is dropped exactly like Report.write
    (:2073-2078). Rows are sorted by source for determinism."""
    rows = ledger.select(*COLUMNS).orderBy("source").collect()
    with open(path, "w", encoding="utf-8") as f:
        for k, v in header.items():
            if k == "op" and v == "createjob":
                continue
            f.write(f"# {k}={v}\n")
        f.write(HEADER_ROW + "\n")
        for r in rows:
            f.write("\t".join([r["source"], r["copied"] or "",
                               r["processed"] or "",
                               r["uploaded"] or ""]) + "\n")
