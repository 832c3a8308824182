"""Tile-manifest sink rows (SURVEY.md §2.1 S13, §2.8 X9, §2.4 A3).

The reference edits MRF XML proxies per output raster (UpdateMRF.update,
OptimizeRasters.py:1558-1734) and flushes an ``ObjectID;Raster`` CSV
(:7116-7131). Here manifests are STRUCTURED ROWS: one per materialized
tile, carrying the grid/pyramid parameters (BlockSize 512 — :3844;
UNIFORM_SCALE default 2, Landsat 3 — :4066-4068) and a deterministic
source URI. A ``to_json(struct(...))`` column stands in for the XML body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SCALE = 2
DEFAULT_BLOCK = 512


def tile_manifest(tile_counts: DataFrame, output_prefix: str = "tiles",
                  scale: int = DEFAULT_SCALE,
                  block: int = DEFAULT_BLOCK) -> DataFrame:
    """tile_counts: (level, tile_x, tile_y, page_count) ->
    manifest rows (tile_id, level, tile_x, tile_y, page_count, blocksize,
    scale, source_uri, manifest_json)."""
    tile_id = F.concat(F.lit("L"), F.col("level").cast("string"),
                       F.lit("/"), F.col("tile_x").cast("string"),
                       F.lit("/"), F.col("tile_y").cast("string"))
    uri = F.concat(F.lit(output_prefix + "/"), tile_id, F.lit(".mrf"))
    out = (tile_counts
           .withColumn("tile_id", tile_id)
           .withColumn("blocksize", F.lit(block).cast("int"))
           .withColumn("scale", F.lit(scale).cast("int"))
           .withColumn("source_uri", uri))
    return out.withColumn(
        "manifest_json",
        F.to_json(F.struct("tile_id", "level", "tile_x", "tile_y",
                           "page_count", "blocksize", "scale",
                           "source_uri")))


def with_cache_paths(manifest: DataFrame, cache_prefix: str = "cache",
                     compression: str | None = None) -> DataFrame:
    """Raster-proxy cache-path rewrite (UpdateMRF.update,
    OptimizeRasters.py:1558-1734): every proxy points DataFile/IndexFile
    at a cache location ``<cache_prefix>/<tile dir>/<stem>.mrf_cache``.
    For LERC payloads the data/index split into ``.lrc`` / ``.idx``
    (extensions_lup :1685-1688); otherwise both columns equal the cache
    path. Pure projection — folds into whatever stage emits the
    manifest."""
    cache = F.concat(F.lit(cache_prefix + "/"), F.col("tile_id"),
                     F.lit(".mrf_cache"))
    if compression == "lerc":
        data_file = F.concat(F.lit(cache_prefix + "/"), F.col("tile_id"),
                             F.lit(".lrc"))
        index_file = F.concat(F.lit(cache_prefix + "/"), F.col("tile_id"),
                              F.lit(".idx"))
    else:
        data_file = index_file = cache
    return (manifest
            .withColumn("cache_path", cache)
            .withColumn("data_file", data_file)
            .withColumn("index_file", index_file))


def proxy_csv_rows(manifest: DataFrame, id_offset: int = 0,
                   num_partitions: int | None = None) -> DataFrame:
    """S13: the ``ObjectID;Raster`` flattened form, one row per tile.
    Deterministic dense object ids equal to ROW_NUMBER() OVER (ORDER BY
    tile_id) — but WITHOUT a partition-less Window (which would sort the
    full manifest, billions of tiles at 100x, on one reducer).

    Zip-with-index per partition instead: range-partition on tile_id,
    stamp each row with its partition id, then ROW_NUMBER() windowed BY
    PARTITION ID (each window partition = one range bucket, so the sort
    is bucket-local, never global); aggregate per-partition counts
    (O(#partitions) rows), turn them into cumulative offsets, and
    broadcast-join the offsets back. Global id = offset(pid) + local
    index. The only partition-less window runs over the #partitions-row
    offsets table — bounded by the shuffle-partition count, never by
    data volume. (An earlier version derived the local index from
    monotonically_increasing_id's pid*2^33 bit layout — an
    implementation detail of Spark, and silently wrong past 2^33 rows
    per partition; row_number depends only on documented semantics.)

    pid stamping happens under the range Exchange, so the window's
    re-shuffle on _pid redistributes CONSISTENT pids; the offsets branch
    hangs off the same window output — one range exchange, one hash
    exchange on the tile-manifest table (tiles, not pages)."""
    from pyspark.sql.window import Window
    staged = (manifest
              .repartitionByRange(*([num_partitions] if num_partitions
                                    else []), "tile_id")
              .withColumn("_pid", F.spark_partition_id())
              .withColumn("_local",
                          F.row_number().over(
                              Window.partitionBy("_pid")
                                    .orderBy("tile_id")) - 1))
    counts = staged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_off"))
    return (staged.join(F.broadcast(offsets), "_pid")
            .withColumn("object_id",
                        (F.col("_off") + F.col("_local") + 1 + id_offset)
                        .cast("bigint"))
            .select("object_id",
                    F.concat_ws(";", F.col("object_id").cast("string"),
                                F.col("source_uri")).alias("csv_row")))
