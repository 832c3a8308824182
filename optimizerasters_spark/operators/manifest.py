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


def proxy_csv_rows(manifest: DataFrame, id_offset: int = 0) -> DataFrame:
    """S13: the ``ObjectID;Raster`` flattened form, one row per tile.
    Deterministic object ids from a dense rank over tile_id (the reference
    used a time-based offset; determinism wins here)."""
    from pyspark.sql.window import Window
    w = Window.orderBy("tile_id")
    return (manifest
            .withColumn("object_id",
                        (F.row_number().over(w) + id_offset).cast("bigint"))
            .select("object_id",
                    F.concat_ws(";", F.col("object_id").cast("string"),
                                F.col("source_uri")).alias("csv_row")))
