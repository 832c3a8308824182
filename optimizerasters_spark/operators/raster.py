"""Raster <-> vector tile materialization (north_rule requirement).

The reference's raster payload work happens inside GDAL; what the ENGINE
owns is the tiling discretization and per-tile assembly. Re-imagined for
page tables:

  * vector -> raster (``rasterize_tiles``): pages land in a 512-grid
    tile; within the tile a BINS x BINS sub-grid accumulates page counts
    -> one dense row per tile carrying the full grid (the "pixel block").
    Two aggregations, both map-side combinable; the dense fill uses an
    explode over plan-time bin ids, never per-row Python.
  * raster -> vector (``vectorize_tiles``): threshold the per-bin counts
    back into point features at bin-centroid coordinates — the classic
    raster-polygonize/centroid extraction, as pure column arithmetic.

A real pixel payload (binary tiles) would flow the same plan with the
bin histogram swapped for a pandas-UDF decode (operators/multimodal.py
shows that plumbing); the partitioning, keys, and outputs are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from optimizerasters_spark.pages import WORLD_H, WORLD_W

BINS = 16  # sub-grid per 512-tile (16x16 bins of 32px)
BLOCK = 512


def with_bins(pages_with_tiles: DataFrame, world_w: int = WORLD_W,
              world_h: int = WORLD_H, bins: int = BINS) -> DataFrame:
    """bin id in [0, bins*bins) from the within-tile pixel offset."""
    px_x = F.floor(F.col("lon_md") * world_w / 360000)
    px_y = F.floor(F.col("lat_md") * world_h / 170000)
    off_x = px_x - F.col("tile_x").cast("bigint") * BLOCK
    off_y = px_y - F.col("tile_y").cast("bigint") * BLOCK
    bx = F.floor(off_x * bins / BLOCK)
    by = F.floor(off_y * bins / BLOCK)
    return pages_with_tiles.withColumn(
        "bin", (by * bins + bx).cast("int"))


def tile_bin_counts(pages_with_tiles: DataFrame,
                    bins: int = BINS) -> DataFrame:
    """Long form: (tile_x, tile_y, bin, n) — the sparse raster."""
    return (with_bins(pages_with_tiles, bins=bins)
            .groupBy("tile_x", "tile_y", "bin")
            .agg(F.count(F.lit(1)).alias("n")))


def rasterize_tiles(pages_with_tiles: DataFrame,
                    bins: int = BINS) -> DataFrame:
    """Dense form: one row per tile, ``grid_csv`` = bins*bins counts in
    bin order (zeros filled) — the materialized "pixel block".

    ONE aggregation: collect the sparse (bin, n) pairs per tile into a
    map, then expand ``transform(sequence(0, bins*bins-1))`` with a map
    lookup (missing bin -> 0). The previous shape exploded a dense bin id
    per tile and re-joined + re-aggregated — an extra bins*bins-row
    intermediate and a second shuffle for the same result."""
    sparse = tile_bin_counts(pages_with_tiles, bins)
    bin_map = F.map_from_entries(
        F.collect_list(F.struct(F.col("bin"), F.col("n"))))
    dense_counts = F.transform(
        F.sequence(F.lit(0), F.lit(bins * bins - 1)),
        lambda i: F.coalesce(F.try_element_at(F.col("_m"), i), F.lit(0)))
    return (sparse.groupBy("tile_x", "tile_y")
            .agg(bin_map.alias("_m"), F.sum("n").alias("page_count"))
            .select("tile_x", "tile_y",
                    F.array_join(
                        F.transform(dense_counts,
                                    lambda n: n.cast("string")), ",")
                    .alias("grid_csv"),
                    "page_count"))


def vectorize_tiles(pages_with_tiles: DataFrame, threshold: int = 1,
                    bins: int = BINS, world_w: int = WORLD_W,
                    world_h: int = WORLD_H) -> DataFrame:
    """raster -> vector: bins with n >= threshold become point features
    at the bin centroid (millidegrees). Inverse of the discretization up
    to bin resolution."""
    sparse = tile_bin_counts(pages_with_tiles, bins)
    feats = sparse.where(F.col("n") >= threshold)
    bx = F.col("bin") % bins
    by = F.floor(F.col("bin") / bins)
    px_x = (F.col("tile_x").cast("bigint") * BLOCK +
            bx * (BLOCK / bins) + (BLOCK / bins) / 2)
    px_y = (F.col("tile_y").cast("bigint") * BLOCK +
            by * (BLOCK / bins) + (BLOCK / bins) / 2)
    lon_md = F.floor(px_x * 360000 / world_w)
    lat_md = F.floor(px_y * 170000 / world_h)
    return feats.select(
        "tile_x", "tile_y", "bin",
        F.col("n").cast("bigint").alias("n"),
        lon_md.cast("bigint").alias("centroid_lon_md"),
        lat_md.cast("bigint").alias("centroid_lat_md"))
