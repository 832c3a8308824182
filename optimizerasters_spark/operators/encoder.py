"""Tile-encoder parameter synthesis — the reference's gdal_translate
argument matrix (args_Callback, OptimizeRasters.py:3875-3999;
args_Callback_for_meta :4002-4075) re-expressed as a typed parameter
STRUCT instead of a CLI argv list.

Matrix semantics (derived, not copied):
  * mode 'tif*' -> format GTiff, BIGTIFF=YES, TILED=YES,
    BLOCKXSIZE/BLOCKYSIZE; 'cog' keeps the COG driver (no TILED).
  * mode 'mrf*' -> format MRF, single BLOCKSIZE key.
  * compound modes 'x_y' split into (output, compression); '_cog' flips
    the COG flag instead ('tif_cog').
  * jpeg: quality (default 85 — DefJpegQuality :97), YCbCr photometric
    for multi-band pixel-interleaved non-COG, jpeg12 -> NBITS=12 then
    compression becomes jpeg.
  * lerc/lerc2: OPTIONS string 'LERC_PREC=<p>' and/or 'V2=ON'
    (lerc2 AND plain lerc get V2=ON; COMPRESS emits 'lerc' for both).
  * deflate/lzw pixel-interleaved: predictor (default 1).
  * meta/proxy variant: MRF + NOCOPY=True + UNIFORM_SCALE (default 2).

The struct is computed per-row with when/otherwise columns so a single
table can carry mixed codecs (e.g., imagery tiles jpeg, masks lerc) and
the encode stage (a pandas UDF in a real deployment) reads its parameters
from the row — no driver-side argv assembly, no per-file subprocess.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from optimizerasters_spark.config import Config, get_boolean_value

DEF_JPEG_QUALITY = 85  # DefJpegQuality, OptimizeRasters.py:97
DEF_BLOCK = 512


@dataclass
class EncoderParams:
    """Driver-side resolved parameters (one job-wide default row)."""
    out_format: str = "MRF"          # GTiff | MRF | COG
    compression: str = "lerc"
    quality: int = DEF_JPEG_QUALITY
    block_size: int = DEF_BLOCK
    interleave: str = "PIXEL"
    predictor: int = 1
    lerc_prec: str | None = None
    nbits12: bool = False
    bigtiff: bool = False
    tiled: bool = False
    ycbcr: bool = False
    options: str = ""
    scale: int = 2                   # UNIFORM_SCALE (meta variant)
    nocopy: bool = False

    def creation_options(self) -> dict[str, str]:
        """The -co key/value surface (for parity inspection/tests)."""
        co: dict[str, str] = {}
        comp = "lerc" if self.compression == "lerc2" else self.compression
        co["COMPRESS"] = comp
        if self.bigtiff:
            co["BIGTIFF"] = "YES"
        if self.tiled:
            co["TILED"] = "YES"
        if comp == "jpeg":
            co["QUALITY" if self.out_format == "MRF" else "JPEG_QUALITY"] = \
                str(self.quality)
            if self.nbits12:
                co["NBITS"] = "12"
            if self.ycbcr:
                co["PHOTOMETRIC"] = "YCBCR"
        if self.compression in ("deflate", "lzw"):
            co["predictor"] = str(self.predictor)
        if self.options:
            co["OPTIONS"] = self.options
        if self.out_format == "GTiff":
            co["BLOCKXSIZE"] = str(self.block_size)
            co["BLOCKYSIZE"] = str(self.block_size)
        else:
            co["BLOCKSIZE"] = str(self.block_size)
        if self.out_format != "COG":
            co["INTERLEAVE"] = self.interleave
        if self.nocopy:
            co["NOCOPY"] = "True"
        return co


def resolve(conf: Config, n_bands: int = 3, meta: bool = False
            ) -> EncoderParams:
    """Config -> EncoderParams, reproducing the reference's resolution
    order: mode split, COG override to deflate, jpeg12/ycbcr rules,
    lerc OPTIONS assembly."""
    p = EncoderParams()
    mode = str(conf.get_value("Mode", "mrf")).lower()
    comp = str(conf.get_value("Compression", "lerc")).lower()
    is_cog = False
    parts = mode.split("_")
    if len(parts) > 1:
        mode = parts[0]
        if parts[1] == "cog":
            is_cog = True
        else:
            comp = parts[1]
    if is_cog:
        comp = "deflate"
    q = conf.get_value("Quality")
    p.quality = int(q) if q else DEF_JPEG_QUALITY
    bs = conf.get_value("BlockSize")
    p.block_size = int(bs) if bs else DEF_BLOCK
    p.predictor = int(conf.get_value("Predictor", 1))
    p.interleave = str(conf.get_value("Interleave", "PIXEL")).upper()
    p.lerc_prec = conf.get_value("LERCPrecision")

    if mode.startswith(("tif", "cog")):
        p.bigtiff = True
        if not is_cog:
            p.tiled = True
            p.out_format = "GTiff"
        else:
            p.out_format = "COG"
        if p.interleave == "PIXEL" and comp.startswith("jpeg"):
            if n_bands != 1 and not is_cog:
                p.ycbcr = True
            if comp == "jpeg12":
                p.nbits12 = True
            comp = "jpeg"
    else:
        p.out_format = "MRF"
    if meta:
        p.out_format = "MRF"
        p.nocopy = True
        sc = conf.get_value("Scale")
        p.scale = int(sc) if sc else 2
        if get_boolean_value(conf.get_value("isuniformscale", True)) is False:
            p.scale = 1
    if comp.startswith("lerc"):
        opts = []
        if p.lerc_prec:
            opts.append(f"LERC_PREC={p.lerc_prec}")
        if comp in ("lerc", "lerc2"):
            opts.append("V2=ON")
        p.options = " ".join(opts)
    p.compression = comp
    return p


def encoder_struct_col(mode: Column, compression: Column,
                       quality: Column, block_size: Column) -> Column:
    """Per-row codec struct for mixed-codec tile tables: the column twin
    of resolve() for the fields that vary per tile."""
    parts = F.split(F.lower(mode), "_")
    base = F.get(parts, 0)
    second = F.get(parts, 1)
    is_cog = second == "cog"
    comp = (F.when(is_cog, F.lit("deflate"))
             .when(second.isNotNull(), second)
             .otherwise(F.lower(compression)))
    comp = F.when(comp.startswith("jpeg"), F.lit("jpeg")).otherwise(comp)
    out_format = (F.when(is_cog, F.lit("COG"))
                   .when(base.startswith("tif"), F.lit("GTiff"))
                   .otherwise(F.lit("MRF")))
    return F.struct(
        out_format.alias("out_format"),
        comp.alias("compression"),
        F.coalesce(quality, F.lit(DEF_JPEG_QUALITY)).cast("int")
         .alias("quality"),
        F.coalesce(block_size, F.lit(DEF_BLOCK)).cast("int")
         .alias("block_size"),
        (F.when(comp == "lerc", F.lit("V2=ON")).otherwise(F.lit("")))
         .alias("options"))


def with_encoder_params(tiles: DataFrame, conf: Config) -> DataFrame:
    """Attach the job-default encoder struct to a tile table."""
    p = resolve(conf)
    return tiles.withColumn(
        "encoder",
        F.struct(F.lit(p.out_format).alias("out_format"),
                 F.lit(p.compression).alias("compression"),
                 F.lit(p.quality).cast("int").alias("quality"),
                 F.lit(p.block_size).cast("int").alias("block_size"),
                 F.lit(p.options).alias("options")))
