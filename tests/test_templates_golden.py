"""Template goldens: the encoder matrix must reproduce every pinned
default set the reference ships (Templates/*.xml — its de-facto golden
configs, SURVEY.md §5). One parametrized case per template."""

from __future__ import annotations

import pytest

from optimizerasters_spark import templates
from optimizerasters_spark.operators import encoder

# (template, out_format, compression, quality, block, scale, pyramids,
#  predictor_emitted) — scale asserted on the meta/proxy resolve path.
GOLDEN = [
    ("Imagery_to_MRF_LERC", "MRF", "lerc", 85, 512, None, True, False),
    ("Imagery_to_MRF_JPEG", "MRF", "jpeg", 95, 512, None, True, False),
    ("Imagery_to_TIF_JPEG", "GTiff", "jpeg", 90, 512, None, True, False),
    ("Imagery_to_TIF_LZW", "GTiff", "lzw", 85, 512, None, True, True),
    ("Imagery_to_COG_JPEG", "COG", "jpeg", 85, 512, None, False, False),
    ("Imagery_to_COG_DEF", "COG", "deflate", 85, 512, None, False, True),
    ("Imagery_to_COG_WEBP", "COG", "webp", 90, 512, None, False, False),
    ("Grid_to_COG_LZW", "COG", "lzw", 90, 256, None, False, True),
    ("Grid_to_MRF_LERC", "MRF", "lerc", 85, 512, None, False, False),
    ("CreateRasterProxy", "MRF", "lerc", 85, 512, 2, False, False),
    ("Landsat8_RasterProxy", "MRF", "lerc", 85, 512, 3, False, False),
    ("Landsat_to_MRF_LERC", "MRF", "lerc", 85, 512, None, True, False),
    ("DG_SatelliteProduct_to_MRF_LERC",
     "MRF", "lerc", 85, 512, None, True, False),
    ("Airbus_SatelliteProduct_to_MRF_LERC",
     "MRF", "lerc", 85, 512, None, True, False),
    ("Sentinel2_to_MRF", "MRF", "lerc", 85, 512, None, True, False),
    ("Overviews_to_MRF_JPEG", "MRF", "jpeg", 95, 512, None, False, False),
    ("Overviews_to_MRF_LERC", "MRF", "lerc", 85, 512, None, False, False),
    ("CopyFilesOnly", "MRF", "lerc", 85, 512, None, True, False),
]


def test_every_shipped_template_is_ported():
    assert len(templates.TEMPLATE_DEFAULTS) == 18
    assert {g[0] for g in GOLDEN} == set(templates.TEMPLATE_DEFAULTS)


@pytest.mark.parametrize(
    "name,out_format,comp,quality,block,scale,pyramids,predictor", GOLDEN,
    ids=[g[0] for g in GOLDEN])
def test_template_golden(name, out_format, comp, quality, block, scale,
                         pyramids, predictor):
    conf = templates.load(name)
    p = encoder.resolve(conf, n_bands=3, meta=scale is not None)
    assert p.out_format == out_format
    assert p.compression == comp
    assert p.quality == quality
    assert p.block_size == block
    assert p.pyramids == pyramids
    co = p.creation_options()
    assert ("predictor" in co) == predictor
    if scale is not None:
        assert p.scale == scale
        assert p.nocopy and co["NOCOPY"] == "True"
    if comp == "lerc":
        assert co["OPTIONS"] == "V2=ON"
        assert co["COMPRESS"] == "lerc"
    if comp == "jpeg":
        key = "JPEG_QUALITY" if out_format == "GTiff" else "QUALITY"
        assert co[key] == str(quality)


def test_template_specifics():
    # Landsat proxy pins Scale=3 (OptimizeRasters.py:4066-4068 +
    # Templates/Landsat8_RasterProxy.xml) vs the CreateRasterProxy
    # default 2 — both must survive the meta resolve path
    l8 = encoder.resolve(templates.load("Landsat8_RasterProxy"), meta=True)
    crp = encoder.resolve(templates.load("CreateRasterProxy"), meta=True)
    assert (l8.scale, crp.scale) == (3, 2)
    # DG/Airbus/Sentinel keep .til in the raster filter -> TIL stage on
    for n in ("DG_SatelliteProduct_to_MRF_LERC",
              "Airbus_SatelliteProduct_to_MRF_LERC", "Sentinel2_to_MRF"):
        assert "til" in templates.load(n).extensions("RasterFormatFilter")
    # CopyFilesOnly declares no rasters at all -> everything copies
    assert templates.load("CopyFilesOnly") \
        .extensions("RasterFormatFilter") == []
    # TIF JPEG multiband pixel-interleave gets YCbCr; COG JPEG does not
    tif = encoder.resolve(templates.load("Imagery_to_TIF_JPEG"), n_bands=3)
    cog = encoder.resolve(templates.load("Imagery_to_COG_JPEG"), n_bands=3)
    assert tif.creation_options().get("PHOTOMETRIC") == "YCBCR"
    assert "PHOTOMETRIC" not in cog.creation_options()
    # GDAL_Translate_UserParameters pass through unmodified
    grid = encoder.resolve(templates.load("Grid_to_COG_LZW"))
    assert grid.user_params == "-stats"
    assert encoder.resolve(
        templates.load("Imagery_to_MRF_LERC")).user_params == ""
    # KeepExtension flag parses reference-truthily per template
    # ('True'/'true' set, 'false' clear) and drives the F6 rewrite
    assert templates.load("Landsat_to_MRF_LERC") \
        .get_boolean("KeepExtension") is True
    assert templates.load("Landsat8_RasterProxy") \
        .get_boolean("KeepExtension") is True
    assert templates.load("Imagery_to_MRF_LERC") \
        .get_boolean("KeepExtension") is False
