"""Config + encoder parameter matrix goldens (X1/X6/X8 semantics)."""

from __future__ import annotations

import os

import pytest

from optimizerasters_spark.config import (
    Config, format_extensions, get_boolean_value,
)
from optimizerasters_spark.operators import encoder

TEMPLATE = os.path.join(os.path.dirname(__file__), "..",
                        "optimizerasters_spark", "templates",
                        "imagery_mrf_lerc.xml")


# getBooleanValue truth table (OptimizeRasters.py:56-67)
@pytest.mark.parametrize("val,want", [
    ("true", True), ("TRUE", True), ("yes", True), ("t", True),
    ("1", True), ("y", True), ("Y", True),
    ("false", False), ("no", False), ("0", False), ("on", False),
    ("", False), (None, False), (True, True), (False, False),
    (1, True), (0, False), ("enabled", False),
])
def test_boolean_truth_table(val, want):
    assert get_boolean_value(val) == want


def test_format_extensions():
    assert format_extensions(" tif , mrf ,, til ") == ["tif", "mrf", "til"]
    assert format_extensions(None) == []


def test_template_load_and_overrides():
    c = Config.from_xml(TEMPLATE)
    assert c.get_value("Mode") == "mrf"
    assert c.get_value("BlockSize") == "512"
    assert c.get_value("PyramidFactor") is None      # empty -> default
    assert c.extensions("RasterFormatFilter") == ["tif", "mrf", "til"]
    assert c.get_boolean("IncludeSubdirectories") is True
    c.set_value("BlockSize", "1024")                 # CLI override wins
    assert c.get_value("BlockSize") == "1024"
    assert c.validate_mode() == "mrf"
    c.set_value("Mode", "nonsense")
    with pytest.raises(ValueError):
        c.validate_mode()


def test_encoder_mrf_lerc_defaults():
    p = encoder.resolve(Config.from_xml(TEMPLATE))
    co = p.creation_options()
    assert p.out_format == "MRF"
    assert co["COMPRESS"] == "lerc"
    assert co["OPTIONS"] == "LERC_PREC=0.5 V2=ON"
    assert co["BLOCKSIZE"] == "512"
    assert "BLOCKXSIZE" not in co


def test_encoder_tif_jpeg_matrix():
    c = Config(dict(Mode="tif_jpeg", Quality="75"))
    p = encoder.resolve(c, n_bands=3)
    co = p.creation_options()
    assert p.out_format == "GTiff"
    assert co["BIGTIFF"] == "YES" and co["TILED"] == "YES"
    assert co["COMPRESS"] == "jpeg" and co["JPEG_QUALITY"] == "75"
    assert co["PHOTOMETRIC"] == "YCBCR"          # multiband pixel jpeg
    assert co["BLOCKXSIZE"] == "512" and co["BLOCKYSIZE"] == "512"
    # single band -> no ycbcr
    assert "PHOTOMETRIC" not in encoder.resolve(
        c, n_bands=1).creation_options()


def test_encoder_jpeg12_and_cog():
    p = encoder.resolve(Config(dict(Mode="tif_jpeg12")), n_bands=3)
    co = p.creation_options()
    assert co["NBITS"] == "12" and co["COMPRESS"] == "jpeg"
    # mode *_cog keeps the CONFIGURED compression (args_Callback
    # :3927-3931) — jpeg under the COG driver uses QUALITY=, no JPEG_
    # prefix, and no YCbCr (the COG driver defaults it)
    p2 = encoder.resolve(Config(dict(Mode="tif_cog", Compression="jpeg",
                                     Quality="80")), n_bands=3)
    co2 = p2.creation_options()
    assert p2.out_format == "COG"
    assert co2["COMPRESS"] == "jpeg" and co2["QUALITY"] == "80"
    assert "JPEG_QUALITY" not in co2 and "PHOTOMETRIC" not in co2
    assert "TILED" not in co2 and "INTERLEAVE" not in co2
    # only the separate cog CONFIG key (useCOGTIFF :3897) forces deflate
    p3 = encoder.resolve(Config(dict(Mode="tif", Compression="jpeg",
                                     cog="true")), n_bands=3)
    assert p3.compression == "deflate" and p3.out_format == "GTiff"


def test_encoder_deflate_predictor_and_meta():
    p = encoder.resolve(Config(dict(Mode="tif_lzw", Predictor="2")))
    assert p.creation_options()["predictor"] == "2"
    # predictor is gated on PIXEL interleave (args_Callback :3958-3962)
    pb = encoder.resolve(Config(dict(Mode="tif_lzw", Predictor="2",
                                     Interleave="BAND")))
    assert "predictor" not in pb.creation_options()
    # ...and on the tif/cog branch: the reference nests the predictor
    # block inside the GTiff/COG path, so MRF outputs never emit it
    pm = encoder.resolve(Config(dict(Mode="mrf", Compression="deflate",
                                     Predictor="2")))
    assert pm.out_format == "MRF"
    assert "predictor" not in pm.creation_options()
    m = encoder.resolve(Config(dict(Mode="rasterproxy", Scale="3")),
                        meta=True)
    co = m.creation_options()
    assert co["NOCOPY"] == "True" and m.scale == 3


def test_encoder_full_mode_whitelist():
    """Every mode in the reference whitelist (:5533-5553) resolves with
    its mode-specific semantics."""
    from optimizerasters_spark.config import VALID_MODES
    for mode in VALID_MODES:
        p = encoder.resolve(Config(dict(Mode=mode)))
        assert p.mode == mode
        co = p.creation_options()
        assert "COMPRESS" in co
    # proxy modes: MRF, no pyramids, NOCOPY proxies
    for mode in ("cachingmrf", "clonemrf", "rasterproxy", "splitmrf"):
        p = encoder.resolve(Config(dict(Mode=mode)))
        assert p.out_format == "MRF" and not p.pyramids and p.nocopy
    # splitmrf + lerc: DataFile/IndexFile extension split
    p = encoder.resolve(Config(dict(Mode="splitmrf", Compression="lerc")))
    assert (p.data_ext, p.index_ext) == (".lrc", ".idx")
    assert encoder.resolve(
        Config(dict(Mode="splitmrf", Compression="jpeg"))).data_ext is None
    # clone marking: mrf-family sources + clonemrf (:1643-1647)
    assert encoder.resolve(Config(dict(Mode="mrf_jpeg"))).clone_source
    assert encoder.resolve(Config(dict(Mode="clonemrf"))).clone_source
    assert not encoder.resolve(Config(dict(Mode="tif_jpeg"))).clone_source
    # dg/landsat product profiles pin MRF+LERC; landsat proxies Scale=3
    for mode in ("tif_dg", "mrf_dg", "tiff_landsat", "mrf_landsat"):
        p = encoder.resolve(Config(dict(Mode=mode)))
        assert p.compression == "lerc", mode
    lp = encoder.resolve(Config(dict(Mode="tiff_landsat")), meta=True)
    assert lp.scale == 3  # Templates/Landsat8_RasterProxy.xml <Scale>3
    dg = encoder.resolve(Config(dict(Mode="mrf_dg")), meta=True)
    assert dg.scale == 2
    # maker modes dispatch to dedicated builders, emit MRF
    for mode in ("bundle", "iiq", "aid"):
        p = encoder.resolve(Config(dict(Mode=mode)))
        assert p.maker == mode and p.out_format == "MRF"
    # invalid mode rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        encoder.resolve(Config(dict(Mode="nonsense")))


def test_encoder_struct_col(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("mrf", "lerc", None, None),
         ("tif_jpeg", "lerc", 75, 256),
         ("tif_cog", "jpeg", None, None)],
        "mode STRING, compression STRING, quality INT, block_size INT")
    out = df.select(encoder.encoder_struct_col(
        F.col("mode"), F.col("compression"), F.col("quality"),
        F.col("block_size")).alias("e")).collect()
    e0, e1, e2 = [r["e"] for r in out]
    assert e0["out_format"] == "MRF" and e0["compression"] == "lerc" \
        and e0["quality"] == 85 and e0["options"] == "V2=ON"
    assert e1["out_format"] == "GTiff" and e1["compression"] == "jpeg" \
        and e1["quality"] == 75 and e1["block_size"] == 256
    # *_cog keeps the row's configured compression (only the cog config
    # key forces deflate, and that is job-wide via resolve())
    assert e2["out_format"] == "COG" and e2["compression"] == "jpeg"


def test_encoder_argv_assembly():
    """argv() mirrors args_Callback's return shape: user params FIRST
    (the reference appends GDAL_Translate_UserParameters into args
    before -of/-co, OptimizeRasters.py:3891-3894) then -of + -co
    pairs; repeated whitespace collapses like str.split()."""
    from optimizerasters_spark import templates
    p = encoder.resolve(templates.load("Grid_to_COG_LZW"))
    argv = p.argv()
    assert argv[0] == "-stats"                      # user params first
    assert argv[1:3] == ["-of", "COG"]
    assert "-co" in argv and "COMPRESS=lzw" in argv
    assert "BLOCKSIZE=256" in argv
    # whitespace-collapsing split: no empty tokens from double spaces
    p.user_params = "-stats  -strict"
    assert p.argv()[:2] == ["-stats", "-strict"]
    # no user params -> none appended
    p2 = encoder.resolve(templates.load("Imagery_to_MRF_LERC"))
    a2 = p2.argv()
    assert a2[:2] == ["-of", "MRF"] and "OPTIONS=V2=ON" in a2
    assert a2.count("-co") == len(p2.creation_options())


def test_text_operators_tolerate_null_and_empty_text(spark):
    """Null/empty text must not crash the text stages; behavior is
    pinned: null text -> null outputs (token counts/hashes), empty text
    -> the one-empty-token convention the batch pipeline uses."""
    from pyspark.sql import functions as F
    from optimizerasters_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "two words")],
        "doc_id bigint, text string")
    tc = {r["doc_id"]: r["n_tokens"]
          for r in T.token_count(df).collect()}
    assert tc[1] is None and tc[2] == 1 and tc[3] == 2
    fp = {r["doc_id"]: r["sha256_hex"] for r in T.fingerprint(df).collect()}
    assert fp[1] is None and fp[2] is not None
    ch = T.chunk_documents(df.where(F.col("doc_id") >= 2)).collect()
    assert {r["doc_id"] for r in ch} == {2, 3}  # null rows drop, no crash
