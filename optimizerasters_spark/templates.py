"""The reference's 18 shipped template default sets (Templates/*.xml),
ported as pinned encoder-conf fixtures — the values below are the
operative <Defaults> entries of each file (empty entries omitted; cloud
credential/path keys map to the platform per SURVEY.md §2.1 and are not
part of the encoder surface).

These are the reference's GOLDEN CONFIGS (SURVEY.md §5): each template
pins a (mode, compression, quality, block, scale, keep-extension,
pyramid) combination that the encoder matrix must reproduce —
tests/test_templates_golden.py asserts every one.

Sources: /root/reference/Templates/<name>.xml; mode semantics
OptimizeRasters.py:5533-5553; Landsat proxy Scale=3 :4066-4068.
"""

from __future__ import annotations

from optimizerasters_spark.config import Config

_IMG_RFF = ("tif,tiff,TIF,TIFF,img,jp2,JP2,IMG,jpg,JPG,jpeg,JPEG,"
            "sid,SID")
_BASE_EXC = ("tmp,rrd,idx,lrc,mrf_cache,pjp,ppng,pft,pzp,ovr,aux.xml,"
             "aux,tfw,TFW,pjg")

TEMPLATE_DEFAULTS: dict[str, dict[str, str]] = {
    "Imagery_to_MRF_LERC": dict(
        Mode="mrf", Compression="LERC", BlockSize="512",
        RasterFormatFilter=_IMG_RFF, ExcludeFilter=_BASE_EXC,
        BuildPyramids="true", PyramidSampling="avg",
        PyramidCompression="LERC", KeepExtension="false"),
    "Imagery_to_MRF_JPEG": dict(
        Mode="mrf", Compression="JPEG", Quality="95", BlockSize="512",
        RasterFormatFilter=_IMG_RFF, ExcludeFilter=_BASE_EXC,
        BuildPyramids="true", PyramidSampling="avg",
        PyramidCompression="LERC", KeepExtension="false"),
    "Imagery_to_TIF_JPEG": dict(
        Mode="tif", Compression="JPEG", Interleave="Pixel", Quality="90",
        BlockSize="512",
        RasterFormatFilter="tif,tiff,TIF,TIFF,jpg,JPG,jpeg,JPEG,img,IMG,"
                           "sid,SID",
        ExcludeFilter=_BASE_EXC, BuildPyramids="true",
        PyramidSampling="average", PyramidCompression="JPEG",
        KeepExtension="false"),
    "Imagery_to_TIF_LZW": dict(
        Mode="tif", Compression="LZW", Interleave="Pixel", BlockSize="512",
        RasterFormatFilter="tif,tiff,TIF,TIFF,jpg,JPG,jpeg,JPEG,img,IMG,"
                           "sid,SID,jp2,JP2",
        ExcludeFilter=_BASE_EXC, BuildPyramids="true",
        PyramidSampling="average", PyramidCompression="LZW",
        KeepExtension="false"),
    "Imagery_to_COG_JPEG": dict(
        Mode="tif_cog", Compression="JPEG", Quality="85", BlockSize="512",
        RasterFormatFilter=_IMG_RFF, ExcludeFilter=_BASE_EXC,
        BuildPyramids="false", PyramidSampling="average",
        PyramidCompression="JPEG", KeepExtension="false"),
    "Imagery_to_COG_DEF": dict(
        Mode="tif_cog", Compression="DEFLATE", Quality="85",
        BlockSize="512", RasterFormatFilter=_IMG_RFF,
        ExcludeFilter=_BASE_EXC, BuildPyramids="false",
        PyramidSampling="average", PyramidCompression="DEFLATE",
        KeepExtension="true"),
    "Imagery_to_COG_WEBP": dict(
        Mode="tif_cog", Compression="WEBP", Quality="90", BlockSize="512",
        RasterFormatFilter=_IMG_RFF, ExcludeFilter=_BASE_EXC,
        BuildPyramids="false", PyramidSampling="average",
        PyramidCompression="JPEG", KeepExtension="false"),
    "Grid_to_COG_LZW": dict(
        Mode="tif_cog", Compression="LZW", Quality="90", BlockSize="256",
        RasterFormatFilter="hdr.adf",
        ExcludeFilter=_BASE_EXC + ",*adf,*txt,log,*arc*,*.xml",
        BuildPyramids="false", PyramidFactor="3 9 81",
        PyramidSampling="average", PyramidCompression="LZW",
        KeepExtension="false",
        GDAL_Translate_UserParameters="-stats"),
    "Grid_to_MRF_LERC": dict(
        Mode="mrf", Compression="LERC", BlockSize="512",
        RasterFormatFilter="hdr.adf",
        ExcludeFilter=_BASE_EXC + ",*adf,*txt,log,*arc*,*.xml",
        BuildPyramids="false", PyramidSampling="avg",
        PyramidCompression="LERC", KeepExtension="false"),
    "CreateRasterProxy": dict(
        Mode="rasterproxy", Compression="LERC", BlockSize="512",
        Scale="2",
        RasterFormatFilter="tif,tiff,TIF,TIFF,JP2,jp2,ntf,NTF,img,jpg,"
                           "JPG,jpeg,JPEG,mrf",
        ExcludeFilter=_BASE_EXC, BuildPyramids="true",
        PyramidSampling="avg", PyramidCompression="LERC",
        KeepExtension="false"),
    "Landsat8_RasterProxy": dict(
        Mode="rasterproxy", Compression="LERC", BlockSize="512",
        Scale="3", RasterFormatFilter="tif,tiff,TIF,TIFF",
        ExcludeFilter=_BASE_EXC, BuildPyramids="true",
        PyramidSampling="average", PyramidCompression="LERC",
        KeepExtension="True"),
    "Landsat_to_MRF_LERC": dict(
        Mode="mrf", Compression="LERC", BlockSize="512",
        RasterFormatFilter="tif,tiff,TIF,TIFF,hdf,HDF",
        ExcludeFilter=_BASE_EXC, BuildPyramids="true",
        PyramidSampling="avg", PyramidCompression="LERC",
        KeepExtension="true"),
    "DG_SatelliteProduct_to_MRF_LERC": dict(
        Mode="mrf", Compression="LERC", BlockSize="512",
        RasterFormatFilter="tif,tiff,TIF,TIFF,img,jp2,JP2,IMG,ntf,NTF,"
                           "til,TIL",
        ExcludeFilter=_BASE_EXC + ",jpg,JPG,jpeg,JPEG,jgw,shp,dbf,shx,"
                                  "ATT,EPH,sbn,sbx",
        BuildPyramids="true", PyramidSampling="avg",
        PyramidCompression="LERC", KeepExtension="true"),
    "Airbus_SatelliteProduct_to_MRF_LERC": dict(
        Mode="mrf", Compression="LERC", BlockSize="512",
        RasterFormatFilter="tif,tiff,TIF,TIFF,img,jp2,JP2,IMG,ntf,NTF,"
                           "til,TIL",
        ExcludeFilter=_BASE_EXC + ",pdf,PDF,HTM,jpg,JPG,jpeg,JPEG,gml,"
                                  "GML,XSL,KMZ,kmz",
        BuildPyramids="true", PyramidSampling="avg",
        PyramidCompression="LERC", KeepExtension="true"),
    "Sentinel2_to_MRF": dict(
        Mode="mrf", Compression="LERC", BlockSize="512",
        RasterFormatFilter="tif,tiff,TIF,TIFF,jp2,JP2,til,TIL",
        ExcludeFilter=_BASE_EXC + ",png,safe,xsd,html,jpg,gml,xsl",
        BuildPyramids="true", PyramidSampling="avg",
        PyramidCompression="LERC", KeepExtension="true"),
    "Overviews_to_MRF_JPEG": dict(
        Mode="mrf", Compression="JPEG", Quality="95", BlockSize="512",
        RasterFormatFilter="tif,tiff,TIF,TIFF,img,jp2,JP2,IMG",
        ExcludeFilter=_BASE_EXC, BuildPyramids="false",
        PyramidSampling="avg", PyramidCompression="jpeg",
        KeepExtension="false"),
    "Overviews_to_MRF_LERC": dict(
        Mode="mrf", Compression="LERC", BlockSize="512",
        RasterFormatFilter="tif,tiff,TIF,TIFF,img,jp2,JP2,IMG",
        ExcludeFilter=_BASE_EXC, BuildPyramids="false",
        PyramidSampling="avg", PyramidCompression="LERC",
        KeepExtension="false"),
    "CopyFilesOnly": dict(Mode="mrf", KeepExtension="true"),
}


def load(name: str) -> Config:
    """Template name -> Config carrying that template's pinned defaults."""
    return Config(dict(TEMPLATE_DEFAULTS[name]))
