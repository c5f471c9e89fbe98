"""ILWIS raster parity (sources/ilwis.py) vs
autotest/gdrivers/ilwis.py (LanduseSmall.mpr checksum 2351)."""

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.ilwis import decode_ilwis, identify_ilwis

FIX = "/root/reference/autotest/gdrivers/data/ilwis/LanduseSmall.mpr"


def test_landuse():
    with open(FIX, "rb") as fh:
        assert identify_ilwis(fh.read(4096), FIX)
    arr, meta = decode_ilwis(FIX)
    assert arr.shape == (75, 75)
    assert gdal_checksum(arr) == 2351
    assert meta["transform"] == (795480.0, 20.0, 0.0, 8090520.0, 0.0,
                                 -20.0)


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(FIX)
    assert name == "ILWIS" and gdal_checksum(arr) == 2351
