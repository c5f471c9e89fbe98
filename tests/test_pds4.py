"""PDS4 XML-label reader parity (sources/pds4.py) vs
autotest/gdrivers/pds4.py — all four cartography model versions
checksum 4672."""

import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.pds4 import decode_pds4, identify_pds4

D = "/root/reference/autotest/gdrivers/data/pds4"
GT = (-59280.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


@pytest.mark.parametrize("fname", [
    "byte_pds4_cart_1700.xml",
    "byte_pds4_cart_1b00.xml",
    "byte_pds4_cart_1d00_1933.xml",
    "byte_pds4_cart_1g00_1950.xml",
])
def test_cart_versions(fname):
    buf = open(f"{D}/{fname}", "rb").read()
    assert identify_pds4(buf)
    arr, meta = decode_pds4(buf, path=f"{D}/{fname}")
    assert gdal_checksum(arr) == 4672
    assert meta["transform"] == GT


def test_special_constants():
    buf = open(f"{D}/byte_pds4_cart_1700.xml", "rb").read()
    _, meta = decode_pds4(buf, path=f"{D}/byte_pds4_cart_1700.xml")
    assert meta["nodata"] == 74.0


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/byte_pds4_cart_1700.xml")
    assert name == "PDS4" and gdal_checksum(arr) == 4672
