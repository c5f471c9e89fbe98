"""Geosoft GXF parity (sources/gxf.py) vs autotest/gdrivers/gxf.py
(small.gxf cs 90 uncompressed; small2.gxf cs 65042 base-90 GTYPE 3)."""

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.gxf import decode_gxf, identify_gxf

D = "/root/reference/autotest/gdrivers/data/gxf"


def test_uncompressed():
    buf = open(f"{D}/small.gxf", "rb").read()
    assert identify_gxf(buf)
    arr, _ = decode_gxf(buf)
    assert arr.shape == (3, 4)
    assert gdal_checksum(arr) == 90


def test_base90_compressed():
    arr, meta = decode_gxf(open(f"{D}/small2.gxf", "rb").read())
    assert arr.shape == (8, 10)
    assert gdal_checksum(arr) == 65042
    assert meta["nodata"] == -1e12  # gxfopen.c:215 default dummy


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/small2.gxf")
    assert name == "GXF" and gdal_checksum(arr) == 65042
