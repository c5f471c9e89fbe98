"""BSB/KAP nautical chart parity (sources/bsb.py) vs
autotest/gdrivers/bsb.py — checksum 30321 across the plain,
index-table (#2782), line-break and reprojected variants."""

import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.bsb import decode_bsb, identify_bsb

D = "/root/reference/autotest/gdrivers/data/bsb"


@pytest.mark.parametrize("fname", [
    "rgbsmall.kap",
    "rgbsmall_index.kap",            # index table at end (#2782)
    "rgbsmall_with_line_break.kap",  # 0 inside line data
    "transverse_mercator.kap",
])
def test_rgbsmall_variants(fname):
    buf = open(f"{D}/{fname}", "rb").read()
    assert identify_bsb(buf)
    arr, meta = decode_bsb(buf)
    assert arr.shape == (50, 50)
    assert gdal_checksum(arr) == 30321
    assert len(meta["palette"]) >= 100


def test_australia_multiline():
    arr, meta = decode_bsb(open(f"{D}/australia4c.kap", "rb").read())
    assert arr.shape == (480, 625)
    assert len(meta["palette"]) == 4  # 4-color chart


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/rgbsmall.kap")
    assert name == "BSB" and gdal_checksum(arr) == 30321
