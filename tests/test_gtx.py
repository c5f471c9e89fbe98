"""GTX vertical-shift grid parity (sources/gtx.py) vs
autotest/gdrivers/gtx.py (checksum 64183 on hydroc1.gtx)."""

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.gtx import decode_gtx, encode_gtx, identify_gtx

FIX = "/root/reference/autotest/gdrivers/data/gtx/hydroc1.gtx"


def test_decode():
    buf = open(FIX, "rb").read()
    assert identify_gtx(buf, FIX)
    arr, meta = decode_gtx(buf)
    assert arr.shape == (11, 21)
    assert gdal_checksum(arr) == 64183
    gt = meta["transform"]
    assert gt[1] == 0.05 and gt[5] == -0.05
    assert gt[0] == 276.75 - 0.025


def test_roundtrip():
    arr, meta = decode_gtx(open(FIX, "rb").read())
    back, meta2 = decode_gtx(encode_gtx(arr, transform=meta["transform"]))
    assert np.array_equal(arr, back)
    assert np.allclose(meta["transform"], meta2["transform"])


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(FIX)
    assert name == "GTX" and gdal_checksum(arr) == 64183
