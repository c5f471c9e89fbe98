"""ISIS2 QUBE parity (sources/isis2.py) vs autotest/gdrivers/isis2.py
(checksum 382 on the truncated arvidson cube)."""

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.isis2 import decode_isis2, identify_isis2

FIX = ("/root/reference/autotest/gdrivers/data/isis2/"
       "arvidson_original_truncated.cub")


def test_qube():
    buf = open(FIX, "rb").read()
    assert identify_isis2(buf)
    arr, meta = decode_isis2(buf)
    assert arr.dtype == np.float32 and arr.shape == (1, 43)
    assert gdal_checksum(arr) == 382
    assert meta["scale"] == 1.0


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(FIX)
    assert name == "ISIS2" and gdal_checksum(arr) == 382
