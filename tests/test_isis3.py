"""ISIS3 planetary cube parity (sources/isis3.py) vs
autotest/gdrivers/isis.py checksum expectations."""

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.isis3 import (decode_isis3, identify_isis3,
                                        parse_pvl)

D = "/root/reference/autotest/gdrivers/data/isis3"


def test_tile_format():
    """isis.py:78 — tiled SignedWord core, checksum 42403; raw DNs
    with Base/Multiplier as metadata."""
    buf = open(f"{D}/isis3_unit_test.cub", "rb").read()
    assert identify_isis3(buf)
    arr, meta = decode_isis3(buf)
    assert arr.shape == (50, 150) and arr.dtype == np.int16
    assert gdal_checksum(arr) == 42403
    assert meta["offset"] == 8190.1245134999
    assert meta["scale"] == 0.25006486667989
    assert meta["transform"][0] == 653.1326414958
    assert meta["target"] == "mars"


def test_detached_label():
    """isis.py:53 — detached .lbl + ^Core raw file, checksum 9978."""
    buf = open(f"{D}/isis3_detached.lbl", "rb").read()
    arr, _ = decode_isis3(buf, path=f"{D}/isis3_detached.lbl")
    assert gdal_checksum(arr) == 9978


def test_pvl_parser():
    lbl = parse_pvl(
        open(f"{D}/isis3_unit_test.cub", "rb").read(4096).decode(
            "latin-1"))
    assert lbl["IsisCube"]["Core"]["Dimensions"]["Samples"] == "150"
    assert lbl["IsisCube"]["BandBin"]["Center"] == "700"


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/isis3_unit_test.cub")
    assert name == "ISIS3" and gdal_checksum(arr) == 42403
