"""Surfer grid parity (sources/surfer.py) vs
autotest/gdrivers/gsg.py — all three variants checksum 4672 on the
byte.tif-derived fixtures."""

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.surfer import (decode_gs7bg, decode_gsag,
                                         decode_gsbg, encode_gsbg)

D = "/root/reference/autotest/gdrivers/data/gsg"
GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def _load(name):
    with open(f"{D}/{name}", "rb") as fh:
        return fh.read()


def test_gsag():
    arr, meta = decode_gsag(_load("gsg_ascii.grd"))
    assert arr.shape == (20, 20)
    assert gdal_checksum(arr) == 4672
    assert tuple(round(v, 6) for v in meta["transform"]) == GT


def test_gsbg():
    arr, meta = decode_gsbg(_load("gsg_binary.grd"))
    assert gdal_checksum(arr) == 4672
    assert tuple(round(v, 6) for v in meta["transform"]) == GT


def test_gs7bg():
    arr, meta = decode_gs7bg(_load("gsg_7binary.grd"))
    assert gdal_checksum(arr) == 4672
    assert tuple(round(v, 6) for v in meta["transform"]) == GT


def test_gsbg_roundtrip():
    arr, meta = decode_gsbg(_load("gsg_binary.grd"))
    buf = encode_gsbg(arr, transform=meta["transform"])
    back, meta2 = decode_gsbg(buf)
    assert np.array_equal(arr, back)
    assert np.allclose(meta["transform"], meta2["transform"])


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    for name, drv in [("gsg_ascii.grd", "GSAG"),
                      ("gsg_binary.grd", "GSBG"),
                      ("gsg_7binary.grd", "GS7BG")]:
        got, arr, _ = open_raster_path(f"{D}/{name}")
        assert got == drv and gdal_checksum(arr) == 4672
