"""BYN geoid grid parity (sources/byn.py) vs
autotest/gdrivers/byn.py (checksum 64764 incl. the
tolerated-invalid-header variant)."""

import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.byn import decode_byn, identify_byn

D = "/root/reference/autotest/gdrivers/data/byn"


@pytest.mark.parametrize("fname", ["cgg2013ai08_reduced.byn",
                                   "test_invalid_header_bytes.byn"])
def test_byn(fname):
    p = f"{D}/{fname}"
    buf = open(p, "rb").read()
    assert identify_byn(buf, p)
    arr, meta = decode_byn(buf)
    assert arr.shape == (24, 48)
    assert gdal_checksum(arr) == 64764
    gt = meta["transform"]
    assert gt[0] == pytest.approx(-170.0)
    assert gt[3] == pytest.approx(90.0)


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/cgg2013ai08_reduced.byn")
    assert name == "BYN" and gdal_checksum(arr) == 64764
