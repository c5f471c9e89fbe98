"""NITF reader parity (sources/nitf.py) vs
autotest/gdrivers/nitf.py — uncompressed segments: RGB IMODE B
(cs 21349 band 3), 1-bit (cs 170), and the NM masked variants."""

import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.nitf import decode_nitf, identify_nitf

D = "/root/reference/autotest/gdrivers/data/nitf"


def test_rgb():
    """nitf.py:227 — 3-band uncompressed, band 3 checksum 21349."""
    buf = open(f"{D}/rgb.ntf", "rb").read()
    assert identify_nitf(buf)
    arr, meta = decode_nitf(buf)
    assert arr.shape == (50, 50, 3)
    assert gdal_checksum(arr[:, :, 2]) == 21349
    assert meta["imode"] == "B" and meta["ic"] == "NC"


def test_one_bit():
    """nitf.py:330 — 1-bit bit-packed data, checksum 170."""
    arr, _ = decode_nitf(open(f"{D}/i_3034c.ntf", "rb").read())
    assert arr.shape == (18, 35)
    assert gdal_checksum(arr) == 170


@pytest.mark.parametrize("fname", ["ns3034d.nsf", "i_3034f.ntf"])
def test_masked_nm(fname):
    """nitf.py:554 — IC=NM mask header with per-block offsets."""
    arr, meta = decode_nitf(open(f"{D}/{fname}", "rb").read())
    assert meta["ic"] == "NM"
    assert gdal_checksum(arr) == 170


def test_compressed_rejected():
    with pytest.raises(NotImplementedError):
        decode_nitf(open(f"{D}/U_1050A.NTF", "rb").read())


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/rgb.ntf")
    assert name == "NITF" and arr.shape == (50, 50, 3)
