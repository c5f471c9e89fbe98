"""PDS3 reader parity (sources/pds.py) vs autotest/gdrivers/pds.py
checksum + geotransform expectations."""

import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.pds import decode_pds, identify_pds

D = "/root/reference/autotest/gdrivers/data/pds"


def test_mc02():
    """pds.py:test_pds_1 — cs 47151, -0.5 projection offset shift."""
    buf = open(f"{D}/mc02_truncated.img", "rb").read()
    assert identify_pds(buf)
    arr, meta = decode_pds(buf, sample_offset_shift=-0.5,
                           line_offset_shift=-0.5)
    assert gdal_checksum(arr) == 47151
    gt = meta["transform"]
    assert gt[1] == pytest.approx(926.115274, abs=0.1)
    assert gt[0] == pytest.approx(-10668384.9, abs=5.0)


def test_fl73n003():
    """pds.py:test_pds_2 — cs 34962."""
    arr, _ = decode_pds(open(f"{D}/fl73n003_truncated.img", "rb").read())
    assert gdal_checksum(arr) == 34962


def test_detached_with_byte_offset():
    """pds.py:test_pds_4 (#3177) — ('small.raw', 3 <BYTES>) pointer;
    cs 3418; exact expected geotransform."""
    buf = open(f"{D}/pds_3177.lbl", "rb").read()
    arr, meta = decode_pds(buf, path=f"{D}/pds_3177.lbl",
                           sample_offset_shift=-0.5,
                           line_offset_shift=-0.5)
    assert gdal_checksum(arr) == 3418
    gt_expected = (6119184.3590369327, 1.0113804322107001, 0.0,
                   -549696.39009125973, 0.0, -1.0113804322107001)
    assert meta["transform"] == pytest.approx(gt_expected)


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/mc02_truncated.img")
    assert name == "PDS" and gdal_checksum(arr) == 47151
