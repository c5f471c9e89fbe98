"""EHdr / ERS raw-raster parity (sources/rawbin.py) vs the
reference's autotest GDAL-checksum expectations (gdrivers/ehdr.py,
gdrivers/ers.py)."""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rawbin import (decode_ehdr, decode_ers,
                                         identify_ehdr, identify_ers)
from lib_gdal_ray.sources.rasters import open_raster_path

D = "/root/reference/autotest/gdrivers/data"


def test_ehdr_size_inferred_float():
    """ehdr.py:test_ehdr_10 (#3933) — no NBITS: 4 B/pixel by file
    size => Float32, checksum 8202."""
    arr, meta = decode_ehdr(f"{D}/ehdr/ehdr10.bil")
    assert arr.dtype == np.dtype(">f4")
    assert gdal_checksum(arr) == 8202


def test_ehdr_flt_extension():
    """ehdr.py:test_ehdr_11 — .flt data extension => Float32."""
    arr, _ = decode_ehdr(f"{D}/ehdr/ehdr11.flt")
    assert arr.dtype == np.dtype(">f4")
    assert gdal_checksum(arr) == 8202


def test_ehdr_float32_pixeltype():
    arr, meta = decode_ehdr(f"{D}/ehdr/float32.bil")
    assert arr.dtype == np.float32
    assert gdal_checksum(arr) == 27
    # ULXMAP/ULYMAP anchor the pixel CENTER
    assert meta["transform"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0,
                                 -60.0)


def test_ehdr_worldclim_signed_from_nodata():
    """ehdr.py:test_ehdr_9 — negative NODATA implies signed int;
    hdr extension fields carry declared min/max."""
    arr, meta = decode_ehdr(f"{D}/ehdr/wc_10m_CCCMA_A2a_2020_tmin_9.bil")
    assert arr.dtype == np.dtype("<i2")
    assert meta["min"] == -191 and meta["max"] == 315
    assert meta["nodata"] == -9999


def test_ers_srtm():
    """ers.py:29 — checksum 64074; DMS registration coord; comments
    inside and outside quoted strings."""
    arr, meta = decode_ers(f"{D}/ers/srtm.ers")
    assert arr.dtype == np.dtype(">i2")
    assert gdal_checksum(arr) == 64074
    gt = meta["transform"]
    assert gt[3] == pytest.approx(-60 + 0.00833333)  # RegistrationCellY=1
    assert gt[0] == pytest.approx(-180 - 0.00833333)
    assert meta["nodata"] == 9999


def test_ers_dem():
    arr, _ = decode_ers(f"{D}/ers/ers_dem.ers")
    assert gdal_checksum(arr) == 56588


def test_ers_case_insensitive():
    """ers.py:115-119 — keys in arbitrary case; band description."""
    assert identify_ers(f"{D}/ers/caseinsensitive.ers")
    _, meta = decode_ers(f"{D}/ers/caseinsensitive.ers")
    assert meta["band_desc"] == "RTP 1st Vertical Derivative"


def test_open_raster_path_dispatch():
    name, arr, _ = open_raster_path(f"{D}/ehdr/ehdr10.bil")
    assert name == "EHdr" and gdal_checksum(arr) == 8202
    name, arr, _ = open_raster_path(f"{D}/ers/srtm.ers")
    assert name == "ERS" and gdal_checksum(arr) == 64074
    assert identify_ehdr(f"{D}/ehdr/float32.bil")
    # an ENVI .hdr must NOT be claimed by EHdr
    assert not identify_ehdr("/nonexistent/x.bil")
