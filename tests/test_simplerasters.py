"""Parity pins for the small raw-grid drivers (sources/simplerasters.py,
sources/usgsdem.py) — expected checksums and geotransforms are the
reference suite's own (autotest/gdrivers/{usgsdem,lan,pnm,saga,ntv2,
idrisi,bt,kro}.py)."""

import os

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.simplerasters import (decode_bt, decode_kro,
                                                decode_lan, decode_ntv2,
                                                decode_pnm, decode_rst,
                                                decode_saga, encode_bt,
                                                encode_kro, encode_pnm,
                                                encode_rst, encode_saga)
from lib_gdal_ray.sources.usgsdem import decode_usgsdem

D = "/root/reference/autotest/gdrivers/data/"

pytestmark = pytest.mark.skipif(not os.path.isdir(D),
                                reason="reference fixtures absent")


def _cs(a, band=0):
    return gdal_checksum(a if a.ndim == 2 else a[:, :, band])


def _read(rel):
    with open(D + rel, "rb") as fh:
        return fh.read()


# ---- USGS DEM: all 8 fixture checksums + geotransforms -----------------

USGSDEM = [
    ("022gdeme_truncated", 1583,
     (-67.00041667, 0.00083333, 0.0, 50.000416667, 0.0, -0.00083333)),
    ("114p01_0100_deme_truncated.dem", 53864,
     (-136.25010416667, 0.000208333, 0.0, 59.25010416667, 0.0,
      -0.000208333)),
    ("39079G6_truncated.dem", 61424, (606855.0, 30.0, 0.0, 4414605.0, 0.0,
                                      -30.0)),
    ("39109h1_truncated.dem", 39443, (660055.0, 10.0, 0.0, 4429465.0, 0.0,
                                      -10.0)),
    ("4619old_truncated.dem", 10659,
     (18.99958333, 0.0008333, 0.0, 47.000416667, 0.0, -0.0008333)),
    ("usgsdem_with_extra_values_at_end_of_profile.dem", 56679, None),
    ("usgsdem_with_spaces_after_byte_864.dem", 61078, None),
    ("record_1025_ending_with_linefeed.dem", 14172, None),
]


@pytest.mark.parametrize("name,cs,gt", USGSDEM)
def test_usgsdem(name, cs, gt):
    arr, meta = decode_usgsdem(_read("usgsdem/" + name))
    assert gdal_checksum(arr) == cs
    if gt is not None:
        assert np.allclose(meta["transform"], gt, atol=1e-6)


def test_usgsdem_dtype_election():
    arr, _ = decode_usgsdem(_read("usgsdem/022gdeme_truncated"))
    assert arr.dtype == np.int16
    arr, _ = decode_usgsdem(_read("usgsdem/39109h1_truncated.dem"))
    assert arr.dtype == np.float32  # fractional vertical resolution


# ---- LAN / PNM / SAGA / NTv2 / RST reads --------------------------------

def test_lan():  # lan.py: fakelan + fakelan4bit both checksum 10
    a, m = decode_lan(_read("lan/fakelan.lan"))
    assert _cs(a) == 10
    a4, _ = decode_lan(_read("lan/fakelan4bit.lan"))
    assert _cs(a4) == 10


def test_pnm():  # pnm.py: byte.pgm 4672, rgbsmall.ppm band2 21053
    a, _ = decode_pnm(_read("pnm/byte.pgm"))
    assert _cs(a) == 4672
    rgb, _ = decode_pnm(_read("pnm/rgbsmall.ppm"))
    assert _cs(rgb, 1) == 21053


def test_saga():  # saga.py: 4byteFloat checksum 108, nodata -99999
    a, m = decode_saga(D + "saga/4byteFloat.sdat")
    assert _cs(a) == 108
    assert m["nodata"] == -99999.0
    az, _ = decode_saga(D + "saga/4byteFloat.sg-grd-z")  # zip container
    assert _cs(az) == 108


@pytest.mark.parametrize("name", ["test_ntv2_le.gsb", "test_ntv2_be.gsb"])
def test_ntv2(name):  # ntv2.py: band 2 checksum 10 (both byte orders)
    a, m = decode_ntv2(_read("ntv2/" + name))
    assert a.shape[2] == 4
    assert _cs(a, 1) == 10
    # GDAL's own formula: (w_long - inc/2)/3600 etc (ntv2dataset.cpp)
    assert np.allclose(m["transform"], (-5.55, 7.8, 0.0, 52.05, 0.0, -5.55))


def test_rst():  # idrisi.py: byte.rst 5044, real.rst 5275
    a, _ = decode_rst(D + "rst/byte.rst")
    assert gdal_checksum(a) == 5044
    a, _ = decode_rst(D + "rst/real.rst")
    assert gdal_checksum(a) == 5275


# ---- BT / KRO / write roundtrips (bt.py / kro.py semantics) -------------

def test_bt_roundtrip():
    rgb, _ = decode_pnm(_read("pnm/rgbsmall.ppm"))
    band = rgb[:, :, 1].astype(np.int16)
    a, m = decode_bt(encode_bt(band, transform=(10, 5, 0, 100, 0, -5)))
    assert _cs(a) == 21053
    assert a.dtype == np.int16
    assert m["transform"] == (10.0, 5.0, 0.0, 100.0, 0.0, -5.0)
    f = band.astype(np.float32) / 3
    af, _ = decode_bt(encode_bt(f))
    assert np.array_equal(af, f.astype(np.float32))


def test_kro_roundtrip():
    rgb, _ = decode_pnm(_read("pnm/rgbsmall.ppm"))
    a, _ = decode_kro(encode_kro(rgb))
    assert _cs(a, 1) == 21053
    u16 = (rgb[:, :, 0].astype(np.uint16) * 250)
    a, _ = decode_kro(encode_kro(u16))
    assert np.array_equal(a, u16)
    f32 = rgb[:, :, 0].astype(np.float32) * 0.5
    a, _ = decode_kro(encode_kro(f32))
    assert np.array_equal(a, f32)


def test_pnm_roundtrip():
    rgb, _ = decode_pnm(_read("pnm/rgbsmall.ppm"))
    a, _ = decode_pnm(encode_pnm(rgb))
    assert np.array_equal(a, rgb)


def test_saga_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    grid = rng.normal(size=(13, 9)).astype(np.float32)
    hdr, body = encode_saga(grid, transform=(100, 2, 0, 400, 0, -2))
    (tmp_path / "g.sgrd").write_text(hdr)
    (tmp_path / "g.sdat").write_bytes(body)
    a, m = decode_saga(str(tmp_path / "g.sdat"))
    assert np.array_equal(a, grid)
    assert m["transform"] == (100.0, 2.0, 0.0, 400.0, 0.0, -2.0)


def test_rst_roundtrip(tmp_path):
    grid = (np.arange(77, dtype=np.int16) % 31).reshape(7, 11)
    body, rdc = encode_rst(grid, transform=(0, 1, 0, 7, 0, -1))
    (tmp_path / "g.rst").write_bytes(body)
    (tmp_path / "g.rdc").write_text(rdc)
    a, _ = decode_rst(str(tmp_path / "g.rst"))
    assert np.array_equal(a, grid)


def test_open_raster_path_dispatch(tmp_path):
    from lib_gdal_ray.sources.rasters import open_raster_path
    rgb, _ = decode_pnm(_read("pnm/rgbsmall.ppm"))
    p = tmp_path / "t.bt"
    p.write_bytes(encode_bt(rgb[:, :, 0].astype(np.int16)))
    name, arr, meta = open_raster_path(str(p))
    assert name == "BT"
    for rel, drv in (("lan/fakelan.lan", "LAN"), ("pnm/byte.pgm", "PNM"),
                     ("ntv2/test_ntv2_le.gsb", "NTV2"),
                     ("rst/byte.rst", "RST"), ("saga/4byteFloat.sdat",
                                               "SAGA"),
                     ("usgsdem/record_1025_ending_with_linefeed.dem",
                      "USGSDEM")):
        name, arr, meta = open_raster_path(D + rel)
        assert name == drv, rel
