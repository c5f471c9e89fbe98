"""ENVI raw rasters (frmts/raw/envidataset.cpp). Interleave parity
validated against the reference's rgbsmall bip/bil/bsq triplet during
development (all three decode identically here)."""
import numpy as np
import pytest

from lib_gdal_ray.sources import envi


@pytest.mark.parametrize("interleave", ["bsq", "bil", "bip"])
def test_roundtrip_interleaves(tmp_path, interleave):
    rng = np.random.default_rng(4)
    a = rng.integers(0, 4000, (7, 9, 3)).astype(np.uint16)
    hdr = str(tmp_path / "t.hdr")
    gt = (10.0, 0.5, 0.0, 20.0, 0.0, -0.5)
    envi.encode_envi(a, hdr, transform=gt, interleave=interleave)
    back, meta = envi.decode_envi(hdr)
    np.testing.assert_array_equal(back, a)
    assert meta["interleave"] == interleave
    np.testing.assert_allclose(meta["transform"], gt)


def test_single_band_and_float(tmp_path):
    a = np.linspace(0, 1, 12).reshape(3, 4).astype(np.float64)
    hdr = str(tmp_path / "f.hdr")
    envi.encode_envi(a, hdr)
    back, meta = envi.decode_envi(hdr)
    assert back.ndim == 2
    np.testing.assert_array_equal(back, a)
    assert meta["dtype"] == np.dtype("<f8")


def test_header_parsing_multiline_blocks():
    text = """ENVI
description = {
a multi-line
description}
samples = 4
lines = 2
bands = 1
data type = 1
interleave = bsq
byte order = 0
map info = {Geographic Lat/Lon, 1, 1, -44.5, -22.5, 0.1, 0.1, WGS-84}
"""
    hdr = envi.parse_envi_header(text)
    assert hdr["samples"] == "4"
    assert "multi-line" in hdr["description"]
    gt = envi._hdr_geotransform(hdr)
    assert gt == (-44.5, 0.1, 0.0, -22.5, 0.0, -0.1)


def test_reference_pixel_offset():
    # ref pixel (3, 2): x0 anchors 2 pixels left, y0 one pixel up
    hdr = {"map info": "{UTM, 3, 2, 100.0, 50.0, 10.0, 10.0, 4, North}"}
    gt = envi._hdr_geotransform({"map info":
                                 "UTM, 3, 2, 100.0, 50.0, 10.0, 10.0"})
    assert gt == (80.0, 10.0, 0.0, 60.0, 0.0, -10.0)


def test_ray_rows_all_interleaves(ray_session, tmp_path):
    rng = np.random.default_rng(8)
    a = rng.integers(0, 255, (20, 6, 2)).astype(np.uint8)
    for il in ("bsq", "bil", "bip"):
        hdr = str(tmp_path / f"{il}.hdr")
        envi.encode_envi(a, hdr, interleave=il)
        rows = envi.read_envi_rows(hdr, band=1,
                                   rows_per_chunk=7).to_pandas()
        got = np.zeros((20, 6))
        got[rows["y"], rows["x"]] = rows["value"]
        np.testing.assert_array_equal(got, a[:, :, 1].astype(np.float64))


def test_open_raster_path_envi(tmp_path):
    from lib_gdal_ray.sources.rasters import open_raster_path

    a = np.arange(6, dtype=np.uint8).reshape(2, 3)
    hdr = str(tmp_path / "e.hdr")
    envi.encode_envi(a, hdr)
    name, arr, _ = open_raster_path(hdr)
    assert name == "ENVI"
    np.testing.assert_array_equal(arr, a)
