"""PHOTOMOD PRF / x-dem driver (sources/prf.py).

Parity: reference PRF driver (`frmts/prf/phprfdataset.cpp`) on its
fixtures (`prf.py:test_prf_1..5`): ph.prf checksum 43190 + GeoRef
shift geotransform + .prj EPSG 32601; dem.x-dem dims/type/units/
overview descriptor + XR/YR-derived geotransform. The ph tiles are
old-style (no-early-change) LZW TIFFs — the compat fallback in the
TIFF codec is exercised here.
"""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.prf import open_prf, read_prf_pixels

D = "/root/reference/autotest/gdrivers/data/PRF"


class TestPrf:
    def test_ph_mosaic(self):
        # prf.py:test_prf_1 — checksum 43190, gt (1,2,3,-7,5,6)
        arr, meta = open_prf(f"{D}/ph.prf")
        assert arr.shape == (268, 201) and arr.dtype == np.uint16
        assert gdal_checksum(arr.astype(np.float64)) == 43190
        assert meta["transform"] == (1.0, 2.0, 3.0, -7.0, 5.0, 6.0)
        assert meta["epsg"] == 32601          # prf.py:test_prf_5

    def test_dem(self):
        # prf.py:test_prf_2/4 — 4330x4663 float32 metres, gt from
        # XR/YR ranges, one Pyramid overview, checksum 0
        arr, meta = open_prf(f"{D}/dem.x-dem")
        assert arr.shape == (4663, 4330) and arr.dtype == np.float32
        assert gdal_checksum(arr.astype(np.float64)) == 0
        assert meta["transform"] == (1.5, 1.0, 0.0, 9329.0, 0.0, -2.0)
        assert meta["units"] == "m"
        assert meta["overviews"] == 1
        assert meta["nodata"] == pytest.approx(-1111111.0)

    def test_ray_pixels(self):
        df = read_prf_pixels(f"{D}/ph.prf").to_pandas()
        full, _ = open_prf(f"{D}/ph.prf")
        dense = np.zeros(full.shape, dtype=np.float64)
        dense[df.y.values, df.x.values] = df.value.values
        assert gdal_checksum(dense) == 43190


class TestLzwCompat:
    def test_old_style_stream_fallback(self):
        # the PHOTOMOD tiles are no-early-change LZW; both variants
        # must decode their respective streams
        from lib_gdal_ray.codecs.tiff import (_lzw_decode,
                                              _lzw_encode)

        rng = np.random.default_rng(1)
        data = bytes(rng.integers(0, 256, 150000).astype(np.uint8))
        assert _lzw_decode(_lzw_encode(data)) == data
        b = open(f"{D}/ph/ph_0_0.tif", "rb").read()
        from lib_gdal_ray.codecs.tiff import decode_geotiff

        arr, _ = decode_geotiff(b)
        assert arr.shape == (128, 128) and arr.dtype == np.uint16
