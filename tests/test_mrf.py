"""MRF (Meta Raster Format) driver over the reference's shipped
byte fixtures (autotest gdrivers/data/mrf/{none,deflate,png,tif,
jpeg}) — all lossless variants pin byte.tif's checksum 4672."""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data/mrf"


@pytest.mark.parametrize("variant", ["none", "deflate", "png", "tif"])
def test_lossless_variants(variant):
    drv, arr, meta = open_raster_path(f"{DATA}/{variant}/byte.mrf")
    assert drv == "MRF"
    assert arr.shape == (20, 20) and arr.dtype == np.uint8
    assert int(gdal_checksum(arr)) == 4672
    np.testing.assert_allclose(
        meta["transform"], (440720, 60, 0, 3751320, 0, -60))
    assert meta["epsg"] == 26711


def test_jpeg_variant():
    # lossy: GDAL's own accepted set varies by libjpeg build
    # (4603/4652/...); our pure-numpy IDCT lands deterministically
    drv, arr, _ = open_raster_path(f"{DATA}/jpeg/byte.mrf")
    assert drv == "MRF"
    assert int(gdal_checksum(arr)) == 4658
    # near byte.tif: bounded per-pixel JPEG error (quality-99 stream,
    # worst pixel off by 19 against the original)
    ref = open_raster_path(
        "/root/reference/autotest/gdrivers/data/byte.tif")[1]
    diff = np.abs(arr.astype(int) - ref.astype(int))
    assert diff.max() <= 25 and diff.mean() < 6
