"""DIMAP v1 driver + the TIFF decoder's PlanarConfig=2 / legacy
Deflate support it exercises, pinned on the reference fixtures
(autotest gdrivers/dimap.py, rgbsmall.tif)."""

import os
import shutil

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum

DATA = "/root/reference/autotest/gdrivers/data"


@pytest.fixture()
def dimap_dir(tmp_path):
    # the reference test copies the label + imagery + the VRT's
    # source side by side
    for f in ("dimap/METADATA.DIM", "dimap/IMAGERY.TIF",
              "rgbsmall.tif"):
        shutil.copy(f"{DATA}/{f}", tmp_path / os.path.basename(f))
    return tmp_path


def test_planar_legacy_deflate_tiff():
    from lib_gdal_ray.codecs.tiff import decode_geotiff

    with open(f"{DATA}/rgbsmall.tif", "rb") as f:
        arr, meta = decode_geotiff(f.read())
    # rgbsmall is PlanarConfig=2 + compression 32946; GDAL's pinned
    # band checksums are 21212/21053/21349
    assert arr.shape == (50, 50, 3)
    assert [int(gdal_checksum(arr[:, :, i])) for i in range(3)] == \
        [21212, 21053, 21349]


def test_dimap_v1(dimap_dir):
    from lib_gdal_ray.sources.rasters import open_raster_path

    drv, arr, meta = open_raster_path(str(dimap_dir / "METADATA.DIM"))
    assert drv == "DIMAP"
    # autotest dimap.py expectations
    assert meta["width"] == 6000 and meta["height"] == 6000
    assert meta["bands"] == 1
    assert int(gdal_checksum(arr[:100, :100])) == 21586
    assert meta["metadata"]["PROCESSING_LEVEL"] == "1A"
    assert meta["metadata"]["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"
    gcps = meta["gcps"]
    assert len(gcps) == 4
    assert gcps[0]["pixel"] == 0.5 and gcps[0]["line"] == 0.5
    np.testing.assert_allclose(gcps[0]["x"], 4.3641728, atol=2e-7)
    np.testing.assert_allclose(gcps[0]["y"], 44.2082255, atol=2e-7)
    assert meta["gcp_epsg"] == 4326
