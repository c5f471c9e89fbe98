"""ESRIC (Esri Compact Cache V2 + .tpkx) driver, pinned to the
reference autotest fixtures (gdrivers/esric.py expectations)."""

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data/esric"


class TestCompactCacheTar:
    def test_full_res_empty_level(self):
        # esric.py test_esric_2/3: 2048² × 4 bands, 3857 grid; the
        # deepest level carries no tiles → black, cs 0
        drv, arr, meta = open_raster_path(f"{DATA}/Layers.tar")
        assert drv == "ESRIC"
        assert arr.shape == (2048, 2048, 4)
        assert meta["epsg"] == 3857
        gt = meta["transform"]
        assert abs(gt[0] + 20037508) < 1
        assert abs(gt[1] - 20037508 / 1024) < 1
        assert abs(gt[3] - 20037508) < 1
        assert int(gdal_checksum(arr[:, :, 0])) == 0
        assert meta["levels"] == [0, 1, 2, 3]

    def test_level1_png_tiles(self):
        from lib_gdal_ray.sources.esric import decode_esric

        # esric.py test_esric_4: level 1 (overview 1), band 2 cs 46857
        arr, _ = decode_esric(f"{DATA}/Layers.tar", level=1)
        assert arr.shape == (512, 512, 4)
        assert int(gdal_checksum(arr[:, :, 1])) == 46857


class TestTpkx:
    def test_checksums(self):
        # esric.py test_tpkx_2/3 (EXTENT_SOURCE=TILING_SCHEME):
        # 8192² × 4, all four band checksums
        drv, arr, meta = open_raster_path(f"{DATA}/Usa.tpkx")
        assert drv == "ESRIC"
        assert arr.shape == (8192, 8192, 4)
        assert meta["epsg"] == 3857
        assert [int(gdal_checksum(arr[:, :, i])) for i in range(4)] \
            == [61275, 57672, 61542, 19476]
