"""MiraMon raster driver (sources/miramon.py).

Parity: reference MiraMonRaster expectations
(`miramon_read.py:test_miramon_test_basic_raster` init_list): all six
sample types raw + RLE read [0..5] with checksum 15 and the
EXTENT-derived geotransform; the bit-packed chess board reads the
pinned pattern with checksum 32 and the rows-anchored default
geotransform; the all-nodata raster checksums 0.
"""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.miramon import open_miramon, read_miramon_pixels

D = "/root/reference/autotest/gdrivers/data/miramon"
GT = (516792.0, 2.0, 0.0, 4638260.0, 0.0, -2.0)


class TestBasicRasterMatrix:
    @pytest.mark.parametrize("base", ["byte", "integer", "uinteger",
                                      "long", "real", "double"])
    @pytest.mark.parametrize("suffix", ["", "_RLE"])
    def test_types(self, base, suffix):
        arr, meta = open_miramon(
            f"{D}/normal/{base}_2x3_6_categs{suffix}.img")
        assert list(arr.ravel()) == [0, 1, 2, 3, 4, 5]
        assert gdal_checksum(arr.astype(np.float64)) == 15
        assert meta["transform"] == GT
        assert meta["epsg"] == 25831   # UTM-31N-ETRS89

    def test_open_by_rel_and_no_index(self):
        arr, _ = open_miramon(f"{D}/normal/byte_2x3_6_categsI.rel")
        assert gdal_checksum(arr.astype(np.float64)) == 15
        arr, _ = open_miramon(
            f"{D}/normal/byte_2x3_6_categs_RLE_no_ind.img")
        assert list(arr.ravel()) == [0, 1, 2, 3, 4, 5]

    def test_chess_bit(self):
        arr, meta = open_miramon(f"{D}/normal/chess_bit.img")
        assert arr.shape == (8, 8)
        assert gdal_checksum(arr.astype(np.float64)) == 32
        assert list(arr.ravel()[:16]) == [0, 1, 0, 1, 0, 1, 0, 1,
                                          1, 0, 1, 0, 1, 0, 1, 0]
        assert meta["transform"] == (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)

    def test_all_nodata(self):
        arr, meta = open_miramon(f"{D}/all_nodata/nodataI.rel")
        assert gdal_checksum(arr.astype(np.float64)) == 0
        assert meta["nodata"] == 0.0

    def test_ray_pixels(self):
        df = read_miramon_pixels(
            f"{D}/normal/long_2x3_6_categs.img").to_pandas()
        dense = np.zeros((3, 2))
        dense[df.y.values, df.x.values] = df.value.values
        assert gdal_checksum(dense) == 15
