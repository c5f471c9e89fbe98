"""STACTA (STAC tiled assets) driver, pinned to the reference's
autotest fixtures (gdrivers/stacta.py expectations)."""

import numpy as np

from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data/stacta"


def test_basic():
    # stacta.py test_stacta_basic: 3 bands, 2048×1024, WGS84 grid
    drv, arr, meta = open_raster_path(f"{DATA}/test.json")
    assert drv == "STACTA"
    assert arr.shape == (1024, 2048, 3)
    np.testing.assert_allclose(
        meta["transform"],
        [-180.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125], rtol=1e-8)
    assert meta["nodata"] == 0.0
    assert meta["overview_zooms"] == [0, 1]  # 2 overview levels
    # pixel equality with the level-2 tiles (the reference's VRT ref)
    t0 = open_raster_path(f"{DATA}/WorldCRS84Quad/2/0/0.tif")[1]
    t1 = open_raster_path(f"{DATA}/WorldCRS84Quad/2/0/1.tif")[1]
    np.testing.assert_array_equal(arr[:, :1024], t0)
    np.testing.assert_array_equal(arr[:, 1024:], t1)


def test_east_hemisphere():
    # min_tile_col = 1 at zoom 2 → gt x0 = 0
    drv, arr, meta = open_raster_path(
        f"{DATA}/test_east_hemisphere.json")
    assert arr.shape == (1024, 1024, 3)
    np.testing.assert_allclose(
        meta["transform"],
        [0.0, 0.17578125, 0.0, 90.0, 0.0, -0.17578125],
        rtol=1e-8, atol=1e-10)
    t1 = open_raster_path(f"{DATA}/WorldCRS84Quad/2/0/1.tif")[1]
    np.testing.assert_array_equal(arr, t1)


def test_overview_zoom():
    from lib_gdal_ray.sources.stacta import decode_stacta

    a1, m1 = decode_stacta(f"{DATA}/test.json", zoom=1)
    assert a1.shape == (512, 1024, 3)
    np.testing.assert_allclose(m1["transform"][1], 0.3515625,
                               rtol=1e-8)
