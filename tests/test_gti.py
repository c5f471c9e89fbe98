"""GTI (GDAL raster tile index) driver, pinned on the reference's
tile-001.gti.gpkg fixture + a synthesized overlap index
(autotest/gdrivers/gti.py semantics)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lib_gdal_ray.sources.rasters import open_raster_path

FIX = "/root/reference/autotest/gdrivers/data/gti/tile-001.gti.gpkg"


def test_fixture_mosaic():
    drv, arr, meta = open_raster_path(FIX)
    assert drv == "GTI"
    # two vertically-adjacent 256² RGB uint16 tiles
    assert arr.shape == (512, 256, 3) and arr.dtype == np.uint16
    assert meta["n_tiles"] == 2 and meta["epsg"] == 4326
    t0 = open_raster_path(
        "/root/reference/autotest/gdrivers/data/gti/tile-001-000.tif")[1]
    t1 = open_raster_path(
        "/root/reference/autotest/gdrivers/data/gti/tile-001-001.tif")[1]
    np.testing.assert_array_equal(arr[:256], t0)
    np.testing.assert_array_equal(arr[256:], t1)
    gt = meta["transform"]
    np.testing.assert_allclose(gt[0], -112.598163789183)
    np.testing.assert_allclose(gt[1], 0.022996972672)
    np.testing.assert_allclose(gt[3], 32.72613051801)


def test_overlap_last_wins_and_pixels(tmp_path, ray_session):
    from lib_gdal_ray.codecs.tiff import encode_geotiff
    from lib_gdal_ray.geom.wkb import box_to_wkb
    from lib_gdal_ray.sources.gti import read_gti_pixels

    # two 4x4 tiles, the second overlapping the first's right half
    a = np.full((4, 4), 1, dtype=np.uint8)
    b = np.full((4, 4), 9, dtype=np.uint8)
    pa_ = str(tmp_path / "a.tif")
    pb = str(tmp_path / "b.tif")
    with open(pa_, "wb") as f:
        f.write(encode_geotiff(a, transform=(0, 1, 0, 4, 0, -1),
                               epsg=4326))
    with open(pb, "wb") as f:
        f.write(encode_geotiff(b, transform=(2, 1, 0, 4, 0, -1),
                               epsg=4326))
    idx = str(tmp_path / "index.gti.parquet")
    pq.write_table(pa.table({
        "location": pa.array(["a.tif", "b.tif"]),
        "geometry": pa.array([box_to_wkb(0, 0, 4, 4),
                              box_to_wkb(2, 0, 6, 4)], pa.binary()),
    }), idx)

    drv, arr, meta = open_raster_path(idx)
    assert drv == "GTI" and arr.shape == (4, 6)
    assert (arr[:, :2] == 1).all()
    assert (arr[:, 2:4] == 9).all()  # later feature paints over
    assert (arr[:, 4:] == 9).all()

    df = read_gti_pixels(idx).to_pandas()
    # streaming path: per-tile tasks emit mosaic-frame coordinates
    dense = np.zeros((4, 6))
    # replay in feature order for the overlap rule
    half = len(df) // 2
    for part in (df.iloc[:half], df.iloc[half:]):
        dense[part["y"].to_numpy(), part["x"].to_numpy()] = \
            part["value"].to_numpy()
    np.testing.assert_array_equal(dense, arr)
