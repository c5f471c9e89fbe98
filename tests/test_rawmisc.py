"""Raw-misc drivers (EIR/GenBin/ISCE/ROI_PAC/NDF/SNODAS/NOAA_B/CTG/
NGSGEOID/LOSLAS/NSIDCbin) pinned against the reference's own autotest
expectations (`autotest/gdrivers/{eir,genbin,isce,roipac,ndf,snodas,
noaa_b,ctg,ngsgeoid,loslas,nsidcbin}.py`)."""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data"


def _gt_close(gt, expected, eps=1e-6):
    assert gt is not None
    for a, b in zip(gt, expected):
        assert abs(a - b) <= eps * max(1.0, abs(b)), (gt, expected)


def test_eir():
    drv, arr, meta = open_raster_path(f"{DATA}/eir/fakeeir.hdr")
    assert drv == "EIR"
    assert arr.shape == (1, 1) and arr.dtype == np.uint8
    # autotest eir.py: GDALTest("EIR", "eir/fakeeir.hdr", 1, 1)
    assert gdal_checksum(arr) == 1


def test_genbin():
    drv, arr, meta = open_raster_path(f"{DATA}/genbin/tm4628_96.bil")
    assert drv == "GenBin"
    assert arr.shape == (8432, 9284, 7)
    # genbin.py: checksum 5738 over window (0, 0, 500, 1)
    assert gdal_checksum(arr[0:1, 0:500, 0]) == 5738
    _gt_close(meta["transform"],
              (1181700.9894981384, 82.021003723042099, 0.0,
               596254.01050186157, 0.0, -82.021003723045894), 1e-9)
    assert meta["state_plane_zone"] == 5626


def test_isce():
    drv, arr, meta = open_raster_path(f"{DATA}/isce/isce.slc")
    assert drv == "ISCE"
    assert arr.shape == (10, 12) and arr.dtype == np.complex64
    # isce.py: GDALTest("isce", "isce/isce.slc", 1, 350)
    assert gdal_checksum(arr) == 350
    _gt_close(meta["transform"],
              (14.259166666666667, 0.0008333333333333334, 0.0,
               38.22083333333333, 0.0, -0.0008333333333333334), 1e-12)
    assert meta["isce_metadata"]["IMAGE_TYPE"] == "slc"


def test_roipac():
    drv, arr, meta = open_raster_path(f"{DATA}/roipac/srtm.dem")
    assert drv == "ROI_PAC"
    assert arr.shape == (10, 12) and arr.dtype == np.int16
    # roipac.py: GDALTest("roi_pac", "roipac/srtm.dem", 1, 64074)
    assert gdal_checksum(arr) == 64074
    _gt_close(meta["transform"],
              (-180.0083333, 0.0083333333, 0.0,
               -59.9916667, 0.0, -0.0083333333), 1e-7)
    assert meta["roipac_metadata"]["YMAX"] == "9"
    assert meta["offset"] == 1.0 and meta["scale"] == 2.0


def test_ndf():
    drv, arr, meta = open_raster_path(
        f"{DATA}/ndf/LE7134052000500350.H3")
    assert drv == "NDF"
    assert arr.shape == (14680, 15620) and arr.dtype == np.uint8
    # ndf.py: checksum 6510 over window (0, 0, 15620, 1)
    assert gdal_checksum(arr[0:1, :]) == 6510
    _gt_close(meta["transform"],
              (320325.75, 14.25, 0, 1383062.25, 0, -14.25), 1e-4)
    assert meta["utm_zone"] == 46


def test_snodas():
    drv, arr, meta = open_raster_path(
        f"{DATA}/snodas/fake_snodas.hdr")
    assert drv == "SNODAS"
    assert arr.shape == (3351, 6935) and arr.dtype == np.int16
    _gt_close(meta["transform"],
              (-124.733749999995, 0.0083333333333330643, 0.0,
               52.874583333331302, 0.0, -0.0083333333333330054), 1e-12)
    assert meta["nodata"] == -9999
    assert meta["min"] == 0 and meta["max"] == 429


@pytest.mark.parametrize("fn", ["test.b", "test_little_endian.b"])
def test_noaa_b(fn):
    drv, arr, meta = open_raster_path(f"{DATA}/noaa_b/{fn}")
    assert drv == "NOAA_B"
    # noaa_b.py: GDALTest("NOAA_B", ..., 1, 3)
    assert gdal_checksum(arr) == 3
    _gt_close(meta["transform"], (1.75, 0.5, 0.0, 49.25, 0.0, -0.5),
              1e-12)


def test_ctg():
    drv, arr, meta = open_raster_path(f"{DATA}/ctg/fake_grid_cell")
    assert drv == "CTG"
    assert arr.shape[2] == 6 and arr.dtype == np.int32
    # ctg.py: GDALTest("CTG", "ctg/fake_grid_cell", 1, 21)
    assert gdal_checksum(arr[:, :, 0]) == 21
    _gt_close(meta["transform"],
              (421000.0, 200.0, 0.0, 5094400.0, 0.0, -200.0), 1e-12)
    assert meta["epsg"] == 32614
    assert meta["nodata"] == 0.0
    assert meta["band_descriptions"][0] == "Land Use and Land Cover"


@pytest.mark.parametrize("fn", ["g2009u01_le_truncated.bin",
                                "g2009u01_be_truncated.bin"])
def test_ngsgeoid(fn):
    drv, arr, meta = open_raster_path(f"{DATA}/ngsgeoid/{fn}")
    assert drv == "NGSGEOID"
    assert arr.dtype == np.float32
    # the "truncated" fixtures are legally complete 1x1 grids
    assert arr.shape == (1, 1)
    # ngsgeoid.py: GDALTest("NGSGEOID", ..., 1, 65534)
    assert gdal_checksum(arr) == 65534
    _gt_close(meta["transform"],
              (229.99166666666667, 0.016666666666670001, 0.0,
               40.00833333333334, 0.0, -0.016666666666670001), 1e-12)


def test_loslas():
    drv, arr, meta = open_raster_path(f"{DATA}/loslas/wyhpgn.los")
    assert drv == "LOSLAS"
    assert arr.shape == (21, 33) and arr.dtype == np.float32
    _gt_close(meta["transform"],
              (-111.625, 0.25, 0.0, 45.625, 0.0, -0.25), 1e-12)
    # loslas.py pinned stats (min/max/mean/std)
    assert abs(arr.min() - -0.027868999168276787) < 1e-12
    assert abs(arr.max() - 0.033906999975442886) < 1e-12
    assert abs(arr.mean() - 0.009716129862575248) < 1e-9
    assert abs(arr.std() - 0.008260044951413324) < 1e-9


def test_nsidcbin():
    drv, arr, meta = open_raster_path(
        f"{DATA}/nsidcbin/nt_20220409_f18_nrt_s.bin")
    assert drv == "NSIDCbin"
    assert arr.shape[1] == 316 and arr.dtype == np.uint8
    # nsidcbin.py: pixel (60, 44) == 27
    assert int(arr[44, 60]) == 27
    assert meta["epsg"] == 3412  # ANTARCTIC → south grid
    _gt_close(meta["transform"],
              (-3950000.0, 25000.0, 0.0, 4350000.0, 0.0, -25000.0),
              1e-12)
