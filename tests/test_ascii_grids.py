"""AAIGrid + XYZ ASCII raster codecs (frmts/aaigrid, frmts/xyz)."""
import numpy as np
import pytest

from lib_gdal_ray.sources import ascii_grids as ag
from lib_gdal_ray.sources.rasters import identify, open_raster


def test_aaigrid_decode_canonical():
    text = b"""ncols        5
nrows        2
xllcorner    440720.0
yllcorner    3750120.0
cellsize     60.0
NODATA_value -99999
107 123 132 115 132
115 -99999 107 123 148
"""
    arr, meta = ag.decode_aaigrid(text)
    assert arr.shape == (2, 5)
    assert arr[0, 0] == 107 and np.isnan(arr[1, 1])
    assert meta["nodata"] == -99999
    # north-up affine anchored at the NW corner: yll + nrows*cellsize
    assert meta["transform"] == (440720.0, 60.0, 0.0,
                                 3750120.0 + 2 * 60.0, 0.0, -60.0)


def test_aaigrid_xllcenter():
    text = b"ncols 2\nnrows 1\nxllcenter 10.0\nyllcenter 5.0\ncellsize 2.0\n1 2\n"
    arr, meta = ag.decode_aaigrid(text)
    assert meta["transform"][0] == 9.0          # center - cellsize/2
    assert meta["transform"][3] == 4.0 + 2.0    # yll + h*dy


def test_aaigrid_roundtrip():
    arr = np.array([[1.5, 2.0, np.nan], [4.0, 5.25, 6.0]])
    gt = (100.0, 10.0, 0.0, 220.0, 0.0, -10.0)
    buf = ag.encode_aaigrid(arr, transform=gt)
    back, meta = ag.decode_aaigrid(buf)
    np.testing.assert_array_equal(np.isnan(back), np.isnan(arr))
    np.testing.assert_allclose(back[~np.isnan(arr)], arr[~np.isnan(arr)])
    assert meta["transform"] == gt


def test_aaigrid_integer_payload_stays_integer_text():
    buf = ag.encode_aaigrid(np.array([[1, 2], [3, 4]], dtype=np.int32))
    rows = buf.decode().splitlines()[-2:]
    assert rows == ["1 2", "3 4"]


def test_xyz_roundtrip():
    arr = np.array([[9.0, 8.0], [7.0, 6.5]])
    gt = (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)
    buf = ag.encode_xyz(arr, transform=gt)
    back, meta = ag.decode_xyz(buf)
    np.testing.assert_array_equal(back, arr)
    assert meta["transform"] == gt


def test_xyz_column_order_header():
    # "Y X Z" header like the reference's xyz.py test_xyz_3 stream
    content = b"Y X Z\n0 0 65\n0 1 66\n1 0 67\n1 1 68\n2 0 69\n2 1 70\n"
    arr, meta = ag.decode_xyz(content)
    assert arr.shape == (3, 2)
    # north-up normalization: top row = highest Y (=2) -> 69, 70
    np.testing.assert_array_equal(arr, [[69, 70], [67, 68], [65, 66]])
    assert meta["transform"][5] == -1.0


def test_xyz_missing_cells_are_nan():
    content = b"X Y Z\n0.5 0.5 1\n1.5 1.5 4\n"
    arr, _ = ag.decode_xyz(content)
    assert arr.shape == (2, 2)
    assert arr[1, 0] == 1 and arr[0, 1] == 4
    assert np.isnan(arr[0, 0]) and np.isnan(arr[1, 1])


def test_registry_dispatch():
    a = np.array([[3.0, 4.0]])
    asc = ag.encode_aaigrid(a)
    xyz = ag.encode_xyz(a)
    assert identify(asc) == "AAIGrid"
    assert identify(xyz) == "XYZ"
    for buf, drv in ((asc, "AAIGrid"), (xyz, "XYZ")):
        name, arr, meta = open_raster(buf)
        assert name == drv
        np.testing.assert_array_equal(arr, a)


def test_ray_pixels_over_asc(ray_session, tmp_path):
    from lib_gdal_ray.sources.rasters import read_raster_pixels

    arr = np.arange(6, dtype=np.float64).reshape(2, 3)
    (tmp_path / "g.asc").write_bytes(ag.encode_aaigrid(arr))
    rows = read_raster_pixels(str(tmp_path / "g.asc")).to_pandas()
    assert len(rows) == 6
    got = np.zeros((2, 3))
    got[rows["y"], rows["x"]] = rows["value"]
    np.testing.assert_array_equal(got, arr)


# ------------------------------------------------------------- SRTMHGT

def test_srtmhgt_roundtrip(tmp_path):
    from lib_gdal_ray.sources import srtmhgt as sh
    from lib_gdal_ray.sources.rasters import open_raster_path

    rng = np.random.default_rng(3)
    a = rng.integers(-100, 4000, (1201, 1201)).astype(np.int16)
    buf = sh.encode_srtmhgt(a)
    assert len(buf) == 1201 * 1201 * 2
    p = tmp_path / "N44W072.hgt"
    p.write_bytes(buf)
    name, back, meta = open_raster_path(str(p))
    assert name == "SRTMHGT"
    np.testing.assert_array_equal(back, a)
    # reference georef math: gt0 = lon - 0.5/(n-1), gt3 = lat+1+0.5/(n-1)
    px = 1.0 / 1200
    assert meta["transform"] == (-72 - 0.5 * px, px, 0.0,
                                 45 + 0.5 * px, 0.0, -px)


def test_srtmhgt_name_parsing():
    from lib_gdal_ray.sources.srtmhgt import parse_hgt_name

    assert parse_hgt_name("N44W072.hgt") == (44, -72)
    assert parse_hgt_name("/x/y/S09E140.hgt") == (-9, 140)
    with pytest.raises(ValueError):
        parse_hgt_name("whatever.hgt")


def test_open_raster_path_vrt(tmp_path):
    from lib_gdal_ray.codecs.tiff import encode_geotiff
    from lib_gdal_ray.sources.rasters import open_raster_path
    from lib_gdal_ray.sources.vrt import build_vrt, write_vrt

    a = np.arange(6, dtype=np.uint8).reshape(2, 3)
    (tmp_path / "a.tif").write_bytes(
        encode_geotiff(a, transform=(0, 1, 0, 2, 0, -1)))
    write_vrt(build_vrt([str(tmp_path / "a.tif")]), str(tmp_path / "m.vrt"))
    name, arr, _meta = open_raster_path(str(tmp_path / "m.vrt"))
    assert name == "VRT"
    np.testing.assert_array_equal(arr, a)
