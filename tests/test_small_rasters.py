"""TGA / ZMap / JDEM / HF2 / FITS / AIGrid parity, pinned against the
reference's own autotest expectations (autotest/gdrivers/{tga,zmap,
jdem,hf2,fits,aigrid}.py)."""

import numpy as np
import pytest

from lib_gdal_ray.codecs.tiff import decode_geotiff
from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import open_raster_path

D = "/root/reference/autotest/gdrivers/data"
G = "/root/reference/autotest/gcore/data"


def _byte_tif():
    return decode_geotiff(open(f"{G}/byte.tif", "rb").read())


# ------------------------------------------------------------------ TGA

TGA_CASES = [  # (file, [per-band checksums])
    ("ref_test_suite/cbw8.tga", [43089]),
    ("ref_test_suite/ccm8.tga", [38151]),
    ("ref_test_suite/ctc24.tga", [9797, 9952, 9848]),
    ("ref_test_suite/ubw8.tga", [43089]),
    ("ref_test_suite/ucm8.tga", [38151]),
    ("ref_test_suite/utc16.tga", [64747, 64839, 64796]),
    ("ref_test_suite/utc24.tga", [9797, 9952, 9848]),
    ("ref_test_suite/utc32.tga", [9797, 9952, 9848, 0]),
    ("stefan_full_rgba.tga", [12603, 58561, 36064, 10807]),
    ("from_ffmpeg_samples/test1g.tga", [13077]),
    ("from_ffmpeg_samples/TEST24rle.tga", [39607, 6458, 44534]),
]


@pytest.mark.parametrize("name,want", TGA_CASES,
                         ids=[c[0].split("/")[-1] for c in TGA_CASES])
def test_tga(name, want):
    fmt, arr, meta = open_raster_path(f"{D}/tga/{name}")
    assert fmt == "TGA"
    got = [gdal_checksum(arr)] if arr.ndim == 2 else \
        [gdal_checksum(arr[:, :, b]) for b in range(arr.shape[2])]
    assert got == want


def test_tga_metadata_and_palette():
    _, _, meta = open_raster_path(f"{D}/tga/ref_test_suite/cbw8.tga")
    assert meta["AUTHOR_NAME"] == "Ricky True"
    assert meta["COMMENTS"] == \
        "Sample 8 bit run length compressed black and white image"
    assert meta["IMAGE_ID"] == "Truevision(R) Sample Image"
    _, _, meta = open_raster_path(f"{D}/tga/ref_test_suite/ccm8.tga")
    pal = meta["palette"]
    assert tuple(pal[0]) == (0, 0, 0, 255)
    assert tuple(pal[1]) == (8, 8, 8, 255)
    assert tuple(pal[64]) == (248, 0, 0, 255)


# ----------------------------------------------------------------- ZMap

def test_zmap_roundtrip():  # zmap.py: byte.tif -> ZMap -> cs 4672
    from lib_gdal_ray.sources.gridformats import decode_zmap, encode_zmap

    arr, meta = _byte_tif()
    out, m2 = decode_zmap(encode_zmap(arr, transform=meta["transform"]))
    assert gdal_checksum(out) == 4672
    assert np.allclose(m2["transform"], meta["transform"])


# ----------------------------------------------------------------- JDEM

def test_jdem():  # jdem.py: fakejdem.mem cs 15
    fmt, arr, meta = open_raster_path(f"{D}/jdem/fakejdem.mem")
    assert fmt == "JDEM"
    assert arr.dtype == np.float32
    assert gdal_checksum(arr) == 15


# ------------------------------------------------------------------ HF2

def test_hf2_roundtrips():  # hf2.py tests 1-4 analogs
    from lib_gdal_ray.sources.gridformats import decode_hf2, encode_hf2
    from lib_gdal_ray.sources.hfa import decode_hfa
    from lib_gdal_ray.sources.dted import decode_dted

    arr, meta = _byte_tif()
    for compress in (False, True):  # plain + HFZ (gzip)
        out, m2 = decode_hf2(encode_hf2(arr.astype(np.int16),
                                        transform=meta["transform"],
                                        compress=compress))
        assert gdal_checksum(out) == 4672
        assert np.allclose(m2["transform"], meta["transform"])
    f32, _ = decode_hfa(f"{D}/hfa/float.img")  # hf2.py test_hf2_3
    out, _ = decode_hf2(encode_hf2(f32.astype(np.float32),
                                   transform=(0, 1, 0, 40, 0, -1)))
    assert gdal_checksum(out) == 23529
    dem, dm = decode_dted(
        open("/root/reference/autotest/gdrivers/data/n43.dt0", "rb").read())
    out, _ = decode_hf2(encode_hf2(dem.astype(np.int16),
                                   transform=dm["transform"]))
    assert gdal_checksum(out) == 49187  # hf2.py test_hf2_4


# ----------------------------------------------------------------- FITS

@pytest.mark.parametrize("name", ["byte", "int16", "uint16", "int32",
                                  "uint32", "float32", "float64"])
def test_fits_roundtrip(name):  # fits.py test_fits parametrization
    from lib_gdal_ray.sources.fits import decode_fits, encode_fits

    arr, _ = decode_geotiff(open(f"{G}/{name}.tif", "rb").read())
    out, _ = decode_fits(encode_fits(arr))
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


def test_fits_georef_merc():  # fits.py test_fits_read_georef_merc
    fmt, arr, meta = open_raster_path(f"{D}/fits/byte_merc.fits")
    assert fmt == "FITS"
    want = (-13095897.481058259, 72.23522015778646, 0.0,
            3991653.2130816197, 0.0, -72.23522015778646)
    assert meta["transform"] == pytest.approx(want, abs=1e-3)
    assert meta["nodata"] == -9999.0


def test_fits_offset_scale():  # fits.py test_fits_read_offset_scale
    _, _, meta = open_raster_path(f"{D}/fits/offset_scale_no_georef.fits")
    assert meta["offset"] == pytest.approx(-0.0039525691699605)
    assert meta["scale"] == pytest.approx(1.00395256917)


def test_fits_image_in_second_hdu():
    from lib_gdal_ray.sources.fits import decode_fits

    arr, _ = decode_fits(
        open(f"{D}/fits/image_in_second_hdu.fits", "rb").read())
    assert arr.shape == (2, 1)
    with pytest.raises(ValueError):
        decode_fits(open(f"{D}/fits/empty_primary_hdu.fits", "rb").read())


def test_fits_nodata_roundtrip():  # fits.py test_fits_nodata analog
    from lib_gdal_ray.sources.fits import decode_fits, encode_fits

    arr = np.arange(12, dtype=np.int16).reshape(3, 4)
    out, meta = decode_fits(encode_fits(arr, nodata=0))
    assert meta["nodata"] == 0


# --------------------------------------------------------------- AIGrid

def test_aigrid():  # aigrid.py tests 1-5
    for cover in ("abc3x1", "ABC3X1UC"):
        fmt, arr, meta = open_raster_path(f"{D}/aigrid/{cover}")
        assert fmt == "AIG"
        assert arr.dtype == np.uint8
        assert gdal_checksum(arr) == 3
        assert meta["transform"] == (-0.5, 1.0, 0.0, 0.5, 0.0, -1.0)
        assert meta["nodata"] == 255
        pal = meta["palette"]
        assert tuple(pal[0]) == (95, 113, 150, 255)
        assert tuple(pal[1]) == (95, 57, 29, 255)


def test_aigrid_via_adf_member():  # aigrid.py test_aigrid_2 open style
    fmt, arr, _ = open_raster_path(f"{D}/aigrid/abc3x1/prj.adf")
    assert fmt == "AIG" and gdal_checksum(arr) == 3


def test_aigrid_sta_24bytes():  # aigrid.py test_aigrid_6
    _, _, meta = open_raster_path(f"{D}/aigrid/aigrid_sta_24bytes/teststa")
    assert meta["min"] == 0.0 and meta["max"] == 2.0


# --------------------------------------------------------------- PCIDSK

def test_pcidsk():  # pcidsk.py test_pcidsk_1 + tile_v1/v2
    for name, want in (("utm.pix", 39576), ("tile_v1.1.pix", 49526),
                       ("tile_v2.pix", 49526)):
        fmt, arr, _ = open_raster_path(f"{D}/pcidsk/{name}")
        assert fmt == "PCIDSK"
        assert gdal_checksum(arr if arr.ndim == 2 else arr[:, :, 0]) == want
