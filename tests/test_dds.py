"""DDS (DirectDraw Surface) driver: the reference's uncompressed RGBA
fixture pinned against stefan_full_rgba.png, plus closed-form DXT1/
DXT3/DXT5 block decodes."""

import struct

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.dds import decode_dds
from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data"


def test_uncompressed_fixture():
    # dds.py test_dds_no_compression: checksums equal the PNG source
    drv, arr, meta = open_raster_path(
        f"{DATA}/dds/stefan_full_rgba_no_compression.dds")
    assert drv == "DDS" and meta["compression"] == "NONE"
    ref = open_raster_path(
        "/root/reference/autotest/gcore/data/stefan_full_rgba.png")[1]
    assert [int(gdal_checksum(arr[:, :, i])) for i in range(4)] == \
        [int(gdal_checksum(ref[:, :, i])) for i in range(4)]


def _dds_header(w, h, fourcc):
    hdr = bytearray(128)
    hdr[0:4] = b"DDS "
    struct.pack_into("<I", hdr, 4, 124)
    struct.pack_into("<II", hdr, 12, h, w)
    struct.pack_into("<I", hdr, 76, 32)
    struct.pack_into("<I4s", hdr, 80, 4, fourcc)  # DDPF_FOURCC
    return bytes(hdr)


def test_dxt1_closed_form():
    # c0 = pure red (0xF800) > c1 = pure blue (0x001F): 4-color mode
    block = struct.pack("<HH", 0xF800, 0x001F) + bytes(
        [0b11100100, 0, 0, 0])  # first row selectors 0,1,2,3
    buf = _dds_header(4, 4, b"DXT1") + block
    arr, meta = decode_dds(buf)
    assert meta["compression"] == "DXT1"
    np.testing.assert_array_equal(arr[0, 0], [255, 0, 0, 255])
    np.testing.assert_array_equal(arr[0, 1], [0, 0, 255, 255])
    np.testing.assert_array_equal(arr[0, 2], [170, 0, 85, 255])
    np.testing.assert_array_equal(arr[0, 3], [85, 0, 170, 255])


def test_dxt5_alpha_closed_form():
    # alpha block: a0=255 > a1=0, all selectors 1 → alpha = 0
    alpha = bytes([255, 0]) + bytes(
        [0b01001001, 0b10010010, 0b00100100] * 2)  # 3-bit "1" x16
    color = struct.pack("<HH", 0xF800, 0x001F) + bytes(4)
    buf = _dds_header(4, 4, b"DXT5") + alpha + color
    arr, meta = decode_dds(buf)
    assert meta["compression"] == "DXT5"
    assert (arr[:, :, 3] == 0).all()  # selector 1 = a1 = 0
    np.testing.assert_array_equal(arr[0, 0, :3], [255, 0, 0])


def test_dxt3_alpha_closed_form():
    # explicit 4-bit alphas 0..15 → 0,17,34,...255
    a4 = bytes([0x10, 0x32, 0x54, 0x76, 0x98, 0xBA, 0xDC, 0xFE])
    color = struct.pack("<HH", 0xF800, 0xF800) + bytes(4)
    buf = _dds_header(4, 4, b"DXT3") + a4 + color
    arr, meta = decode_dds(buf)
    assert meta["compression"] == "DXT3"
    np.testing.assert_array_equal(
        arr[:, :, 3].ravel(), np.arange(16, dtype=np.uint8) * 17)
