"""GIF codec parity (codecs/gif.py) vs autotest/gdrivers/gif.py
(bug407.gif cs 57921; byte_with_xmp.gif carries the byte.tif plane
cs 4672 + an XMP packet) plus encode/decode roundtrips incl. the
INTERLACING=YES path."""

import numpy as np
import pytest

from lib_gdal_ray.codecs.gif import decode_gif, encode_gif, identify_gif
from lib_gdal_ray.pipelines.rasterize import gdal_checksum

D = "/root/reference/autotest/gdrivers/data/gif"


def test_bug407():  # gif.py test_gif_2
    buf = open(f"{D}/bug407.gif", "rb").read()
    assert identify_gif(buf)
    arr, meta = decode_gif(buf)
    assert arr.shape == (400, 400)
    assert gdal_checksum(arr) == 57921
    assert meta["palette"] is not None


def test_byte_with_xmp():  # gif.py test_gif_8 analog
    arr, meta = decode_gif(open(f"{D}/byte_with_xmp.gif", "rb").read())
    assert gdal_checksum(arr) == 4672
    assert meta["xmp"].startswith(b"<?xpacket begin=")


def test_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 21), dtype=np.uint8)
    for interlace in (False, True):
        out, meta = decode_gif(encode_gif(img, interlace=interlace))
        np.testing.assert_array_equal(out, img)


def test_transparency_and_palette_roundtrip():
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    img = (np.arange(64, dtype=np.uint8) % 16).reshape(8, 8)
    out, meta = decode_gif(encode_gif(img, palette=pal, transparent=3))
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(meta["palette"][:16], pal)
    assert meta["transparent"] == 3


def test_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/bug407.gif")
    assert name == "GIF" and gdal_checksum(arr) == 57921
