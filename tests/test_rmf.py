"""RMF (Panorama .rsw/.mtw) parity vs autotest/gdrivers/rmf.py —
every checksum below is the reference suite's own pinned value
(frmts/rmf/rmfdataset.cpp re-derivation in sources/rmf.py)."""

import gzip

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum as cs
from lib_gdal_ray.sources.rmf import (decode_rmf, encode_rmf,
                                      rmf_overview_count)

D = "/root/reference/autotest/gdrivers/data/rmf"


def _read(name):
    with open(f"{D}/{name}", "rb") as f:
        return f.read()


def test_byte_rsw():  # test_rmf_1
    arr, m = decode_rmf(_read("byte.rsw"))
    assert cs(arr) == 4672
    assert m["geotransform"] == (440720, 60, 0, 3751320, 0, -60)


def test_byte_lzw():  # test_rmf_2
    arr, _ = decode_rmf(_read("byte-lzw.rsw"))
    assert cs(arr) == 40503


def test_float64_mtw():  # test_rmf_3
    arr, m = decode_rmf(_read("float64.mtw"))
    assert arr.dtype == np.float64 and cs(arr) == 4672
    assert m["geotransform"] == (440720, 60, 0, 3751320, 0, -60)


def test_rgbsmall():  # test_rmf_4 — BGR-interleaved tiles
    arr, _ = decode_rmf(_read("rgbsmall.rsw"))
    assert [cs(arr[b]) for b in range(3)] == [21212, 21053, 21349]


def test_rgbsmall_lzw():  # test_rmf_5
    arr, _ = decode_rmf(_read("rgbsmall-lzw.rsw"))
    assert [cs(arr[b]) for b in range(3)] == [40503, 41429, 40238]


def test_big_endian():  # test_rmf_6 — "\0WSR" signature
    arr, m = decode_rmf(_read("big-endian.rsw"))
    assert m["big_endian"]
    assert [cs(arr[b]) for b in range(3)] == [7782, 8480, 4195]


def test_dem_compressed_mtw():  # test_rmf_10 — RMF_DEM delta codec
    arr, _ = decode_rmf(_read("t100.mtw"))
    assert arr.dtype == np.int32 and cs(arr) == 6388


def test_1bit():  # test_rmf_31a
    arr, _ = decode_rmf(_read("1bit.rsw"))
    assert cs(arr) == 34325


def test_4bit():  # test_rmf_31b/c (4bit + 4bit-lzw agree)
    assert cs(decode_rmf(_read("4bit.rsw"))[0]) == 55221
    assert cs(decode_rmf(_read("4bit-lzw.rsw"))[0]) == 55221


def test_cucled_and_corrupted_subheaders():  # test_rmf_12a-d
    for name in ("cucled-1.rsw", "cucled-2.rsw", "invalid-subheader.rsw",
                 "corrupted-subheader.rsw"):
        arr, m = decode_rmf(_read(name))
        assert cs(arr) == 4672, name
        assert m["geotransform"] == (440720, 60, 0, 3751320, 0, -60)


def test_overview_chain():  # test_rmf_11
    buf = gzip.decompress(_read("overviews.rsw.gz"))
    assert rmf_overview_count(buf) == 3
    sizes, sums = [], []
    for i in range(3):
        a, _ = decode_rmf(buf, overview=i)
        a1 = a[0] if a.ndim == 3 else a
        sizes.append(a1.shape[0])
        sums.append(cs(a1))
    assert sizes == [256, 64, 16]
    assert sums == [32756, 51233, 3192]


def test_jpeg_in_rmf():  # test_rmf_27 — lossy: our pure-numpy IDCT is
    # bounded-error vs libjpeg, so pin proximity to the reference sets
    arr, m = decode_rmf(_read("jpeg-in-rmf.rsw"))
    assert m["compression"] == 2 and arr.shape == (3, 289, 290)
    got = [cs(arr[b]) for b in range(3)]
    ref = [51009, 27640, 37765]  # autotest cs2
    assert all(abs(g - r) < 2000 for g, r in zip(got, ref)), got


def test_roundtrip_rsw8_mtw_rgb():  # testCreateCopy analog
    src, meta = decode_rmf(_read("byte.rsw"))
    back, m2 = decode_rmf(encode_rmf(src, geotransform=meta["geotransform"],
                                     epsg=32611))
    assert np.array_equal(src, back)
    assert m2["geotransform"] == meta["geotransform"] and m2["epsg"] == 32611

    srcf, metaf = decode_rmf(_read("float64.mtw"))
    backf, _ = decode_rmf(encode_rmf(srcf, geotransform=metaf["geotransform"]))
    assert np.array_equal(srcf, backf) and backf.dtype == np.float64

    rgb, _ = decode_rmf(_read("rgbsmall.rsw"))
    backr, _ = decode_rmf(encode_rmf(rgb))
    assert np.array_equal(rgb, backr)

    # int16/int32 MTW + odd sizes exercise the partial-tile path
    rng = np.random.default_rng(7)
    for dt in ("int16", "int32"):
        a = rng.integers(-1000, 1000, (37, 53)).astype(dt)
        b, _ = decode_rmf(encode_rmf(a, tile_size=16))
        assert np.array_equal(a, b) and b.dtype == a.dtype


def test_registry_dispatch():
    from lib_gdal_ray.sources.rasters import open_raster

    name, a, m = open_raster(_read("rgbsmall.rsw"))
    assert name == "RMF" and a.shape == (50, 50, 3)
    assert cs(a[:, :, 0]) == 21212
