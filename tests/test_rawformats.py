"""Header-file raw formats (sources/rawformats.py, sources/fast.py)
pinned against the reference's own autotest expectations:
autotest/gdrivers/{paux,mff,mff2,gsc,doq1,doq2,terragen,leveller,fast}.py.
"""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import open_raster_path

D = "/root/reference/autotest/gdrivers/data"


def cs(path, band=0, win=None, expect_name=None):
    name, arr, meta = open_raster_path(path)
    if expect_name:
        assert name == expect_name
    a = arr if arr.ndim == 2 else arr[:, :, band]
    if win:
        x, y, w, h = win
        a = a[y:y + h, x:x + w]
    return gdal_checksum(a), arr, meta


def test_paux():  # paux.py: band 2 cs 12816
    c, arr, meta = cs(f"{D}/paux/small16.raw", band=1, expect_name="PAux")
    assert arr.shape == (35, 31, 2) and c == 12816


def test_mff():  # mff.py: fake cs 1, tiled cs 1, byte cs 4672
    assert cs(f"{D}/mff/fakemff.hdr", expect_name="MFF")[0] == 1
    assert cs(f"{D}/mff/fakemfftiled.hdr")[0] == 1
    assert cs(f"{D}/mff/bytemff.hdr")[0] == 4672


def test_mff_too_large_tile():  # mffdataset.cpp rejection
    with pytest.raises(Exception, match="[Tt]oo large tile"):
        open_raster_path(f"{D}/mff/too_large_tile.hdr")


def test_mff2_directory():  # mff2.py: cs 4672; dataset IS a directory
    assert cs(f"{D}/mff2/bytemff2", expect_name="MFF2")[0] == 4672


def test_gsc():  # gsc.py: 1x1 fake, cs 0
    c, arr, _ = cs(f"{D}/gsc/fakegsc.gsc", expect_name="GSC")
    assert c == 0 and arr.dtype == np.float32


def test_doq1_rejects_garbage():  # doq1.py expects open failure
    with pytest.raises(Exception):
        open_raster_path(f"{D}/doq1/fakedoq1.doq")


def test_doq2():  # doq2.py: 3 band checksums on first 500x1, gt, metadata
    for band, want in ((0, 4201), (1, 4010), (2, 5820)):
        c, arr, meta = cs(f"{D}/doq2/C3607614_truncated.NWS", band=band,
                          win=(0, 0, 500, 1), expect_name="DOQ2")
        assert c == want
    assert meta["transform"] == (377054, 1, 0, 4082205, 0, -1)
    assert meta["metadata"]["QUADRANGLE_NAME"] == \
        "NORFOLK SOUTH 3.45 or 7.5-min. name*"


def test_terragen():  # terragen.py: cs 1128
    c, arr, _ = cs(f"{D}/terragen/float32.ter", expect_name="TERRAGEN")
    assert c == 1128


def test_terragen_roundtrip():
    from lib_gdal_ray.sources.rawformats import (decode_terragen,
                                                 encode_terragen)
    arr = (np.arange(120, dtype=np.int16) * 7 % 513 - 100).reshape(10, 12)
    out, _ = decode_terragen(encode_terragen(arr))
    np.testing.assert_array_equal(out, arr)


def test_leveller():  # leveller.py: cs 33441
    c, arr, _ = cs(f"{D}/leveller/ter6test.ter", expect_name="LEVELLER")
    assert arr.shape == (96, 64) and c == 33441


def test_fast_landsat_pan():  # fast.py test_fast_2/3/4
    c, arr, meta = cs(f"{D}/fast/L71118038_03820020111_HPN.FST",
                      win=(0, 0, 5000, 1), expect_name="FAST")
    assert c == 60323
    assert meta["ACQUISITION_DATE"] == "20020111"
    assert meta["SATELLITE"] == "LANDSAT7"
    assert meta["SENSOR"] == "ETM+"
    assert float(meta["GAIN1"]) == pytest.approx(-6.199999809265137, abs=1e-4)
    assert float(meta["BIAS1"]) == pytest.approx(0.775686297697179, abs=1e-4)
    gt = meta["transform"]
    assert gt[0] == pytest.approx(280342.5, abs=0.01)
    assert gt[1] == pytest.approx(15.0, abs=0.01)
    assert gt[3] == pytest.approx(3621457.5, abs=0.01)
    assert gt[5] == pytest.approx(-15.0, abs=0.01)


def test_fast_landsat_tm():  # fast.py test_fast_5 (band 2, southern UTM)
    c, arr, meta = cs(f"{D}/fast/L71230079_07920021111_HTM.FST",
                      band=1, win=(0, 0, 7000, 1))
    assert c == 19110
    gt = meta["transform"]
    assert gt[0] == pytest.approx(528417.25, abs=0.01)
    assert gt[1] == pytest.approx(30.0, abs=0.01)
    assert gt[3] == pytest.approx(7071187.0, abs=0.01)
    assert gt[5] == pytest.approx(-30.0, abs=0.01)


def test_fast_header_dat():  # fast.py test_fast_9: 7 bands, empty SENSOR
    name, arr, meta = open_raster_path(f"{D}/fast/HEADER.DAT")
    assert name == "FAST"
    assert arr.ndim == 3 and arr.shape[2] == 7
    assert meta["SENSOR"] == ""


def test_fast_euromap_irs():  # fast.py test_fast_6..8: gt from corner GCPs
    want = {
        "n0o0y867.0fl": (14640936.89174916, 1.008817518246492,
                         24.9876841746236, 664274.3912497687,
                         24.98828832116786, -0.9907878581173808),
        "h0o0y867.1ah": (676565.09, 5, 0, 5348341.5, 0, -5),
        "w0y13a4t.010": (-336965.0150603952, 176.0817495260164,
                         -37.35662873563219, 484122.7765089957,
                         -37.35622603749736, -176.081791954023),
    }
    for hdr, gt in want.items():
        name, arr, meta = open_raster_path(f"{D}/fast/{hdr}")
        assert name == "FAST", hdr
        got = meta["transform"]
        for g, w in zip(got, gt):
            assert g == pytest.approx(w, abs=1e-4), hdr
