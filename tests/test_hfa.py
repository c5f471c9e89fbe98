"""Erdas Imagine HFA reader parity (sources/hfa.py) vs
autotest/gdrivers/hfa.py expectations on the reference fixtures."""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.hfa import HFAFile, decode_hfa, identify_hfa

D = "/root/reference/autotest/gdrivers/data/hfa"


def test_int_img():
    """hfa.py:test_hfa_int_read (cs 6691) +
    test_hfa_int_stats_1/2 declared statistics."""
    arr, meta = decode_hfa(f"{D}/int.img")
    assert arr.shape == (201, 201) and arr.dtype == np.int32
    assert gdal_checksum(arr) == 6691
    st = meta["stats"][0]
    assert st["minimum"] == 40918.0
    assert st["maximum"] == 41134.0
    assert st["median"] == 41017.0
    assert st["mode"] == pytest.approx(41013.0)
    assert st["stddev"] == pytest.approx(44.637237445, abs=1e-6)
    # pixel-center MapInfo -> edge-anchored geotransform
    assert meta["transform"] == (135362.5, 100.0, 0.0, 7122712.5, 0.0,
                                 -100.0)


def test_float_img():
    """hfa.py:test_hfa_float_read — cs 23529, pixel (100,100), and
    the bug-#1000 integer-bit-pattern float decompression."""
    arr, meta = decode_hfa(f"{D}/float.img")
    assert arr.dtype == np.float32
    assert gdal_checksum(arr) == 23529
    assert arr[100, 100] == pytest.approx(41.021659851074219, abs=1e-4)
    st = meta["stats"][0]
    assert st["minimum"] == pytest.approx(40.91858291625976)
    assert st["maximum"] == pytest.approx(41.134323120117)


def test_dictionary_and_tree():
    hfa = HFAFile(f"{D}/int.img")
    assert "Eimg_Layer" in hfa.types
    assert "Edms_State" in hfa.types
    layer = hfa.root.find_type("Eimg_Layer")[0]
    assert layer.get("width") == 201
    assert layer.get("blockWidth") == 64
    assert layer.get("pixelType") in ("s32", 8)


@pytest.mark.parametrize("fname,shape", [
    ("i8u_c_i.img", (250, 233)),    # compressed u8 w/ color table
    ("small1bit.img", (300, 300)),  # u1 sub-byte expansion
    ("87test.img", (24, 32)),       # PE-string projection file
    ("dem10.img", (210, 87)),
])
def test_other_fixtures_decode(fname, shape):
    arr, _ = decode_hfa(f"{D}/{fname}")
    assert arr.shape == shape
    assert int(arr.max()) >= 0  # decoded something sane


def test_spill_ige():
    """hfa.py:test_hfa_rde_overviews — external .ige spill store,
    band checksum 1631."""
    arr, _ = decode_hfa(f"{D}/spill.img")
    assert gdal_checksum(arr if arr.ndim == 2 else arr[:, :, 0]) == 1631


def test_identify_and_dispatch():
    with open(f"{D}/int.img", "rb") as fh:
        assert identify_hfa(fh.read(16))
    from lib_gdal_ray.sources.rasters import open_raster_path

    name, arr, _ = open_raster_path(f"{D}/int.img")
    assert name == "HFA" and gdal_checksum(arr) == 6691
