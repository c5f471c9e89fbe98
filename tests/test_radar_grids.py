"""PCRaster / IRIS / CPG drivers, pinned to the reference autotest
fixtures (gdrivers/{pcraster,iris,cpg}.py expectations)."""

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data"


class TestPCRaster:
    def test_ldd_fixture(self):
        # pcraster.py — cs 4528, gt, nodata 255
        drv, arr, meta = open_raster_path(f"{DATA}/pcraster/ldd.map")
        assert drv == "PCRaster"
        assert int(gdal_checksum(arr)) == 4528
        assert meta["transform"] == (182140.0, 10.0, 0.0, 327880.0,
                                     0.0, -10.0)
        assert meta["nodata"] == 255.0
        assert meta["value_scale"] == 0xF0  # VS_LDD

    def test_roundtrip(self):
        from lib_gdal_ray.sources.pcraster import (decode_pcraster,
                                                   encode_pcraster)

        with open(f"{DATA}/pcraster/ldd.map", "rb") as f:
            a, m = decode_pcraster(f.read())
        a2, m2 = decode_pcraster(encode_pcraster(
            a, transform=m["transform"], value_scale=m["value_scale"]))
        np.testing.assert_array_equal(a2, a)
        assert int(gdal_checksum(a2)) == 4528
        assert m2["transform"] == m["transform"]

        # scalar float + int32 representations
        f = np.linspace(0, 1, 20).reshape(4, 5).astype(np.float32)
        fa, fm = decode_pcraster(encode_pcraster(f))
        np.testing.assert_array_equal(fa, f)
        i = np.arange(20, dtype=np.int32).reshape(4, 5) * 1000
        ia, _ = decode_pcraster(encode_pcraster(i))
        np.testing.assert_array_equal(ia, i)


class TestIRIS:
    def test_fixtures(self):
        # iris.py — cs 65532 (fake) and 52872 (real-world PPI)
        drv, arr, meta = open_raster_path(f"{DATA}/iris/fakeiris.dat")
        assert drv == "IRIS"
        assert int(gdal_checksum(arr)) == 65532

        drv, arr, meta = open_raster_path(f"{DATA}/iris/iristest.dat")
        assert drv == "IRIS" and arr.shape == (262, 260)
        assert int(gdal_checksum(arr)) == 52872
        assert meta["nodata"] == -9999.0
        assert meta["data_type_code"] == 2  # dBZ


class TestCPG:
    def test_sirc(self):
        # cpg.py — 1x1 zero scattering matrix, cs 0, 4 complex bands
        drv, arr, meta = open_raster_path(
            f"{DATA}/cpg/fakecpgSIRC.hdr")
        assert drv == "CPG"
        assert arr.shape == (1, 1, 4) and arr.dtype == np.complex64
        assert int(gdal_checksum(arr[:, :, 0])) == 0
        assert meta["polarizations"] == ["hh", "hv", "vv", "vh"]

    def test_sirc_values(self, tmp_path):
        from lib_gdal_ray.sources.cpg import decode_cpg_sirc

        # synthesize a 2x1 SIRC pair with known bytes
        (tmp_path / "tSIRC.hdr").write_text(
            "number_lines          1\nnumber_samples        2\n")
        raw = np.array([[0, 0, 127, -127, 0, 0, 0, 0, 0, 0],
                        [2, 0, 127, 0, 0, 0, 0, 0, 0, 0]],
                       dtype=np.int8)
        raw.tofile(str(tmp_path / "tSIRC.img"))
        a, _ = decode_cpg_sirc(str(tmp_path / "tSIRC.hdr"))
        s0 = np.sqrt(1.5 * 2.0 ** 0) / 127
        s1 = np.sqrt(1.5 * 2.0 ** 2) / 127
        np.testing.assert_allclose(a[0, 0, 0],
                                   127 * s0 - 127j * s0, rtol=1e-6)
        np.testing.assert_allclose(a[0, 1, 0], 127 * s1, rtol=1e-6)


class TestACE2:
    def test_synthesized_tile(self, tmp_path):
        # mirrors ace2.py test_ace2_1: zero-filled 45N015E_5M tile
        p = tmp_path / "45N015E_5M.ACE2"
        p.write_bytes(b"\x00" * (180 * 180 * 4))
        drv, arr, meta = open_raster_path(str(p))
        assert drv == "ACE2"
        assert arr.shape == (180, 180) and arr.dtype == np.float32
        assert int(gdal_checksum(arr)) == 0
        np.testing.assert_allclose(
            meta["transform"],
            [15.0, 1 / 12, 0.0, 60.0, 0.0, -1 / 12], rtol=1e-12)
        assert meta["epsg"] == 4326

    def test_sw_hemisphere_and_int16(self, tmp_path):
        p = tmp_path / "30S120W_5M.ACE2"
        p.write_bytes(np.arange(180 * 180,
                                dtype="<f4").tobytes())
        _, arr, meta = open_raster_path(str(p))
        assert meta["transform"][0] == -120.0
        assert meta["transform"][3] == -15.0
        assert arr[0, 1] == 1.0
        q = tmp_path / "30S120W_QUALITY_5M.ACE2"
        q.write_bytes(np.full(180 * 180, 3, dtype="<i2").tobytes())
        _, arr, _ = open_raster_path(str(q))
        assert arr.dtype == np.int16 and arr[0, 0] == 3
