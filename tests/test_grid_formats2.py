"""RRASTER / GRASSASCIIGrid / ISG / LCP / NWT_GRD / NWT_GRC drivers,
pinned to the reference's own autotest fixtures and checksums
(autotest/gdrivers/{rraster,grassasciigrid,isg,lcp,nwt_grd,nwt_grc}.py)."""

import os

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import identify, open_raster_path

DATA = "/root/reference/autotest/gdrivers/data"


class TestRRaster:
    D = f"{DATA}/rraster"

    def test_byte_checksum_and_georef(self):
        # autotest rraster.py:28-40 — cs 4672, byte.tif georef, EPSG 26711
        drv, arr, meta = open_raster_path(f"{self.D}/byte_rraster1.grd")
        assert drv == "RRASTER"
        assert int(gdal_checksum(arr)) == 4672
        assert arr.min() == 74 and arr.max() == 255
        np.testing.assert_allclose(
            meta["transform"], (440720, 60, 0, 3751320, 0, -60))
        assert meta["epsg"] == 26711
        assert meta["band_names"] == ["byte"]

    def test_rgba_bil(self):
        # rraster.py:101-140 — per-band checksums 19/27/22/7
        from lib_gdal_ray.sources.rraster import decode_rraster

        arr, meta = decode_rraster(f"{self.D}/rgba_rraster.grd")
        assert [int(gdal_checksum(arr[:, :, i])) for i in range(4)] == \
            [19, 27, 22, 7]
        assert meta["band_names"] == ["red", "green", "blue", "alpha"]

    def test_color_tables(self):
        # rraster.py:169-225 — palette entries incl. alpha column
        from lib_gdal_ray.sources.rraster import decode_rraster

        _, m = decode_rraster(f"{self.D}/byte_rraster_ct_rgb.grd")
        assert m["color_table"] == [[10, 20, 30, 255], [11, 21, 31, 255]]
        _, m = decode_rraster(f"{self.D}/byte_rraster_ct_rgba.grd")
        assert m["color_table"] == [[10, 20, 30, 0], [11, 21, 31, 255]]

    def test_rat(self):
        from lib_gdal_ray.sources.rraster import decode_rraster

        _, m = decode_rraster(f"{self.D}/byte_rraster_rat.grd")
        assert m["rat"]["ID"] == [0, 1]
        assert m["rat"]["int_field"] == [10, 11]
        assert m["rat"]["numeric_field"] == [1.2, 2.3]
        assert m["rat"]["string_field"] == ["foo", "bar"]
        assert m["rat"]["red"] == [0, 1]
        assert m["rat"]["name"] == ["baz", "baw"]

    def test_roundtrip(self, tmp_path):
        # mirrors test_rraster_1_copy: re-written copy decodes identical
        from lib_gdal_ray.sources.rraster import (decode_rraster,
                                                  encode_rraster)

        arr, meta = decode_rraster(f"{self.D}/byte_rraster1.grd")
        out = str(tmp_path / "copy.grd")
        encode_rraster(arr, out, transform=meta["transform"],
                       projection=meta["projection"],
                       band_names=meta["band_names"])
        a2, m2 = decode_rraster(out)
        np.testing.assert_array_equal(a2, arr)
        assert int(gdal_checksum(a2)) == 4672
        np.testing.assert_allclose(m2["transform"], meta["transform"])
        assert m2["band_names"] == ["byte"]

        # multiband BIP/BSQ interleaves roundtrip too
        rng = np.random.RandomState(0)
        mb = rng.randint(0, 1000, size=(7, 5, 3)).astype(np.int32)
        for order in ("BIL", "BIP", "BSQ"):
            p = str(tmp_path / f"mb_{order}.grd")
            encode_rraster(mb, p, bandorder=order)
            back, _ = decode_rraster(p)
            np.testing.assert_array_equal(back, mb)


class TestGrassAscii:
    def test_fixture(self):
        # autotest grassasciigrid.py — cs 212, gt [-100, 62.5, ...]
        drv, arr, meta = open_raster_path(
            f"{DATA}/grassasciigrid/grassascii.txt")
        assert drv == "GRASSASCIIGrid"
        assert int(gdal_checksum(arr)) == 212
        np.testing.assert_allclose(
            meta["transform"],
            [-100.0, 62.5, 0.0, 250.0, 0.0, -41.666666666666664])

    def test_roundtrip(self, tmp_path):
        from lib_gdal_ray.sources.ascii_grids import (decode_grassascii,
                                                      encode_grassascii)

        a = np.arange(20, dtype=np.int32).reshape(4, 5)
        buf = encode_grassascii(a, transform=(10, 2, 0, 8, 0, -2))
        a2, m2 = decode_grassascii(buf)
        np.testing.assert_array_equal(a2, a)
        np.testing.assert_allclose(m2["transform"], (10, 2, 0, 8, 0, -2))


class TestISG:
    D = f"{DATA}/isg"

    def test_fixture(self):
        # autotest isg.py test_isg_1 — cs 159, gt [120, .25, 0, 41, ...]
        drv, arr, meta = open_raster_path(f"{self.D}/test.isg")
        assert drv == "ISG"
        assert int(gdal_checksum(arr)) == 159
        np.testing.assert_allclose(meta["transform"],
                                   [120.0, 0.25, 0.0, 41.0, 0.0, -0.25])
        assert meta["nodata"] == -9999.0

    def test_approx_georeferencing(self):
        from lib_gdal_ray.sources.ascii_grids import decode_isg

        with open(f"{self.D}/approx_georeferencing_auto_corrected.isg",
                  "rb") as f:
            _, m = decode_isg(f.read())
        np.testing.assert_allclose(
            m["transform"],
            [-76.0098535, 0.016667, 0.0, -20.0087335, 0.0, -0.016667],
            rtol=1e-8)
        with open(f"{self.D}/approx_georeferencing_warning.isg",
                  "rb") as f:
            _, m = decode_isg(f.read())
        np.testing.assert_allclose(
            m["transform"],
            [-76.0083, 0.01666694444444445, 0.0,
             -20.0083, 0.0, -0.016667027027027027], rtol=1e-8)
        with pytest.raises(ValueError, match="[Ii]nconsistent"):
            with open(
                    f"{self.D}/approx_georeferencing_rejected_by_default"
                    ".isg", "rb") as f:
                decode_isg(f.read())

    def test_dms_and_big_header(self):
        from lib_gdal_ray.sources.ascii_grids import decode_isg

        with open(f"{self.D}/header_dms.isg", "rb") as f:
            _, m = decode_isg(f.read())
        np.testing.assert_allclose(
            m["transform"],
            [119.9875, 0.025, 0.0, 50.0083333333, 0.0, -0.01666666666],
            rtol=1e-8)
        with open(f"{self.D}/header_larger_than_1024bytes.isg",
                  "rb") as f:
            _, m = decode_isg(f.read())
        assert m["width"] == 321 and m["height"] == 241


class TestLCP:
    D = f"{DATA}/lcp"

    def test_farsite_utm12(self):
        # autotest lcp.py test_lcp_1 — 8 bands, all checksums + metadata
        p = f"{self.D}/test_FARSITE_UTM12.LCP"
        drv, arr, meta = open_raster_path(p)
        assert drv == "LCP" and arr.shape[2] == 8
        cs = [int(gdal_checksum(arr[:, :, i])) for i in range(8)]
        assert cs == [18645, 16431, 18851, 26182, 30038, 22077, 30388,
                      23249]
        assert meta["LATITUDE"] == "49"
        assert meta["LINEAR_UNIT"] == "Meters"
        assert meta["DESCRIPTION"].startswith(
            "This is a test LCP file created with FARSITE")
        np.testing.assert_allclose(
            meta["transform"],
            (285807.932887174887583, 30, 0, 5379230.386217921040952, 0,
             -30), atol=1e-5)
        bm = meta["band_meta"]
        assert bm[0]["ELEVATION_UNIT_NAME"] == "Meters"
        assert bm[0]["ELEVATION_MIN"] == "1064"
        assert bm[0]["ELEVATION_MAX"] == "1492"
        assert bm[1]["SLOPE_UNIT_NAME"] == "Degrees"
        assert bm[1]["SLOPE_FILE"] == "slope.asc"
        assert bm[2]["ASPECT_UNIT_NAME"] == "Azimuth degrees"
        assert bm[3]["FUEL_MODEL_VALUES"] == "1,2,5,8,10,99"
        assert bm[3]["FUEL_MODEL_OPTION_DESC"] == \
            "no custom models AND no conversion file needed"
        assert bm[4]["CANOPY_COV_UNIT_NAME"] == "Categories (0-4)"
        assert bm[5]["CANOPY_HT_UNIT_NAME"] == "Meters x 10"
        assert bm[6]["CBH_UNIT_NAME"] == "Meters x 10"
        assert bm[7]["CBD_UNIT_NAME"] == "kg/m^3 x 100"
        assert "NAD_1983_UTM_Zone_12N" in meta["projection_name"]

    def test_usgs_alb83(self):
        # autotest lcp.py test_lcp_2
        p = f"{self.D}/test_USGS_LFNM_Alb83.lcp"
        drv, arr, meta = open_raster_path(p)
        assert arr.shape[2] == 8
        cs = [int(gdal_checksum(arr[:, :, i])) for i in range(8)]
        assert cs[:7] == [28381, 25824, 28413, 19052, 30164, 22316,
                          30575]
        assert meta["LATITUDE"] == "48"
        assert meta["DESCRIPTION"] == ""
        np.testing.assert_allclose(
            meta["transform"], (-1328145, 30, 0, 2961735, 0, -30),
            atol=1e-5)
        assert meta["band_meta"][4]["CANOPY_COV_UNIT_NAME"] == "Percent"
        assert meta["band_meta"][3]["FUEL_MODEL_VALUES"] == "1,2,5,8,10"


class TestNWT:
    def test_grd(self):
        # autotest nwt_grd.py — 4 bands: color ramp R/G/B + Z
        p = f"{DATA}/nwt_grd/nwt_grd.grd"
        drv, arr, meta = open_raster_path(p)
        assert drv == "NWT_GRD" and arr.shape[2] == 4
        cs = [int(gdal_checksum(arr[:, :, i].astype(np.uint8)))
              for i in range(3)]
        cs.append(int(gdal_checksum(arr[:, :, 3])))
        assert cs == [28093, 33690, 20365, 25856]
        # grid-center half-pixel shift in the geotransform
        gt = meta["transform"]
        assert gt[1] > 0 and gt[5] < 0 and gt[1] == -gt[5]

    def test_grc(self):
        # autotest nwt_grc.py — band 1 checksum 46760 + class dict
        p = f"{DATA}/nwt_grc/nwt_grc.grc"
        drv, arr, meta = open_raster_path(p)
        assert drv == "NWT_GRC"
        assert int(gdal_checksum(arr)) == 46760
        assert len(meta["classes"]) == 3
        assert all({"value", "r", "g", "b", "name"} <= set(c)
                   for c in meta["classes"])

    def test_identify(self):
        with open(f"{DATA}/nwt_grd/nwt_grd.grd", "rb") as f:
            assert identify(f.read(2048)) == "NWT_GRD"
        with open(f"{DATA}/nwt_grc/nwt_grc.grc", "rb") as f:
            assert identify(f.read(2048)) == "NWT_GRC"
