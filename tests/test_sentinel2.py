"""Sentinel-2 SAFE driver (sources/sentinel2.py).

Parity: reference SENTINEL2 driver expectations on its own fake_l1c
fixture (`autotest/gdrivers/sentinel2.py:test_sentinel2_l1c_1/2/4`):
the exact product-metadata dict, subdataset names/descriptions, the
20984x20980 two-granule mosaic with (10004,10000) placement offsets,
RGB-fronted band order and the ESA band-constant table — plus a full
synthetic SAFE round-trip through the repo's own JP2 encoder/decoder.
"""

import os
import shutil

import numpy as np
import pytest

from lib_gdal_ray.sources.sentinel2 import (open_sentinel2,
                                            open_sentinel2_subdataset,
                                            read_sentinel2_pixels)

XML = ("/root/reference/autotest/gdrivers/data/sentinel2/fake_l1c/"
       "S2A_OPER_PRD_MSIL1C.SAFE/S2A_OPER_MTD_SAFL1C.xml")

EXPECTED_MD = {
    "CLOUD_COVERAGE_ASSESSMENT": "0.0",
    "DATATAKE_1_DATATAKE_SENSING_START": "2015-12-31T23:59:59.999Z",
    "DATATAKE_1_DATATAKE_TYPE": "INS-NOBS",
    "DATATAKE_1_ID": "GS2A_20151231T235959_000123_N01.03",
    "DATATAKE_1_SENSING_ORBIT_DIRECTION": "DESCENDING",
    "DATATAKE_1_SENSING_ORBIT_NUMBER": "22",
    "DATATAKE_1_SPACECRAFT_NAME": "Sentinel-2A",
    "DEGRADED_ANC_DATA_PERCENTAGE": "0",
    "DEGRADED_MSI_DATA_PERCENTAGE": "0",
    "FOOTPRINT": "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))",
    "FORMAT_CORRECTNESS_FLAG": "PASSED",
    "GENERAL_QUALITY_FLAG": "PASSED",
    "GENERATION_TIME": "2015-12-31T23:59:59.999Z",
    "GEOMETRIC_QUALITY_FLAG": "PASSED",
    "PREVIEW_GEO_INFO": "BrowseImageFootprint",
    "PREVIEW_IMAGE_URL": "http://example.com",
    "PROCESSING_BASELINE": "01.03",
    "PROCESSING_LEVEL": "Level-1C",
    "PRODUCT_START_TIME": "2015-12-31T23:59:59.999Z",
    "PRODUCT_STOP_TIME": "2015-12-31T23:59:59.999Z",
    "PRODUCT_TYPE": "S2MSI1C",
    "QUANTIFICATION_VALUE": "1000",
    "RADIOMETRIC_QUALITY_FLAG": "PASSED",
    "REFERENCE_BAND": "B1",
    "REFLECTANCE_CONVERSION_U": "0.97",
    "SENSOR_QUALITY_FLAG": "PASSED",
    "SPECIAL_VALUE_NODATA": "1",
    "SPECIAL_VALUE_SATURATED": "0",
}


class TestFakeL1C:
    def test_product_metadata_exact(self):
        # sentinel2.py:test_sentinel2_l1c_1 expected_md, verbatim
        assert open_sentinel2(XML)["metadata"] == EXPECTED_MD

    def test_subdatasets(self):
        subs = open_sentinel2(XML)["subdatasets"]
        assert [d for _n, d in subs] == [
            "Bands B2, B3, B4, B8 with 10m resolution, UTM 32N",
            "Bands B5, B6, B7, B8A, B11, B12 with 20m resolution, "
            "UTM 32N",
            "Bands B1, B9, B10 with 60m resolution, UTM 32N",
            "RGB preview, UTM 32N",
        ]
        assert subs[0][0] == f"SENTINEL2_L1C:{XML}:10m:EPSG_32632"
        assert subs[3][0] == f"SENTINEL2_L1C:{XML}:PREVIEW:EPSG_32632"

    def test_10m_subdataset_geometry_and_bands(self):
        # sentinel2.py:test_sentinel2_l1c_2
        sd = open_sentinel2_subdataset(
            f"SENTINEL2_L1C:{XML}:10m:EPSG_32632")
        assert (sd["xsize"], sd["ysize"]) == (20984, 20980)
        assert sd["geotransform"] == (699960.0, 10.0, 0.0,
                                      5100060.0, 0.0, -10.0)
        assert sd["epsg"] == 32632
        names = [b["name"] for b in sd["bands"]]
        assert names == ["B4", "B3", "B2", "B8"]
        b1 = sd["bands"][0]
        assert (b1["wavelength"], b1["bandwidth"],
                b1["solar_irradiance"]) == (665, 30, "1500")
        assert b1["color"] == "red" and b1["nbits"] == 12
        assert sd["bands"][3]["name"] == "B8"
        assert sd["bands"][3]["color"] == "nir"
        # granule placement = the reference's expected SimpleSource
        b8 = [s for s in sd["sources"] if s["band"] == 4]
        offs = sorted((s["xoff"], s["yoff"], s["xsize"], s["ysize"])
                      for s in b8)
        assert offs == [(0, 0, 10980, 10980),
                        (10004, 10000, 10980, 10980)]
        assert b8[0]["path"].endswith(
            "IMG_DATA/S2A_OPER_MSI_L1C_T32TQR_B08.jp2")

    def test_other_subdatasets_open(self):
        for spec in ("20m", "60m", "PREVIEW"):
            sd = open_sentinel2_subdataset(
                f"SENTINEL2_L1C:{XML}:{spec}:EPSG_32632")
            assert sd["xsize"] > 0 and sd["ysize"] > 0
        sd = open_sentinel2_subdataset(
            f"SENTINEL2_L1C:{XML}:60m:EPSG_32632")
        assert [b["name"] for b in sd["bands"]] == ["B1", "B9", "B10"]
        sd = open_sentinel2_subdataset(
            f"SENTINEL2_L1C:{XML}:PREVIEW:EPSG_32632")
        assert len(sd["bands"]) == 3 and sd["bands"][0]["nbits"] == 8
        assert all(s["path"].endswith(".jp2") and "QI_DATA" in s["path"]
                   for s in sd["sources"])

    @pytest.mark.parametrize("bad", [
        "SENTINEL2_L1C:",
        "SENTINEL2_L1C:foo.xml:10m:EPSG_32632",
        "SENTINEL2_L1C:%s" % XML,
        "SENTINEL2_L1C:%s:" % XML,
        "SENTINEL2_L1C:%s:10m" % XML,
        "SENTINEL2_L1C:%s:10m:" % XML,
        "SENTINEL2_L1C:%s:10m:EPSG_" % XML,
        "SENTINEL2_L1C:%s:50m:EPSG_32632" % XML,
        "SENTINEL2_L1C:%s:10m:EPSG_32633" % XML,
    ])
    def test_invalid_subdataset_names(self, bad):
        # sentinel2.py:test_sentinel2_l1c_1 invalid-name list
        with pytest.raises(Exception):
            open_sentinel2_subdataset(bad)


def _make_synthetic_safe(root, tiles):
    """Minimal L1C SAFE with REAL JP2 payloads (our encoder)."""
    from lib_gdal_ray.codecs.jp2k import encode_jp2

    safe = os.path.join(root, "S2Z_OPER_PRD_MSIL1C.SAFE")
    granules_xml = []
    for (tile, ulx, uly, arr) in tiles:
        gid = f"S2Z_OPER_MSI_L1C_T{tile}_N01.03"
        gdir = os.path.join(safe, "GRANULE", gid)
        os.makedirs(os.path.join(gdir, "IMG_DATA"), exist_ok=True)
        n = arr.shape[0]
        open(os.path.join(gdir, f"S2Z_OPER_MTD_L1C_T{tile}.xml"),
             "w").write(f"""<n1:Level-1C_Tile_ID xmlns:n1="x">
  <n1:Geometric_Info>
    <Tile_Geocoding>
      <HORIZONTAL_CS_CODE>EPSG:32632</HORIZONTAL_CS_CODE>
      <Size resolution="10"><NROWS>{n}</NROWS><NCOLS>{n}</NCOLS></Size>
      <Geoposition resolution="10"><ULX>{ulx}</ULX><ULY>{uly}</ULY>
        <XDIM>10</XDIM><YDIM>-10</YDIM></Geoposition>
    </Tile_Geocoding>
  </n1:Geometric_Info>
</n1:Level-1C_Tile_ID>""")
        img = f"S2Z_OPER_MSI_L1C_T{tile}_B08"
        open(os.path.join(gdir, "IMG_DATA", img + ".jp2"),
             "wb").write(encode_jp2(arr, nlevels=1))
        granules_xml.append(
            f'<Granule_List><Granules granuleIdentifier="{gid}">'
            f"<IMAGE_ID>{img}</IMAGE_ID></Granules></Granule_List>")
    os.makedirs(safe, exist_ok=True)
    xml = os.path.join(safe, "S2Z_OPER_MTD_SAFL1C.xml")
    open(xml, "w").write(f"""<n1:Level-1C_User_Product xmlns:n1="x">
  <n1:General_Info>
    <Product_Info>
      <PROCESSING_LEVEL>Level-1C</PROCESSING_LEVEL>
      <Query_Options><Band_List>
        <BAND_NAME>B8</BAND_NAME>
      </Band_List></Query_Options>
      <Product_Organisation>{''.join(granules_xml)}
      </Product_Organisation>
    </Product_Info>
  </n1:General_Info>
</n1:Level-1C_User_Product>""")
    return xml


class TestSyntheticEndToEnd:
    def test_two_granule_mosaic_through_real_jp2(self, tmp_path):
        rng = np.random.default_rng(3)
        a = (rng.random((40, 40)) * 4000).astype(np.uint16)
        b = (rng.random((40, 40)) * 4000).astype(np.uint16)
        xml = _make_synthetic_safe(
            str(tmp_path), [("AAAAA", 500000, 4000400, a),
                            ("BBBBB", 500400, 4000000, b)])
        sd = open_sentinel2_subdataset(
            f"SENTINEL2_L1C:{xml}:10m:EPSG_32632")
        assert (sd["xsize"], sd["ysize"]) == (80, 80)
        df = read_sentinel2_pixels(
            f"SENTINEL2_L1C:{xml}:10m:EPSG_32632", band=1).to_pandas()
        dense = np.zeros((80, 80))
        dense[df.y.values, df.x.values] = df.value.values
        np.testing.assert_array_equal(dense[0:40, 0:40], a)
        np.testing.assert_array_equal(dense[40:80, 40:80], b)


XML_L2A = ("/root/reference/autotest/gdrivers/data/sentinel2/fake_l2a/"
           "S2A_USER_PRD_MSIL2A.SAFE/S2A_USER_MTD_SAFL2A.xml")

EXPECTED_L2A_MD = {
    "AOT_RETRIEVAL_ACCURACY": "0",
    "BARE_SOILS_PERCENTAGE": "0",
    "CLOUD_COVERAGE_ASSESSMENT": "0.0",
    "CLOUD_SHADOW_PERCENTAGE": "0",
    "DARK_FEATURES_PERCENTAGE": "0",
    "DATATAKE_1_DATATAKE_SENSING_START": "2015-12-31T23:59:59.999Z",
    "DATATAKE_1_DATATAKE_TYPE": "INS-NOBS",
    "DATATAKE_1_ID": "GS2A_20151231T235959_000123_N01.03",
    "DATATAKE_1_SENSING_ORBIT_DIRECTION": "DESCENDING",
    "DATATAKE_1_SENSING_ORBIT_NUMBER": "22",
    "DATATAKE_1_SPACECRAFT_NAME": "Sentinel-2A",
    "DEGRADED_ANC_DATA_PERCENTAGE": "0",
    "DEGRADED_MSI_DATA_PERCENTAGE": "0",
    "FOOTPRINT": "POLYGON((11 46, 11 45, 13 45, 13 46, 11 46))",
    "FORMAT_CORRECTNESS_FLAG": "PASSED",
    "GENERAL_QUALITY_FLAG": "PASSED",
    "GENERATION_TIME": "2015-12-31T23:59:59.999Z",
    "GEOMETRIC_QUALITY_FLAG": "PASSED",
    "HIGH_PROBA_CLOUDS_PERCENTAGE": "0",
    "L1C_TOA_QUANTIFICATION_VALUE": "1000",
    "L1C_TOA_QUANTIFICATION_VALUE_UNIT": "none",
    "L2A_AOT_QUANTIFICATION_VALUE": "1000.0",
    "L2A_AOT_QUANTIFICATION_VALUE_UNIT": "none",
    "L2A_BOA_QUANTIFICATION_VALUE": "1000",
    "L2A_BOA_QUANTIFICATION_VALUE_UNIT": "none",
    "L2A_WVP_QUANTIFICATION_VALUE": "1000.0",
    "L2A_WVP_QUANTIFICATION_VALUE_UNIT": "cm",
    "LOW_PROBA_CLOUDS_PERCENTAGE": "0",
    "MEDIUM_PROBA_CLOUDS_PERCENTAGE": "0",
    "NODATA_PIXEL_PERCENTAGE": "0",
    "PREVIEW_GEO_INFO": "BrowseImageFootprint",
    "PREVIEW_IMAGE_URL": "http://example.com",
    "PROCESSING_BASELINE": "01.03",
    "PROCESSING_LEVEL": "Level-2Ap",
    "PRODUCT_START_TIME": "2015-12-31T23:59:59.999Z",
    "PRODUCT_STOP_TIME": "2015-12-31T23:59:59.999Z",
    "PRODUCT_TYPE": "S2MSI2Ap",
    "RADIATIVE_TRANSFER_ACCURACY": "0",
    "RADIOMETRIC_QUALITY_FLAG": "PASSED",
    "REFERENCE_BAND": "B1",
    "REFLECTANCE_CONVERSION_U": "0.97",
    "SATURATED_DEFECTIVE_PIXEL_PERCENTAGE": "0",
    "SENSOR_QUALITY_FLAG": "PASSED",
    "SNOW_ICE_PERCENTAGE": "0",
    "SPECIAL_VALUE_NODATA": "1",
    "SPECIAL_VALUE_SATURATED": "0",
    "THIN_CIRRUS_PERCENTAGE": "0",
    "VEGETATION_PERCENTAGE": "0",
    "WATER_PERCENTAGE": "0",
    "WATER_VAPOUR_RETRIEVAL_ACCURACY": "0",
}


class TestFakeL2A:
    def test_product_metadata_exact(self):
        # sentinel2.py:test_sentinel2_l2a_1 expected_md, verbatim
        assert open_sentinel2(XML_L2A)["metadata"] == EXPECTED_L2A_MD

    def test_subdatasets(self):
        subs = open_sentinel2(XML_L2A)["subdatasets"]
        assert [d for _n, d in subs] == [
            "Bands B1, B2, B3, B4, B5, B6, B7, B9, B10, B11, B12, "
            "B8A, AOT, CLD, SCL, SNW, WVP with 60m resolution, "
            "UTM 32N",
            "RGB preview, UTM 32N",
        ]
        assert subs[0][0] == \
            f"SENTINEL2_L2A:{XML_L2A}:60m:EPSG_32632"

    def test_60m_subdataset(self):
        # sentinel2.py:test_sentinel2_l2a_2
        sd = open_sentinel2_subdataset(
            f"SENTINEL2_L2A:{XML_L2A}:60m:EPSG_32632")
        assert (sd["xsize"], sd["ysize"]) == (1830, 1830)
        assert sd["geotransform"] == (699960.0, 60.0, 0.0,
                                      5100060.0, 0.0, -60.0)
        assert len(sd["bands"]) == 17
        assert sd["bands"][0]["name"] == "B1"
        assert (sd["bands"][0]["wavelength"],
                sd["bands"][0]["solar_irradiance"]) == (443, "1900")
        assert sd["bands"][12]["name"] == "AOT"
        assert sd["bands"][12]["color"] == "undefined"
        b1 = [s for s in sd["sources"] if s["band"] == 1][0]
        assert b1["path"].endswith(
            "IMG_DATA/R60m/S2A_USER_MSI_L2A_T32TQR_B01_60m.jp2")
        assert (b1["xoff"], b1["yoff"], b1["xsize"]) == (0, 0, 1830)
        # special band file locations probe QI_DATA / IMG_DATA
        cld = [s for s in sd["sources"]
               if "CLD" in os.path.basename(s["path"])][0]
        assert "QI_DATA" in cld["path"]
        scl = [s for s in sd["sources"]
               if "SCL" in os.path.basename(s["path"])][0]
        assert scl["path"].endswith(
            "IMG_DATA/S2A_USER_SCL_L2A_T32TQR_60m.jp2")

    def test_invalid_l2a_names(self):
        for bad in (f"SENTINEL2_L2A:{XML_L2A}:50m:EPSG_32632",
                    f"SENTINEL2_L2A:{XML_L2A}:60m:EPSG_32633",
                    f"SENTINEL2_L1C:{XML_L2A}:60m:EPSG_32632"):
            with pytest.raises(Exception):
                open_sentinel2_subdataset(bad)


XML_SC = ("/root/reference/autotest/gdrivers/data/sentinel2/"
          "fake_l1c_safecompact/S2A_MSIL1C_test.SAFE/MTD_MSIL1C.xml")


class TestSafeCompact:
    def test_subdatasets(self):
        # sentinel2.py:test_sentinel2_l1c_safe_compact_1 — TCI
        # replaces PREVIEW; product metadata = the plain-L1C dict
        out = open_sentinel2(XML_SC)
        assert out["metadata"] == EXPECTED_MD
        assert [d for _n, d in out["subdatasets"]] == [
            "Bands B2, B3, B4, B8 with 10m resolution, UTM 32N",
            "Bands B5, B6, B7, B8A, B11, B12 with 20m resolution, "
            "UTM 32N",
            "Bands B1, B9, B10 with 60m resolution, UTM 32N",
            "True color image, UTM 32N",
        ]
        assert out["subdatasets"][3][0] == \
            f"SENTINEL2_L1C:{XML_SC}:TCI:EPSG_32632"

    def test_10m_and_tci(self):
        sd = open_sentinel2_subdataset(
            f"SENTINEL2_L1C:{XML_SC}:10m:EPSG_32632")
        assert (sd["xsize"], sd["ysize"]) == (10980, 10980)
        assert [b["name"] for b in sd["bands"]] == \
            ["B4", "B3", "B2", "B8"]
        b1 = [s for s in sd["sources"] if s["band"] == 1][0]
        assert b1["path"].endswith("GRANULE/FOO/IMG_DATA/BAR_B04.jp2")
        tci = open_sentinel2_subdataset(
            f"SENTINEL2_L1C:{XML_SC}:TCI:EPSG_32632")
        assert (tci["xsize"], tci["ysize"]) == (10980, 10980)
        assert tci["bands"][0]["dtype"] == "uint8"
        assert tci["sources"][0]["path"].endswith(
            "GRANULE/FOO/IMG_DATA/BAR_TCI.jp2")

    def test_tci_requires_compact(self):
        with pytest.raises(Exception):
            open_sentinel2_subdataset(
                f"SENTINEL2_L1C:{XML}:TCI:EPSG_32632")
