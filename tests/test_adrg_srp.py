"""ADRG and USRP/ASRP (SRP) drivers over the shared ISO 8211 parser,
pinned to the reference autotest fixtures (gdrivers/{adrg,srp}.py)."""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data"


class TestADRG:
    def test_gen_and_thf(self):
        # adrg.py: checksum 62833 via the .GEN and the .THF routes
        drv, arr, meta = open_raster_path(
            f"{DATA}/adrg/SMALL_ADRG/ABCDEF01.GEN")
        assert drv == "ADRG" and arr.shape == (128, 128, 3)
        assert int(gdal_checksum(arr[:, :, 0])) == 62833
        assert meta["epsg"] == 4326

        drv, arr2, _ = open_raster_path(
            f"{DATA}/adrg/SMALL_ADRG/TRANSH01.THF")
        assert int(gdal_checksum(arr2[:, :, 0])) == 62833

    def test_polar_zones(self):
        # adrg.py test_adrg_zna_9 / _18 geotransforms
        _, _, m9 = open_raster_path(
            f"{DATA}/adrg/SMALL_ADRG_ZNA9/ABCDEF01.GEN")
        np.testing.assert_allclose(
            m9["transform"],
            (-307675.73602473765, 100.09145391818853, 0.0,
             -179477.5051066006, 0.0, -100.09145391818853), atol=1e-5)
        _, _, m18 = open_raster_path(
            f"{DATA}/adrg/SMALL_ADRG_ZNA18/ABCDEF01.GEN")
        np.testing.assert_allclose(
            m18["transform"],
            (-307675.73602473765, 100.09145391818853, 0.0,
             179477.5051066006, 0.0, -100.09145391818853), atol=1e-5)


class TestSRP:
    @pytest.mark.parametrize("pcb", [0, 4, 8])
    def test_usrp_all_compressions(self, pcb):
        # srp.py test_srp_1: checksum 24576 + UTM-17 georef for raw,
        # nibble-RLE and byte-RLE tile stores
        drv, arr, meta = open_raster_path(
            f"{DATA}/srp/USRP_PCB{pcb}/FKUSRP01.IMG")
        assert drv == "SRP"
        assert int(gdal_checksum(arr)) == 24576
        assert meta["transform"] == (500000.0, 5.0, 0.0, 5000000.0,
                                     0.0, -5.0)
        assert meta["epsg"] == 32617

    def test_palette_and_metadata(self):
        _, _, meta = open_raster_path(
            f"{DATA}/srp/USRP_PCB0/FKUSRP01.IMG")
        ct = meta["color_table"]
        assert len(ct) == 4
        assert ct[0] == (0, 0, 0, 255)
        assert ct[1] == (255, 0, 0, 255)
        md = meta["metadata"]
        assert md["SRP_NAM"] == "FKUSRP"
        assert md["SRP_PRODUCT"] == "USRP"
        assert md["SRP_SCA"] == "50000"
        assert md["SRP_ZNA"] == "17"
        assert md["SRP_PSP"] == "100.0"

    def test_thf_route(self):
        drv, arr, _ = open_raster_path(
            f"{DATA}/srp/USRP_PCB0/TRANSH01.THF")
        assert drv == "SRP"
        assert int(gdal_checksum(arr)) == 24576
