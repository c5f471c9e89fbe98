"""TIL (DigitalGlobe tile set) and RS2 (RADARSAT-2 product.xml)
drivers, pinned to the reference autotest fixtures
(gdrivers/{til,rs2}.py expectations)."""

import numpy as np

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data"


class TestTIL:
    def test_mosaic_checksum(self):
        drv, arr, meta = open_raster_path(f"{DATA}/til/testtil.til")
        assert drv == "TIL"
        assert int(gdal_checksum(arr)) == 4672  # til.py test_til_1

    def test_filelist_and_imd(self):
        # til.py test_til_2: 3 files, IMAGERY metadata keys present
        _, _, meta = open_raster_path(f"{DATA}/til/testtil.til")
        assert len(meta["file_list"]) == 3
        md = meta["imagery"]
        assert md["SATELLITEID"] == "WV03"
        assert md["CLOUDCOVER"] == "0.027"
        assert "ACQUISITIONDATETIME" in md


class TestRS2:
    P = f"{DATA}/rs2/product.xml"

    def test_raw_bands(self):
        drv, arr, meta = open_raster_path(self.P)
        assert drv == "RS2"
        assert arr.shape == (20, 20, 2)  # HH + HV poles
        assert int(gdal_checksum(arr[:, :, 0])) == 4672
        assert meta["poles"] == ["HH", "HV"]

    def test_beta0_calibration(self):
        from lib_gdal_ray.sources.rs2 import decode_rs2

        # rs2.py test_rs2_2: RADARSAT_2_CALIB:BETA0 → checksum 4848
        arr, meta = decode_rs2(self.P, calibration="beta0")
        assert arr.dtype == np.float32
        assert int(gdal_checksum(arr[:, :, 0])) == 4848

    def test_rpc(self):
        from lib_gdal_ray.sources.rs2 import decode_rs2

        _, meta = decode_rs2(self.P)
        # rs2.py test_rs2_3: the dummy RPC carries element names as
        # values — the full mapping must come through verbatim
        assert meta["rpc"] == {
            "ERR_BIAS": "biasError", "ERR_RAND": "randomError",
            "HEIGHT_OFF": "heightOffset",
            "HEIGHT_SCALE": "heightScale",
            "LAT_OFF": "latitudeOffset", "LAT_SCALE": "latitudeScale",
            "LINE_DEN_COEFF": "lineDenominatorCoefficients",
            "LINE_NUM_COEFF": "lineNumeratorCoefficients",
            "LINE_OFF": "lineOffset", "LINE_SCALE": "lineScale",
            "LONG_OFF": "longitudeOffset",
            "LONG_SCALE": "longitudeScale",
            "SAMP_DEN_COEFF": "pixelDenominatorCoefficients",
            "SAMP_NUM_COEFF": "pixelNumeratorCoefficients",
            "SAMP_OFF": "pixelOffset", "SAMP_SCALE": "pixelScale",
        }
