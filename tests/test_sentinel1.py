"""Sentinel-1 SAFE driver (sources/sentinel1.py).

Parity: reference SAFE driver expectations on its own fixtures
(`autotest/gdrivers/safe.py`): measurement band checksums 65372/3732
(decoded through the repo's TIFF codec), the FOOTPRINT string with
GDAL's exact spacing, the SENTINEL1_CALIB subdataset grammar
(swath / swath_pol / swath_pol_img selection), the WV SLC product's
10-subdataset listing and annotation GCP counts (1 and 2).
"""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.sentinel1 import (open_sentinel1,
                                            open_sentinel1_subdataset,
                                            read_sentinel1_band)

M = ("/root/reference/autotest/gdrivers/data/SAFE_FAKE/test.SAFE/"
     "manifest.safe")
W = ("/root/reference/autotest/gdrivers/data/SAFE_FAKE_WV/"
     "manifest.safe")


class TestGrd:
    def test_footprint_and_band_checksums(self):
        # safe.py:test_safe_1/2 — band 1 (VH) 65372, band 2 (VV) 3732
        p = open_sentinel1(M)
        assert p["metadata"]["FOOTPRINT"] == (
            "POLYGON((-8.407759 38.130520,-11.335915 38.535374,"
            "-11.026125 40.036644,-8.035001 39.633217, "
            "-8.407759 38.130520))")
        assert [(b["pol"]) for b in p["bands"]] == ["VH", "VV"]
        sd = {"calibration": "UNCALIB", "unit": "AMPLITUDE",
              "bands": p["bands"], "gcps": [], "metadata": {}}
        arr, _ = read_sentinel1_band(sd, band=1)
        assert gdal_checksum(arr.astype(np.float64)) == 65372
        arr, _ = read_sentinel1_band(sd, band=2)
        assert gdal_checksum(arr.astype(np.float64)) == 3732

    @pytest.mark.parametrize("ident,cs", [
        ("IW_VH", 65372),   # safe.py:test_safe_3
        ("IW_VV", 3732),    # safe.py:test_safe_4
        ("IW", 65372),      # safe.py:test_safe_5 (swath-only)
    ])
    def test_subdataset_selection(self, ident, cs):
        arr, meta = read_sentinel1_band(
            f"SENTINEL1_CALIB:UNCALIB:{M}:{ident}:AMPLITUDE")
        assert gdal_checksum(arr.astype(np.float64)) == cs

    def test_calibrated_intensity_runs(self):
        raw, _ = read_sentinel1_band(
            f"SENTINEL1_CALIB:UNCALIB:{M}:IW_VH:AMPLITUDE")
        cal, _ = read_sentinel1_band(
            f"SENTINEL1_CALIB:SIGMA0:{M}:IW_VH:INTENSITY")
        assert cal.shape == raw.shape
        assert (cal >= 0).all()

    def test_invalid_names(self):
        for bad in (f"SENTINEL1_CALIB:FOO:{M}:IW_VH:AMPLITUDE",
                    f"SENTINEL1_CALIB:UNCALIB:{M}:EW_VH:AMPLITUDE",
                    f"SENTINEL1_CALIB:UNCALIB:{M}:IW_VH:WATTS"):
            with pytest.raises(Exception):
                open_sentinel1_subdataset(bad)


class TestWvSlc:
    def test_subdataset_listing(self):
        # safe.py:test_safe_WV — exactly 10 subdatasets (5 per
        # existing measurement; manifest-listed-but-pruned granules
        # are skipped)
        p = open_sentinel1(W)
        names = [n for n, _d in p["subdatasets"]]
        assert len(names) == 10
        assert f"SENTINEL1_CALIB:SIGMA0:{W}:WV1_VV_001:INTENSITY" \
            in names
        assert f"SENTINEL1_CALIB:SIGMA0:{W}:WV2_VV_002:INTENSITY" \
            in names

    def test_gcp_counts(self):
        s1 = open_sentinel1_subdataset(
            f"SENTINEL1_CALIB:SIGMA0:{W}:WV1_VV_001:INTENSITY")
        s2 = open_sentinel1_subdataset(
            f"SENTINEL1_CALIB:SIGMA0:{W}:WV2_VV_002:INTENSITY")
        assert len(s1["gcps"]) == 1
        assert len(s2["gcps"]) == 2
        g = s2["gcps"][0]
        assert {"line", "pixel", "latitude", "longitude"} <= set(g)
