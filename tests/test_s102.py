"""S-102 bathymetry driver (HDF5 compound datatypes), pinned to the
reference autotest fixtures (gdrivers/s102.py test_s102_basic)."""

import numpy as np
import pytest

from lib_gdal_ray.sources.rasters import open_raster_path

DATA = "/root/reference/autotest/gdrivers/data/s102"


@pytest.mark.parametrize("version", ["2.1", "2.2"])
def test_basic(version):
    p = f"{DATA}/test_s102_v{version}.h5"
    drv, arr, meta = open_raster_path(p)
    assert drv == "S102"
    assert arr.shape == (2, 3, 2) and arr.dtype == np.float32
    np.testing.assert_allclose(
        meta["transform"], (1.8, 0.4, 0.0, 48.75, 0.0, -0.5))
    assert meta["epsg"] == 4326 and meta["nodata"] == 1e6
    assert meta["band_names"] == ["depth", "uncertainty"]
    # the reference's exact ReadRaster expectations (north-up flip)
    np.testing.assert_array_equal(
        arr[:, :, 0].ravel(), [1e6, 4, 5, 0, 1, 2])
    np.testing.assert_array_equal(
        arr[:, :, 1].ravel(), [103, 1e6, 105, 100, 101, 102])


def test_compound_hdf5_datatype():
    from lib_gdal_ray.sources.hdf5 import read_h5_array, read_h5_structure

    p = f"{DATA}/test_s102_v2.1.h5"
    s = read_h5_structure(p)
    ds = "/BathymetryCoverage/BathymetryCoverage.01/Group_001/values"
    dt = s[ds]["dtype"]
    assert dt.names == ("depth", "uncertainty")
    assert dt["depth"] == np.dtype("<f4")
    rec = read_h5_array(p, ds)
    assert rec.shape == (2, 3)
