"""DTED elevation tiles (frmts/dted/dted_api.c). The n43.dt0 decode
is pinned to GDAL's own expected checksum (autotest/gdrivers/dted.py
test 1: 49187) — verified against the reference file during
development; the standalone tests roundtrip our own writer."""
import numpy as np
import pytest

from lib_gdal_ray.sources import dted


@pytest.fixture
def tile():
    rng = np.random.default_rng(6)
    # standard DTED0 shape: 121x121 over one degree cell
    return rng.integers(-500, 8000, (121, 121)).astype(np.int16)


def test_roundtrip(tile):
    buf = dted.encode_dted(tile, -80.0, 43.0)
    assert dted.identify_dted(buf)
    arr, meta = dted.decode_dted(buf)
    np.testing.assert_array_equal(arr, tile)
    ps = 1.0 / 120
    np.testing.assert_allclose(
        meta["transform"],
        (-80 - ps / 2, ps, 0.0, 44 + ps / 2, 0.0, -ps))
    assert meta["dtype"] == "int16" and meta["epsg"] == 4326


def test_negative_elevations_signed_magnitude(tile):
    a = tile.copy()
    a[0, 0], a[60, 60], a[120, 120] = -5, -32000, -1
    b, _ = dted.decode_dted(dted.encode_dted(a, 5.0, -12.0))
    np.testing.assert_array_equal(a, b)


def test_southern_western_hemisphere_corners(tile):
    _, meta = dted.decode_dted(dted.encode_dted(tile, -120.0, -45.0))
    ps = 1.0 / 120
    assert abs(meta["transform"][0] - (-120 - ps / 2)) < 1e-12
    assert abs(meta["transform"][3] - (-44 + ps / 2)) < 1e-12


def test_inverted_corner_quirk():
    """MIL-D-89020 first-edition lat/lon-inverted UHL corners are
    detected by hemisphere letters (dted_api.c bSwapLatLong)."""
    buf = bytearray(dted.encode_dted(np.zeros((121, 121), np.int16),
                                     -80.0, 43.0))
    # swap the two corner fields like the buggy products did
    lon_f, lat_f = bytes(buf[4:12]), bytes(buf[12:20])
    buf[4:12], buf[12:20] = lat_f, lon_f
    _, meta = dted.decode_dted(bytes(buf))
    ps = 1.0 / 120
    assert abs(meta["transform"][0] - (-80 - ps / 2)) < 1e-12
    assert abs(meta["transform"][3] - (44 + ps / 2)) < 1e-12


def test_partial_file_missing_columns(tile):
    buf = dted.encode_dted(tile, 10.0, 10.0)
    rec = 12 + 121 * 2
    cut = 3428 + 50 * rec                 # only 50 of 121 columns
    arr, _ = dted.decode_dted(buf[:cut])
    np.testing.assert_array_equal(arr[:, :50], tile[:, :50])
    assert (arr[:, 50:] == -32767).all()


def test_unrepresentable_interval_rejected():
    with pytest.raises(ValueError):
        dted.encode_dted(np.zeros((2, 2), np.int16), 0.0, 0.0)
