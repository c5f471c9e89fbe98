"""NetCDF classic (CDF-1/2): header parse, parallel chunk read, write."""

import struct

import numpy as np
import pytest

from lib_gdal_ray.sources import multidim as md
from lib_gdal_ray.sources import netcdf as nc


def test_roundtrip_cdf2(tmp_path):
    path = str(tmp_path / "t.nc")
    a = (np.arange(24 * 10 * 6) % 13).reshape(24, 10, 6) \
        .astype(np.float64)
    b = np.arange(50, dtype=np.int32)
    nc.write_netcdf(path, {"temp": a, "idx": b},
                    dim_names={"temp": ["time", "y", "x"],
                               "idx": ["n"]})
    hdr = nc.read_header(path)
    assert hdr["version"] == 2
    assert hdr["vars"]["temp"]["shape"] == (24, 10, 6)
    assert dict(hdr["dims"])["y"] == 10

    ds, meta = nc.read_netcdf(path, "temp", rows_per_chunk=7)
    assert meta["shape"] == (24, 10, 6)
    out = md.to_numpy(ds, meta["shape"], meta["chunk_shape"])
    np.testing.assert_array_equal(out, a)

    ds2, m2 = nc.read_netcdf(path, "idx")
    out2 = md.to_numpy(ds2, m2["shape"], m2["chunk_shape"])
    np.testing.assert_array_equal(out2, b.astype(np.float64))


def test_roundtrip_cdf1(tmp_path):
    path = str(tmp_path / "v1.nc")
    a = np.linspace(0, 1, 36, dtype=np.float32).reshape(6, 6)
    nc.write_netcdf(path, {"v": a}, version=1)
    assert open(path, "rb").read(4) == b"CDF\x01"
    ds, meta = nc.read_netcdf(path, "v")
    out = md.to_numpy(ds, meta["shape"], meta["chunk_shape"])
    np.testing.assert_allclose(out, a.astype(np.float64))


def test_reads_record_variable(tmp_path):
    # hand-build a spec-conformant CDF-1 file with an unlimited
    # record dimension and one record variable (as a foreign writer
    # would lay it out: record slabs interleaved)
    path = str(tmp_path / "rec.nc")
    nrec, width = 5, 3
    data = np.arange(nrec * width, dtype=">f4").reshape(nrec, width)
    out = bytearray()
    out += b"CDF\x01" + struct.pack(">I", nrec)
    out += struct.pack(">II", 0x0A, 2)          # dim list
    for nm, ln in (("time", 0), ("x", width)):
        b = nm.encode()
        out += struct.pack(">I", len(b)) + b
        out += b"\x00" * ((4 - len(b) % 4) % 4)
        out += struct.pack(">I", ln)
    out += struct.pack(">II", 0, 0)             # gatts absent
    out += struct.pack(">II", 0x0B, 1)          # var list
    b = b"rv"
    out += struct.pack(">I", len(b)) + b + b"\x00\x00"
    out += struct.pack(">I", 2)                 # ndims
    out += struct.pack(">II", 0, 1)             # dimids: time, x
    out += struct.pack(">II", 0, 0)             # vatts absent
    out += struct.pack(">I", 5)                 # float
    vsize = width * 4
    out += struct.pack(">I", vsize)
    begin = len(out) + 4
    out += struct.pack(">I", begin)
    for r in range(nrec):                       # record-interleaved
        out += data[r].tobytes()
    open(path, "wb").write(bytes(out))

    hdr = nc.read_header(path)
    assert hdr["vars"]["rv"]["record"]
    ds, meta = nc.read_netcdf(path, "rv", rows_per_chunk=2)
    assert meta["shape"] == (nrec, width)
    got = md.to_numpy(ds, meta["shape"], meta["chunk_shape"])
    np.testing.assert_array_equal(got, data.astype(np.float64))


def test_pipeline_composition(tmp_path):
    path = str(tmp_path / "p.nc")
    a = ((np.arange(12)[:, None] * 3 + np.arange(8)[None, :]) % 7) \
        .astype(np.float64)
    nc.write_netcdf(path, {"g": a})
    ds, meta = nc.read_netcdf(path, "g", rows_per_chunk=5)
    red = md.reduce_dim(ds, meta["shape"], meta["chunk_shape"],
                        axis=1, op="sum")
    got = md.to_numpy(red, meta["shape"][:1], meta["chunk_shape"][:1])
    np.testing.assert_array_equal(got, a.sum(axis=1))


def test_guards(tmp_path):
    bad = str(tmp_path / "bad.nc")
    open(bad, "wb").write(b"HDF\x89nope")
    with pytest.raises(ValueError, match="classic"):
        nc.read_header(bad)
    path = str(tmp_path / "g.nc")
    nc.write_netcdf(path, {"v": np.zeros((2, 2))})
    with pytest.raises(KeyError):
        nc.read_netcdf(path, "missing")
