"""NetCDF classic (CDF-1 / CDF-2) files ↔ multidim chunk-row Datasets.

Pure-python implementation of the public NetCDF classic file format
(the Unidata "classic format spec"): big-endian header with
dimension / attribute / variable lists, contiguous fixed-size
variable data, record variables interleaved along the unlimited
dimension. CDF-1 uses 4-byte data offsets, CDF-2 (the 64-bit-offset
variant) 8-byte; both read and write here. NetCDF-4/HDF5 is out of
scope (documented) — GDAL routes those via HDF5.

Reference parity: the reference's netCDF driver (`frmts/netcdf/`)
feeds the same multidim model (`gcore/gdal_multidim.h:304`). Ray
shape mirrors `sources/zarr.py`: the tiny header parses driver-side,
then each variable reads as chunk rows split along the slowest
dimension — every map_batches task seeks to only its own byte ranges,
so a 100 GB variable decodes in parallel with no driver-side data.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from .multidim import MAX_DIMS, pack_chunks

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

# nc_type -> (numpy dtype (big-endian on disk), external size)
_NC_TYPES = {1: ">i1", 2: "S1", 3: ">i2", 4: ">i4", 5: ">f4", 6: ">f8"}
_NC_FROM_NP = {"int8": 1, "int16": 3, "int32": 4,
               "float32": 5, "float64": 6}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.pos:self.pos + n].decode("utf-8")
        self.pos += _pad4(n)
        return s

    def values(self, nc_type: int, n: int):
        dt = np.dtype(_NC_TYPES[nc_type])
        raw = self.buf[self.pos:self.pos + dt.itemsize * n]
        self.pos += _pad4(dt.itemsize * n)
        if nc_type == 2:
            return raw.decode("utf-8", "replace")
        return np.frombuffer(raw, dtype=dt)

    def att_list(self) -> Dict:
        tag = self.u32()
        count = self.u32()
        if tag == 0 and count == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError("bad attribute list tag")
        out = {}
        for _ in range(count):
            nm = self.name()
            t = self.u32()
            n = self.u32()
            out[nm] = self.values(t, n)
        return out


def read_header(path: str) -> Dict:
    """Parse the classic header; -> {version, numrecs, dims:[(name,
    len)], gatts, vars:{name: {dims, shape, nc_type, vsize, begin,
    record, atts}}, recsize}."""
    with open(path, "rb") as f:
        head = f.read(1 << 20)  # classic headers are tiny
    if head[:8] == b"\x89HDF\r\n\x1a\n":
        raise ValueError("NetCDF-4 file (HDF5-backed): route through "
                         "sources.hdf5 (read_netcdf does this "
                         "automatically)")
    if head[:3] != b"CDF" or head[3] not in (1, 2):
        raise ValueError("not a NetCDF classic (CDF-1/CDF-2) file")
    version = head[3]
    r = _Reader(head)
    r.pos = 4
    numrecs = r.u32()
    tag = r.u32()
    ndims = r.u32()
    dims: List[Tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            dims.append((r.name(), r.u32()))
    elif not (tag == 0 and ndims == 0):
        raise ValueError("bad dimension list tag")
    gatts = r.att_list()
    tag = r.u32()
    nvars = r.u32()
    if tag not in (_NC_VARIABLE, 0):
        raise ValueError("bad variable list tag")
    vars_: Dict[str, Dict] = {}
    recsize = 0
    for _ in range(nvars if tag == _NC_VARIABLE else 0):
        nm = r.name()
        nd = r.u32()
        dimids = [r.u32() for _ in range(nd)]
        atts = r.att_list()
        nc_type = r.u32()
        vsize = r.u32()
        begin = r.u64() if version == 2 else r.u32()
        record = bool(dimids) and dims[dimids[0]][1] == 0
        shape = tuple(dims[d][1] for d in dimids)
        vars_[nm] = {"dims": [dims[d][0] for d in dimids],
                     "shape": shape, "nc_type": nc_type,
                     "vsize": vsize, "begin": begin,
                     "record": record, "atts": atts}
        if record:
            recsize += vsize
    return {"version": version, "numrecs": numrecs, "dims": dims,
            "gatts": gatts, "vars": vars_, "recsize": recsize}


def read_netcdf(path: str, var: str,
                rows_per_chunk: Optional[int] = None,
                override_num_blocks: Optional[int] = None
                ) -> Tuple[ray.data.Dataset, Dict]:
    """One variable -> (chunk-row Dataset, meta) in the multidim model:
    chunks split along the slowest dimension (the record dimension for
    record variables); each decode task seeks to its own byte ranges.
    meta: {shape, chunk_shape, dtype}.

    NetCDF-4 files are HDF5 containers (the reference's netCDF driver
    routes them through libhdf5, `frmts/netcdf/netcdfdataset.cpp`
    Identify) — detected by signature and routed through
    `sources.hdf5.read_hdf5` transparently."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == b"\x89HDF\r\n\x1a\n":
        from .hdf5 import read_hdf5
        return read_hdf5(path, var,
                         override_num_blocks=override_num_blocks)
    hdr = read_header(path)
    if var not in hdr["vars"]:
        raise KeyError(f"variable {var!r} not in {list(hdr['vars'])}")
    v = hdr["vars"][var]
    shape = list(v["shape"])
    if v["record"]:
        shape[0] = hdr["numrecs"]
    shape = tuple(shape)
    k = len(shape)
    if k == 0 or k > MAX_DIMS:
        raise ValueError(f"need 1..{MAX_DIMS} dims, got {k}")
    dt = np.dtype(_NC_TYPES[v["nc_type"]])
    if v["nc_type"] == 2:
        raise ValueError("char variables not supported as arrays")
    inner = int(np.prod(shape[1:], dtype=np.int64)) if k > 1 else 1
    row_bytes = inner * dt.itemsize
    if rows_per_chunk is None:
        rows_per_chunk = max(1, min(shape[0],
                                    (4 << 20) // max(1, row_bytes)))
    chunk_shape = (rows_per_chunk,) + shape[1:]
    n_chunks = (shape[0] + rows_per_chunk - 1) // rows_per_chunk
    begin = v["begin"]
    recsize = hdr["recsize"]
    rec_stride = recsize if v["record"] else row_bytes
    # non-record: row i at begin + i*row_bytes (contiguous);
    # record var: record i's slab at begin + i*recsize
    record = v["record"]
    per_rec = v["vsize"] if record else row_bytes

    items = [{"c": i} for i in range(n_chunks)]

    def decode(batch: pa.Table) -> pa.Table:
        cs = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        datas = []
        idx = np.zeros((len(cs), k), dtype=np.int64)
        with open(path, "rb") as f:
            for j, ci in enumerate(cs):
                r0 = int(ci) * rows_per_chunk
                r1 = min(r0 + rows_per_chunk, shape[0])
                if record:
                    rows = []
                    for r_i in range(r0, r1):
                        f.seek(begin + r_i * rec_stride)
                        rows.append(f.read(per_rec)[:row_bytes])
                    raw = b"".join(rows)
                else:
                    f.seek(begin + r0 * row_bytes)
                    raw = f.read((r1 - r0) * row_bytes)
                arr = np.frombuffer(raw, dtype=dt).reshape(
                    (r1 - r0,) + shape[1:])
                datas.append(np.ascontiguousarray(arr)
                             .astype("<f8").tobytes())
                idx[j, 0] = ci
        cols = {"chunk_id": pa.array(pack_chunks(idx)),
                "data": pa.array(datas, type=pa.binary())}
        for d in range(k):
            cols[f"i{d}"] = pa.array(idx[:, d].astype(np.int32))
        return pa.table(cols)

    ds = ray.data.from_items(
        items,
        override_num_blocks=override_num_blocks or min(64, n_chunks)
    ).map_batches(decode, batch_format="pyarrow")
    meta = {"shape": shape, "chunk_shape": chunk_shape,
            "dtype": str(np.dtype(dt).newbyteorder("=")),
            "atts": v["atts"], "gatts": hdr["gatts"]}
    return ds, meta


class _Writer:
    def __init__(self):
        self.out = bytearray()

    def u32(self, v):
        self.out += struct.pack(">I", int(v))

    def u64(self, v):
        self.out += struct.pack(">Q", int(v))

    def name(self, s: str):
        b = s.encode("utf-8")
        self.u32(len(b))
        self.out += b + b"\x00" * (_pad4(len(b)) - len(b))


def write_netcdf(path: str, variables: Dict[str, np.ndarray],
                 dim_names: Optional[Dict[str, List[str]]] = None,
                 version: int = 2) -> None:
    """Write fixed-size variables to a classic CDF-1/CDF-2 file
    (driver-side metadata; intended for small interchange files and
    roundtrip tests — big arrays belong in zarr chunks)."""
    w = _Writer()
    w.out += b"CDF" + bytes([version])
    w.u32(0)  # numrecs
    # dimension list: unique (name, length) in first-seen order
    dims: List[Tuple[str, int]] = []
    var_dimids: Dict[str, List[int]] = {}
    for nm, arr in variables.items():
        names = (dim_names or {}).get(
            nm, [f"{nm}_d{i}" for i in range(arr.ndim)])
        ids = []
        for dn, ln in zip(names, arr.shape):
            key = (dn, int(ln))
            if key not in dims:
                dims.append(key)
            ids.append(dims.index(key))
        var_dimids[nm] = ids
    w.u32(_NC_DIMENSION)
    w.u32(len(dims))
    for dn, ln in dims:
        w.name(dn)
        w.u32(ln)
    w.u32(0)
    w.u32(0)  # no global attributes
    w.u32(_NC_VARIABLE)
    w.u32(len(variables))
    # first pass with placeholder begins to learn the header size
    items = []
    for nm, arr in variables.items():
        nc_type = _NC_FROM_NP.get(str(arr.dtype.newbyteorder("=")))
        if nc_type is None:
            raise ValueError(f"unsupported dtype {arr.dtype}")
        dt = np.dtype(_NC_TYPES[nc_type])
        vsize = _pad4(arr.size * dt.itemsize)
        items.append((nm, arr, nc_type, dt, vsize))

    def var_entry(nm, arr, nc_type, vsize, begin):
        w.name(nm)
        w.u32(arr.ndim)
        for d in var_dimids[nm]:
            w.u32(d)
        w.u32(0)
        w.u32(0)  # no attributes
        w.u32(nc_type)
        w.u32(vsize)
        (w.u64 if version == 2 else w.u32)(begin)

    probe = len(w.out)
    for nm, arr, nc_type, dt, vsize in items:
        var_entry(nm, arr, nc_type, vsize, 0)
    header_len = len(w.out)
    # second pass with real offsets
    del w.out[probe:]
    begin = header_len
    for nm, arr, nc_type, dt, vsize in items:
        var_entry(nm, arr, nc_type, vsize, begin)
        begin += vsize
    assert len(w.out) == header_len
    tmp = path + ".__tmp__"
    with open(tmp, "wb") as f:
        f.write(bytes(w.out))
        for nm, arr, nc_type, dt, vsize in items:
            raw = np.ascontiguousarray(arr).astype(dt).tobytes()
            f.write(raw + b"\x00" * (vsize - len(raw)))
    os.replace(tmp, path)
