"""HDF5 files ↔ multidim chunk-row Datasets, pure python.

Hand-rolled parser for the public HDF5 file-format spec v1.x — no
libhdf5/h5py in this container. Supported surface (the subset every
netCDF-4 / satellite-product file in the reference's
`autotest/gdrivers/data/hdf5/` corpus uses):

- superblock v0/v1 and v2/v3 (8-byte offsets/lengths)
- object headers v1 and v2 ("OHDR"), incl. continuation blocks
- groups: v1 symbol tables (B-tree v1 + SNOD + local heap) and v2
  compact Link messages (dense fractal-heap groups are rejected
  with a clear error)
- dataspace v1/v2, datatype classes fixed-point/float/string,
  fill value v2/v3, layout v1/v2/v3 (compact / contiguous / chunked
  with B-tree v1 chunk index), filter pipeline v1/v2 with deflate,
  shuffle and fletcher32

Reference parity: `frmts/hdf5/hdf5dataset.cpp` + `hdf5imagedataset
.cpp` (read-only there too); the multidim model it feeds is
`gcore/gdal_multidim.h:304`. Ray shape mirrors `sources/netcdf.py` /
`sources/zarr.py`: the header and chunk B-tree parse driver-side
(pure metadata, one record per chunk), then `read_hdf5` fans the
chunk list out as a from_items plan — each task seeks/reads/inflates
only its own chunks, so a 100 GB dataset decodes in parallel with no
driver-side pixel data.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from .multidim import MAX_DIMS, pack_chunks

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF


class _F:
    """Cursor over the file bytes (files are metadata-small; data
    reads in the Ray tasks re-open and seek)."""

    def __init__(self, buf: bytes):
        self.b = buf

    def u(self, off: int, n: int) -> int:
        return int.from_bytes(self.b[off:off + n], "little")


def _parse_datatype(body: bytes) -> Tuple[np.dtype, int]:
    """Datatype message -> (numpy dtype, class)."""
    cls_ver = body[0]
    cls = cls_ver & 0x0F
    bits0 = body[1]
    size = struct.unpack_from("<I", body, 4)[0]
    order = ">" if (bits0 & 1) else "<"
    if cls == 0:                      # fixed-point
        signed = bool(bits0 & 0x08)
        return np.dtype(f"{order}{'i' if signed else 'u'}{size}"), cls
    if cls == 1:                      # float
        return np.dtype(f"{order}f{size}"), cls
    if cls == 3:                      # string (fixed-length)
        return np.dtype(f"S{size}"), cls
    if cls == 6:                      # compound (S-102/S-104 carriers)
        ver = cls_ver >> 4
        nmembers = body[1] | (body[2] << 8)
        pos = 8
        names, formats, offsets = [], [], []
        for _ in range(nmembers):
            if ver in (1, 2):
                end = body.index(b"\x00", pos)
                name = body[pos:end].decode("ascii")
                pos += ((end - pos) // 8 + 1) * 8
                (m_off,) = struct.unpack_from("<I", body, pos)
                pos += 4
                if ver == 1:
                    pos += 1 + 3 + 4 + 4 + 16  # dims/perm/reserved
            else:  # v3: unpadded name, minimal-size offset
                end = body.index(b"\x00", pos)
                name = body[pos:end].decode("ascii")
                pos = end + 1
                nbytes = max(1, (max(size - 1, 1).bit_length() + 7) // 8)
                m_off = int.from_bytes(body[pos:pos + nbytes], "little")
                pos += nbytes
            m_dt, m_cls = _parse_datatype(body[pos:])
            # advance past the member datatype message: 8-byte fixed
            # header + class-specific property block
            props = {0: 4, 1: 12, 3: 0}.get(m_cls)
            if props is None:
                raise ValueError(
                    f"compound member class {m_cls} unsupported")
            pos += 8 + props
            names.append(name)
            formats.append(m_dt)
            offsets.append(m_off)
        dt = np.dtype({"names": names, "formats": formats,
                       "offsets": offsets, "itemsize": size})
        return dt, cls
    raise ValueError(f"unsupported HDF5 datatype class {cls}")


def _parse_dataspace(body: bytes) -> Tuple[int, ...]:
    ver = body[0]
    if ver == 1:
        rank, flags = body[1], body[2]
        off = 8
    elif ver == 2:
        rank, flags = body[1], body[2]
        off = 4
    else:
        raise ValueError(f"dataspace version {ver}")
    dims = struct.unpack_from(f"<{rank}Q", body, off)
    return tuple(int(d) for d in dims)


def _parse_filters(body: bytes) -> List[Tuple[int, Tuple[int, ...]]]:
    """Filter pipeline -> [(filter_id, client_values), ...]."""
    ver = body[0]
    nf = body[1]
    out = []
    if ver == 1:
        pos = 8
        for _ in range(nf):
            fid, namelen, _flags, nvals = struct.unpack_from("<4H", body, pos)
            pos += 8
            pos += (namelen + 7) & ~7
            vals = struct.unpack_from(f"<{nvals}I", body, pos)
            pos += 4 * nvals
            if nvals % 2:
                pos += 4
            out.append((fid, vals))
    else:
        pos = 2
        for _ in range(nf):
            fid = struct.unpack_from("<H", body, pos)[0]
            pos += 2
            namelen = 0
            if fid >= 256:
                namelen = struct.unpack_from("<H", body, pos)[0]
                pos += 2
            _flags, nvals = struct.unpack_from("<2H", body, pos)
            pos += 4 + namelen
            vals = struct.unpack_from(f"<{nvals}I", body, pos)
            pos += 4 * nvals
            out.append((fid, vals))
    return out


def _iter_messages_v1(f: _F, addr: int):
    """Object header v1 -> yield (msg_type, body bytes)."""
    nmsgs = f.u(addr + 2, 2)
    hdr_size = f.u(addr + 8, 4)
    blocks = [(addr + 16, hdr_size)]
    got = 0
    while blocks and got < nmsgs:
        start, size = blocks.pop(0)
        pos = start
        end = start + size
        while pos + 8 <= end and got < nmsgs:
            mtype, msize, _fl = struct.unpack_from("<HHB", f.b, pos)
            body = f.b[pos + 8: pos + 8 + msize]
            pos += 8 + msize
            got += 1
            if mtype == 0x0010:        # continuation
                caddr = int.from_bytes(body[0:8], "little")
                clen = int.from_bytes(body[8:16], "little")
                blocks.append((caddr, clen))
                continue
            yield mtype, body


def _iter_messages_v2(f: _F, addr: int):
    """Object header v2 ("OHDR") -> yield (msg_type, body bytes)."""
    assert f.b[addr:addr + 4] == b"OHDR"
    flags = f.u(addr + 5, 1)
    pos = addr + 6
    if flags & 0x20:
        pos += 8                       # times
    if flags & 0x10:
        pos += 4                       # max compact/dense
    size_bytes = 1 << (flags & 0x3)
    chunk0 = f.u(pos, size_bytes)
    pos += size_bytes
    track_order = bool(flags & 0x04)
    blocks = [(pos, chunk0)]
    while blocks:
        start, size = blocks.pop(0)
        pos = start
        end = start + size
        while pos + 4 <= end:
            mtype = f.u(pos, 1)
            msize = f.u(pos + 1, 2)
            pos += 4
            if track_order:
                pos += 2
            body = f.b[pos:pos + msize]
            pos += msize
            if mtype == 0x10:
                caddr = int.from_bytes(body[0:8], "little")
                clen = int.from_bytes(body[8:16], "little")
                blocks.append((caddr + 4, clen - 8))  # skip OCHK + checksum
                continue
            yield mtype, body


def _iter_messages(f: _F, addr: int):
    if f.b[addr:addr + 4] == b"OHDR":
        yield from _iter_messages_v2(f, addr)
    else:
        yield from _iter_messages_v1(f, addr)


def _walk_group_btree(f: _F, btree_addr: int, heap_addr: int,
                      out: Dict[str, int]):
    """B-tree v1 (node type 0) + local heap -> {link name: obj addr}."""
    assert f.b[heap_addr:heap_addr + 4] == b"HEAP"
    heap_data = f.u(heap_addr + 24, 8)

    def name_at(off: int) -> str:
        p = heap_data + off
        e = f.b.index(b"\x00", p)
        return f.b[p:e].decode("utf-8")

    def walk(addr: int):
        assert f.b[addr:addr + 4] == b"TREE", "bad group B-tree node"
        level = f.u(addr + 5, 1)
        nent = f.u(addr + 6, 2)
        pos = addr + 8 + 16            # skip left/right siblings
        pos += 8                       # key 0
        children = []
        for _ in range(nent):
            children.append(f.u(pos, 8))
            pos += 8 + 8               # child + next key
        for c in children:
            if level > 0:
                walk(c)
            else:                      # SNOD
                assert f.b[c:c + 4] == b"SNOD"
                nsyms = f.u(c + 6, 2)
                p = c + 8
                for _ in range(nsyms):
                    noff = f.u(p, 8)
                    oaddr = f.u(p + 8, 8)
                    out[name_at(noff)] = oaddr
                    p += 40

    walk(btree_addr)


def _walk_chunk_btree(f: _F, addr: int, ndims: int,
                      chunks: List[Tuple[Tuple[int, ...], int, int, int]]):
    """B-tree v1 (node type 1) -> [(chunk offsets, file addr, nbytes,
    filter mask)]. ndims = rank + 1 (spec stores an extra 0 dim)."""
    if addr == _UNDEF:
        return
    assert f.b[addr:addr + 4] == b"TREE", "bad chunk B-tree node"
    level = f.u(addr + 5, 1)
    nent = f.u(addr + 6, 2)
    pos = addr + 8 + 16
    key_size = 8 + 8 * ndims
    for _ in range(nent):
        nbytes = f.u(pos, 4)
        fmask = f.u(pos + 4, 4)
        offs = tuple(f.u(pos + 8 + 8 * d, 8) for d in range(ndims - 1))
        child = f.u(pos + key_size, 8)
        if level > 0:
            _walk_chunk_btree(f, child, ndims, chunks)
        else:
            chunks.append((offs, child, nbytes, fmask))
        pos += key_size + 8


def _parse_attribute(body: bytes):
    """Attribute message (0x000C) -> (name, value) best-effort.
    value: python scalar/str for scalar dataspaces, numpy array else."""
    ver = body[0]
    name_size, dt_size, ds_size = struct.unpack_from("<3H", body, 2)
    pos = 8
    if ver == 3:
        pos += 1                               # name charset
    def pad8(n):
        return (n + 7) & ~7
    name = body[pos:pos + name_size].split(b"\x00")[0].decode("utf-8")
    if ver == 1:
        pos += pad8(name_size)
        dt_raw = body[pos:pos + dt_size]
        pos += pad8(dt_size)
        ds_raw = body[pos:pos + ds_size]
        pos += pad8(ds_size)
    else:
        if body[1] & 0x3:
            raise ValueError("shared attribute datatype/dataspace")
        pos += name_size
        dt_raw = body[pos:pos + dt_size]
        pos += dt_size
        ds_raw = body[pos:pos + ds_size]
        pos += ds_size
    dt, cls = _parse_datatype(dt_raw)
    shape = _parse_dataspace(ds_raw) if ds_raw[1] > 0 else ()
    n = int(np.prod(shape)) if shape else 1
    data = body[pos:pos + n * dt.itemsize]
    arr = np.frombuffer(data, dt, count=n)
    if cls == 3:
        vals = [v.split(b"\x00")[0].decode("utf-8", "replace")
                for v in arr.tolist()]
        return name, (vals[0] if not shape else vals)
    if not shape:
        return name, arr[0].item()
    return name, arr.reshape(shape)


def _parse_object(f: _F, addr: int, path: str,
                  groups: Dict[str, int], datasets: Dict[str, dict]):
    info: dict = {"attrs": {}}
    links: Dict[str, int] = {}
    for mtype, body in _iter_messages(f, addr):
        if mtype == 0x000C:
            try:
                k, v = _parse_attribute(body)
                info["attrs"][k] = v
            except Exception:
                pass                           # best-effort metadata
        elif mtype == 0x0001:
            info["shape"] = _parse_dataspace(body)
        elif mtype == 0x0003:
            info["dtype"], info["dt_class"] = _parse_datatype(body)
        elif mtype == 0x0005 and len(body) > 1:
            pass                        # fill value: default 0 semantics
        elif mtype == 0x0008:
            ver = body[0]
            if ver == 3:
                lclass = body[1]
                if lclass == 0:         # compact
                    sz = struct.unpack_from("<H", body, 2)[0]
                    info["layout"] = ("compact", body[4:4 + sz])
                elif lclass == 1:
                    a, s = struct.unpack_from("<QQ", body, 2)
                    info["layout"] = ("contiguous", a, s)
                elif lclass == 2:
                    nd = body[2]
                    bt = struct.unpack_from("<Q", body, 3)[0]
                    dims = struct.unpack_from(f"<{nd}I", body, 11)
                    info["layout"] = ("chunked", bt,
                                      tuple(int(d) for d in dims[:-1]),
                                      int(dims[-1]))
                else:
                    raise ValueError(f"layout class {lclass}")
            elif ver in (1, 2):
                rank = body[1]
                lclass = body[2]
                pos = 8
                if lclass in (1, 2):
                    a = struct.unpack_from("<Q", body, pos)[0]
                    pos += 8
                dims = struct.unpack_from(f"<{rank}I", body, pos)
                pos += 4 * rank
                if lclass == 2:
                    esz = struct.unpack_from("<I", body, pos)[0]
                    info["layout"] = ("chunked", a,
                                      tuple(int(d) for d in dims), esz)
                elif lclass == 1:
                    info["layout"] = ("contiguous", a, 0)
                else:
                    sz = struct.unpack_from("<I", body, pos)[0]
                    info["layout"] = ("compact",
                                      body[pos + 4:pos + 4 + sz])
            else:
                raise ValueError(f"layout version {ver}")
        elif mtype == 0x000B:
            info["filters"] = _parse_filters(body)
        elif mtype == 0x0011:          # v1 group symbol table
            bt, hp = struct.unpack_from("<QQ", body, 0)
            _walk_group_btree(f, bt, hp, links)
        elif mtype == 0x0006:          # v2 compact link
            flags = body[1]
            pos = 2
            ltype = 0
            if flags & 0x08:
                ltype = body[pos]; pos += 1
            if flags & 0x04:
                pos += 8
            if flags & 0x10:
                pos += 1
            lsz = 1 << (flags & 0x3)
            nlen = int.from_bytes(body[pos:pos + lsz], "little")
            pos += lsz
            name = body[pos:pos + nlen].decode("utf-8")
            pos += nlen
            if ltype == 0:             # hard link
                links[name] = int.from_bytes(body[pos:pos + 8], "little")
        elif mtype == 0x0002:          # link info (dense check)
            fheap = int.from_bytes(body[2 + (8 if body[1] & 1 else 0):
                                        10 + (8 if body[1] & 1 else 0)],
                                   "little")
            if fheap != _UNDEF:
                raise ValueError("dense (fractal-heap) groups unsupported")
    if "layout" in info and "shape" in info:
        datasets[path or "/"] = info
    elif info["attrs"]:
        # group-level metadata (GDALGroup::GetAttributes analog)
        info["group"] = True
        datasets[(path or "") + "/@"] = info
    for name, a in links.items():
        child = f"{path}/{name}"
        groups[child] = a
        _parse_object(f, a, child, groups, datasets)


def read_h5_structure(path: str) -> Dict[str, dict]:
    """File -> {dataset path: {shape, dtype, layout, filters}}.
    Metadata only — chunk payloads are never touched here."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:8] != _SIG:
        # spec allows the superblock at 512/1024/...; probe
        off = 512
        while off < len(buf) and buf[off:off + 8] != _SIG:
            off *= 2
        if off >= len(buf):
            raise ValueError("not an HDF5 file (no signature)")
        buf = buf[off:]
    f = _F(buf)
    ver = buf[8]
    if ver in (0, 1):
        if buf[13] != 8 or buf[14] != 8:
            raise ValueError("only 8-byte offsets/lengths supported")
        sym_off = 24 + (4 if ver == 1 else 0) + 32
        root_addr = f.u(sym_off + 8, 8)
    elif ver in (2, 3):
        if buf[9] != 8 or buf[10] != 8:
            raise ValueError("only 8-byte offsets/lengths supported")
        root_addr = f.u(36, 8)
    else:
        raise ValueError(f"superblock version {ver}")
    groups: Dict[str, int] = {"": root_addr}
    datasets: Dict[str, dict] = {}
    _parse_object(f, root_addr, "", groups, datasets)
    return datasets


def _defilter(raw: bytes, filters, fmask: int) -> bytes:
    """Apply the filter pipeline in reverse (deflate=1, shuffle=2,
    fletcher32=3)."""
    for i, (fid, vals) in enumerate(reversed(filters or [])):
        if fmask & (1 << (len(filters) - 1 - i)):
            continue
        if fid == 1:
            raw = zlib.decompress(raw)
        elif fid == 2:
            esz = vals[0] if vals else 4
            n = len(raw) // esz
            raw = (np.frombuffer(raw, np.uint8)[:n * esz]
                   .reshape(esz, n).T.tobytes())
        elif fid == 3:
            raw = raw[:-4]
        else:
            raise ValueError(f"unsupported HDF5 filter id {fid}")
    return raw


def read_h5_array(path: str, var: str) -> np.ndarray:
    """Driver-side full read of one dataset (small arrays / tests)."""
    ds = read_h5_structure(path)
    key = var if var.startswith("/") else f"/{var}"
    if key not in ds:
        raise KeyError(f"{var!r} not in {sorted(ds)}")
    info = ds[key]
    shape, dt = info["shape"], info["dtype"]
    layout = info["layout"]
    with open(path, "rb") as fh:
        buf = fh.read()
    f = _F(buf)
    if layout[0] == "compact":
        return np.frombuffer(layout[1], dt)[:int(np.prod(shape))] \
            .reshape(shape)
    if layout[0] == "contiguous":
        addr, size = layout[1], layout[2]
        n = int(np.prod(shape)) * dt.itemsize
        return np.frombuffer(buf[addr:addr + n], dt).reshape(shape)
    _k, bt, cshape, _esz = layout
    chunks: List = []
    _walk_chunk_btree(f, bt, len(cshape) + 1, chunks)
    out = np.zeros(shape, dtype=dt)
    for offs, addr, nbytes, fmask in chunks:
        raw = _defilter(buf[addr:addr + nbytes],
                        info.get("filters"), fmask)
        c = np.frombuffer(raw, dt)[:int(np.prod(cshape))].reshape(cshape)
        sl = tuple(slice(o, min(o + cs, s))
                   for o, cs, s in zip(offs, cshape, shape))
        out[sl] = c[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def read_hdf5(path: str, var: str,
              override_num_blocks: Optional[int] = None
              ) -> Tuple[ray.data.Dataset, Dict]:
    """One dataset -> (chunk-row Dataset, meta) in the multidim model.

    Chunked layouts fan out one task per stored chunk (the natural
    scale unit — the B-tree gave us (addr, nbytes) per chunk, so each
    task reads exactly its own bytes). Contiguous layouts split along
    the slowest dimension like `read_netcdf`."""
    struct_all = read_h5_structure(path)
    key = var if var.startswith("/") else f"/{var}"
    if key not in struct_all:
        raise KeyError(f"{var!r} not in {sorted(struct_all)}")
    info = struct_all[key]
    shape, dt = info["shape"], info["dtype"]
    k = len(shape)
    if k == 0 or k > MAX_DIMS:
        raise ValueError(f"need 1..{MAX_DIMS} dims, got {k}")
    layout = info["layout"]
    filters = info.get("filters")

    if layout[0] == "chunked":
        cshape = layout[2]
        with open(path, "rb") as fh:
            buf = fh.read()
        chunk_list: List = []
        _walk_chunk_btree(_F(buf), layout[1], len(cshape) + 1, chunk_list)
        items = [{"a": int(addr), "n": int(nbytes), "m": int(fmask),
                  **{f"o{d}": int(offs[d]) for d in range(k)}}
                 for offs, addr, nbytes, fmask in chunk_list]

        def decode(batch: pa.Table) -> pa.Table:
            m = len(batch)
            idx = np.zeros((m, k), dtype=np.int64)
            datas = []
            with open(path, "rb") as fh:
                for j in range(m):
                    fh.seek(batch["a"][j].as_py())
                    raw = _defilter(fh.read(batch["n"][j].as_py()),
                                    filters, batch["m"][j].as_py())
                    c = np.frombuffer(raw, dt)[:int(np.prod(cshape))] \
                        .reshape(cshape)
                    offs = [batch[f"o{d}"][j].as_py() for d in range(k)]
                    # clip stored full-size edge chunks to the array
                    sl = tuple(slice(0, min(cs, s - o))
                               for o, cs, s in zip(offs, cshape, shape))
                    datas.append(np.ascontiguousarray(c[sl])
                                 .astype("<f8").tobytes())
                    idx[j] = [o // cs for o, cs in zip(offs, cshape)]
            cols = {"chunk_id": pa.array(pack_chunks(idx)),
                    "data": pa.array(datas, type=pa.binary())}
            for d in range(k):
                cols[f"i{d}"] = pa.array(idx[:, d].astype(np.int32))
            return pa.table(cols)

        nb = override_num_blocks or min(64, max(1, len(items)))
        ds = ray.data.from_items(items, override_num_blocks=nb) \
            .map_batches(decode, batch_format="pyarrow")
        meta = {"shape": shape, "chunk_shape": cshape,
                "dtype": str(np.dtype(dt).newbyteorder("="))}
        return ds, meta

    if layout[0] != "contiguous":
        raise ValueError("compact datasets: use read_h5_array")
    addr = layout[1]
    inner = int(np.prod(shape[1:], dtype=np.int64)) if k > 1 else 1
    row_bytes = inner * dt.itemsize
    rows_per_chunk = max(1, min(shape[0], (4 << 20) // max(1, row_bytes)))
    chunk_shape = (rows_per_chunk,) + tuple(shape[1:])
    n_chunks = (shape[0] + rows_per_chunk - 1) // rows_per_chunk
    items = [{"c": i} for i in range(n_chunks)]

    def decode_c(batch: pa.Table) -> pa.Table:
        cs = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.zeros((len(cs), k), dtype=np.int64)
        datas = []
        with open(path, "rb") as fh:
            for j, ci in enumerate(cs):
                r0 = int(ci) * rows_per_chunk
                r1 = min(r0 + rows_per_chunk, shape[0])
                fh.seek(addr + r0 * row_bytes)
                raw = fh.read((r1 - r0) * row_bytes)
                arr = np.frombuffer(raw, dt).reshape((r1 - r0,) + shape[1:])
                datas.append(np.ascontiguousarray(arr)
                             .astype("<f8").tobytes())
                idx[j, 0] = ci
        cols = {"chunk_id": pa.array(pack_chunks(idx)),
                "data": pa.array(datas, type=pa.binary())}
        for d in range(k):
            cols[f"i{d}"] = pa.array(idx[:, d].astype(np.int32))
        return pa.table(cols)

    ds = ray.data.from_items(
        items, override_num_blocks=override_num_blocks or min(64, n_chunks)
    ).map_batches(decode_c, batch_format="pyarrow")
    meta = {"shape": shape, "chunk_shape": chunk_shape,
            "dtype": str(np.dtype(dt).newbyteorder("="))}
    return ds, meta


# ---------------------------------------------------------------------------
# Minimal writer: superblock v0, v1 object headers, one root symbol
# table, contiguous or (deflate-)chunked datasets. The reference's
# HDF5 driver is read-only, so this exists for self-contained tests
# and as the sink side of the hdf5 roundtrip catalog entry.
# ---------------------------------------------------------------------------

_NP_TO_DT = {"u": 0, "i": 0, "f": 1}


def _dt_message(dt: np.dtype) -> bytes:
    """Datatype message body for fixed-point / IEEE float dtypes
    (class+version byte, 24-bit flags, size, class properties)."""
    cls = _NP_TO_DT[dt.kind]
    bits0, bits1 = 0, 0
    if dt.byteorder == ">":
        bits0 |= 1
    if cls == 0:
        if dt.kind == "i":
            bits0 |= 0x08
        props = struct.pack("<HH", 0, dt.itemsize * 8)
    else:
        bits0 |= 0x20                      # implied-MSB mantissa norm
        if dt.itemsize == 4:
            bits1 = 31                     # sign bit location
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            bits1 = 63
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    return (bytes([0x10 | cls, bits0, bits1, 0])
            + struct.pack("<I", dt.itemsize) + props)


def _msg_v1(mtype: int, body: bytes) -> bytes:
    pad = (-len(body)) % 8
    body = body + b"\x00" * pad
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _object_header_v1(messages: List[bytes]) -> bytes:
    blob = b"".join(messages)
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(blob)) + blob


def write_hdf5(path: str, variables: Dict[str, np.ndarray],
               chunks: Optional[Dict[str, tuple]] = None,
               compress: bool = False) -> None:
    """Write {name: array} as an HDF5 file (flat root group)."""
    chunks = chunks or {}
    names = sorted(variables)
    # ---- plan layout ------------------------------------------------
    # [superblock 96][root OH][btree][heap][snod][per-dataset OH][data]
    parts: List[bytes] = []

    def addr_of(i: int) -> int:
        return 96 + sum(len(p) for p in parts[:i])

    # placeholders appended in order; patch addresses afterwards
    # 0: root object header, 1: btree, 2: heap, 3: snod, then datasets
    heap_names = bytearray(b"\x00" * 8)   # offset 0 reserved (empty name)
    name_off = {}
    for nm in names:
        name_off[nm] = len(heap_names)
        heap_names += nm.encode() + b"\x00"
        heap_names += b"\x00" * ((-len(heap_names)) % 8)

    ds_blobs: List[bytes] = []
    data_blobs: List[bytes] = []
    chunk_meta: List[Optional[List]] = []
    for nm in names:
        arr = np.ascontiguousarray(variables[nm])
        dt = arr.dtype.newbyteorder("<")
        arr = arr.astype(dt)
        msgs = [
            _msg_v1(0x0001, struct.pack(
                "<BBB5x", 1, arr.ndim, 0)
                + b"".join(struct.pack("<Q", d) for d in arr.shape)),
            _msg_v1(0x0003, _dt_message(dt)),
            _msg_v1(0x0005, bytes([2, 2, 2, 0])),   # fill undefined
        ]
        if nm in chunks:
            cshape = chunks[nm]
            nd = arr.ndim + 1
            lay = struct.pack("<BBB", 3, 2, nd) + struct.pack("<Q", 0) \
                + b"".join(struct.pack("<I", c) for c in cshape) \
                + struct.pack("<I", dt.itemsize)
            msgs.append(_msg_v1(0x0008, lay))
            if compress:
                filt = struct.pack("<BB6x", 1, 1) + struct.pack(
                    "<4H8s2I", 1, 8, 1, 2, b"deflate\x00", 6, 0)
                msgs.append(_msg_v1(0x000B, filt))
            # stored chunks: iterate grid, full-size chunks
            grid = [range(0, s, c) for s, c in zip(arr.shape, cshape)]
            import itertools
            cm = []
            for offs in itertools.product(*grid):
                sl = tuple(slice(o, min(o + c, s))
                           for o, c, s in zip(offs, cshape, arr.shape))
                full = np.zeros(cshape, dtype=dt)
                full[tuple(slice(0, s.stop - s.start) for s in sl)] = arr[sl]
                raw = full.tobytes()
                if compress:
                    raw = zlib.compress(raw, 6)
                cm.append((offs, raw))
            chunk_meta.append(cm)
            data_blobs.append(b"")
        else:
            lay = struct.pack("<BB", 3, 1) + struct.pack(
                "<QQ", 0, arr.nbytes)
            msgs.append(_msg_v1(0x0008, lay))
            chunk_meta.append(None)
            data_blobs.append(arr.tobytes())
        ds_blobs.append(_object_header_v1(msgs))

    # root object header with symbol table message (btree/heap patched)
    root_oh = _object_header_v1([_msg_v1(0x0011, struct.pack("<QQ", 0, 0))])

    # assemble with real addresses
    out = bytearray()
    # sb ver, freespace ver, root-group ver, reserved, shared-hdr ver,
    # sizeof offsets, sizeof lengths, reserved
    out += _SIG + bytes([0, 0, 0, 0, 0, 8, 8, 0])
    out += struct.pack("<HHI", 4, 16, 0)
    out += struct.pack("<QQQQ", 0, _UNDEF, 0, _UNDEF)  # eof patched
    # root symbol table entry
    root_oh_addr = 96
    out += struct.pack("<QQI4x16x", 0, root_oh_addr, 0)
    assert len(out) == 96

    pos = root_oh_addr + len(root_oh)
    btree_addr = pos
    # btree v1: one leaf with 1 child (the SNOD)
    btree = (b"TREE" + bytes([0, 0]) + struct.pack("<H", 1)
             + struct.pack("<QQ", _UNDEF, _UNDEF)
             + struct.pack("<Q", 0)            # key 0
             + struct.pack("<Q", 0)            # child (snod) patched
             + struct.pack("<Q", 0))           # key 1
    pos += len(btree)
    heap_addr = pos
    heap_data_addr = heap_addr + 32
    heap = (b"HEAP" + bytes([0, 0, 0, 0])
            + struct.pack("<QQQ", len(heap_names), len(heap_names),
                          heap_data_addr) + bytes(heap_names))
    pos = heap_data_addr + len(heap_names)
    snod_addr = pos
    snod = bytearray(b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(names)))
    ds_addr_pos = []
    for nm in names:
        ds_addr_pos.append(len(snod) + 8)
        snod += struct.pack("<QQI4x16x", name_off[nm], 0, 0)
    pos += len(snod)

    ds_addrs = []
    for blob in ds_blobs:
        ds_addrs.append(pos)
        pos += len(blob)

    # data segments (contiguous) and chunk btrees + chunk data
    ds_blobs2 = []
    tail = bytearray()
    for i, nm in enumerate(names):
        blob = bytearray(ds_blobs[i])
        if chunk_meta[i] is None:
            daddr = pos + len(tail)
            tail += data_blobs[i]
            # patch contiguous address: find layout message
            _patch_layout_contig(blob, daddr)
        else:
            cm = chunk_meta[i]
            nd = len(cm[0][0]) + 1
            # chunk data first, then a single leaf btree node
            centries = []
            for offs, raw in cm:
                caddr = pos + len(tail)
                tail += raw
                centries.append((offs, caddr, len(raw)))
            bt_addr = pos + len(tail)
            key_size = 8 + 8 * nd
            node = bytearray(b"TREE" + bytes([1, 0])
                             + struct.pack("<H", len(centries))
                             + struct.pack("<QQ", _UNDEF, _UNDEF))
            for offs, caddr, nb in centries:
                node += struct.pack("<II", nb, 0)
                for o in offs:
                    node += struct.pack("<Q", o)
                node += struct.pack("<Q", 0)       # extra dim 0
                node += struct.pack("<Q", caddr)
            # final key
            node += struct.pack("<II", 0, 0)
            for o in cm[-1][0]:
                node += struct.pack("<Q", 0)
            node += struct.pack("<Q", 0)
            tail += node
            _patch_layout_chunked(blob, bt_addr)
        ds_blobs2.append(bytes(blob))

    # patch root OH symbol table message
    root = bytearray(root_oh)
    st_off = root.index(struct.pack("<HH", 0x0011, 16))
    struct.pack_into("<QQ", root, st_off + 8, btree_addr, heap_addr)
    # patch btree child -> snod
    btree = bytearray(btree)
    struct.pack_into("<Q", btree, 8 + 16 + 8, snod_addr)
    # patch snod entries -> dataset object headers
    for i, p in enumerate(ds_addr_pos):
        struct.pack_into("<Q", snod, p, ds_addrs[i])
    # patch superblock eof
    body = bytes(root) + bytes(btree) + heap + bytes(snod) \
        + b"".join(ds_blobs2) + bytes(tail)
    total = 96 + len(body)
    out_b = bytearray(out)
    struct.pack_into("<Q", out_b, 40, total)  # eof address
    import os
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out_b) + body)
    os.replace(tmp, path)


def _patch_layout_contig(blob: bytearray, addr: int) -> None:
    i = _find_msg(blob, 0x0008)
    # body: ver(1) class(1) addr(8) size(8)
    struct.pack_into("<Q", blob, i + 8 + 2, addr)


def _patch_layout_chunked(blob: bytearray, bt_addr: int) -> None:
    i = _find_msg(blob, 0x0008)
    # body: ver(1) class(1) ndims(1) btaddr(8) ...
    struct.pack_into("<Q", blob, i + 8 + 3, bt_addr)


def _find_msg(blob: bytearray, mtype: int) -> int:
    """Offset of a v1 message header inside an object-header blob."""
    nmsgs = struct.unpack_from("<H", blob, 2)[0]
    pos = 16
    for _ in range(nmsgs):
        mt, sz = struct.unpack_from("<HH", blob, pos)
        if mt == mtype:
            return pos
        pos += 8 + sz
    raise ValueError(f"message {mtype:#x} not found")
