"""Zarr v2 directory stores ↔ multidim chunk-row Datasets.

Pure-python implementation of the public Zarr v2 storage spec: a
directory store with a ``.zarray`` JSON descriptor per array and one
file per chunk named ``i.j.k`` (C-order chunk indices joined by
``dimension_separator``, default ``.``), each holding the raw C-order
chunk bytes, optionally zlib/gzip compressed. Edge chunks are stored
FULL-SIZE padded with ``fill_value`` (per spec); the chunk-row model
(`sources/multidim.py`) stores trimmed edge payloads, so the writer
pads and the reader trims.

Reference parity: GDAL's Zarr driver (`frmts/zarr/zarr_v2_array.cpp`)
reads the same layout into the multidim model
(`gcore/gdal_multidim.h:304,850`). Ray shape: one chunk file = one
row. Reads plan from the store listing (``from_items`` over chunk
keys → ``map_batches`` decode, so a million-chunk store decodes in
parallel with no driver-side data); writes are a distributed
``map_batches`` sink (atomic tmp+rename per chunk) with a driver-side
metadata commit, so a failed write run can re-run and overwrite
partial chunks idempotently.

Compressors: ``null`` (raw), ``zlib`` and ``gzip`` (stdlib zlib — the
two numcodecs ids with a pure-stdlib implementation). Blosc/LZ4 (the
zarr-python defaults) are rejected with a clear error.
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from .multidim import MAX_DIMS, pack_chunks

_SUPPORTED_CODECS = (None, "zlib", "gzip")


def _compress(raw: bytes, compressor: Optional[Dict]) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    level = int(compressor.get("level", 1))
    if cid == "zlib":
        return zlib.compress(raw, level)
    if cid == "gzip":
        import gzip as _gz

        return _gz.compress(raw, compresslevel=level)
    raise ValueError(f"unsupported zarr compressor {cid!r} "
                     f"(supported: {_SUPPORTED_CODECS})")


def _decompress(buf: bytes, compressor: Optional[Dict]) -> bytes:
    if compressor is None:
        return buf
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.decompress(buf)
    if cid == "gzip":
        import gzip as _gz

        return _gz.decompress(buf)
    raise ValueError(f"unsupported zarr compressor {cid!r} "
                     f"(supported: {_SUPPORTED_CODECS})")


def _json_fill(fill_value):
    """fill_value per spec: NaN/Infinity encode as strings."""
    if fill_value is None:
        return None
    f = float(fill_value)
    if np.isnan(f):
        return "NaN"
    if np.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    return fill_value


def _parse_fill(v):
    if v is None:
        return 0.0
    if isinstance(v, str):
        return {"NaN": np.nan, "Infinity": np.inf,
                "-Infinity": -np.inf}[v]
    return v


def create_array(path: str, shape: Sequence[int],
                 chunk_shape: Sequence[int], dtype: str = "<f8",
                 compressor: Optional[Dict] = None,
                 fill_value=0.0, attrs: Optional[Dict] = None,
                 dimension_separator: str = ".") -> Dict:
    """Write the .zarray (+ optional .zattrs) metadata; -> meta dict."""
    if len(shape) > MAX_DIMS:
        raise ValueError(f"up to {MAX_DIMS} dims")
    np.dtype(dtype)  # validate early
    if compressor is not None and compressor.get("id") not in ("zlib",
                                                               "gzip"):
        raise ValueError(f"unsupported compressor {compressor!r}")
    if dimension_separator not in (".", "/"):
        raise ValueError("dimension_separator must be '.' or '/'")
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": [int(s) for s in shape],
        "chunks": [int(c) for c in chunk_shape],
        "dtype": dtype,
        "compressor": compressor,
        "fill_value": _json_fill(fill_value),
        "order": "C",
        "filters": None,
        "dimension_separator": dimension_separator,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    if attrs:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(attrs, f)
    return meta


def create_group(path: str, attrs: Optional[Dict] = None) -> None:
    """Write a .zgroup marker (GDALGroup analog)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    if attrs:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(attrs, f)


def list_arrays(path: str) -> Dict[str, Dict]:
    """Group listing: subdirectories carrying a .zarray -> their meta."""
    out = {}
    for name in sorted(os.listdir(path)):
        za = os.path.join(path, name, ".zarray")
        if os.path.isfile(za):
            with open(za) as f:
                out[name] = json.load(f)
    return out


def _trimmed_dims(ci, shape, chunks):
    return [min((int(ci[d]) + 1) * chunks[d], shape[d])
            - int(ci[d]) * chunks[d] for d in range(len(shape))]


def write_zarr(ds: ray.data.Dataset, path: str, shape: Sequence[int],
               chunk_shape: Sequence[int], dtype: str = "<f8",
               compressor: Optional[Dict] = None, fill_value=0.0,
               attrs: Optional[Dict] = None,
               dimension_separator: str = ".") -> int:
    """Chunk-row Dataset -> Zarr v2 array on disk; -> chunks written.

    Each map_batches task encodes + writes its own chunk files (tmp +
    rename, so re-runs are idempotent); only a (chunk_id, nbytes)
    manifest row per chunk returns through the object store.
    """
    meta = create_array(path, shape, chunk_shape, dtype, compressor,
                        fill_value, attrs, dimension_separator)
    shape = tuple(int(s) for s in shape)
    chunks = tuple(int(c) for c in chunk_shape)
    k = len(shape)
    dt = np.dtype(dtype)
    fill = _parse_fill(meta["fill_value"])
    sep = dimension_separator

    from .multidim import unpack_chunks

    def write_stage(batch: pa.Table) -> pa.Table:
        key = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = unpack_chunks(key, k)
        nbytes = np.zeros(len(key), dtype=np.int64)
        for r in range(len(key)):
            ci = idx[r]
            dims = _trimmed_dims(ci, shape, chunks)
            arr = np.frombuffer(batch["data"][r].as_py(),
                                dtype="<f8").reshape(dims)
            if tuple(dims) != chunks:  # edge chunk: pad to full size
                full = np.full(chunks, fill, dtype=dt)
                full[tuple(slice(0, d) for d in dims)] = arr
            else:
                full = np.ascontiguousarray(arr).astype(dt, copy=False)
            raw = full.astype(dt, copy=False).tobytes(order="C")
            payload = _compress(raw, compressor)
            name = sep.join(str(int(ci[d])) for d in range(k))
            dst = os.path.join(path, name)
            if sep == "/":
                os.makedirs(os.path.dirname(dst), exist_ok=True)
            tmp = dst + ".__tmp__"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, dst)
            nbytes[r] = len(payload)
        return pa.table({"chunk_id": batch["chunk_id"],
                         "nbytes": pa.array(nbytes)})

    manifest = ds.map_batches(write_stage,
                              batch_format="pyarrow").materialize()
    return manifest.count()


def read_meta(path: str) -> Dict:
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 2:
        raise ValueError("not a zarr v2 array")
    if meta.get("order", "C") != "C":
        raise ValueError("only C-order zarr arrays supported")
    if meta.get("filters"):
        raise ValueError("zarr filters not supported")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") not in ("zlib", "gzip"):
        raise ValueError(f"unsupported zarr compressor "
                         f"{comp.get('id')!r}")
    return meta


def _list_chunk_keys(path: str, k: int, sep: str):
    """Chunk coordinate tuples present in the store (one listdir walk;
    metadata only — no chunk bytes touched)."""
    keys = []
    if sep == ".":
        for name in os.listdir(path):
            if name.startswith("."):
                continue
            parts = name.split(".")
            if len(parts) == k and all(p.isdigit() for p in parts):
                keys.append(tuple(int(p) for p in parts))
    else:
        for root, _dirs, files in os.walk(path):
            rel = os.path.relpath(root, path)
            pre = () if rel == "." else tuple(rel.split(os.sep))
            if any(not p.isdigit() for p in pre):
                continue
            for name in files:
                if name.startswith("."):
                    continue
                parts = pre + (name,)
                if len(parts) == k and all(str(p).isdigit()
                                           for p in parts):
                    keys.append(tuple(int(p) for p in parts))
    return sorted(keys)


def read_zarr(path: str,
              override_num_blocks: Optional[int] = None
              ) -> Tuple[ray.data.Dataset, Dict]:
    """Zarr v2 array -> (chunk-row Dataset, meta). Rows match the
    multidim model: (chunk_id uint64, i0..i{k-1} int32, data = trimmed
    C-order float64 payload); decode happens in parallel map_batches
    tasks that each open only their own chunk files."""
    meta = read_meta(path)
    shape = tuple(int(s) for s in meta["shape"])
    chunks = tuple(int(c) for c in meta["chunks"])
    k = len(shape)
    if k > MAX_DIMS:
        raise ValueError(f"up to {MAX_DIMS} dims")
    dt = np.dtype(meta["dtype"])
    comp = meta.get("compressor")
    sep = meta.get("dimension_separator", ".")
    keys = _list_chunk_keys(path, k, sep)

    items = [{"ci": list(c)} for c in keys]

    def decode(batch: pa.Table) -> pa.Table:
        cis = batch["ci"].to_pylist()
        n = len(cis)
        idx = np.asarray(cis, dtype=np.int64).reshape(n, k)
        datas = []
        for r in range(n):
            ci = idx[r]
            name = sep.join(str(int(ci[d])) for d in range(k))
            with open(os.path.join(path, name), "rb") as f:
                raw = _decompress(f.read(), comp)
            arr = np.frombuffer(raw, dtype=dt).reshape(chunks)
            dims = _trimmed_dims(ci, shape, chunks)
            if tuple(dims) != chunks:
                arr = arr[tuple(slice(0, d) for d in dims)]
            datas.append(np.ascontiguousarray(arr)
                         .astype("<f8").tobytes())
        cols = {"chunk_id": pa.array(pack_chunks(idx)),
                "data": pa.array(datas, type=pa.binary())}
        for d in range(k):
            cols[f"i{d}"] = pa.array(idx[:, d].astype(np.int32))
        return pa.table(cols)

    ds = ray.data.from_items(
        items, override_num_blocks=override_num_blocks).map_batches(
            decode, batch_format="pyarrow")
    return ds, meta
