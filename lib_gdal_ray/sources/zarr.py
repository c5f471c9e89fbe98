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


# ---------------------------------------------------------------------------
# Zarr v3 (zarr.json; reference frmts/zarr/zarr_v3_array.cpp)
# ---------------------------------------------------------------------------

_V3_DTYPES = {
    "float64": "<f8", "float32": "<f4", "float16": "<f2",
    "int64": "<i8", "int32": "<i4", "int16": "<i2", "int8": "|i1",
    "uint64": "<u8", "uint32": "<u4", "uint16": "<u2", "uint8": "|u1",
    "bool": "|b1",
}
_V3_NAMES = {np.dtype(v).name: k for k, v in _V3_DTYPES.items()}


def _v3_codecs(compressor: Optional[Dict], dt: np.dtype):
    endian = "little" if dt.byteorder in ("<", "=", "|") else "big"
    codecs = [{"name": "bytes", "configuration": {"endian": endian}}]
    if compressor is not None:
        cid = compressor.get("id")
        if cid not in ("gzip", "zlib"):
            raise ValueError(f"unsupported v3 compressor {cid!r}")
        # v3 has no zlib codec name; both map to gzip on write
        codecs.append({"name": "gzip", "configuration":
                       {"level": int(compressor.get("level", 1))}})
    return codecs


def create_array_v3(path: str, shape: Sequence[int],
                    chunk_shape: Sequence[int], dtype: str = "<f8",
                    compressor: Optional[Dict] = None,
                    fill_value=0.0, attrs: Optional[Dict] = None,
                    dimension_separator: str = "/") -> Dict:
    """Write a Zarr v3 ``zarr.json`` array descriptor (default chunk
    key encoding: chunks live under ``c/i/j`` or ``c.i.j``). Returns a
    v2-SHAPED meta dict (shape/chunks/dtype/compressor/...) with
    ``zarr_format: 3`` so both readers share one code path."""
    if len(shape) > MAX_DIMS:
        raise ValueError(f"up to {MAX_DIMS} dims")
    dt = np.dtype(dtype)
    if dt.name not in _V3_NAMES:
        raise ValueError(f"unsupported v3 dtype {dtype!r}")
    if dimension_separator not in (".", "/"):
        raise ValueError("separator must be '.' or '/'")
    os.makedirs(path, exist_ok=True)
    doc = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": [int(s) for s in shape],
        "data_type": _V3_NAMES[dt.name],
        "chunk_grid": {"name": "regular", "configuration":
                       {"chunk_shape": [int(c) for c in chunk_shape]}},
        "chunk_key_encoding": {"name": "default", "configuration":
                               {"separator": dimension_separator}},
        "fill_value": _json_fill(fill_value),
        "codecs": _v3_codecs(compressor, dt),
        "attributes": attrs or {},
    }
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump(doc, f)
    return {
        "zarr_format": 3, "shape": doc["shape"],
        "chunks": [int(c) for c in chunk_shape], "dtype": dt.str,
        "compressor": ({"id": "gzip",
                        "level": int(compressor.get("level", 1))}
                       if compressor else None),
        "fill_value": doc["fill_value"], "order": "C", "filters": None,
        "dimension_separator": dimension_separator, "_prefix": "c",
    }


def create_group_v3(path: str, attrs: Optional[Dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group",
                   "attributes": attrs or {}}, f)


def read_meta_v3(path: str) -> Dict:
    """zarr.json -> the shared v2-shaped meta dict. Rejects what the
    chunk-row model can't serve (sharding, blosc, F order, non-default
    chunk key encodings other than v2)."""
    with open(os.path.join(path, "zarr.json")) as f:
        doc = json.load(f)
    if doc.get("zarr_format") != 3 or doc.get("node_type") != "array":
        raise ValueError("not a zarr v3 array")
    grid = doc.get("chunk_grid", {})
    if grid.get("name") != "regular":
        raise ValueError("only regular chunk grids supported")
    cke = doc.get("chunk_key_encoding",
                  {"name": "default", "configuration": {"separator": "/"}})
    conf = cke.get("configuration") or {}
    if cke.get("name") == "default":
        prefix, sep = "c", conf.get("separator", "/")
    elif cke.get("name") == "v2":
        prefix, sep = "", conf.get("separator", ".")
    else:
        raise ValueError(f"unsupported chunk_key_encoding {cke!r}")
    dt_name = doc.get("data_type")
    if dt_name not in _V3_DTYPES:
        raise ValueError(f"unsupported v3 data_type {dt_name!r}")
    dtype = _V3_DTYPES[dt_name]
    comp = None
    for codec in doc.get("codecs", []):
        name = codec.get("name")
        cfg = codec.get("configuration") or {}
        if name == "bytes":
            if cfg.get("endian", "little") == "big":
                dtype = dtype.replace("<", ">")
        elif name in ("gzip", "zlib"):
            comp = {"id": "gzip" if name == "gzip" else "zlib",
                    "level": int(cfg.get("level", 1))}
        elif name == "transpose":
            order = cfg.get("order")
            if order and list(order) != list(range(len(doc["shape"]))):
                raise ValueError("only identity transpose supported")
        else:
            raise ValueError(f"unsupported v3 codec {name!r}")
    return {
        "zarr_format": 3, "shape": [int(s) for s in doc["shape"]],
        "chunks": [int(c) for c in
                   grid["configuration"]["chunk_shape"]],
        "dtype": dtype, "compressor": comp,
        "fill_value": doc.get("fill_value", 0), "order": "C",
        "filters": None, "dimension_separator": sep, "_prefix": prefix,
    }


def convert_zarr_v2_to_v3(src: str, dst: str,
                          compressor: Optional[Dict] = None) -> int:
    """v2 store -> v3 store through the distributed chunk-row path
    (each chunk decodes and re-encodes in its own task)."""
    ds, meta = read_zarr(src)
    return write_zarr(ds, dst, meta["shape"], meta["chunks"],
                      dtype=meta["dtype"],
                      compressor=(compressor if compressor is not None
                                  else meta.get("compressor")),
                      fill_value=_parse_fill(meta["fill_value"]),
                      zarr_format=3)


def convert_zarr_v3_to_v2(src: str, dst: str,
                          compressor: Optional[Dict] = None) -> int:
    ds, meta = read_zarr(src)
    comp = compressor if compressor is not None else meta.get("compressor")
    if comp is not None and comp.get("id") == "gzip":
        comp = {"id": "zlib", "level": comp.get("level", 1)}
    return write_zarr(ds, dst, meta["shape"], meta["chunks"],
                      dtype=meta["dtype"], compressor=comp,
                      fill_value=_parse_fill(meta["fill_value"]),
                      zarr_format=2)


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
               dimension_separator: Optional[str] = None,
               zarr_format: int = 2) -> int:
    """Chunk-row Dataset -> Zarr v2 OR v3 array on disk; -> chunks
    written. v3 (zarr_format=3) writes ``zarr.json`` + ``c/``-prefixed
    default chunk keys (frmts/zarr/zarr_v3_array.cpp parity); v2 the
    classic ``.zarray`` + bare keys.

    Each map_batches task encodes + writes its own chunk files (tmp +
    rename, so re-runs are idempotent); only a (chunk_id, nbytes)
    manifest row per chunk returns through the object store.
    """
    if zarr_format == 3:
        sep = dimension_separator or "/"
        meta = create_array_v3(path, shape, chunk_shape, dtype,
                               compressor, fill_value, attrs, sep)
        compressor = meta["compressor"]  # v3 normalizes zlib -> gzip
    elif zarr_format == 2:
        sep = dimension_separator or "."
        meta = create_array(path, shape, chunk_shape, dtype, compressor,
                            fill_value, attrs, sep)
    else:
        raise ValueError("zarr_format must be 2 or 3")
    prefix = meta.get("_prefix", "")
    shape = tuple(int(s) for s in shape)
    chunks = tuple(int(c) for c in chunk_shape)
    k = len(shape)
    dt = np.dtype(dtype)
    fill = _parse_fill(meta["fill_value"])

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
            parts = [str(int(ci[d])) for d in range(k)]
            name = sep.join(([prefix] if prefix else []) + parts)
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
    if not os.path.exists(os.path.join(path, ".zarray")) and \
            os.path.exists(os.path.join(path, "zarr.json")):
        return read_meta_v3(path)
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


def _list_chunk_keys(path: str, k: int, sep: str, prefix: str = ""):
    """Chunk coordinate tuples present in the store (one listdir walk;
    metadata only — no chunk bytes touched). prefix="c" = the zarr v3
    default chunk key encoding (keys c/i/j or c.i.j)."""
    keys = []
    if sep == ".":
        want = k + (1 if prefix else 0)
        for name in os.listdir(path):
            if name.startswith(".") or name == "zarr.json":
                continue
            parts = name.split(".")
            if prefix:
                if not parts or parts[0] != prefix:
                    continue
                parts = parts[1:]
            if len(parts) == k and all(p.isdigit() for p in parts):
                keys.append(tuple(int(p) for p in parts))
    else:
        root_dir = os.path.join(path, prefix) if prefix else path
        if not os.path.isdir(root_dir):
            return []
        for root, _dirs, files in os.walk(root_dir):
            rel = os.path.relpath(root, root_dir)
            pre = () if rel == "." else tuple(rel.split(os.sep))
            if any(not p.isdigit() for p in pre):
                continue
            for name in files:
                if name.startswith(".") or name == "zarr.json":
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
    prefix = meta.get("_prefix", "")
    keys = _list_chunk_keys(path, k, sep, prefix)

    items = [{"ci": list(c)} for c in keys]

    def decode(batch: pa.Table) -> pa.Table:
        cis = batch["ci"].to_pylist()
        n = len(cis)
        idx = np.asarray(cis, dtype=np.int64).reshape(n, k)
        datas = []
        for r in range(n):
            ci = idx[r]
            name = sep.join(([prefix] if prefix else [])
                            + [str(int(ci[d])) for d in range(k)])
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
