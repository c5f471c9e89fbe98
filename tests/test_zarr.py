"""Zarr v2 store: pure-python read/write against the multidim model."""

import json
import os
import shutil
import zlib

import numpy as np
import pytest

from lib_gdal_ray.sources import multidim as md
from lib_gdal_ray.sources import zarr as zr


def _mk(shape, chunks):
    def fv(*mesh):
        v = np.zeros_like(mesh[0], dtype=np.float64)
        for d, m in enumerate(mesh):
            v += (d + 2) * m
        return v % 13

    return md.from_function(shape, chunks, fv), fv


@pytest.mark.parametrize("compressor", [
    None, {"id": "zlib", "level": 1}, {"id": "gzip", "level": 1}])
def test_roundtrip_3d_edge_chunks(tmp_path, compressor):
    shape, chunks = (10, 7, 5), (4, 3, 5)  # edge chunks on 2 axes
    ds, fv = _mk(shape, chunks)
    path = str(tmp_path / "a.zarr")
    n = zr.write_zarr(ds, path, shape, chunks, compressor=compressor)
    assert n == 3 * 3 * 1

    out, meta = zr.read_zarr(path)
    assert tuple(meta["shape"]) == shape
    arr = md.to_numpy(out, shape, chunks)
    mesh = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    np.testing.assert_array_equal(arr, fv(*mesh))


def test_int_dtype_and_fill(tmp_path):
    shape, chunks = (6, 6), (4, 4)
    ds, fv = _mk(shape, chunks)
    path = str(tmp_path / "i.zarr")
    zr.write_zarr(ds, path, shape, chunks, dtype="<i4", fill_value=7)
    # raw chunk bytes: edge chunk padded with fill_value 7 as int32
    raw = open(os.path.join(path, "1.1"), "rb").read()
    block = np.frombuffer(raw, dtype="<i4").reshape(4, 4)
    assert (block[2:, :] == 7).all() and (block[:, 2:] == 7).all()
    out, _ = zr.read_zarr(path)
    arr = md.to_numpy(out, shape, chunks)
    mesh = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    np.testing.assert_array_equal(arr, fv(*mesh))


def test_reads_foreign_store_layout(tmp_path):
    # hand-write a spec-conformant store (as zarr-python would):
    # zlib chunks, '/' separator, NaN fill
    path = str(tmp_path / "f.zarr")
    os.makedirs(path)
    shape, chunks = (5, 4), (3, 3)
    meta = {"zarr_format": 2, "shape": list(shape),
            "chunks": list(chunks), "dtype": "<f4",
            "compressor": {"id": "zlib", "level": 5},
            "fill_value": "NaN", "order": "C", "filters": None,
            "dimension_separator": "/"}
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    full = np.arange(20, dtype="<f4").reshape(5, 4)
    for ci in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        block = np.full(chunks, np.nan, dtype="<f4")
        ys = slice(ci[0] * 3, min(ci[0] * 3 + 3, 5))
        xs = slice(ci[1] * 3, min(ci[1] * 3 + 3, 4))
        block[:ys.stop - ys.start, :xs.stop - xs.start] = full[ys, xs]
        os.makedirs(os.path.join(path, str(ci[0])), exist_ok=True)
        with open(os.path.join(path, f"{ci[0]}/{ci[1]}"), "wb") as f:
            f.write(zlib.compress(block.tobytes(order="C")))

    out, m = zr.read_zarr(path)
    assert m["dimension_separator"] == "/"
    arr = md.to_numpy(out, shape, chunks)
    np.testing.assert_array_equal(arr, full.astype(np.float64))


def test_group_listing_and_guards(tmp_path):
    root = str(tmp_path / "g.zarr")
    zr.create_group(root, attrs={"title": "test"})
    ds, _ = _mk((4, 4), (2, 2))
    zr.write_zarr(ds, os.path.join(root, "t"), (4, 4), (2, 2))
    arrs = zr.list_arrays(root)
    assert list(arrs) == ["t"] and arrs["t"]["shape"] == [4, 4]

    with pytest.raises(ValueError, match="compressor"):
        zr.create_array(str(tmp_path / "x"), (4,), (2,),
                        compressor={"id": "blosc"})
    bad = str(tmp_path / "b.zarr")
    os.makedirs(bad)
    with open(os.path.join(bad, ".zarray"), "w") as f:
        json.dump({"zarr_format": 2, "shape": [4], "chunks": [2],
                   "dtype": "<f8", "order": "F", "filters": None,
                   "compressor": None, "fill_value": 0}, f)
    with pytest.raises(ValueError, match="C-order"):
        zr.read_zarr(bad)


def test_pipeline_over_zarr_store(tmp_path):
    # read_zarr chunks flow straight into the mdim operators
    shape, chunks = (8, 6, 4), (4, 3, 2)
    ds, fv = _mk(shape, chunks)
    path = str(tmp_path / "p.zarr")
    zr.write_zarr(ds, path, shape, chunks,
                  compressor={"id": "zlib", "level": 1})
    out, _ = zr.read_zarr(path)
    red = md.reduce_dim(out, shape, chunks, axis=2, op="sum")
    arr2 = md.to_numpy(red, shape[:2], chunks[:2])
    mesh = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    np.testing.assert_array_equal(arr2, fv(*mesh).sum(axis=2))


# ---------------------------------------------------------------------------
# Zarr v3 (zarr.json; frmts/zarr/zarr_v3_array.cpp parity)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sep,compressor", [
    ("/", None), ("/", {"id": "gzip", "level": 1}),
    (".", {"id": "zlib", "level": 1})])
def test_v3_roundtrip(tmp_path, sep, compressor):
    shape, chunks = (10, 7, 5), (4, 3, 5)
    ds, fv = _mk(shape, chunks)
    path = str(tmp_path / "v3.zarr")
    n = zr.write_zarr(ds, path, shape, chunks, compressor=compressor,
                      dimension_separator=sep, zarr_format=3)
    assert n == 9
    # spec shape on disk: zarr.json + c-prefixed default chunk keys
    doc = json.load(open(os.path.join(path, "zarr.json")))
    assert doc["zarr_format"] == 3 and doc["node_type"] == "array"
    assert doc["data_type"] == "float64"
    assert doc["chunk_grid"]["configuration"]["chunk_shape"] == [4, 3, 5]
    assert doc["chunk_key_encoding"]["configuration"]["separator"] == sep
    key0 = os.path.join(path, *("c/0/0/0".split("/"))) if sep == "/" \
        else os.path.join(path, "c.0.0.0")
    assert os.path.exists(key0)
    out, meta = zr.read_zarr(path)
    assert meta["zarr_format"] == 3
    arr = md.to_numpy(out, shape, chunks)
    mesh = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    np.testing.assert_array_equal(arr, fv(*mesh))


def test_v3_foreign_store(tmp_path):
    # hand-written v3 store, big chunk grid vocabulary: uint16 data,
    # gzip codec, v2-style chunk key encoding
    import gzip as _gz

    path = str(tmp_path / "f3.zarr")
    os.makedirs(path)
    data = (np.arange(12, dtype="<u2") % 9).reshape(3, 4)
    doc = {
        "zarr_format": 3, "node_type": "array",
        "shape": [3, 4], "data_type": "uint16",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": [3, 4]}},
        "chunk_key_encoding": {"name": "v2",
                               "configuration": {"separator": "."}},
        "fill_value": 0,
        "codecs": [{"name": "bytes",
                    "configuration": {"endian": "little"}},
                   {"name": "gzip", "configuration": {"level": 5}}],
        "attributes": {},
    }
    json.dump(doc, open(os.path.join(path, "zarr.json"), "w"))
    open(os.path.join(path, "0.0"), "wb").write(
        _gz.compress(data.tobytes()))
    out, meta = zr.read_zarr(path)
    assert meta["dtype"] == "<u2" and meta["_prefix"] == ""
    arr = md.to_numpy(out, (3, 4), (3, 4))
    np.testing.assert_array_equal(arr, data.astype(np.float64))


def test_v3_v2_convert_cycle(tmp_path):
    shape, chunks = (9, 6), (4, 4)
    ds, fv = _mk(shape, chunks)
    p2 = str(tmp_path / "a2.zarr")
    zr.write_zarr(ds, p2, shape, chunks,
                  compressor={"id": "zlib", "level": 1})
    p3 = str(tmp_path / "a3.zarr")
    n = zr.convert_zarr_v2_to_v3(p2, p3)
    assert n == 6
    assert os.path.exists(os.path.join(p3, "zarr.json"))
    p2b = str(tmp_path / "back2.zarr")
    zr.convert_zarr_v3_to_v2(p3, p2b)
    out, meta = zr.read_zarr(p2b)
    assert meta["zarr_format"] == 2
    arr = md.to_numpy(out, shape, chunks)
    mesh = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    np.testing.assert_array_equal(arr, fv(*mesh))


def test_v3_guards(tmp_path):
    path = str(tmp_path / "g.zarr")
    os.makedirs(path)
    doc = {"zarr_format": 3, "node_type": "array", "shape": [4],
           "data_type": "float64",
           "chunk_grid": {"name": "regular",
                          "configuration": {"chunk_shape": [2]}},
           "fill_value": 0,
           "codecs": [{"name": "sharding_indexed",
                       "configuration": {}}]}
    json.dump(doc, open(os.path.join(path, "zarr.json"), "w"))
    with pytest.raises(ValueError, match="unsupported v3 codec"):
        zr.read_meta_v3(path)
    with pytest.raises(ValueError, match="unsupported v3 dtype"):
        zr.create_array_v3(str(tmp_path / "x"), [4], [2],
                           dtype="<c16")
