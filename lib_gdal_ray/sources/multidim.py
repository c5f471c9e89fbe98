"""Multidimensional (N-D) chunked arrays as Datasets of chunk rows.

Reference: the GDAL multidim model (`gcore/gdal_multidim.h:304,850` —
GDALGroup / GDALDimension / GDALMDArray with chunked storage and
slicing views, used by netCDF/HDF5/Zarr). SURVEY §1.3 maps it to "a
Dataset of chunk rows keyed by N-D chunk index (same pattern as raster
tiles, generalized key)" — this module is that mapping:

* a chunk row = (chunk_id:uint64, i0..i{k-1}:int32, data:binary) where
  data is the C-order float64 payload of one chunk (edge chunks are
  full-size with trailing NaN padding trimmed by shape math);
* `slice_view` = GDALMDArray::GetView — prune whole chunks against the
  hyper-slab, then trim within surviving chunks (stateless map_batches);
* `reduce_dim` = per-chunk partial reduction along one axis + one
  `groupby` over the projected chunk key (the same partial+final shape
  as the raster statistics).

Up to 4 dimensions, 16 bits of chunk index each.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data

MAX_DIMS = 4


def pack_chunks(idx: np.ndarray) -> np.ndarray:
    """(N, k) chunk indices → uint64 keys (16 bits per dim)."""
    out = np.zeros(len(idx), dtype=np.uint64)
    for d in range(idx.shape[1]):
        out |= idx[:, d].astype(np.uint64) << np.uint64(16 * d)
    return out


def unpack_chunks(key: np.ndarray, k: int) -> np.ndarray:
    out = np.empty((len(key), k), dtype=np.int64)
    for d in range(k):
        out[:, d] = ((key.astype(np.uint64) >> np.uint64(16 * d))
                     & np.uint64(0xFFFF)).astype(np.int64)
    return out


def _grid(shape: Sequence[int], chunk_shape: Sequence[int]) -> List[int]:
    return [(s + c - 1) // c for s, c in zip(shape, chunk_shape)]


def from_function(shape: Sequence[int], chunk_shape: Sequence[int],
                  fn: Callable[..., np.ndarray],
                  override_num_blocks: int = None) -> ray.data.Dataset:
    """Materialize an N-D array defined by fn(*index_arrays) -> values
    as a Dataset of chunk rows (generated in parallel, streamed)."""
    k = len(shape)
    if k > MAX_DIMS:
        raise ValueError(f"up to {MAX_DIMS} dims")
    grid = _grid(shape, chunk_shape)
    n_chunks = int(np.prod(grid))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows_idx = np.empty((len(ids), k), dtype=np.int64)
        rem = ids.copy()
        for d in range(k - 1, -1, -1):
            rows_idx[:, d] = rem % grid[d]
            rem //= grid[d]
        datas = []
        for ci in rows_idx:
            slices = []
            for d in range(k):
                lo = ci[d] * chunk_shape[d]
                hi = min(lo + chunk_shape[d], shape[d])
                slices.append(np.arange(lo, hi))
            mesh = np.meshgrid(*slices, indexing="ij")
            datas.append(fn(*mesh).astype("<f8").tobytes())
        cols = {"chunk_id": pa.array(pack_chunks(rows_idx)),
                "data": pa.array(datas, type=pa.binary())}
        for d in range(k):
            cols[f"i{d}"] = pa.array(rows_idx[:, d].astype(np.int32))
        return pa.table(cols)

    return ray.data.range(n_chunks, override_num_blocks=override_num_blocks) \
        .map_batches(gen, batch_format="pyarrow")


def _chunk_extent(ci: np.ndarray, d: int, chunk_shape, shape) -> Tuple[int, int]:
    lo = int(ci[d]) * chunk_shape[d]
    return lo, min(lo + chunk_shape[d], shape[d])


def slice_view(ds: ray.data.Dataset, shape: Sequence[int],
               chunk_shape: Sequence[int],
               ranges: Sequence[Tuple[int, int]]) -> ray.data.Dataset:
    """GetView([lo:hi, ...]): prune chunks outside the hyper-slab, trim
    within surviving chunks. Output chunk rows keep ORIGINAL chunk ids
    plus per-chunk global offsets (o0..) of the trimmed block."""
    k = len(shape)

    def trim(batch: pa.Table) -> pa.Table:
        key = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = unpack_chunks(key, k)
        keep_rows, datas, offs = [], [], []
        for r in range(len(key)):
            ci = idx[r]
            slicers, o = [], []
            ok = True
            for d in range(k):
                lo, hi = _chunk_extent(ci, d, chunk_shape, shape)
                s0, s1 = max(lo, ranges[d][0]), min(hi, ranges[d][1])
                if s0 >= s1:
                    ok = False
                    break
                slicers.append(slice(s0 - lo, s1 - lo))
                o.append(s0)
            if not ok:
                continue
            dims = [min((int(ci[d]) + 1) * chunk_shape[d], shape[d])
                    - int(ci[d]) * chunk_shape[d] for d in range(k)]
            arr = np.frombuffer(batch["data"][r].as_py(), dtype="<f8").reshape(dims)
            datas.append(np.ascontiguousarray(arr[tuple(slicers)]).tobytes())
            keep_rows.append(r)
            offs.append(o)
        out = batch.take(pa.array(np.asarray(keep_rows, dtype=np.int64)))
        out = out.drop_columns(["data"]).append_column(
            "data", pa.array(datas, type=pa.binary()))
        for d in range(k):
            out = out.append_column(
                f"o{d}", pa.array(np.asarray([o[d] for o in offs], dtype=np.int32)))
        return out

    return ds.map_batches(trim, batch_format="pyarrow")


def reduce_dim(ds: ray.data.Dataset, shape: Sequence[int],
               chunk_shape: Sequence[int], axis: int,
               op: str = "sum") -> ray.data.Dataset:
    """Reduce one dimension (sum|max|min|mean): per-chunk partial along
    `axis`, then one groupby over the projected chunk key. mean runs
    the sum plan and divides by shape[axis] at finalize (every output
    element aggregates exactly shape[axis] inputs)."""
    if op not in ("sum", "max", "min", "mean"):
        raise ValueError("op must be sum|max|min|mean")
    part_op = "sum" if op == "mean" else op
    red_np = {"sum": np.sum, "max": np.max, "min": np.min}[part_op]
    k = len(shape)
    keep_dims = [d for d in range(k) if d != axis]

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = unpack_chunks(key, k)
        new_keys, datas = [], []
        for r in range(len(key)):
            ci = idx[r]
            dims = [min((int(ci[d]) + 1) * chunk_shape[d], shape[d])
                    - int(ci[d]) * chunk_shape[d] for d in range(k)]
            arr = np.frombuffer(batch["data"][r].as_py(), dtype="<f8").reshape(dims)
            red = red_np(arr, axis=axis)
            datas.append(red.astype("<f8").tobytes())
            new_keys.append([int(ci[d]) for d in keep_dims])
        nk = pack_chunks(np.asarray(new_keys, dtype=np.int64).reshape(len(key), k - 1)) \
            if len(key) else np.empty(0, np.uint64)
        return pa.table({"chunk_id": pa.array(nk),
                         "data": pa.array(datas, type=pa.binary())})

    import pandas as pd

    partials = ds.map_batches(partial, batch_format="pyarrow")
    denom = float(shape[axis]) if op == "mean" else None

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(b, dtype="<f8") for b in df["data"]]
        stack = np.stack(arrs)
        red = red_np(stack, axis=0)
        if denom is not None:
            red = red / denom
        return pd.DataFrame({"chunk_id": [np.uint64(df["chunk_id"].iloc[0])],
                             "data": [red.astype("<f8").tobytes()]})

    return partials.groupby("chunk_id").map_groups(combine, batch_format="pandas")


def statistics(ds: ray.data.Dataset) -> ray.data.Dataset:
    """GDALMDArray::ComputeStatistics analog
    (`gcore/gdalmdarray.cpp` ComputeStatistics): global
    (n, vmin, vmax, mean, std_pop) over every chunk payload — per-batch
    moment partials (n, Σv, Σv², min, max), one single-key groupby,
    closed-form finalize. One streaming pass, no payload shuffle."""

    def part(batch: pa.Table) -> pa.Table:
        n = s = s2 = 0.0
        vmin, vmax = np.inf, -np.inf
        for b in batch["data"]:
            v = np.frombuffer(b.as_py(), dtype="<f8")
            if not len(v):
                continue
            n += len(v)
            s += float(v.sum())
            s2 += float((v * v).sum())
            vmin = min(vmin, float(v.min()))
            vmax = max(vmax, float(v.max()))
        return pa.table({"__g": pa.array([0], pa.int8()),
                         "n": pa.array([n]), "s": pa.array([s]),
                         "s2": pa.array([s2]), "vmin": pa.array([vmin]),
                         "vmax": pa.array([vmax])})

    from ray.data.aggregate import Max, Min, Sum

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby("__g")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Sum("s2", alias_name="s2"),
                      Min("vmin", alias_name="vmin"),
                      Max("vmax", alias_name="vmax")))

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        s = batch["s"].to_numpy(zero_copy_only=False)
        s2 = batch["s2"].to_numpy(zero_copy_only=False)
        mean = s / n
        var = np.maximum(s2 / n - mean * mean, 0.0)
        return pa.table({
            "n": pa.array(n.astype(np.int64)),
            "vmin": batch["vmin"], "vmax": batch["vmax"],
            "mean": pa.array(mean), "std_pop": pa.array(np.sqrt(var)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def as_classic(ds: ray.data.Dataset, shape: Sequence[int],
               chunk_shape: Sequence[int], z: int,
               x_dim: int = 1, y_dim: int = 0) -> ray.data.Dataset:
    """GDALMDArray::AsClassicDataset analog
    (`gcore/gdalmdarray.cpp` AsClassicDataset): view a 2-D chunked
    array as sparse raster pixel rows (pix_id, burn) at zoom ``z`` —
    the bridge from the multidim surface into every raster operator
    (focal kernels, polygonize, tiling, zonal). Pure per-chunk explode
    (meshgrid of the chunk's global offsets), no shuffle."""
    if len(shape) != 2:
        raise ValueError("as_classic needs a 2-D array (slice/reduce first)")
    if {x_dim, y_dim} != {0, 1}:
        raise ValueError("x_dim/y_dim must be a permutation of (0, 1)")
    from ..pipelines.rasterize import pack_pixel

    def explode(batch: pa.Table) -> pa.Table:
        key = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = unpack_chunks(key, 2)
        gxs, gys, vals = [], [], []
        for r in range(len(key)):
            ci = idx[r]
            lohi = [_chunk_extent(ci, d, chunk_shape, shape) for d in (0, 1)]
            dims = [hi - lo for lo, hi in lohi]
            arr = np.frombuffer(batch["data"][r].as_py(),
                                dtype="<f8").reshape(dims)
            g0, g1 = np.meshgrid(np.arange(lohi[0][0], lohi[0][1]),
                                 np.arange(lohi[1][0], lohi[1][1]),
                                 indexing="ij")
            gxs.append((g1 if x_dim == 1 else g0).ravel())
            gys.append((g0 if y_dim == 0 else g1).ravel())
            vals.append(arr.ravel())
        gx = np.concatenate(gxs) if gxs else np.empty(0, np.int64)
        gy = np.concatenate(gys) if gys else np.empty(0, np.int64)
        v = np.concatenate(vals) if vals else np.empty(0)
        return pa.table({"pix_id": pa.array(pack_pixel(z, gx, gy)),
                         "burn": pa.array(v)})

    return ds.map_batches(explode, batch_format="pyarrow")


def transpose(ds: ray.data.Dataset, shape: Sequence[int],
              chunk_shape: Sequence[int],
              axes: Sequence[int]) -> ray.data.Dataset:
    """GDALMDArray::Transpose (`gcore/gdalmdarray.cpp` Transpose view):
    permute dimensions. The chunk grid permutes 1:1 — each chunk row
    transposes its payload locally and remaps its chunk index; a pure
    stateless ``map_batches``, no shuffle, no materialization. The
    result is a valid chunk-row dataset for the permuted
    ``shape``/``chunk_shape``."""
    k = len(shape)
    axes = list(axes)
    if sorted(axes) != list(range(k)):
        raise ValueError(f"axes must permute 0..{k-1}")

    def stage(batch: pa.Table) -> pa.Table:
        key = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = unpack_chunks(key, k)
        new_idx = idx[:, axes]
        datas = []
        for r in range(len(key)):
            ci = idx[r]
            dims = [min((int(ci[d]) + 1) * chunk_shape[d], shape[d])
                    - int(ci[d]) * chunk_shape[d] for d in range(k)]
            arr = np.frombuffer(batch["data"][r].as_py(),
                                dtype="<f8").reshape(dims)
            datas.append(np.ascontiguousarray(
                np.transpose(arr, axes)).tobytes())
        cols = {"chunk_id": pa.array(pack_chunks(new_idx)),
                "data": pa.array(datas, type=pa.binary())}
        for d in range(k):
            cols[f"i{d}"] = pa.array(new_idx[:, d].astype(np.int32))
        return pa.table(cols)

    return ds.map_batches(stage, batch_format="pyarrow")


def unscale(ds: ray.data.Dataset, scale: float = 1.0,
            offset: float = 0.0) -> ray.data.Dataset:
    """GDALMDArray::GetUnscaled: value*scale + offset over every chunk
    payload (stateless, vectorized, schema-preserving)."""

    def stage(batch: pa.Table) -> pa.Table:
        datas = [
            (np.frombuffer(b.as_py(), dtype="<f8") * scale + offset)
            .astype("<f8").tobytes()
            for b in batch["data"]]
        pos = batch.column_names.index("data")
        return batch.set_column(pos, "data",
                                pa.array(datas, type=pa.binary()))

    return ds.map_batches(stage, batch_format="pyarrow")


def to_numpy(ds: ray.data.Dataset, shape: Sequence[int],
             chunk_shape: Sequence[int]) -> np.ndarray:
    """Assemble chunk rows → dense array (tests / small results)."""
    k = len(shape)
    out = np.full(shape, np.nan)
    for b in ds.iter_batches(batch_format="pyarrow"):
        key = b["chunk_id"].to_numpy(zero_copy_only=False)
        idx = unpack_chunks(key, k)
        for r in range(len(key)):
            ci = idx[r]
            slicers, dims = [], []
            for d in range(k):
                lo, hi = _chunk_extent(ci, d, chunk_shape, shape)
                slicers.append(slice(lo, hi))
                dims.append(hi - lo)
            out[tuple(slicers)] = np.frombuffer(
                b["data"][r].as_py(), dtype="<f8").reshape(dims)
    return out
