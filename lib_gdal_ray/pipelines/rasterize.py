"""Rasterize (vector→raster) as a two-phase tile pipeline.

Reference: `alg/gdalrasterize.cpp` (`gv_rasterize_one_shape` `:569`,
options `:774-817` — MERGE_ALG=REPLACE/ADD, burn value fixed or from a
field) and the tile job layout of `apps/gdalalg_raster_tile.cpp`.

Phase 1 (`map_batches`, stateless): assign each point to
(tile, px, py) at zoom z and **pre-aggregate within the batch** to
sparse pixel partials (tile_id, px, py, burn) — the combiner that keeps
the shuffle narrow. Phase 2 (`groupby(tile_id).map_groups`): burn the
partials into a dense tile_size² array, emit one Arrow row per tile
with the raw pixel payload (`data`: little-endian bytes), nonzero
count, sum, and the GDAL-checksum of the tile
(`gdal_checksum`, bit-exact re-derivation of
`alg/gdalchecksum.cpp:48` — the conformance currency of the autotest
suite, SURVEY.md §5).

MERGE_ALG semantics: "add" sums burn values per pixel (associative →
safe to pre-aggregate); "count" burns 1 per point; "max"/"min" keep the
extreme (also associative). GDAL's order-sensitive REPLACE is
deliberately not offered distributed — use "max" with a priority field.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..geom import cells

_PRIMES = np.asarray([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def gdal_checksum(arr: np.ndarray) -> int:
    """GDALChecksumImage for a full 2-D window at offset (0,0).

    Bit-exact per `alg/gdalchecksum.cpp:48-260`: per pixel
    `(int)value % primes[(y*W + x) % 11]` with C truncated modulo
    (sign of dividend), summed, masked to 16 bits. Float inputs go
    through GDALCopyWords' float→Int32: add 0.5, floor, clamp to
    ±2147483647 (NaN/inf → INT_MIN).
    """
    h, w = arr.shape
    if np.issubdtype(arr.dtype, np.floating):
        v = arr.astype(np.float64) + 0.5
        nonfinite = ~np.isfinite(v)
        v = np.floor(np.clip(v, -2147483647.0, 2147483647.0))
        iv = v.astype(np.int64)
        iv[nonfinite] = np.iinfo(np.int32).min
    else:
        iv = arr.astype(np.int64)
    idx = np.arange(h * w, dtype=np.int64).reshape(h, w)
    primes = _PRIMES[idx % 11]
    contrib = np.fmod(iv, primes)  # truncated modulo, C semantics
    return int(contrib.sum() & 0xFFFF)


_MERGE_NUMPY = {
    "add": np.add,
    "count": np.add,
    "max": np.maximum,
    "min": np.minimum,
}


def rasterize_points(points: ray.data.Dataset, z: int,
                     lon_col: str = "lon", lat_col: str = "lat",
                     value_col: Optional[str] = None,
                     merge_alg: str = "add",
                     tile_size: int = 256) -> ray.data.Dataset:
    """Points → dense tiles at zoom z. Returns Dataset of tile rows:
    (tile_id, z, tile_x, tile_y, data, nonzero, total, checksum)."""
    if merge_alg not in _MERGE_NUMPY:
        raise ValueError(f"merge_alg must be one of {sorted(_MERGE_NUMPY)}")
    pa_agg = {"add": "sum", "count": "sum", "max": "max", "min": "min"}[merge_alg]

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[lon_col].to_numpy(zero_copy_only=False)
        y = batch[lat_col].to_numpy(zero_copy_only=False)
        tx, ty, px, py = cells.tile_pixel(x, y, z, tile_size)
        tile = cells.pack_tile(np.full(len(tx), z, dtype=np.int64), tx, ty)
        if merge_alg == "count" or value_col is None:
            burn = np.ones(len(tx), dtype=np.float64)
        else:
            burn = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({
            "tile_id": pa.array(tile),
            "px": pa.array(px.astype(np.int32)),
            "py": pa.array(py.astype(np.int32)),
            "burn": pa.array(burn),
        })
        out = t.group_by(["tile_id", "px", "py"]).aggregate([("burn", pa_agg)])
        return out.rename_columns(["tile_id", "px", "py", "burn"])

    partials = points.map_batches(partial, batch_format="pyarrow")

    def burn_tile(df: pd.DataFrame) -> pd.DataFrame:
        tile_id = np.uint64(df["tile_id"].iloc[0])
        arr = np.zeros((tile_size, tile_size), dtype=np.float64)
        px = df["px"].to_numpy()
        py = df["py"].to_numpy()
        b = df["burn"].to_numpy(dtype=np.float64)
        if merge_alg in ("add", "count"):
            np.add.at(arr, (py, px), b)
        elif merge_alg == "max":
            np.maximum.at(arr, (py, px), b)
        else:
            arr.fill(np.inf)
            np.minimum.at(arr, (py, px), b)
            arr[np.isinf(arr)] = 0.0
        zz, tx, ty = cells.unpack_tile(np.asarray([tile_id]))
        return pd.DataFrame({
            "tile_id": [tile_id],
            "z": [int(zz[0])],
            "tile_x": [int(tx[0])],
            "tile_y": [int(ty[0])],
            "data": [arr.astype("<f8").tobytes()],
            "nonzero": [int((arr != 0).sum())],
            "total": [float(arr.sum())],
            "checksum": [gdal_checksum(arr)],
        })

    return partials.groupby("tile_id").map_groups(burn_tile, batch_format="pandas")


def decode_tile(data: bytes, tile_size: int = 256) -> np.ndarray:
    return np.frombuffer(data, dtype="<f8").reshape(tile_size, tile_size)
