"""Tile-pyramid overview chain (z → z-1) and tile statistics.

Reference: `gdal raster tile` builds overview zoom levels from the 4
children at z+1 (`apps/gdalalg_raster_tile.cpp:5679-5695`) — a
level-synchronous reduction; and band statistics
(`gcore/gdalrasterband.cpp:5392` ComputeStatisticsInternal) /
histograms (`GetHistogram`) as per-block partials merged globally.

Here: each child tile is downsampled 2× inside `map_batches` (tagged
with its parent key + quadrant), then one `groupby(parent)` assembles
the 4 quadrants into the parent tile. Reductions: "sum" (counts —
exact, SQL-oracle-able), "mean" (average resampling,
`gcore/overview.cpp` average path), "nearest" (top-left pixel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..geom import cells
from .rasterize import decode_tile, gdal_checksum


def _downsample(arr: np.ndarray, how: str) -> np.ndarray:
    h, w = arr.shape
    q = arr.reshape(h // 2, 2, w // 2, 2)
    if how == "sum":
        return q.sum(axis=(1, 3))
    if how == "mean":
        return q.mean(axis=(1, 3))
    if how == "nearest":
        return arr[::2, ::2]
    raise ValueError(f"unknown reduction {how}")


def overview_level(tiles: ray.data.Dataset, how: str = "sum",
                   tile_size: int = 256) -> ray.data.Dataset:
    """One overview step: tiles at zoom z → tiles at z-1."""

    def shrink(batch: pa.Table) -> pa.Table:
        tile_id = batch["tile_id"].to_numpy(zero_copy_only=False)
        data = batch["data"].to_numpy(zero_copy_only=False)
        z, tx, ty = cells.unpack_tile(tile_id)
        parent = cells.pack_tile(z - 1, tx >> 1, ty >> 1)
        quad = ((ty & 1) << 1 | (tx & 1)).astype(np.int8)  # 0=NW,1=NE,2=SW,3=SE
        small = [ _downsample(decode_tile(d, tile_size), how).astype("<f8").tobytes() for d in data ]
        return pa.table({
            "parent_id": pa.array(parent),
            "quad": pa.array(quad),
            "data": pa.array(small, type=pa.binary()),
        })

    halves = tiles.map_batches(shrink, batch_format="pyarrow")
    half = tile_size // 2

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        parent = np.uint64(df["parent_id"].iloc[0])
        arr = np.zeros((tile_size, tile_size), dtype=np.float64)
        for _, row in df.iterrows():
            q = int(row["quad"])
            sub = np.frombuffer(row["data"], dtype="<f8").reshape(half, half)
            oy, ox = (q >> 1) * half, (q & 1) * half
            arr[oy:oy + half, ox:ox + half] = sub
        z, tx, ty = cells.unpack_tile(np.asarray([parent]))
        return pd.DataFrame({
            "tile_id": [parent],
            "z": [int(z[0])],
            "tile_x": [int(tx[0])],
            "tile_y": [int(ty[0])],
            "data": [arr.astype("<f8").tobytes()],
            "nonzero": [int((arr != 0).sum())],
            "total": [float(arr.sum())],
            "checksum": [gdal_checksum(arr)],
        })

    return halves.groupby("parent_id").map_groups(assemble, batch_format="pandas")


def overview_pyramid(tiles: ray.data.Dataset, z_base: int, z_min: int,
                     how: str = "sum", tile_size: int = 256):
    """Full chain z_base → z_min; returns {z: Dataset}. Each level feeds
    the next (lazy; materialized per level by the consumer)."""
    levels = {z_base: tiles}
    cur = tiles
    for z in range(z_base - 1, z_min - 1, -1):
        cur = overview_level(cur, how=how, tile_size=tile_size)
        levels[z] = cur
    return levels


def tile_stats(tiles: ray.data.Dataset) -> ray.data.Dataset:
    """Per-pyramid summary from tile rows (count/total/nonzero) — the
    per-tile partials → global merge of GDAL's raster statistics."""
    from .relational import global_agg

    return global_agg(tiles, [
        ("count", None, "n_tiles"),
        ("sum", "nonzero", "nonzero_px"),
        ("sum", "total", "total_burn"),
        ("min", "checksum", "min_checksum"),
        ("max", "checksum", "max_checksum"),
    ])
