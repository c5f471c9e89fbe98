"""Tile-pyramid overview chain (z → z-1) and tile statistics — sparse.

Reference: `gdal raster tile` builds overview zoom levels from the 4
children at z+1 (`apps/gdalalg_raster_tile.cpp:5679-5695`) — a
level-synchronous reduction; band statistics
(`gcore/gdalrasterband.cpp:5392` ComputeStatisticsInternal) as
per-block partials merged globally.

Sparse formulation: a level step maps every finalized pixel row at z to
its parent pixel at z-1 (`map_batches`, with an in-batch pyarrow
combiner) and re-aggregates with one hash `groupby` — no dense arrays,
no per-group Python. Reductions: "sum" (counts — exact) and "max";
"mean" of the 2×2 block = sum/4 for count rasters (emitted by
`how="mean4"`, dividing after the sum — exact for the sparse case where
absent pixels are zero, matching GDAL average-resampling over the full
block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import cells


def overview_pixels(pixels: ray.data.Dataset, how: str = "sum",
                    tile_size: int = 256,
                    shuffle_partitions=None) -> ray.data.Dataset:
    """One overview step on sparse pixel rows: zoom z → z-1.
    shuffle_partitions: see rasterize_pixels — small-shuffle knob."""
    if how not in ("sum", "max", "mean4"):
        raise ValueError(f"unknown reduction {how}")
    pa_agg = {"sum": "sum", "mean4": "sum", "max": "max"}[how]

    from .rasterize import pack_pixel, unpack_pixel

    def to_parent(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        burn = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        z, gpx, gpy = unpack_pixel(pix)
        parent = pack_pixel(int(z[0]) - 1 if len(z) else 0, gpx >> 1, gpy >> 1)
        t = pa.table({"pix_id": pa.array(parent), "burn": pa.array(burn)})
        out = t.group_by(["pix_id"]).aggregate([("burn", pa_agg)])
        return out.rename_columns(["pix_id", "burn"])

    partials = pixels.map_batches(to_parent, batch_format="pyarrow")

    from .rasterize import combine_pixel_partials

    out = combine_pixel_partials(partials, pa_agg, shuffle_partitions)
    if how == "mean4":
        def div4(batch: pa.Table) -> pa.Table:
            b = batch["burn"].to_numpy(zero_copy_only=False) / 4.0
            return batch.drop_columns(["burn"]).append_column("burn", pa.array(b))
        out = out.map_batches(div4, batch_format="pyarrow")
    return out


def overview_pyramid(pixels: ray.data.Dataset, z_base: int, z_min: int,
                     how: str = "sum", tile_size: int = 256,
                     shuffle_partitions=None):
    """Full chain z_base → z_min over sparse pixel rows; {z: Dataset}."""
    levels = {z_base: pixels}
    cur = pixels
    for z in range(z_base - 1, z_min - 1, -1):
        cur = overview_pixels(cur, how=how, tile_size=tile_size,
                              shuffle_partitions=shuffle_partitions)
        levels[z] = cur
    return levels


def tile_stats(tiles: ray.data.Dataset) -> ray.data.Dataset:
    """Pyramid-level summary from tile-summary rows."""
    from .relational import global_agg

    return global_agg(tiles, [
        ("count", None, "n_tiles"),
        ("sum", "nonzero", "nonzero_px"),
        ("sum", "total", "total_burn"),
        ("min", "checksum", "min_checksum"),
        ("max", "checksum", "max_checksum"),
    ])
