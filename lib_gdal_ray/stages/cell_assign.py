"""Cell/tile key-assignment stages — stateless ``map_batches`` over
zero-copy Arrow batches.

This is phase 1 of the two-phase distributed spatial join (north rule:
"batched cell encoding as a map_batches key-assignment stage"); the
reference analog is the envelope/cell pretest of GDAL's spatial filter
funnel (``ogrlayer.cpp:3700-3760``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import cells, wkb


def with_grid_cell(ds: ray.data.Dataset, res: float,
                   lon_col: str = "lon", lat_col: str = "lat",
                   wkb_col: Optional[str] = None,
                   out: str = "cell_id") -> ray.data.Dataset:
    """Add a flat-grid cell id column from lon/lat (or a point WKB col)."""

    def assign(batch: pa.Table) -> pa.Table:
        if wkb_col is not None:
            x, y = wkb.wkb_to_points(batch[wkb_col].to_numpy(zero_copy_only=False))
        else:
            x = batch[lon_col].to_numpy(zero_copy_only=False)
            y = batch[lat_col].to_numpy(zero_copy_only=False)
        return batch.append_column(out, pa.array(cells.grid_cell(x, y, res)))

    return ds.map_batches(assign, batch_format="pyarrow")


def with_tile_key(ds: ray.data.Dataset, z: int,
                  lon_col: str = "lon", lat_col: str = "lat",
                  tile_size: int = 256,
                  out_prefix: str = "") -> ray.data.Dataset:
    """Add (tile_id, px, py) columns at zoom z — rasterize key assignment."""

    def assign(batch: pa.Table) -> pa.Table:
        x = batch[lon_col].to_numpy(zero_copy_only=False)
        y = batch[lat_col].to_numpy(zero_copy_only=False)
        tx, ty, px, py = cells.tile_pixel(x, y, z, tile_size)
        tile = cells.pack_tile(np.full(len(tx), z, dtype=np.int64), tx, ty)
        batch = batch.append_column(out_prefix + "tile_id", pa.array(tile))
        batch = batch.append_column(out_prefix + "px", pa.array(px.astype(np.int32)))
        batch = batch.append_column(out_prefix + "py", pa.array(py.astype(np.int32)))
        return batch

    return ds.map_batches(assign, batch_format="pyarrow")


def explode_covering_cells(ds: ray.data.Dataset, res: float,
                           bbox_cols=("xmin", "ymin", "xmax", "ymax"),
                           wkb_col: Optional[str] = None,
                           out: str = "cell_id") -> ray.data.Dataset:
    """Replicate each row once per covered grid cell (polygon side of the
    join shuffle). Uses bbox columns if present, else computes the
    envelope from WKB."""

    def explode(batch: pa.Table) -> pa.Table:
        if wkb_col is not None and bbox_cols[0] not in batch.column_names:
            bbox = wkb.wkb_bbox(batch[wkb_col].to_numpy(zero_copy_only=False))
            xmin, ymin, xmax, ymax = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
        else:
            xmin = batch[bbox_cols[0]].to_numpy(zero_copy_only=False)
            ymin = batch[bbox_cols[1]].to_numpy(zero_copy_only=False)
            xmax = batch[bbox_cols[2]].to_numpy(zero_copy_only=False)
            ymax = batch[bbox_cols[3]].to_numpy(zero_copy_only=False)
        offsets, cc = cells.covering_grid(xmin, ymin, xmax, ymax, res)
        counts = np.diff(offsets)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        out_tbl = batch.take(pa.array(idx))
        return out_tbl.append_column(out, pa.array(cc))

    return ds.map_batches(explode, batch_format="pyarrow")
