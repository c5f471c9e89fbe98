"""Raster-at-point lookup: sample a sparse raster at point locations.

Reference: `GDALRasterBand::InterpolateAtPoint`
(`gcore/gdal_rasterband.h:573`, `alg/gdal_interpolateatpoint.cpp`) —
nearest / bilinear value at a fractional pixel coordinate.

Distributed shape (SURVEY §2.4 "point rows joined to tile rows by tile
key"): each point explodes to its 1 (nearest) or 4 (bilinear)
surrounding pixel keys with interpolation weights; the union of
weighted point-probes and pixel rows co-partitions on `pix_id` in ONE
`groupby`, matches are re-keyed by point id and a second tiny
`groupby(point)` sums weight×value. Fully vectorized — no per-row
lookups, no broadcast of the (potentially huge) raster.

Missing pixels contribute 0 with their weight dropped (weights
renormalized) — GDAL's nodata-aware bilinear behaves the same way when
a corner is nodata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import cells
from .rasterize import pack_pixel

_METHODS = ("nearest", "bilinear")


def interpolate_at_points(pixels: ray.data.Dataset, points: ray.data.Dataset,
                          z: int, id_col: str = "point_id",
                          lon_col: str = "lon", lat_col: str = "lat",
                          method: str = "bilinear",
                          tile_size: int = 256) -> ray.data.Dataset:
    """-> (point_id, value, weight_sum). Points with no covered pixel
    are absent (GDAL returns nodata)."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}")
    m = (1 << z) * tile_size

    def probes(batch: pa.Table) -> pa.Table:
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = np.clip(batch[lat_col].to_numpy(zero_copy_only=False),
                      -cells.MAX_MERC_LAT, cells.MAX_MERC_LAT)
        rad = np.radians(lat)
        fx = (lon + 180.0) / 360.0 * m
        fy = (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * m
        if method == "nearest":
            gx = np.clip(np.floor(fx).astype(np.int64), 0, m - 1)
            gy = np.clip(np.floor(fy).astype(np.int64), 0, m - 1)
            return pa.table({
                "pix_id": pa.array(pack_pixel(z, gx, gy)),
                "point": pa.array(pid),
                "w": pa.array(np.ones(len(pid))),
                "pv": pa.array(np.zeros(len(pid))),
                "side": pa.array(np.ones(len(pid), dtype=np.int8)),
            })
        # bilinear on pixel centers: sample grid of centers at (i+0.5)
        cx = fx - 0.5
        cy = fy - 0.5
        x0 = np.floor(cx).astype(np.int64)
        y0 = np.floor(cy).astype(np.int64)
        tx = cx - x0
        ty = cy - y0
        parts = []
        for dx, dy, w in ((0, 0, (1 - tx) * (1 - ty)), (1, 0, tx * (1 - ty)),
                          (0, 1, (1 - tx) * ty), (1, 1, tx * ty)):
            gx = x0 + dx
            gy = y0 + dy
            ok = (gx >= 0) & (gy >= 0) & (gx < m) & (gy < m) & (w > 0)
            parts.append(pa.table({
                "pix_id": pa.array(pack_pixel(z, np.clip(gx, 0, m - 1),
                                              np.clip(gy, 0, m - 1))),
                "point": pa.array(pid),
                "w": pa.array(w),
                "pv": pa.array(np.zeros(len(pid))),
                "side": pa.array(np.ones(len(pid), dtype=np.int8)),
            }).filter(pa.array(ok)))
        return pa.concat_tables(parts)

    def pix_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "pix_id": batch["pix_id"],
            "point": pa.array(np.full(n, -1, dtype=np.int64)),
            "w": pa.array(np.zeros(n)),
            "pv": pa.array(batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    both = points.map_batches(probes, batch_format="pyarrow").union(
        pixels.map_batches(pix_rows, batch_format="pyarrow"))

    # Re-key the per-pixel match into 256 bounded groups (NOTES lesson:
    # never per-pixel map_groups — ~1 ms/group kills million-pixel
    # rasters); inside a group the probe->pixel match is one vectorized
    # searchsorted.
    def bucket(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        g = ((pix * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)).astype(np.int32)
        return batch.append_column("__g", pa.array(g))

    def match(tbl: pa.Table) -> pa.Table:
        side = tbl["side"].to_numpy(zero_copy_only=False)
        pv_rows = tbl.filter(pa.array(side == 0))
        probe_rows = tbl.filter(pa.array(side == 1))
        empty = pa.table({"point": pa.array([], type=pa.int64()),
                          "wv": pa.array([], type=pa.float64()),
                          "w": pa.array([], type=pa.float64())})
        if len(pv_rows) == 0 or len(probe_rows) == 0:
            return empty
        ppix = pv_rows["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pval = pv_rows["pv"].to_numpy(zero_copy_only=False)
        order = np.argsort(ppix)
        ppix, pval = ppix[order], pval[order]
        qpix = probe_rows["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.searchsorted(ppix, qpix)
        idx = np.clip(idx, 0, len(ppix) - 1)
        found = ppix[idx] == qpix
        if not found.any():
            return empty
        w = probe_rows["w"].to_numpy(zero_copy_only=False)[found]
        v = pval[idx[found]]
        return pa.table({
            "point": pa.array(probe_rows["point"].to_numpy(
                zero_copy_only=False).astype(np.int64)[found]),
            "wv": pa.array(w * v),
            "w": pa.array(w),
        })

    matched = (both.map_batches(bucket, batch_format="pyarrow")
               .groupby("__g").map_groups(match, batch_format="pyarrow"))

    from ray.data.aggregate import Sum

    agg = matched.groupby("point").aggregate(Sum("wv", alias_name="wv"),
                                             Sum("w", alias_name="weight_sum"))

    def finalize(batch: pa.Table) -> pa.Table:
        wv = batch["wv"].to_numpy(zero_copy_only=False)
        w = batch["weight_sum"].to_numpy(zero_copy_only=False)
        return pa.table({
            "point_id": batch["point"],
            "value": pa.array(wv / np.maximum(w, 1e-300)),
            "weight_sum": batch["weight_sum"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")
