"""FillNodata: interpolate missing pixels from nearby valid pixels.

Reference: `alg/rasterfill.cpp:348-403` — inverse-distance-weighted
fill from valid pixels found by ring search within MAX_SEARCH_DIST
(smoothing iterations omitted in v0; they are a local 3×3 pass =
`raster_calc.focal(..., "mean")`).

Sparse shape: queries = the window's missing pixels (generated
streamed), valid pixels broadcast once; per batch a chunked
running-top-k IDW (same memory-bounded pattern as proximity).
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .rasterize import pack_pixel, unpack_pixel

_BLOCK = 8192


class _FillStage:
    def __init__(self, wrapped, max_search, k, power):
        t = ray.get(wrapped["ref"])
        self.vx, self.vy, self.vv = t["x"], t["y"], t["v"]
        self.max_search = max_search
        self.k = k
        self.power = power

    def __call__(self, batch: pa.Table) -> pa.Table:
        z, gpx, gpy = unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        qx = gpx.astype(np.float64)
        qy = gpy.astype(np.float64)
        n = len(qx)
        k = min(self.k, len(self.vx))
        best_d2 = np.full((n, k), np.inf)
        best_v = np.zeros((n, k))
        for s in range(0, len(self.vx), _BLOCK):
            dx = qx[:, None] - self.vx[None, s:s + _BLOCK]
            dy = qy[:, None] - self.vy[None, s:s + _BLOCK]
            d2 = dx * dx + dy * dy
            alld = np.concatenate([best_d2, d2], axis=1)
            allv = np.concatenate([best_v,
                                   np.broadcast_to(self.vv[None, s:s + _BLOCK],
                                                   d2.shape)], axis=1)
            part = np.argpartition(alld, k - 1, axis=1)[:, :k]
            rows = np.arange(n)[:, None]
            best_d2 = alld[rows, part]
            best_v = allv[rows, part]
        within = best_d2 <= self.max_search ** 2
        w = np.where(within, 1.0 / (best_d2 + 1e-12), 0.0)
        wsum = w.sum(axis=1)
        filled = np.where(wsum > 0, (w * best_v).sum(axis=1) / np.maximum(wsum, 1e-300),
                          np.nan)
        t = pa.table({"pix_id": batch["pix_id"], "burn": pa.array(filled)})
        return t.filter(pa.array(~np.isnan(filled)))


def fillnodata(valid_pixels: ray.data.Dataset, query_pixels: ray.data.Dataset,
               max_search: float = 16.0, k: int = 8, power: float = 2.0,
               concurrency: Union[int, Tuple[int, int]] = (1, 8)) -> ray.data.Dataset:
    """Fill `query_pixels` (missing locations, rows with pix_id) by IDW
    of the k nearest valid pixels within max_search; unreachable
    pixels are dropped (GDAL leaves them nodata)."""
    vdf = valid_pixels.to_pandas()
    z, vx, vy = unpack_pixel(vdf["pix_id"].to_numpy().astype(np.uint64))
    ref = ray.put({"x": vx.astype(np.float64), "y": vy.astype(np.float64),
                   "v": vdf["burn"].to_numpy().astype(np.float64)})
    return query_pixels.map_batches(
        _FillStage, batch_format="pyarrow",
        fn_constructor_args=({"ref": ref}, max_search, k, power),
        concurrency=concurrency)
