"""FillNodata: interpolate missing pixels from nearby valid pixels.

Reference: `alg/rasterfill.cpp:348-403` — inverse-distance-weighted
fill from valid pixels found within MAX_SEARCH_DIST (smoothing
iterations omitted; they are a local 3×3 pass =
`raster_calc.focal(..., "mean")`).

Scale shape (tile-halo co-partition — the same pattern proximity.py
documents, now with NO driver-side materialization of the valid side):

* valid pixels are replicated to every ``tile``-sized block whose
  halo-expanded window can reach them (halo = ceil(max_search) ⇒ ≤4
  replicas while halo < tile);
* query (missing) pixels go to exactly their own block;
* one ``groupby(block)`` co-partitions both sides; the per-group kernel
  runs the chunked running-top-k IDW over ≤ (tile+2·halo)² candidates.

Exactness: a valid pixel farther than max_search is weightless, and
every valid pixel within max_search of a query lands in the query's
block by construction — identical output to the broadcast version.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .rasterize import unpack_pixel

_BLOCK = 8192


def _idw_fill(qx, qy, qpix, vx, vy, vv, max_search, k):
    n = len(qx)
    k = min(k, len(vx))
    if k == 0:
        return qpix[:0], np.empty(0, dtype=np.float64)
    best_d2 = np.full((n, k), np.inf)
    best_v = np.zeros((n, k))
    for s in range(0, len(vx), _BLOCK):
        dx = qx[:, None] - vx[None, s:s + _BLOCK]
        dy = qy[:, None] - vy[None, s:s + _BLOCK]
        d2 = dx * dx + dy * dy
        alld = np.concatenate([best_d2, d2], axis=1)
        allv = np.concatenate([best_v,
                               np.broadcast_to(vv[None, s:s + _BLOCK], d2.shape)],
                              axis=1)
        part = np.argpartition(alld, k - 1, axis=1)[:, :k]
        rows = np.arange(n)[:, None]
        best_d2 = alld[rows, part]
        best_v = allv[rows, part]
    within = best_d2 <= max_search ** 2
    w = np.where(within, 1.0 / (best_d2 + 1e-12), 0.0)
    wsum = w.sum(axis=1)
    filled = np.where(wsum > 0,
                      (w * best_v).sum(axis=1) / np.maximum(wsum, 1e-300),
                      np.nan)
    ok = ~np.isnan(filled)
    return qpix[ok], filled[ok]


def fillnodata(valid_pixels: ray.data.Dataset, query_pixels: ray.data.Dataset,
               max_search: float = 16.0, k: int = 8, power: float = 2.0,
               tile: int = 256,
               concurrency: Union[int, Tuple[int, int]] = (1, 8)) -> ray.data.Dataset:
    """Fill `query_pixels` (missing locations, rows with pix_id) by IDW
    of the k nearest valid pixels within max_search; unreachable pixels
    are dropped (GDAL leaves them nodata). Streaming tile-halo
    co-partition — neither side is ever collected on the driver."""
    halo = int(np.ceil(max_search))

    def tag_query(batch: pa.Table) -> pa.Table:
        _, gpx, gpy = unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        key = (gpx // tile).astype(np.uint64) << np.uint64(29) \
            | (gpy // tile).astype(np.uint64)
        return pa.table({
            "pix_id": batch["pix_id"],
            "burn": pa.array(np.zeros(len(batch), dtype=np.float64)),
            "__blk": pa.array(key),
            "__side": pa.array(np.zeros(len(batch), dtype=np.int8)),
        })

    def tag_valid(batch: pa.Table) -> pa.Table:
        _, gpx, gpy = unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        bx0 = np.maximum((gpx - halo) // tile, 0)
        bx1 = (gpx + halo) // tile
        by0 = np.maximum((gpy - halo) // tile, 0)
        by1 = (gpy + halo) // tile
        reps = ((bx1 - bx0 + 1) * (by1 - by0 + 1)).astype(np.int64)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        keys = np.empty(int(reps.sum()), dtype=np.uint64)
        o = 0
        for i in range(len(batch)):
            for bx in range(bx0[i], bx1[i] + 1):
                for by in range(by0[i], by1[i] + 1):
                    keys[o] = (np.uint64(bx) << np.uint64(29)) | np.uint64(by)
                    o += 1
        sub = batch.take(pa.array(idx))
        return pa.table({
            "pix_id": sub["pix_id"],
            "burn": sub["burn"],
            "__blk": pa.array(keys),
            "__side": pa.array(np.ones(len(sub), dtype=np.int8)),
        })

    both = query_pixels.map_batches(tag_query, batch_format="pyarrow").union(
        valid_pixels.map_batches(tag_valid, batch_format="pyarrow"))

    def fill_group(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        q = tbl.filter(pa.array(side == 0))
        v = tbl.filter(pa.array(side == 1))
        empty = pa.table({"pix_id": pa.array([], type=pa.uint64()),
                          "burn": pa.array([], type=pa.float64())})
        if len(q) == 0 or len(v) == 0:
            return empty
        qpix = q["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        _, qx, qy = unpack_pixel(qpix)
        vpix = v["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        _, vx, vy = unpack_pixel(vpix)
        vv = v["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        pix, filled = _idw_fill(qx.astype(np.float64), qy.astype(np.float64),
                                qpix, vx.astype(np.float64),
                                vy.astype(np.float64), vv, max_search, k)
        return pa.table({"pix_id": pa.array(pix), "burn": pa.array(filled)})

    return both.groupby("__blk").map_groups(fill_group, batch_format="pyarrow")
