"""Proximity: per-pixel distance to the nearest target pixel.

Reference: `alg/gdalproximity.cpp:29-101` — for each pixel, the
distance to the nearest target pixel, capped at MAXDIST (pixels beyond
get the cap / nodata). GDAL's dense two-pass scanline becomes, in the
sparse world, a nearest-neighbor lookup: target pixel centers are
broadcast once (`ray.put`), each query batch computes a chunked
running-min distance matrix (memory-bounded: targets are processed in
blocks so batch×block stays small).

Scale assumption (documented): the *target* set fits in worker memory
(typical: rasterized vector features). For huge target sets, partition
queries by cell and ship only targets within MAXDIST of each cell —
the same cell-join pattern as the spatial join.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .rasterize import unpack_pixel

_TARGET_BLOCK = 8192


def _min_dist_chunked(qx, qy, tx, ty) -> np.ndarray:
    best = np.full(len(qx), np.inf)
    for s in range(0, len(tx), _TARGET_BLOCK):
        dx = qx[:, None] - tx[None, s:s + _TARGET_BLOCK]
        dy = qy[:, None] - ty[None, s:s + _TARGET_BLOCK]
        d2 = dx * dx + dy * dy
        np.minimum(best, d2.min(axis=1), out=best)
    return np.sqrt(best)


class _ProximityStage:
    def __init__(self, wrapped, maxdist):
        t = ray.get(wrapped["ref"])
        self.tx, self.ty = t["x"], t["y"]
        self.maxdist = maxdist

    def __call__(self, batch: pa.Table) -> pa.Table:
        z, gpx, gpy = unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        d = _min_dist_chunked(gpx.astype(np.float64), gpy.astype(np.float64),
                              self.tx, self.ty)
        np.minimum(d, self.maxdist, out=d)
        return pa.table({"pix_id": batch["pix_id"], "dist": pa.array(d)})


def proximity(query_pixels: ray.data.Dataset, target_pixels: ray.data.Dataset,
              maxdist: float = 64.0,
              concurrency: Union[int, Tuple[int, int]] = (1, 8)) -> ray.data.Dataset:
    """-> (pix_id, dist) for every query pixel; dist capped at maxdist.

    The broadcast target side is assembled INSIDE a Ray task from block
    refs (never on the driver) and cached once per worker process."""
    blocks = target_pixels.select_columns(["pix_id"]).to_arrow_refs()

    @ray.remote
    def _collect(*bs):
        import pyarrow as _pa

        if not bs:
            return {"x": np.empty(0), "y": np.empty(0)}
        pix = np.concatenate([
            b["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            for b in bs if len(b)])
        _z, tx, ty = unpack_pixel(pix)
        return {"x": tx.astype(np.float64), "y": ty.astype(np.float64)}

    ref = _collect.remote(*blocks)
    key = ref.hex()

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _ProximityStage({"ref": ref}, maxdist))
        return j(batch)

    return query_pixels.map_batches(stage, batch_format="pyarrow")
