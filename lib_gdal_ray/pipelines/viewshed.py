"""Viewshed / line-of-sight over a DEM window.

Reference: `alg/viewshed/viewshed.cpp` (per-observer visibility over a
DEM) and `alg/viewshed/cumulative.cpp:64-77` (observers fanned out over
a worker queue — here: a `map_batches` over observer rows, SURVEY §2.8
"embarrassingly parallel").

The DEM window is broadcast once (`ray.put` of the dense array — the
per-observer working set, same shape as GDAL reading the DEM window per
observer); each observer task runs a vectorized ray-march: for every
target pixel, sample the DEM along the sight line (DDA, per-step
maximum of the elevation angle) — visible iff the target's angle
clears every intermediate angle.
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data


def line_of_sight(dem: np.ndarray, ox: int, oy: int, oh: float,
                  tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Boolean visibility of targets (tx, ty) from observer (ox, oy) at
    height dem[oy, ox] + oh. Vectorized over targets per ring step."""
    h0 = dem[oy, ox] + oh
    dx = tx - ox
    dy = ty - oy
    dist = np.hypot(dx, dy)
    n_steps = np.maximum(1, np.ceil(dist).astype(np.int64))
    max_steps = int(n_steps.max()) if len(n_steps) else 1
    # target elevation angle
    with np.errstate(divide="ignore", invalid="ignore"):
        tgt_angle = (dem[ty, tx] - h0) / np.maximum(dist, 1e-12)
    visible = np.ones(len(tx), dtype=bool)
    # march all rays in lockstep; rays shorter than step k are done
    best = np.full(len(tx), -np.inf)
    for k in range(1, max_steps):
        frac = k / n_steps
        active = frac < 1.0
        if not active.any():
            break
        sx = np.clip(np.round(ox + dx * frac).astype(np.int64), 0, dem.shape[1] - 1)
        sy = np.clip(np.round(oy + dy * frac).astype(np.int64), 0, dem.shape[0] - 1)
        d = dist * frac
        with np.errstate(divide="ignore", invalid="ignore"):
            ang = (dem[sy, sx] - h0) / np.maximum(d, 1e-12)
        # exclude the sample that IS the target pixel itself
        not_self = (sx != tx) | (sy != ty)
        upd = active & not_self
        best = np.where(upd, np.maximum(best, ang), best)
    visible = tgt_angle >= best - 1e-12
    visible[(dx == 0) & (dy == 0)] = True
    return visible


class _ViewshedStage:
    def __init__(self, wrapped, observer_height):
        self.dem = ray.get(wrapped["ref"])
        self.oh = observer_height
        ny, nx = self.dem.shape
        self.ty, self.tx = np.mgrid[0:ny, 0:nx]
        self.tx = self.tx.ravel()
        self.ty = self.ty.ravel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ox = batch["ox"].to_numpy(zero_copy_only=False)
        oy = batch["oy"].to_numpy(zero_copy_only=False)
        n_vis = np.empty(len(ox), dtype=np.int64)
        for i in range(len(ox)):
            vis = line_of_sight(self.dem, int(ox[i]), int(oy[i]), self.oh,
                                self.tx, self.ty)
            n_vis[i] = int(vis.sum())
        out = batch.append_column("n_visible", pa.array(n_vis))
        return out.append_column("n_total", pa.array(
            np.full(len(ox), len(self.tx), dtype=np.int64)))


def viewshed_counts(observers: ray.data.Dataset, dem: np.ndarray,
                    observer_height: float = 2.0,
                    concurrency: Union[int, Tuple[int, int]] = (1, 8)
                    ) -> ray.data.Dataset:
    """Observer rows (ox, oy, ...) → + (n_visible, n_total) over the
    broadcast DEM window."""
    ref = ray.put(np.ascontiguousarray(dem, dtype=np.float64))
    key = ref.hex()

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _ViewshedStage({"ref": ref},
                                                     observer_height))
        return j(batch)

    return observers.map_batches(stage, batch_format="pyarrow")
