"""Proximity: per-pixel distance to the nearest target pixel.

Reference: `alg/gdalproximity.cpp:29-101` — for each pixel, the
distance to the nearest target pixel, capped at MAXDIST (pixels beyond
get the cap / nodata). GDAL's dense two-pass scanline becomes, in the
sparse world, a nearest-neighbor lookup: target pixel centers are
broadcast once (`ray.put`), each query batch computes a chunked
running-min distance matrix (memory-bounded: targets are processed in
blocks so batch×block stays small).

Two paths:

* ``proximity`` — broadcast targets (typical: sparse rasterized vector
  features that fit in worker memory).
* ``proximity_shuffle`` — tile-halo co-partition for HUGE/dense target
  sets: queries go to their own tile, targets replicate to every tile
  whose halo (= maxdist) can reach them, one ``groupby(tile)`` runs the
  bounded per-tile kernel. A target farther than the halo is capped
  anyway, so output is identical to the broadcast path.
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


def _pack_cells(cx, cy):
    return (cx.astype(np.uint64) << np.uint64(32)) | cy.astype(np.uint64)


class _ProximityStage:
    """Broadcast-target proximity with a per-worker cell-bucket index.

    Targets are bucketed into ceil(maxdist)-sized cells once per worker
    (sorted key array + binary search); each query batch scans only its
    3x3 cell neighborhood. A target outside that neighborhood is
    > maxdist away in at least one axis, so it is capped to maxdist
    either way — output is bit-identical to the dense scan while work
    drops from O(queries x targets) to O(queries x local density)."""

    def __init__(self, wrapped, maxdist):
        t = ray.get(wrapped["ref"])
        self.maxdist = maxdist
        self.cell = max(int(np.ceil(maxdist)), 1)
        tx, ty = t["x"], t["y"]
        ck = _pack_cells(np.floor_divide(tx, self.cell).astype(np.int64),
                         np.floor_divide(ty, self.cell).astype(np.int64))
        order = np.argsort(ck, kind="stable")
        self.tx, self.ty = tx[order], ty[order]
        self.tkeys = ck[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        _z, gpx, gpy = unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False))
        qx = gpx.astype(np.float64)
        qy = gpy.astype(np.float64)
        d = np.full(len(qx), float(self.maxdist))
        if len(self.tx):
            qcx = (gpx // self.cell).astype(np.int64)
            qcy = (gpy // self.cell).astype(np.int64)
            qkey = _pack_cells(qcx, qcy)
            order = np.argsort(qkey, kind="stable")
            ks = qkey[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            bounds = np.append(starts, len(ks))
            offs = [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]
            for i in range(len(starts)):
                sel = order[bounds[i]:bounds[i + 1]]
                cx, cy = int(qcx[sel[0]]), int(qcy[sel[0]])
                nk = np.array(
                    [((cx + ox) << 32) | (cy + oy) for ox, oy in offs
                     if cx + ox >= 0 and cy + oy >= 0], dtype=np.uint64)
                s = np.searchsorted(self.tkeys, nk, side="left")
                e = np.searchsorted(self.tkeys, nk, side="right")
                spans = [np.arange(a, b) for a, b in zip(s, e) if b > a]
                if not spans:
                    continue
                ti = np.concatenate(spans)
                dd = _min_dist_chunked(qx[sel], qy[sel],
                                       self.tx[ti], self.ty[ti])
                np.minimum(dd, self.maxdist, out=dd)
                d[sel] = dd
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


def proximity_shuffle(query_pixels: ray.data.Dataset,
                      target_pixels: ray.data.Dataset,
                      maxdist: float = 64.0,
                      tile: int = 256) -> ray.data.Dataset:
    """Cell-partitioned proximity for dense/huge target sets (the
    100-TB path): NO broadcast side. Queries key to their ``tile``
    block; targets replicate to every block whose halo(=ceil(maxdist))
    window reaches them (≤4 replicas while halo < tile); one
    ``groupby(block)`` computes the bounded per-tile chunked min-dist.
    Bit-identical to ``proximity`` (targets beyond the halo are capped
    to maxdist either way). Reference: `alg/gdalproximity.cpp:29-101`
    (MAXDIST cap semantics)."""
    halo = int(np.ceil(maxdist))

    def tag_query(batch: pa.Table) -> pa.Table:
        _, gpx, gpy = unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        key = (gpx // tile).astype(np.uint64) << np.uint64(29) \
            | (gpy // tile).astype(np.uint64)
        return pa.table({
            "pix_id": batch["pix_id"],
            "__blk": pa.array(key),
            "__side": pa.array(np.zeros(len(batch), dtype=np.int8)),
        })

    def tag_target(batch: pa.Table) -> pa.Table:
        _, gpx, gpy = unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        bx0 = np.maximum((gpx - halo) // tile, 0)
        bx1 = (gpx + halo) // tile
        by0 = np.maximum((gpy - halo) // tile, 0)
        by1 = (gpy + halo) // tile
        nx = (bx1 - bx0 + 1).astype(np.int64)
        ny = (by1 - by0 + 1).astype(np.int64)
        reps = nx * ny
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        # vectorized (bx, by) cartesian offsets per row (ragged arange)
        tot = int(reps.sum())
        flat = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        bx = np.repeat(bx0, reps) + flat // np.repeat(ny, reps)
        by = np.repeat(by0, reps) + flat % np.repeat(ny, reps)
        keys = bx.astype(np.uint64) << np.uint64(29) | by.astype(np.uint64)
        sub = batch.take(pa.array(idx))
        return pa.table({
            "pix_id": sub["pix_id"],
            "__blk": pa.array(keys),
            "__side": pa.array(np.ones(len(sub), dtype=np.int8)),
        })

    both = query_pixels.map_batches(tag_query, batch_format="pyarrow").union(
        target_pixels.map_batches(tag_target, batch_format="pyarrow"))

    def dist_group(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        q = tbl.filter(pa.array(side == 0))
        if len(q) == 0:
            return pa.table({"pix_id": pa.array([], type=pa.uint64()),
                             "dist": pa.array([], type=pa.float64())})
        t = tbl.filter(pa.array(side == 1))
        _, qx, qy = unpack_pixel(q["pix_id"].to_numpy(zero_copy_only=False))
        if len(t) == 0:
            d = np.full(len(q), float(maxdist))
        else:
            _, tx, ty = unpack_pixel(t["pix_id"].to_numpy(zero_copy_only=False))
            d = _min_dist_chunked(qx.astype(np.float64), qy.astype(np.float64),
                                  tx.astype(np.float64), ty.astype(np.float64))
            np.minimum(d, maxdist, out=d)
        return pa.table({"pix_id": q["pix_id"], "dist": pa.array(d)})

    return both.groupby("__blk").map_groups(dist_group, batch_format="pyarrow")
