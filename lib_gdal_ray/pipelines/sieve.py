"""Sieve filter: remove connected regions smaller than a threshold by
merging them into their largest neighboring region.

Reference: `alg/gdalsievefilter.cpp:129-187` — "polygons" (connected
components of equal value) below the size threshold are merged into
their largest neighbor, iterating until no small polygon remains.

Distributed shape: reuse `label_connected_components` (per-tile CC +
cross-tile union-find), then build the *region graph* (sizes + region
adjacency via one edge-keyed groupby) and run GDAL's merge loop on that
contracted graph driver-side (regions ≪ pixels; same scale caveat as
polygonize). The final region→region mapping is broadcast and applied
in one `map_batches`, rewriting pixel values to the absorbing region's
value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .polygonize import label_connected_components
from .rasterize import pack_pixel


def _adjacency_pairs(labeled: ray.data.Dataset,
                     tile: int = 256) -> ray.data.Dataset:
    """DISTINCT region adjacency pairs from 4-neighbor pixel edges.

    Tile-halo co-partition (≤4 replicas per pixel, one bounded
    groupby(__blk)) + dense per-tile neighbor comparison — instead of
    the former 4-rows-per-pixel edge-keyed groupby, the exchange moves
    ~1.06× the pixel rows and each tile emits its region pairs already
    deduplicated (pairs ≪ edges)."""
    maxb = ((1 << 29) - 1) // tile

    def tag(batch: pa.Table) -> pa.Table:
        gpx = batch["gpx"].to_numpy(zero_copy_only=False).astype(np.int64)
        gpy = batch["gpy"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.uint64)
        reg = batch["region_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(gpx)
        if n == 0:
            return pa.table({"gpx": pa.array([], pa.int64()),
                             "gpy": pa.array([], pa.int64()),
                             "reg": pa.array([], pa.uint64()),
                             "__blk": pa.array([], pa.uint64())})
        bx0 = np.maximum((gpx - 1) // tile, 0)
        bx1 = np.minimum((gpx + 1) // tile, maxb)
        by0 = np.maximum((gpy - 1) // tile, 0)
        by1 = np.minimum((gpy + 1) // tile, maxb)
        ny = (by1 - by0 + 1).astype(np.int64)
        reps = ((bx1 - bx0 + 1) * ny).astype(np.int64)
        total = int(reps.sum())
        idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        k = np.arange(total, dtype=np.int64) - np.repeat(starts, reps)
        ny_r = np.repeat(ny, reps)
        bx = np.repeat(bx0, reps) + k // ny_r
        by = np.repeat(by0, reps) + k % ny_r
        key = (np.repeat(z, reps) << np.uint64(42)) \
            | (bx.astype(np.uint64) << np.uint64(21)) | by.astype(np.uint64)
        return pa.table({"gpx": pa.array(gpx[idx]),
                         "gpy": pa.array(gpy[idx]),
                         "reg": pa.array(reg[idx]),
                         "__blk": pa.array(key)})

    def kernel(tbl: pa.Table) -> pa.Table:
        blk = int(tbl["__blk"][0].as_py())
        bx = (blk >> 21) & ((1 << 21) - 1)
        by = blk & ((1 << 21) - 1)
        x0, y0 = bx * tile - 1, by * tile - 1
        w = tile + 2
        gpx = tbl["gpx"].to_numpy(zero_copy_only=False)
        gpy = tbl["gpy"].to_numpy(zero_copy_only=False)
        reg = tbl["reg"].to_numpy(zero_copy_only=False).astype(np.int64)
        grid = np.full((w, w), -1, dtype=np.int64)
        grid[gpy - y0, gpx - x0] = reg
        own = grid[1:tile + 1, 1:tile + 1]
        out = []
        for a, b in ((own, grid[1:tile + 1, 2:tile + 2]),     # east
                     (own, grid[2:tile + 2, 1:tile + 1])):    # south
            m = (a >= 0) & (b >= 0) & (a != b)
            if m.any():
                ra, rb = a[m], b[m]
                out.append(np.stack([np.minimum(ra, rb),
                                     np.maximum(ra, rb)], axis=1))
        if not out:
            return pa.table({"ra": pa.array([], pa.uint64()),
                             "rb": pa.array([], pa.uint64())})
        u = np.unique(np.concatenate(out), axis=0)
        return pa.table({"ra": pa.array(u[:, 0].astype(np.uint64)),
                         "rb": pa.array(u[:, 1].astype(np.uint64))})

    return (labeled.map_batches(tag, batch_format="pyarrow")
            .groupby("__blk").map_groups(kernel, batch_format="pyarrow"))


def sieve(pixels: ray.data.Dataset, threshold: int,
          connectivity: int = 4, tile_size: int = 256) -> ray.data.Dataset:
    """-> sieved sparse pixel rows (pix_id, burn): small regions take
    the value of the largest neighboring region (GDAL merge loop)."""
    labeled = label_connected_components(pixels, connectivity, tile_size)
    labeled = labeled.materialize()  # reused 3× below

    from ray.data.aggregate import Count, Min

    # The GDAL merge loop is inherently sequential on the CONTRACTED
    # region graph (region count << pixel count). It runs inside ONE Ray
    # task fed by block refs — regions and adjacency never pass through
    # the driver; the result map ref broadcasts to the rewrite actors.
    from ray.data.aggregate import Sum

    def size_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"region_id": batch["region_id"],
                      "value": batch["value"]})
        g = t.group_by(["region_id"]).aggregate([([], "count_all"),
                                                 ("value", "min")])
        return g.rename_columns(["region_id", "n", "value"])

    region_blocks = (labeled.map_batches(size_partial, batch_format="pyarrow")
                     .groupby("region_id")
                     .aggregate(Sum("n", alias_name="n"),
                                Min("value", alias_name="value"))
                     .to_arrow_refs())
    adj_blocks = _adjacency_pairs(labeled).to_arrow_refs()

    @ray.remote
    def _merge_task(threshold, n_region_blocks, *blocks):
        sizes: dict = {}
        values: dict = {}
        for b in blocks[:n_region_blocks]:
            if len(b) == 0 or "region_id" not in b.column_names:
                continue
            for r, n, v in zip(b["region_id"].to_numpy(zero_copy_only=False),
                               b["n"].to_numpy(zero_copy_only=False),
                               b["value"].to_numpy(zero_copy_only=False)):
                sizes[int(r)] = int(n)
                values[int(r)] = float(v)
        adj: dict = {r: set() for r in sizes}
        for b in blocks[n_region_blocks:]:
            if len(b) == 0 or "ra" not in b.column_names:
                continue
            for ra, rb in zip(b["ra"].to_numpy(zero_copy_only=False),
                              b["rb"].to_numpy(zero_copy_only=False)):
                adj.setdefault(int(ra), set()).add(int(rb))
                adj.setdefault(int(rb), set()).add(int(ra))

        mapping = {r: r for r in sizes}

        def resolve(r):
            while mapping[r] != r:
                r = mapping[r]
            return r

        changed = True
        while changed:
            changed = False
            small = sorted((r for r in sizes if mapping[r] == r
                            and sizes[r] < threshold and adj.get(r)),
                           key=lambda r: (sizes[r], r))
            for r in small:
                neighbors = {resolve(n) for n in adj[r]} - {r}
                if not neighbors:
                    continue
                target = max(neighbors, key=lambda n: (sizes[n], -n))
                mapping[r] = target
                sizes[target] += sizes[r]
                adj[target] = (adj.get(target, set()) | adj[r]) - {target, r}
                for n in adj[r]:
                    s = adj.get(n)
                    if s is not None:
                        s.discard(r)
                        if n != target:
                            s.add(target)
                changed = True

        return {r: values[resolve(r)] for r in sizes if resolve(r) != r}

    ref = _merge_task.remote(threshold, len(region_blocks),
                             *(list(region_blocks) + list(adj_blocks)))

    class Rewrite:
        def __init__(self, wrapped):
            m = ray.get(wrapped["ref"])
            # sorted key/value arrays: the per-pixel rewrite is a
            # vectorized searchsorted gather, not a per-row dict .get
            keys = np.fromiter(m.keys(), dtype=np.uint64, count=len(m))
            vals = np.fromiter(m.values(), dtype=np.float64, count=len(m))
            order = np.argsort(keys)
            self.keys = keys[order]
            self.vals = vals[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            gpx = batch["gpx"].to_numpy(zero_copy_only=False).astype(np.int64)
            gpy = batch["gpy"].to_numpy(zero_copy_only=False).astype(np.int64)
            zz = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
            reg = batch["region_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            newv = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64).copy()
            if len(self.keys):
                pos = np.minimum(np.searchsorted(self.keys, reg),
                                 len(self.keys) - 1)
                hit = self.keys[pos] == reg
                newv[hit] = self.vals[pos[hit]]
            pix = pack_pixel(int(zz[0]) if len(zz) else 0, gpx, gpy)
            return pa.table({"pix_id": pa.array(pix), "burn": pa.array(newv)})

    rw_key = ref.hex() + ":sieve_rewrite"

    def rewrite_stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        return get_or_build(rw_key, lambda: Rewrite({"ref": ref}))(batch)

    return labeled.map_batches(rewrite_stage, batch_format="pyarrow")
