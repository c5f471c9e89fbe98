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


def _adjacency_pairs(labeled: ray.data.Dataset) -> ray.data.Dataset:
    """Region adjacency (ra, rb, ra≠rb) from 4-neighbor pixel pairs.

    Each shared pixel edge gets exactly one row per incident pixel
    (side 0 = the pixel east/south of the edge, side 1 = west/north);
    region ids are < 2^62 (pack_pixel keys), so `enc = side<<62 | region`
    lets a single native Min/Max/Count aggregate recover both sides of
    every edge — no per-edge-key map_groups."""
    SIDE = np.uint64(1) << np.uint64(62)
    MASK = SIDE - np.uint64(1)

    def probes(batch: pa.Table) -> pa.Table:
        gpx = batch["gpx"].to_numpy(zero_copy_only=False).astype(np.int64)
        gpy = batch["gpy"].to_numpy(zero_copy_only=False).astype(np.int64)
        reg = batch["region_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tables = []
        # horizontal edge between (x,y) and (x+1,y): key = ((x+1) << 32 | y) << 1
        # vertical edge between (x,y) and (x,y+1): key = ((x) << 32 | y+1) << 1 | 1
        hk_e = (((gpx + 1).astype(np.uint64) << np.uint64(32)) | gpy.astype(np.uint64)) << np.uint64(1)
        hk_w = ((gpx.astype(np.uint64) << np.uint64(32)) | gpy.astype(np.uint64)) << np.uint64(1)
        vk_s = (((gpx.astype(np.uint64) << np.uint64(32)) | (gpy + 1).astype(np.uint64)) << np.uint64(1)) | np.uint64(1)
        vk_n = (((gpx.astype(np.uint64) << np.uint64(32)) | gpy.astype(np.uint64)) << np.uint64(1)) | np.uint64(1)
        for key, side in ((hk_e, 0), (hk_w, 1), (vk_s, 0), (vk_n, 1)):
            enc = reg if side == 0 else (reg | SIDE)
            tables.append(pa.table({"ek": pa.array(key), "enc": pa.array(enc)}))
        return pa.concat_tables(tables)

    from ray.data.aggregate import Count, Max, Min

    grouped = (labeled.map_batches(probes, batch_format="pyarrow")
               .groupby("ek").aggregate(Count(alias_name="n"),
                                        Min("enc", alias_name="lo"),
                                        Max("enc", alias_name="hi")))

    def pairs(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        lo = batch["lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hi = batch["hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ra, rb = lo & MASK, hi & MASK
        keep = (n == 2) & (ra != rb)
        return pa.table({"ra": pa.array(ra[keep]), "rb": pa.array(rb[keep])})

    return grouped.map_batches(pairs, batch_format="pyarrow")


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
    region_blocks = (labeled.groupby("region_id")
                     .aggregate(Count(alias_name="n"),
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
            self.map = ray.get(wrapped["ref"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            gpx = batch["gpx"].to_numpy(zero_copy_only=False).astype(np.int64)
            gpy = batch["gpy"].to_numpy(zero_copy_only=False).astype(np.int64)
            zz = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
            reg = batch["region_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            val = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            if self.map:
                newv = np.asarray([self.map.get(int(r), v)
                                   for r, v in zip(reg, val)])
            else:
                newv = val
            pix = pack_pixel(int(zz[0]) if len(zz) else 0, gpx, gpy)
            return pa.table({"pix_id": pa.array(pix), "burn": pa.array(newv)})

    rw_key = ref.hex() + ":sieve_rewrite"

    def rewrite_stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        return get_or_build(rw_key, lambda: Rewrite({"ref": ref}))(batch)

    return labeled.map_batches(rewrite_stage, batch_format="pyarrow")
