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


def _merge_regions_labelprop(regions: ray.data.Dataset,
                             adj: ray.data.Dataset, threshold: int,
                             max_rounds: int = 30) -> ray.data.Dataset:
    """Distributed sieve merge on the contracted region graph — the
    escape hatch for adversarial rasters where regions ≈ pixels and the
    single-task GDAL loop (`_merge_task`) would hold the whole region
    graph in one worker's heap.

    Round-parallel semantics: every round, each small region
    (size < threshold) with at least one neighbor picks its largest
    neighbor (size desc, id asc — the sequential loop's preference);
    the chosen merge edges' connected components
    (`polygonize._cc_root_map`, bounded-bucket min-label propagation)
    collapse onto the component's (size desc, id asc)-max member,
    sizes summing; region + adjacency tables contract and the loop
    repeats until no small region with a neighbor remains. A component
    holds at most one large region (each small region has exactly one
    out-edge), so an absorber ≥ threshold always wins its component.
    Eliminates exactly the same set of small regions as the sequential
    loop; the absorbing value can differ only where the sequential
    loop's intra-pass size mutations change a later target (both are
    valid orders of GDAL's merge, `alg/gdalsievefilter.cpp:129-187`).

    regions: (region_id int64 unique, n int64, value float64)
    adj:     (ra int64, rb int64) distinct undirected pairs
    -> (region_id, new_value) rows for every region whose value changes.
    Everything stays in Dataset land: bounded-bucket joins/groupbys,
    no single-node graph.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from .polygonize import _cc_root_map
    from .relational import bucket_lookup_join
    from .windows import grouped_topk

    def _proj(names_map):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({dst: b[src] for dst, src in names_map.items()})
        return f

    mapping = None  # accumulated (dead, winner) over all rounds
    regions = regions.materialize()
    adj = adj.materialize()

    for _ in range(max_rounds):
        if adj.count() == 0:
            break

        # 1. directed neighbor edges with both endpoint sizes attached
        def both_dirs(b: pa.Table) -> pa.Table:
            ra = b["ra"].to_numpy(zero_copy_only=False)
            rb = b["rb"].to_numpy(zero_copy_only=False)
            return pa.table({"r": pa.array(np.concatenate([ra, rb])),
                             "nb": pa.array(np.concatenate([rb, ra]))})

        directed = adj.map_batches(both_dirs, batch_format="pyarrow")
        d = bucket_lookup_join(
            directed,
            regions.map_batches(_proj({"region_id": "region_id",
                                       "n_nb": "n"}),
                                batch_format="pyarrow"),
            on="nb", right_on="region_id", how="inner")
        d = bucket_lookup_join(
            d,
            regions.map_batches(_proj({"region_id": "region_id",
                                       "n_r": "n"}),
                                batch_format="pyarrow"),
            on="r", right_on="region_id", how="inner")

        # 2. each small region picks its largest neighbor
        def keep_small(b: pa.Table) -> pa.Table:
            return b.filter(pc.less(b["n_r"], pa.scalar(threshold)))

        small = d.map_batches(keep_small, batch_format="pyarrow")
        tgt = grouped_topk(small, "r", "n_nb", 1, descending=True,
                           tiebreak="nb", keep=["r", "nb"]).materialize()
        if tgt.count() == 0:
            break

        # 3. merge-edge connected components + per-component absorber
        comp = _cc_root_map(
            tgt.map_batches(_proj({"la": "r", "lb": "nb"}),
                            batch_format="pyarrow")).materialize()
        mem = bucket_lookup_join(
            comp,
            regions.map_batches(_proj({"region_id": "region_id",
                                       "n": "n"}), batch_format="pyarrow"),
            on="label", right_on="region_id", how="inner")
        win = grouped_topk(mem, "root", "n", 1, descending=True,
                           tiebreak="label", keep=["root", "label"])
        win = win.map_batches(_proj({"root": "root", "winner": "label"}),
                              batch_format="pyarrow")
        step = bucket_lookup_join(comp, win, on="root", how="inner")
        step = step.map_batches(
            lambda b: b.filter(pc.not_equal(b["label"], b["winner"])),
            batch_format="pyarrow")
        step_lw = step.map_batches(_proj({"dead": "label",
                                          "winner": "winner"}),
                                   batch_format="pyarrow").materialize()

        # 4. fold into the accumulated dead->winner mapping (earlier
        # winners that died this round re-point to their new winner)
        if mapping is None:
            mapping = step_lw
        else:
            relab = step_lw.map_batches(_proj({"dead2": "dead",
                                               "w2": "winner"}),
                                        batch_format="pyarrow")
            j = bucket_lookup_join(mapping, relab, on="winner",
                                   right_on="dead2", how="left")

            def upd(b: pa.Table) -> pa.Table:
                w2 = b["w2"].cast(pa.int64())
                return pa.table({
                    "dead": b["dead"],
                    "winner": pc.coalesce(w2, b["winner"])})

            mapping = (j.map_batches(upd, batch_format="pyarrow")
                       .union(step_lw)).materialize()

        # 5. contract the region table: merged components become one
        # region carrying the winner's id/value and the summed size
        comp_sizes = mem.groupby("root").aggregate(
            Sum("n", alias_name="n"))
        wv = bucket_lookup_join(
            win,
            regions.map_batches(_proj({"region_id": "region_id",
                                       "value": "value"}),
                                batch_format="pyarrow"),
            on="winner", right_on="region_id", how="inner")
        merged = bucket_lookup_join(
            wv,
            comp_sizes.map_batches(_proj({"root2": "root", "n": "n"}),
                                   batch_format="pyarrow"),
            on="root", right_on="root2", how="inner")
        merged = merged.map_batches(
            _proj({"region_id": "winner", "n": "n", "value": "value"}),
            batch_format="pyarrow")

        def flag(b: pa.Table) -> pa.Table:
            return pa.table({"label2": b["label"],
                             "__in": pa.array(
                                 np.ones(len(b), dtype=np.int8))})

        ru = bucket_lookup_join(regions,
                                comp.map_batches(flag,
                                                 batch_format="pyarrow"),
                                on="region_id", right_on="label2",
                                how="left")
        untouched = ru.map_batches(
            lambda b: b.filter(pc.is_null(b["__in"]))
            .drop_columns(["__in"]),
            batch_format="pyarrow")
        regions = untouched.union(merged).materialize()

        # 6. contract adjacency: relabel endpoints through this round's
        # dead->winner map, drop self-loops, re-distinct
        a1 = bucket_lookup_join(
            adj, step_lw.map_batches(_proj({"deadA": "dead",
                                            "wA": "winner"}),
                                     batch_format="pyarrow"),
            on="ra", right_on="deadA", how="left")
        a2 = bucket_lookup_join(
            a1, step_lw.map_batches(_proj({"deadB": "dead",
                                           "wB": "winner"}),
                                    batch_format="pyarrow"),
            on="rb", right_on="deadB", how="left")

        def contract(b: pa.Table) -> pa.Table:
            ra = pc.coalesce(b["wA"].cast(pa.int64()),
                             b["ra"]).to_numpy(zero_copy_only=False)
            rb = pc.coalesce(b["wB"].cast(pa.int64()),
                             b["rb"]).to_numpy(zero_copy_only=False)
            lo = np.minimum(ra, rb)
            hi = np.maximum(ra, rb)
            keep = lo != hi
            u = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
            return pa.table({"ra": pa.array(u[:, 0]),
                             "rb": pa.array(u[:, 1])})

        adj = (a2.map_batches(contract, batch_format="pyarrow")
               .groupby(["ra", "rb"])
               .aggregate(Count(alias_name="__c"))
               .map_batches(lambda b: b.drop_columns(["__c"]),
                            batch_format="pyarrow")).materialize()

    if mapping is None:
        return ray.data.from_arrow(pa.table({
            "region_id": pa.array([], pa.int64()),
            "new_value": pa.array([], pa.float64())}))
    out = bucket_lookup_join(
        mapping,
        regions.map_batches(_proj({"region_id": "region_id",
                                   "new_value": "value"}),
                            batch_format="pyarrow"),
        on="winner", right_on="region_id", how="inner")
    return out.map_batches(_proj({"region_id": "dead",
                                  "new_value": "new_value"}),
                           batch_format="pyarrow")


def _sieve_rewrite_distributed(labeled: ray.data.Dataset,
                               regions: ray.data.Dataset,
                               threshold: int) -> ray.data.Dataset:
    """labelprop-path rewrite: the region->value mapping can itself be
    huge (regions ≈ pixels), so it joins back to the pixels with a
    bounded-bucket lookup instead of a driver broadcast."""
    import pyarrow.compute as pc
    from .relational import bucket_lookup_join

    def adj64(b: pa.Table) -> pa.Table:
        return pa.table({
            "ra": pa.array(b["ra"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "rb": pa.array(b["rb"].to_numpy(
                zero_copy_only=False).astype(np.int64))})

    adj = _adjacency_pairs(labeled).map_batches(adj64,
                                                batch_format="pyarrow")
    mapping = _merge_regions_labelprop(regions, adj, threshold)

    def lab64(b: pa.Table) -> pa.Table:
        rid = b["region_id"].to_numpy(
            zero_copy_only=False).astype(np.uint64).astype(np.int64)
        return pa.table({"gpx": b["gpx"], "gpy": b["gpy"], "z": b["z"],
                         "value": b["value"], "region_id": pa.array(rid)})

    joined = bucket_lookup_join(
        labeled.map_batches(lab64, batch_format="pyarrow"),
        mapping, on="region_id", how="left")

    def finish(b: pa.Table) -> pa.Table:
        gpx = b["gpx"].to_numpy(zero_copy_only=False).astype(np.int64)
        gpy = b["gpy"].to_numpy(zero_copy_only=False).astype(np.int64)
        zz = b["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        burn = pc.coalesce(b["new_value"].cast(pa.float64()),
                           b["value"].cast(pa.float64()))
        pix = pack_pixel(int(zz[0]) if len(zz) else 0, gpx, gpy)
        return pa.table({"pix_id": pa.array(pix), "burn": burn})

    return joined.map_batches(finish, batch_format="pyarrow")


def sieve(pixels: ray.data.Dataset, threshold: int,
          connectivity: int = 4, tile_size: int = 256,
          cc_mode: str = "auto",
          region_limit: int = 5_000_000) -> ray.data.Dataset:
    """-> sieved sparse pixel rows (pix_id, burn): small regions take
    the value of the largest neighboring region (GDAL merge loop).

    cc_mode: 'task' runs the merge loop on the contracted region graph
    inside ONE Ray task (regions << pixels for real rasters);
    'labelprop' routes it through `_merge_regions_labelprop` (fully
    distributed, bounded-bucket rounds); 'auto' switches to labelprop
    above `region_limit` regions — the same escape hatch as
    polygonize / near_dup_clusters."""
    labeled = label_connected_components(pixels, connectivity, tile_size)
    labeled = labeled.materialize()  # reused 3× below

    from ray.data.aggregate import Min, Sum

    def size_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"region_id": batch["region_id"],
                      "value": batch["value"]})
        g = t.group_by(["region_id"]).aggregate([([], "count_all"),
                                                 ("value", "min")])
        return g.rename_columns(["region_id", "n", "value"])

    def norm_regions(batch: pa.Table) -> pa.Table:
        rid = batch["region_id"].to_numpy(
            zero_copy_only=False).astype(np.uint64).astype(np.int64)
        return pa.table({
            "region_id": pa.array(rid),
            "n": batch["n"].cast(pa.int64()),
            "value": batch["value"].cast(pa.float64())})

    regions = (labeled.map_batches(size_partial, batch_format="pyarrow")
               .groupby("region_id")
               .aggregate(Sum("n", alias_name="n"),
                          Min("value", alias_name="value"))
               .map_batches(norm_regions, batch_format="pyarrow")
               .materialize())

    if cc_mode == "labelprop" or (cc_mode == "auto"
                                  and regions.count() > region_limit):
        return _sieve_rewrite_distributed(labeled, regions, threshold)

    # The GDAL merge loop is inherently sequential on the CONTRACTED
    # region graph (region count << pixel count). It runs inside ONE Ray
    # task fed by block refs — regions and adjacency never pass through
    # the driver; the result map ref broadcasts to the rewrite actors.
    region_blocks = regions.to_arrow_refs()
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
