"""Polygonize (raster→vector): connected components over equal-valued
pixels, distributed as per-tile labeling + cross-tile label merge.

Reference semantics: `alg/polygonize.cpp:80-239` — connected components
of equal pixel values, 4-connected (8-connected optional, `:86`;
v0 implements 4-connected and rejects 8), background/nodata pixels
(absent sparse pixels) excluded. GDAL emits ring polygons; v0 emits one
row per region with (region_id, value, n_pixels, global-pixel bbox) —
the component structure, which is the distributed-hard part; ring
tracing is a per-region local post-pass.

Distributed shape (SURVEY.md §2.8 "the one operator needing a 2-round
shuffle"):
1. `groupby(tile_id).map_groups(label_tile)` — union-find CC inside
   each tile; a pixel's label is its component-root pixel's global
   coordinates packed to uint64 (globally unique without coordination).
2. Border adjacency: boundary pixels are emitted under a shared
   edge key (`groupby(edge)`) where the two touching tiles meet; equal
   values at adjacent positions yield (label_a, label_b) merge pairs.
3. The label graph (≪ pixel count; one node per *border-touching*
   component) is union-found on the driver and the relabel map is
   broadcast; final region stats via one vectorized `groupby`.
   Documented scale assumption: the border-component graph fits the
   driver (standard 2-round CC; an iterative label-propagation round
   can replace it if it ever doesn't).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .rasterize import unpack_pixel, with_tile_cols


class UnionFind:
    def __init__(self):
        self.parent: Dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller root wins
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def _label_pixels(gpx: np.ndarray, gpy: np.ndarray, val: np.ndarray,
                  connectivity: int = 4):
    """4- or 8-connected CC over sparse pixels; -> label per pixel =
    (root gpx << 32 | root gpy), root = lexicographically smallest pixel.
    (8-connected adds the two forward diagonals, `alg/polygonize.cpp:86`.)"""
    n = len(gpx)
    key = (gpx.astype(np.uint64) << np.uint64(32)) | gpy.astype(np.uint64)
    order = np.argsort(key, kind="stable")
    skey = key[order]
    parent = np.arange(n, dtype=np.int64)

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != i:
            parent[i], i = root, parent[i]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if skey[ra] < skey[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb

    # neighbors: east (gpx+1, gpy), south (gpx, gpy+1); 8-conn adds the
    # forward diagonals (SE, NE)
    sg_x = gpx[order]
    sg_y = gpy[order]
    sval = val[order]
    offsets = ((1, 0), (0, 1)) if connectivity == 4 else ((1, 0), (0, 1), (1, 1), (1, -1))
    for dx, dy in offsets:
        nkey = ((sg_x + dx).astype(np.uint64) << np.uint64(32)) | (sg_y + dy).astype(np.uint64)
        pos = np.searchsorted(skey, nkey)
        ok = (pos < n)
        pos_c = np.clip(pos, 0, n - 1)
        ok &= skey[pos_c] == nkey
        ok &= sval[pos_c] == sval
        for i in np.flatnonzero(ok):
            union(i, pos[i])

    roots = np.asarray([find(i) for i in range(n)], dtype=np.int64)
    labels = skey[roots]
    out = np.empty(n, dtype=np.uint64)
    out[order] = labels
    return out


def label_connected_components(pixels: ray.data.Dataset, connectivity: int = 4,
                               tile_size: int = 256,
                               cc_mode: str = "auto") -> ray.data.Dataset:
    """Sparse pixel rows → labeled pixel rows
    (gpx, gpy, value, region_id); shared by polygonize and sieve.

    connectivity: 4 (GDAL default) or 8 (8CONNECTED option,
    `alg/polygonize.cpp:86`). For 8, border rows at the end of an edge
    group are duplicated into the adjacent group so diagonal pairs
    across tile rows/corners are seen by exactly one group."""
    if connectivity not in (4, 8):
        raise ValueError("connectivity must be 4 or 8")

    tiled = with_tile_cols(pixels, tile_size)

    def label_tile(df: pd.DataFrame) -> pd.DataFrame:
        pix = df["pix_id"].to_numpy().astype(np.uint64)
        z, gpx, gpy = unpack_pixel(pix)
        val = df["burn"].to_numpy()
        labels = _label_pixels(gpx, gpy, val, connectivity)
        return pd.DataFrame({
            "z": z, "gpx": gpx, "gpy": gpy, "value": val,
            "label": labels.astype(np.int64).view(np.uint64),
        })

    labeled = tiled.groupby("tile_id").map_groups(label_tile, batch_format="pandas")
    return merge_tile_labels(labeled, connectivity, tile_size, cc_mode)


def label_binned_counts(partials: ray.data.Dataset,
                        bounds, values,
                        connectivity: int = 4, tile_size: int = 256,
                        cc_mode: str = "auto") -> ray.data.Dataset:
    """Fused rasterize-count ∘ reclassify ∘ tile-label over per-block
    pixel partials (pix_id, burn) — ONE shuffle instead of three.

    The unfused composition (`rasterize_pixels(combine=True)` →
    `reclassify` → `label_connected_components`) shuffles the full
    pixel set twice (pixel-combine groupby, then tile groupby). Keying
    the FIRST shuffle by tile co-locates every partial of a pixel with
    its tile group, so the group function can sum the partials,
    bin the totals (reclassify semantics: value in
    [bounds[i], bounds[i+1]) → values[i]) and run the tile-local
    union-find in one pass; only the border machinery (border rows ≪
    pixels) shuffles again. Same output as the composition."""
    if connectivity not in (4, 8):
        raise ValueError("connectivity must be 4 or 8")
    identity = bounds is None
    if identity:
        bounds_a = values_a = None  # value = summed count, no binning
    else:
        bounds_a = np.asarray(bounds, dtype=np.float64)
        values_a = np.asarray(values, dtype=np.float64)
        if len(values_a) != len(bounds_a) - 1:
            raise ValueError("need len(values) == len(bounds) - 1")

    tiled = with_tile_cols(partials, tile_size)

    def combine_bin_label(df: pd.DataFrame) -> pd.DataFrame:
        pix = df["pix_id"].to_numpy().astype(np.uint64)
        cnt = df["burn"].to_numpy().astype(np.float64)
        order = np.argsort(pix, kind="stable")
        spix, scnt = pix[order], cnt[order]
        starts = np.flatnonzero(np.r_[True, spix[1:] != spix[:-1]])
        upix = spix[starts]
        totals = np.add.reduceat(scnt, starts)
        if identity:
            val = totals
        else:
            idx = np.clip(np.searchsorted(bounds_a, totals, side="right") - 1,
                          0, len(values_a) - 1)
            val = values_a[idx]
        z, gpx, gpy = unpack_pixel(upix)
        labels = _label_pixels(gpx, gpy, val, connectivity)
        return pd.DataFrame({
            "z": z, "gpx": gpx, "gpy": gpy, "value": val,
            "label": labels.astype(np.int64).view(np.uint64),
        })

    labeled = tiled.groupby("tile_id").map_groups(combine_bin_label,
                                                  batch_format="pandas")
    return merge_tile_labels(labeled, connectivity, tile_size, cc_mode)


def merge_tile_labels(labeled: ray.data.Dataset, connectivity: int = 4,
                      tile_size: int = 256,
                      cc_mode: str = "auto") -> ray.data.Dataset:
    """Cross-tile label merge over tile-labeled pixel rows
    (z, gpx, gpy, value, label) → (…, region_id). Stage 2+3 of
    label_connected_components; shared by the fused entry points."""
    # Two consumers read `labeled` (the border branch and the final
    # relabel pass). Without pinning, Ray re-executes the tile-groupby
    # lineage once per consumer — the widest shuffle in the operator,
    # twice. Materialize pins the labeled blocks in the object store
    # (spillable), which is the multi-consumer branching pattern, not a
    # driver-side collection.
    labeled = labeled.materialize()
    # Border adjacency pairs: boundary pixels meet under a shared edge key.
    def border_rows(batch: pa.Table) -> pa.Table:
        gpx = batch["gpx"].to_numpy(zero_copy_only=False)
        gpy = batch["gpy"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        lab = batch["label"].to_numpy(zero_copy_only=False)
        ts = tile_size
        rows = []
        # vertical edges: pixel on east border (side 0) or west border (side 1)
        east = (gpx % ts) == ts - 1
        west = (gpx % ts) == 0
        north = (gpy % ts) == 0
        south = (gpy % ts) == ts - 1
        def emit(mask, edge_axis, edge_coord, pos, side):
            idx = np.flatnonzero(mask)
            if not len(idx):
                return
            grps = [(idx, (pos[idx] // ts).astype(np.int64))]
            if connectivity == 8:
                # duplicate group-boundary rows into the adjacent group so
                # diagonal pairs across tile rows/corners co-locate
                lo = idx[(pos[idx] % ts == 0) & (pos[idx] // ts > 0)]
                hi = idx[pos[idx] % ts == ts - 1]
                if len(lo):
                    grps.append((lo, (pos[lo] // ts - 1).astype(np.int64)))
                if len(hi):
                    grps.append((hi, (pos[hi] // ts + 1).astype(np.int64)))
            for sub, grp in grps:
                rows.append(pa.table({
                    "edge": pa.array(
                        (np.full(len(sub), edge_axis, dtype=np.uint64) << np.uint64(62))
                        | (edge_coord[sub].astype(np.uint64) << np.uint64(31))
                        | grp.astype(np.uint64)),
                    "pos": pa.array(pos[sub]),
                    "side": pa.array(np.full(len(sub), side, dtype=np.int8)),
                    "value": pa.array(val[sub]),
                    "label": pa.array(lab[sub]),
                }))
        # vertical edge id: x boundary line at gpx+1 (east) / gpx (west), tile row
        emit(east, 0, (gpx + 1) // ts, gpy, 0)
        emit(west, 0, gpx // ts, gpy, 1)
        # horizontal edge id: y boundary at gpy+1 (south) / gpy (north), tile col
        emit(south, 1, (gpy + 1) // ts, gpx, 0)
        emit(north, 1, gpy // ts, gpx, 1)
        if not rows:
            return pa.table({"edge": pa.array([], pa.uint64()),
                             "pos": pa.array([], pa.int64()),
                             "side": pa.array([], pa.int8()),
                             "value": pa.array([], pa.float64()),
                             "label": pa.array([], pa.uint64())})
        return pa.concat_tables(rows)

    borders = labeled.map_batches(border_rows, batch_format="pyarrow")

    def edge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0].drop_duplicates(subset=["pos", "label"])
        b = df[df["side"] == 1].drop_duplicates(subset=["pos", "label"])
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"la": pd.Series(dtype=np.uint64),
                                 "lb": pd.Series(dtype=np.uint64)})
        shifts = (0,) if connectivity == 4 else (0, 1, -1)
        outs = []
        for s in shifts:
            bb = b.copy()
            bb["pos"] = bb["pos"] + s
            m = a.merge(bb, on="pos", suffixes=("_a", "_b"))
            m = m[m["value_a"] == m["value_b"]]
            if len(m):
                outs.append(pd.DataFrame({
                    "la": m["label_a"].to_numpy(dtype=np.uint64),
                    "lb": m["label_b"].to_numpy(dtype=np.uint64)}))
        if not outs:
            return pd.DataFrame({"la": pd.Series(dtype=np.uint64),
                                 "lb": pd.Series(dtype=np.uint64)})
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    pairs = borders.groupby("edge").map_groups(edge_pairs, batch_format="pandas")

    # Cross-tile merge. The label graph has one node per BORDER-TOUCHING
    # component (<< pixel count). Two resolution paths:
    # * task union-find (default): the pair blocks concat + union-find
    #   inside ONE Ray task — never on the driver; the relabel map ref
    #   broadcasts to the relabel actors. Bounded by border-component
    #   count in one worker's heap.
    # * distributed min-label propagation (cc_mode="labelprop" or auto
    #   beyond ~5M edges): O(log n) rounds of edge-join + pointer
    #   jumping, no single-node graph at all (see _cc_root_map).
    pairs = pairs.materialize()
    if cc_mode == "labelprop" or (cc_mode == "auto"
                                  and pairs.count() > 5_000_000):
        root_map = _cc_root_map(pairs)

        def lab64(batch: pa.Table) -> pa.Table:
            lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.drop_columns(["label"]).append_column(
                "label", pa.array(lab))

        from .relational import bucket_lookup_join

        # bucket lookup instead of native Dataset.join: root_map ends in
        # a Sort-derived map_groups whose empty blocks break the native
        # join's partition aggregators (NOTES lesson W)
        rm = root_map.map_batches(
            lambda b: pa.table({"label": b["label"], "root": b["root"]}),
            batch_format="pyarrow")
        joined = bucket_lookup_join(
            labeled.map_batches(lab64, batch_format="pyarrow"), rm,
            on="label", how="left")

        def finish(batch: pa.Table) -> pa.Table:
            lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            isnull = pa.compute.is_null(batch["root"]).to_numpy(zero_copy_only=False)
            root = pa.compute.fill_null(batch["root"], 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            out = np.where(isnull, lab, root).astype(np.uint64)
            return (batch.drop_columns(["label", "root"])
                    .append_column("region_id", pa.array(out)))

        return joined.map_batches(finish, batch_format="pyarrow")

    pair_blocks = pairs.to_arrow_refs()

    @ray.remote
    def _uf_task(*blocks: pa.Table):
        uf = UnionFind()
        for b in blocks:
            if len(b) == 0 or "la" not in b.column_names:
                continue
            for la, lb in zip(b["la"].to_numpy(zero_copy_only=False),
                              b["lb"].to_numpy(zero_copy_only=False)):
                uf.union(int(la), int(lb))
        return {x: uf.find(x) for x in uf.parent}

    relabel_ref = _uf_task.remote(*pair_blocks)

    # Task-pool relabel with a per-worker-process cache (not an actor
    # pool: the stage is short and pool cold-start dominates — NOTES
    # perf lesson 21). The root map is fetched once per worker and
    # compiled to sorted key/value arrays for vectorized searchsorted
    # lookup; labels absent from the map keep their tile-local label.
    def _compile_map(m: dict):
        if not m:
            return None
        keys = np.fromiter(m.keys(), dtype=np.uint64, count=len(m))
        vals = np.fromiter(m.values(), dtype=np.uint64, count=len(m))
        order = np.argsort(keys)
        return keys[order], vals[order]

    def relabel(batch: pa.Table, *, _ref=relabel_ref) -> pa.Table:
        from ..state.worker_cache import get_or_build

        compiled = get_or_build("ccroot:" + _ref.hex(),
                                lambda: _compile_map(ray.get(_ref)))
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if compiled is None or len(lab) == 0:
            out = lab
        else:
            keys, vals = compiled
            idx = np.searchsorted(keys, lab)
            idx[idx >= len(keys)] = 0
            hit = keys[idx] == lab
            out = np.where(hit, vals[idx], lab)
        return batch.drop_columns(["label"]).append_column(
            "region_id", pa.array(out))

    return labeled.map_batches(relabel, batch_format="pyarrow")


def _cc_lookup(requests: ray.data.Dataset, values: ray.data.Dataset,
               n_buckets: int) -> ray.data.Dataset:
    """Distributed key lookup as ONE bounded-bucket groupby (the bb_mod
    idiom): requests (k, p, pr) resolve k against values (k -> v),
    emitting (label=p, root=v) — or (label=p, root=pr fallback) when k
    has no value row. Avoids Dataset.join entirely (native hash-join
    partition aggregators break on empty partitions and hold one CPU
    each — NOTES lessons); each bucket's kernel is a vectorized
    searchsorted over its co-partitioned value rows."""
    C = np.uint64(0x9E3779B97F4A7C15)

    def tag(kind: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
            bb = ((k.astype(np.uint64) * C) >> np.uint64(40)) % np.uint64(n_buckets)
            return pa.table({
                "k": pa.array(k),
                "p": batch["p"],
                "pr": batch["pr"],
                "kind": pa.array(np.full(len(k), kind, dtype=np.int8)),
                "__bb": pa.array(bb.astype(np.int64)),
            })
        return fn

    both = requests.map_batches(tag(0), batch_format="pyarrow").union(
        values.map_batches(tag(1), batch_format="pyarrow"))

    def resolve(tbl: pa.Table) -> pa.Table:
        kind = tbl["kind"].to_numpy(zero_copy_only=False)
        k = tbl["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = tbl["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = tbl["pr"].to_numpy(zero_copy_only=False).astype(np.int64)
        vm = kind == 1
        rm = ~vm
        vk, vv = k[vm], p[vm]
        order = np.argsort(vk, kind="stable")
        vk, vv = vk[order], vv[order]
        rk, rp, rpr = k[rm], p[rm], pr[rm]
        if len(vk):
            idx = np.clip(np.searchsorted(vk, rk), 0, len(vk) - 1)
            hit = vk[idx] == rk
            root = np.where(hit, vv[idx], rpr)
        else:
            root = rpr
        return pa.table({"label": pa.array(rp), "root": pa.array(root)})

    return both.groupby("__bb").map_groups(resolve, batch_format="pyarrow")


def _cc_root_map(pairs: ray.data.Dataset, max_rounds: int = 30,
                 n_buckets: int = 256) -> ray.data.Dataset:
    """(la, lb) edge rows -> (label, root) rows: distributed connected
    components by min-label propagation + pointer jumping (the
    hash-to-min / pointer-jump scheme of the distributed-CC literature,
    e.g. Kiveris et al. 'Connected Components in MapReduce'). Converges
    in O(log n) rounds; each round is three bounded-bucket groupbys
    (propagate-lookup, min-merge, jump-lookup), all in the object
    store — no driver-side graph, no native hash join."""
    from ray.data.aggregate import Min, Sum

    # int64 throughout: Ray aggregates normalize unsigned keys, and the
    # packed labels use < 63 bits (z <= 21 at 256px tiles)
    def both(batch: pa.Table) -> pa.Table:
        la = batch["la"].to_numpy(zero_copy_only=False).astype(np.int64)
        lb = batch["lb"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"x": pa.array(np.concatenate([la, lb])),
                         "y": pa.array(np.concatenate([lb, la]))})

    edges = pairs.map_batches(both, batch_format="pyarrow").materialize()
    # initial root: min(self, neighbors)
    m = edges.groupby("x").aggregate(Min("y", alias_name="root"))

    def clamp_self(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["root"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"label": pa.array(x),
                         "root": pa.array(np.minimum(x, r))})

    m = m.map_batches(clamp_self, batch_format="pyarrow").materialize()

    def edge_req(batch: pa.Table) -> pa.Table:
        # x asks for root(y); no fallback needed (every endpoint has a
        # value row), pr = int64 max so a miss can never win the Min
        n = len(batch)
        return pa.table({"k": batch["y"], "p": batch["x"],
                         "pr": pa.array(np.full(n, np.iinfo(np.int64).max))})

    def m_val(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch["label"], "p": batch["root"],
                         "pr": batch["root"]})

    def jump_req(batch: pa.Table) -> pa.Table:
        # label asks for root(root); fallback = own current root
        return pa.table({"k": batch["root"], "p": batch["label"],
                         "pr": batch["root"]})

    prev_sum = None
    for _ in range(max_rounds):
        # propagate roots across edges: label x gains candidate root(y)
        cand = _cc_lookup(edges.map_batches(edge_req, batch_format="pyarrow"),
                          m.map_batches(m_val, batch_format="pyarrow"),
                          n_buckets)
        merged = m.union(cand).groupby("label").aggregate(
            Min("root", alias_name="root")).materialize()
        # pointer jump: root <- root's root
        m = _cc_lookup(merged.map_batches(jump_req, batch_format="pyarrow"),
                       merged.map_batches(m_val, batch_format="pyarrow"),
                       n_buckets).materialize()
        s = m.aggregate(Sum("root"))["sum(root)"]
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    return m


def polygonize_wkb(pixels: ray.data.Dataset, connectivity: int = 4,
                   tile_size: int = 256) -> ray.data.Dataset:
    """Full polygonize: region rows with traced WKB polygon geometry
    (outer ring + holes, pixel coordinates — `geom/rings.py`, the
    edge-cancel equivalent of GDAL's two-arm follower,
    `alg/polygonize_polygonizer.cpp`)."""
    from ..geom.rings import region_to_wkb

    relabeled = label_connected_components(pixels, connectivity, tile_size)

    def to_poly(df: pd.DataFrame) -> pd.DataFrame:
        gpx = df["gpx"].to_numpy(dtype=np.int64)
        gpy = df["gpy"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "region_id": [np.uint64(df["region_id"].iloc[0])],
            "value": [float(df["value"].iloc[0])],
            "n_pixels": [len(df)],
            "geometry": [region_to_wkb(gpx, gpy)],
        })

    return relabeled.groupby("region_id").map_groups(to_poly, batch_format="pandas")


def polygonize(pixels: ray.data.Dataset, connectivity: int = 4,
               tile_size: int = 256,
               shuffle_partitions=None) -> ray.data.Dataset:
    """Sparse pixel rows (pix_id, burn) → region rows
    (region_id, value, n_pixels, gpx_min, gpy_min, gpx_max, gpy_max)."""
    relabeled = label_connected_components(pixels, connectivity, tile_size)
    return regions_from_labels(relabeled, shuffle_partitions)


def regions_from_labels(relabeled: ray.data.Dataset,
                        shuffle_partitions=None) -> ray.data.Dataset:
    """Labeled pixel rows → one region row per component
    (region_id, value, n_pixels, global-pixel bbox).

    In-batch partial aggregation first: regions are tile-local, so the
    per-block group_by collapses the pixel rows to ~one partial per
    (region, block) before the cross-block shuffle — the groupby then
    moves region partials, not pixels. shuffle_partitions: LOCAL tree
    combine of the (small) partials in one block — valid only when the
    region table fits one block (bounded rasters; same contract as
    rasterize.combine_pixel_partials); leave None for the scalable
    groupby."""
    from ray.data.aggregate import Max, Min, Sum

    _PARTIAL_AGGS = [("value", "min"), ("n_pixels", "sum"),
                     ("gpx_min", "min"), ("gpy_min", "min"),
                     ("gpx_max", "max"), ("gpy_max", "max")]
    names = ["region_id", "value", "n_pixels", "gpx_min", "gpy_min",
             "gpx_max", "gpy_max"]

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({c: batch[c] for c in
                      ("region_id", "value", "gpx", "gpy")})
        g = t.group_by(["region_id"]).aggregate([
            ("value", "min"), ([], "count_all"),
            ("gpx", "min"), ("gpy", "min"),
            ("gpx", "max"), ("gpy", "max")])
        return g.rename_columns(names)

    partials = relabeled.map_batches(partial, batch_format="pyarrow")
    if shuffle_partitions:
        def combine(batch: pa.Table) -> pa.Table:
            g = batch.group_by(["region_id"]).aggregate(_PARTIAL_AGGS)
            return g.rename_columns(names)

        return partials.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None)
    return partials.groupby("region_id").aggregate(
        Min("value", alias_name="value"),
        Sum("n_pixels", alias_name="n_pixels"),
        Min("gpx_min", alias_name="gpx_min"),
        Min("gpy_min", alias_name="gpy_min"),
        Max("gpx_max", alias_name="gpx_max"),
        Max("gpy_max", alias_name="gpy_max"),
    )
