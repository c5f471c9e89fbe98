"""kNN lookup with cell-ring expansion.

Reference semantics: GDAL gridding's nearest-neighbor searches walk a
CPLQuadTree with growing search radius (`alg/gdalgrid.cpp:853-900`,
quadtree build `:2688-2728`). Here the index is a grid-cell bucketed
site table broadcast to every actor; per point we gather candidate
sites ring-by-ring (`geom.cells.ring_cells`) and stop once the k-th
nearest distance is provably inside the searched ring span (ring r
guarantees every unseen site is > (r-1)*res away in Chebyshev degrees,
hence > that in euclidean too).

Metric: euclidean in lon/lat degree space (documented engine contract;
exactly mirrorable in a SQL oracle). Ties broken by site id.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..geom import cells


class SiteIndex:
    """Grid-bucketed point index, built once per actor."""

    def __init__(self, site_table: pa.Table, id_col: str, lon_col: str, lat_col: str,
                 res: float):
        self.res = res
        ids = site_table[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = site_table[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = site_table[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        by_id = np.argsort(ids, kind="stable")  # id order ⇒ stable-sort tie-break = id tie-break
        self.ids, self.x, self.y = ids[by_id], x[by_id], y[by_id]
        cell = cells.grid_cell(self.x, self.y, res)
        order = np.argsort(cell, kind="stable")
        self._order = order
        sorted_cells = cell[order]
        uniq, starts = np.unique(sorted_cells, return_index=True)
        self._cells = uniq
        self._starts = np.append(starts, len(order))
        self.n = len(self.ids)

    def sites_in_cell(self, cell: int) -> np.ndarray:
        i = np.searchsorted(self._cells, cell)
        if i >= len(self._cells) or self._cells[i] != cell:
            return np.empty(0, dtype=np.int64)
        return self._order[self._starts[i]:self._starts[i + 1]]

    def knn_cell(self, px: np.ndarray, py: np.ndarray, cell: int, k: int,
                 max_rings: int = 512):
        """kNN for a group of points sharing one grid cell.

        Expands cell rings until every point's k-th distance is within
        the guaranteed-searched radius: after finishing ring r, every
        unseen site is > r*res degrees away (Chebyshev lower bound) —
        the quadtree ring-expansion invariant of alg/gdalgrid.cpp.

        -> (idx (m,k) site row indices ordered by (dist², id), d2 (m,k)).
        """
        k = min(k, self.n)
        gathered: list = []
        n_cand = 0
        r = 0
        d2 = None
        cand = None
        while r <= max_rings:
            for c in cells.ring_cells(cell, r, self.res):
                s = self.sites_in_cell(int(c))
                if len(s):
                    gathered.append(s)
                    n_cand += len(s)
            if n_cand >= k:
                cand = np.sort(np.concatenate(gathered))  # id-ascending
                d2 = (px[:, None] - self.x[cand][None, :]) ** 2 + \
                     (py[:, None] - self.y[cand][None, :]) ** 2
                kth = np.partition(d2, k - 1, axis=1)[:, k - 1]
                if kth.max() <= (r * self.res) ** 2 or n_cand == self.n:
                    break
            r += 1
        if cand is None:  # fewer sites than k in the whole index
            cand = np.sort(np.concatenate(gathered)) if gathered else np.empty(0, np.int64)
            d2 = (px[:, None] - self.x[cand][None, :]) ** 2 + \
                 (py[:, None] - self.y[cand][None, :]) ** 2
            k = len(cand)
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]  # stable ⇒ id tie-break
        rows = np.arange(len(px))[:, None]
        return cand[order], d2[rows, order]

    def knn_brute(self, px: np.ndarray, py: np.ndarray, k: int):
        """Fully vectorized exact path for small site tables."""
        k = min(k, self.n)
        d2 = (px[:, None] - self.x[None, :]) ** 2 + (py[:, None] - self.y[None, :]) ** 2
        order = np.argsort(d2, axis=1, kind="stable")[:, :k]
        rows = np.arange(len(px))[:, None]
        return order, d2[rows, order]


class _KnnJoiner:
    def __init__(self, wrapped_ref, id_col, lon_col, lat_col, res, k, pt_lon, pt_lat):
        table = ray.get(wrapped_ref["ref"])
        self.index = SiteIndex(table, id_col, lon_col, lat_col, res)
        self.k = k
        self.pt_lon, self.pt_lat = pt_lon, pt_lat

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.pt_lon].to_numpy(zero_copy_only=False)
        py = batch[self.pt_lat].to_numpy(zero_copy_only=False)
        n = len(batch)
        k = min(self.k, self.index.n)
        if self.index.n <= 4096:
            idx, d2 = self.index.knn_brute(px, py, k)
        else:
            # group batch points by cell; one vectorized ring search per cell
            cell = cells.grid_cell(px, py, self.index.res)
            order = np.argsort(cell, kind="stable")
            idx = np.empty((n, k), dtype=np.int64)
            d2 = np.empty((n, k), dtype=np.float64)
            uniq, starts = np.unique(cell[order], return_index=True)
            bounds = np.append(starts, n)
            for u in range(len(uniq)):
                rows = order[bounds[u]:bounds[u + 1]]
                ci, cd = self.index.knn_cell(px[rows], py[rows], int(uniq[u]), k)
                idx[rows], d2[rows] = ci, cd
        all_row = np.repeat(np.arange(n, dtype=np.int64), k)
        out = batch.take(pa.array(all_row))
        out = out.append_column("neighbor_id", pa.array(self.index.ids[idx.ravel()]))
        out = out.append_column("rank", pa.array(np.tile(np.arange(1, k + 1, dtype=np.int32), n)))
        out = out.append_column("dist2", pa.array(d2.ravel()))
        return out


def shuffle_knn_join(points: ray.data.Dataset, sites: ray.data.Dataset, k: int,
                     site_id_col: str, site_lon_col: str, site_lat_col: str,
                     res: float = 5.0, max_ring: int = 4,
                     lon_col: str = "lon", lat_col: str = "lat",
                     point_id_col: str = "pid",
                     hot_cells: Optional[dict] = None,
                     auto_salt: bool = False,
                     hot_threshold: int = 1_000_000) -> ray.data.Dataset:
    """Both-sides-large kNN: co-partition by grid cell with ring-`r`
    site replication, refine per cell, and guarantee exactness by a
    bound check (SURVEY §7.3 "kNN ring round 2").

    Round r ∈ {1, 2, …}: sites are replicated to all cells within
    Chebyshev ring distance r (`flat_map` explode), points keyed by
    their own cell; one `groupby(cell)` co-partitions; per cell a
    vectorized brute kNN runs over the gathered sites. A point's result
    is PROVEN exact when its k-th distance ≤ (r·res)² — the minimum
    possible distance to any site outside the searched rings.
    Unsatisfied points re-run with doubled r (bounded by max_ring; the
    final round accepts best-effort and reports `exact=False`).

    Skew: `hot_cells` ({cell_id: n_salts} from
    `spatial_join.precount_cells`, or auto_salt=True to pre-count here)
    splits a hot cell's POINTS across salt sub-keys and replicates the
    cell's gathered SITES to every salt — a dense urban cell becomes
    n_salts bounded groups instead of one quadratic one (exactness
    unchanged: every point still sees every ring site of its cell).

    Returns (point cols…, neighbor_id, rank, dist2, exact).
    """
    import pandas as pd

    from ..geom import cells as cellsm

    if auto_salt and hot_cells is None:
        from .spatial_join import precount_cells

        hot_cells = precount_cells(points, res, lon_col=lon_col,
                                   lat_col=lat_col, hot_threshold=hot_threshold)
    hot = hot_cells or {}

    def _salts_for(cc: np.ndarray) -> np.ndarray:
        reps = np.ones(len(cc), dtype=np.int64)
        for c, nsalt in hot.items():
            reps[cc == np.uint64(c)] = int(nsalt)
        return reps

    remaining = points
    results = []
    r = 1
    while True:
        final_round = (r * 2 > max_ring)

        def site_explode(batch: pa.Table, rr=r) -> pa.Table:
            sx = batch[site_lon_col].to_numpy(zero_copy_only=False)
            sy = batch[site_lat_col].to_numpy(zero_copy_only=False)
            sid = batch[site_id_col].to_numpy(zero_copy_only=False)
            home = cellsm.grid_cell(sx, sy, res)
            out_cell, out_idx = [], []
            for i, c in enumerate(home):
                covered = [cellsm.ring_cells(int(c), rad, res) for rad in range(rr + 1)]
                cc = np.concatenate(covered)
                out_cell.append(cc)
                out_idx.append(np.full(len(cc), i, dtype=np.int64))
            if not out_cell:
                return pa.table({"cell": pa.array([], pa.uint64()),
                                 "sid": pa.array([], pa.int64()),
                                 "sx": pa.array([], pa.float64()),
                                 "sy": pa.array([], pa.float64()),
                                 "side": pa.array([], pa.int8())})
            cc = np.concatenate(out_cell)
            ii = np.concatenate(out_idx)
            # replicate to every salt of each (hot) covered cell
            reps = _salts_for(cc)
            tot = int(reps.sum())
            rix = np.repeat(np.arange(len(cc), dtype=np.int64), reps)
            salts = (np.arange(tot, dtype=np.int64)
                     - np.repeat(np.cumsum(reps) - reps, reps)).astype(np.uint64)
            key = (cc[rix] << np.uint64(6)) | salts
            ii = ii[rix]
            return pa.table({
                "cell": pa.array(key),
                "sid": pa.array(sid[ii].astype(np.int64)),
                "sx": pa.array(sx[ii]), "sy": pa.array(sy[ii]),
                "side": pa.array(np.ones(len(key), dtype=np.int8)),
            })

        def point_key(batch: pa.Table) -> pa.Table:
            px = batch[lon_col].to_numpy(zero_copy_only=False)
            py = batch[lat_col].to_numpy(zero_copy_only=False)
            pid = batch[point_id_col].to_numpy(zero_copy_only=False)
            cell = cellsm.grid_cell(px, py, res)
            salt = np.zeros(len(cell), dtype=np.uint64)
            for c, nsalt in hot.items():
                m = cell == np.uint64(c)
                if m.any():  # deterministic: salt by point id
                    salt[m] = (pid[m].astype(np.uint64)) % np.uint64(int(nsalt))
            key = (cell << np.uint64(6)) | salt
            return pa.table({
                "cell": pa.array(key),
                "sid": pa.array(pid.astype(np.int64)),  # reuse col as point id
                "sx": pa.array(px), "sy": pa.array(py),
                "side": pa.array(np.zeros(len(px), dtype=np.int8)),
            })

        both = remaining.map_batches(point_key, batch_format="pyarrow").union(
            sites.map_batches(site_explode, batch_format="pyarrow"))

        bound2 = (r * res) ** 2

        def cell_knn(tbl: pa.Table, fr=final_round) -> pa.Table:
            side = tbl["side"].to_numpy(zero_copy_only=False)
            pts = tbl.filter(pa.array(side == 0))
            sts = tbl.filter(pa.array(side == 1))
            empty = pa.table({
                "pid": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int32()),
                "dist2": pa.array([], type=pa.float64()),
                "exact": pa.array([], type=pa.bool_()),
            })
            if len(pts) == 0:
                return empty
            pid = pts["sid"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(sts) == 0:
                if not fr:
                    n = len(pid)
                    return pa.table({
                        "pid": pa.array(pid),
                        "neighbor_id": pa.array(np.full(n, -1, dtype=np.int64)),
                        "rank": pa.array(np.zeros(n, dtype=np.int32)),
                        "dist2": pa.array(np.full(n, np.inf)),
                        "exact": pa.array(np.zeros(n, dtype=bool)),
                    })
                return empty
            sid_all = sts["sid"].to_numpy(zero_copy_only=False).astype(np.int64)
            sid, first = np.unique(sid_all, return_index=True)
            sx = sts["sx"].to_numpy(zero_copy_only=False)[first]
            sy = sts["sy"].to_numpy(zero_copy_only=False)[first]
            px = pts["sx"].to_numpy(zero_copy_only=False)
            py = pts["sy"].to_numpy(zero_copy_only=False)
            kk = min(k, len(sid))
            d2 = (px[:, None] - sx[None, :]) ** 2 + (py[:, None] - sy[None, :]) ** 2
            n_p = len(px)
            # O(s) selection instead of a full argsort: partition for the
            # kk-th distance, keep the <=kth superset (boundary ties
            # included), then one lexsort by (row, dist, site index) —
            # identical output to a stable argsort (ties -> smaller sid).
            if d2.shape[1] > kk:
                kth_part = np.partition(d2, kk - 1, axis=1)[:, kk - 1:kk]
                rows_c, cols_c = np.nonzero(d2 <= kth_part)
            else:
                rows_c = np.repeat(np.arange(n_p, dtype=np.int64), d2.shape[1])
                cols_c = np.tile(np.arange(d2.shape[1], dtype=np.int64), n_p)
            vals_c = d2[rows_c, cols_c]
            ordk = np.lexsort((cols_c, vals_c, rows_c))
            rows_s, cols_s, vals_s = rows_c[ordk], cols_c[ordk], vals_c[ordk]
            firsts = np.searchsorted(rows_s, np.arange(n_p))
            posin = np.arange(len(rows_s), dtype=np.int64) - firsts[rows_s]
            selm = posin < kk
            top = cols_s[selm].reshape(n_p, kk)
            topd = vals_s[selm].reshape(n_p, kk)
            kth = topd[:, -1]
            exact = (kth <= bound2) & (kk == k)
            return pa.table({
                "pid": pa.array(np.repeat(pid, kk)),
                "neighbor_id": pa.array(sid[top].ravel()),
                "rank": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int32), len(px))),
                "dist2": pa.array(topd.ravel()),
                "exact": pa.array(np.repeat(exact | fr, kk)),
            })

        round_out = both.groupby("cell").map_groups(cell_knn, batch_format="pyarrow")
        round_out = round_out.materialize()
        ok = round_out.map_batches(
            lambda t: t.filter(pa.compute.and_(t["exact"],
                                               pa.compute.not_equal(t["rank"], 0))),
            batch_format="pyarrow")
        results.append(ok)
        bad = round_out.map_batches(
            lambda t: t.filter(pa.compute.invert(t["exact"])), batch_format="pyarrow")
        n_bad = bad.count()
        if n_bad == 0 or final_round:
            break
        # gather unsatisfied point ids INSIDE a task from block refs —
        # the id array goes block store -> task -> object store without
        # a driver-side Python set (VERDICT r1 item 6).
        bad_blocks = bad.select_columns(["pid"]).to_arrow_refs()

        @ray.remote
        def _collect_ids(*blocks: pa.Table) -> np.ndarray:
            if not blocks:
                return np.empty(0, dtype=np.int64)
            return np.unique(np.concatenate(
                [b["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
                 for b in blocks]))

        bad_ref = _collect_ids.remote(*bad_blocks)

        class KeepBad:
            def __init__(self, wrapped):
                self.ids = ray.get(wrapped["ref"])

            def __call__(self, batch: pa.Table) -> pa.Table:
                pid = batch[point_id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                return batch.filter(pa.array(np.isin(pid, self.ids)))

        kb_key = bad_ref.hex() + ":knn_keepbad"

        def keepbad_stage(batch: pa.Table, _key=kb_key, _ref=bad_ref) -> pa.Table:
            from ..state.worker_cache import get_or_build

            return get_or_build(_key, lambda: KeepBad({"ref": _ref}))(batch)

        remaining = points.map_batches(keepbad_stage, batch_format="pyarrow")
        r *= 2

    out = results[0]
    for extra in results[1:]:
        out = out.union(extra)
    return out


def knn_join(points: ray.data.Dataset, sites: pa.Table, k: int,
             site_id_col: str, site_lon_col: str, site_lat_col: str,
             res: float = 5.0,
             lon_col: str = "lon", lat_col: str = "lat",
             concurrency: Union[int, Tuple[int, int]] = (1, 16)) -> ray.data.Dataset:
    """For each point row emit k rows (neighbor_id, rank, dist2).

    Task-pool stage with a per-worker SiteIndex cache (see
    broadcast_pip_join; `concurrency` kept for API compat)."""
    ref = ray.put(sites)
    key = ref.hex()

    def joiner(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _KnnJoiner(
            {"ref": ref}, site_id_col, site_lon_col, site_lat_col,
            res, k, lon_col, lat_col))
        return j(batch)

    return points.map_batches(joiner, batch_format="pyarrow")
