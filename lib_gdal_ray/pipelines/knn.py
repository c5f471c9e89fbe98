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

from typing import Tuple, Union

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


def knn_join(points: ray.data.Dataset, sites: pa.Table, k: int,
             site_id_col: str, site_lon_col: str, site_lat_col: str,
             res: float = 5.0,
             lon_col: str = "lon", lat_col: str = "lat",
             concurrency: Union[int, Tuple[int, int]] = (1, 16)) -> ray.data.Dataset:
    """For each point row emit k rows (neighbor_id, rank, dist2)."""
    ref = ray.put(sites)
    return points.map_batches(
        _KnnJoiner,
        batch_format="pyarrow",
        fn_constructor_args=({"ref": ref}, site_id_col, site_lon_col, site_lat_col,
                             res, k, lon_col, lat_col),
        concurrency=concurrency,
    )
