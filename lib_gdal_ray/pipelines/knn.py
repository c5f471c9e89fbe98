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
        self.ids = site_table[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        self.x = site_table[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        self.y = site_table[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
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

    def knn(self, px: float, py: float, k: int, max_rings: int = 512):
        """-> (site_row_indices sorted by (dist², id), dists²)."""
        gathered: list = []
        r = 0
        cell = int(cells.grid_cell(np.asarray([px]), np.asarray([py]), self.res)[0])
        best: Tuple[np.ndarray, np.ndarray] = (np.empty(0, np.int64), np.empty(0, np.float64))
        while r <= max_rings:
            ring = cells.ring_cells(cell, r, self.res)
            for c in ring:
                s = self.sites_in_cell(int(c))
                if len(s):
                    gathered.append(s)
            if gathered:
                cand = np.concatenate(gathered)
                d2 = (self.x[cand] - px) ** 2 + (self.y[cand] - py) ** 2
                order = np.lexsort((self.ids[cand], d2))
                cand, d2 = cand[order], d2[order]
                top = cand[:k]
                topd = d2[:k]
                # stop when the k-th distance is within the guaranteed-searched
                # radius: every unseen site is at least r*res degrees away
                # (Chebyshev lower bound from ring distance).
                if len(top) == k and topd[-1] <= (r * self.res) ** 2:
                    return top, topd
                best = (top, topd)
            if len(gathered) and len(best[0]) == k and r > 0:
                # keep expanding until bound satisfied
                pass
            r += 1
            if r > max_rings:
                break
        return best


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
        k = self.k
        all_idx = np.empty(n * k, dtype=np.int64)
        all_d2 = np.empty(n * k, dtype=np.float64)
        all_rank = np.empty(n * k, dtype=np.int32)
        all_row = np.empty(n * k, dtype=np.int64)
        pos = 0
        for i in range(n):
            idx, d2 = self.index.knn(px[i], py[i], k)
            m = len(idx)
            all_idx[pos:pos + m] = idx
            all_d2[pos:pos + m] = d2
            all_rank[pos:pos + m] = np.arange(1, m + 1)
            all_row[pos:pos + m] = i
            pos += m
        all_idx, all_d2 = all_idx[:pos], all_d2[:pos]
        all_rank, all_row = all_rank[:pos], all_row[:pos]
        out = batch.take(pa.array(all_row))
        out = out.append_column("neighbor_id", pa.array(self.index.ids[all_idx]))
        out = out.append_column("rank", pa.array(all_rank))
        out = out.append_column("dist2", pa.array(all_d2))
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
