"""Grid interpolation (points → raster): inverse-distance weighting.

Reference: `alg/gdalgrid.cpp` — invdist (`:109`), invdistnn
(per-kNN variant, `:629`), nearest (`:879`), with CPLQuadTree neighbor
search (`:2688-2728`). Here:

* output pixels are generated as a streamed Dataset of global-pixel
  rows (no driver-side loops);
* the site table is broadcast once (`ray.put`); each batch computes
  IDW fully vectorized — `mode="all"` is one matmul-style broadcast
  against every site (exact; the SQL-oracle-able flavor),
  `mode="knn"` restricts to the k nearest via the shared SiteIndex
  (cell-ring expansion — the scale path for large site tables);
* the epsilon in `w = 1/(d² + eps)` sidesteps the exact-hit
  singularity identically on both engine and oracle sides.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .knn import SiteIndex
from .rasterize import pack_pixel

EPS = 1e-12


def pixel_centers_lonlat(gpx: np.ndarray, gpy: np.ndarray, z: int,
                         tile_size: int = 256):
    """Global pixel center → lon/lat (WebMercator inverse). The exact
    expression is mirrored in the SQL oracle — keep in sync."""
    m = (1 << z) * tile_size
    lon = (gpx + 0.5) / m * 360.0 - 180.0
    lat = np.degrees(2.0 * np.arctan(np.exp(np.pi * (1.0 - 2.0 * (gpy + 0.5) / m))) - np.pi / 2.0)
    return lon, lat


def pixel_window(z: int, gx0: int, gy0: int, nx: int, ny: int,
                 tile_size: int = 256,
                 override_num_blocks: Optional[int] = None) -> ray.data.Dataset:
    """Streamed Dataset of output pixel rows for a window (no driver loop)."""

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gpx = gx0 + idx % nx
        gpy = gy0 + idx // nx
        return pa.table({
            "pix_id": pa.array(pack_pixel(z, gpx, gpy)),
            "gpx": pa.array(gpx),
            "gpy": pa.array(gpy),
        })

    return ray.data.range(nx * ny, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="pyarrow")


class _IdwStage:
    def __init__(self, wrapped, z, tile_size, power, mode, k, res):
        data = ray.get(wrapped["ref"])
        self.sx = data["x"]
        self.sy = data["y"]
        self.sv = data["v"]
        self.z, self.tile_size = z, tile_size
        self.power, self.mode, self.k = power, mode, k
        if mode == "knn":
            tbl = pa.table({"id": pa.array(np.arange(len(self.sx), dtype=np.int64)),
                            "x": pa.array(self.sx), "y": pa.array(self.sy)})
            self.index = SiteIndex(tbl, "id", "x", "y", res)

    def __call__(self, batch: pa.Table) -> pa.Table:
        gpx = batch["gpx"].to_numpy(zero_copy_only=False)
        gpy = batch["gpy"].to_numpy(zero_copy_only=False)
        lon, lat = pixel_centers_lonlat(gpx, gpy, self.z, self.tile_size)
        if self.mode == "all":
            dx = lon[:, None] - self.sx[None, :]
            dy = lat[:, None] - self.sy[None, :]
            d2 = dx * dx + dy * dy
            if self.power == 2:
                w = 1.0 / (d2 + EPS)
            else:
                w = 1.0 / (np.power(d2, self.power / 2.0) + EPS)
            val = (w * self.sv[None, :]).sum(axis=1) / w.sum(axis=1)
        else:
            idx, d2 = self.index.knn_brute(lon, lat, self.k) if self.index.n <= 4096 \
                else self._knn_cells(lon, lat)
            w = 1.0 / (d2 + EPS)
            val = (w * self.sv[idx]).sum(axis=1) / w.sum(axis=1)
        return batch.append_column("burn", pa.array(val))

    def _knn_cells(self, lon, lat):
        from ..geom import cells as cellsm

        cell = cellsm.grid_cell(lon, lat, self.index.res)
        order = np.argsort(cell, kind="stable")
        n = len(lon)
        k = min(self.k, self.index.n)
        idx = np.empty((n, k), dtype=np.int64)
        d2 = np.empty((n, k), dtype=np.float64)
        uniq, starts = np.unique(cell[order], return_index=True)
        bounds = np.append(starts, n)
        for u in range(len(uniq)):
            rows = order[bounds[u]:bounds[u + 1]]
            ci, cd = self.index.knn_cell(lon[rows], lat[rows], int(uniq[u]), k)
            idx[rows], d2[rows] = ci, cd
        return idx, d2


def grid_idw(pixels: ray.data.Dataset, site_x: np.ndarray, site_y: np.ndarray,
             site_v: np.ndarray, z: int, power: float = 2.0,
             mode: str = "all", k: int = 12, res: float = 10.0,
             tile_size: int = 256,
             concurrency: Union[int, Tuple[int, int]] = (1, 8)) -> ray.data.Dataset:
    """IDW-interpolate site values onto the given output pixel rows."""
    ref = ray.put({"x": np.asarray(site_x, dtype=np.float64),
                   "y": np.asarray(site_y, dtype=np.float64),
                   "v": np.asarray(site_v, dtype=np.float64)})
    key = ref.hex()

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _IdwStage(
            {"ref": ref}, z, tile_size, power, mode, k, res))
        return j(batch)

    return pixels.map_batches(stage, batch_format="pyarrow")


class _LinearStage:
    """Delaunay-linear interpolation (GDAL `GDALGridLinear`,
    `alg/gdalgrid.cpp` linear via `alg/delaunay.c`): triangulation built
    ONCE per worker from the broadcast site table; faces bucketed to a
    coarse grid for the per-batch locate; queries outside the hull are
    dropped (GDAL nodata). Vertex roles within a face are index-sorted,
    so the barycentric expressions are deterministic (SQL-mirrorable).
    """

    def __init__(self, wrapped, cell: float):
        from ..geom.delaunay import delaunay

        data = ray.get(wrapped["ref"])
        self.sx, self.sy, self.sv = data["x"], data["y"], data["v"]
        self.tri = delaunay(self.sx, self.sy)
        self.cell = cell
        # face -> covered coarse cells (bbox cover)
        self.buckets: dict = {}
        for t in range(len(self.tri)):
            ia, ib, ic = self.tri[t]
            xs = (self.sx[ia], self.sx[ib], self.sx[ic])
            ys = (self.sy[ia], self.sy[ib], self.sy[ic])
            for bx in range(int(np.floor(min(xs) / cell)),
                            int(np.floor(max(xs) / cell)) + 1):
                for by in range(int(np.floor(min(ys) / cell)),
                                int(np.floor(max(ys) / cell)) + 1):
                    self.buckets.setdefault((bx, by), []).append(t)

    def _bary(self, t_idx: np.ndarray, qx: np.ndarray, qy: np.ndarray):
        """Barycentric coords of (qx, qy) w.r.t. faces t_idx — the
        expression order here is the oracle contract (catalog
        sql mirrors it verbatim)."""
        ia, ib, ic = (self.tri[t_idx, 0], self.tri[t_idx, 1], self.tri[t_idx, 2])
        x1, y1 = self.sx[ia], self.sy[ia]
        x2, y2 = self.sx[ib], self.sy[ib]
        x3, y3 = self.sx[ic], self.sy[ic]
        den = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
        l1 = ((y2 - y3) * (qx - x3) + (x3 - x2) * (qy - y3)) / den
        l2 = ((y3 - y1) * (qx - x3) + (x1 - x3) * (qy - y3)) / den
        l3 = 1.0 - l1 - l2
        return l1, l2, l3

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        qy = batch["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(qx)
        found = np.full(n, -1, dtype=np.int64)
        bx = np.floor(qx / self.cell).astype(np.int64)
        by = np.floor(qy / self.cell).astype(np.int64)
        key = bx * np.int64(1 << 32) + by
        order = np.argsort(key, kind="stable")
        uniq, starts = np.unique(key[order], return_index=True)
        bounds = np.append(starts, n)
        for u in range(len(uniq)):
            rows = order[bounds[u]:bounds[u + 1]]
            cands = self.buckets.get((int(bx[rows[0]]), int(by[rows[0]])))
            if not cands:
                continue
            remaining = rows
            for t in cands:  # ascending face index -> deterministic pick
                if not len(remaining):
                    break
                l1, l2, l3 = self._bary(np.full(len(remaining), t, dtype=np.int64),
                                        qx[remaining],
                                        qy[remaining])
                inside = (l1 >= -1e-12) & (l2 >= -1e-12) & (l3 >= -1e-12)
                found[remaining[inside]] = t
                remaining = remaining[~inside]
        ok = found >= 0
        t_ok = found[ok]
        l1, l2, l3 = self._bary(t_ok, qx[ok], qy[ok])
        ia, ib, ic = self.tri[t_ok, 0], self.tri[t_ok, 1], self.tri[t_ok, 2]
        v = l1 * self.sv[ia] + l2 * self.sv[ib] + l3 * self.sv[ic]
        sub = batch.filter(pa.array(ok))
        for name, col in (("v", v), ("i1", ia), ("i2", ib), ("i3", ic),
                          ("l1", l1), ("l2", l2), ("l3", l3)):
            sub = sub.append_column(name, pa.array(col))
        return sub


def grid_linear(queries: ray.data.Dataset, site_x: np.ndarray,
                site_y: np.ndarray, site_v: np.ndarray,
                cell: float = 8.0) -> ray.data.Dataset:
    """Delaunay-linear interpolation of site values at query (x, y)
    rows -> (query cols…, v, i1, i2, i3, l1, l2, l3); outside-hull
    queries drop. Broadcast sites; triangulation + face buckets built
    once per worker (the 100-TB path re-runs the same kernel per tile
    over halo-gathered sites)."""
    ref = ray.put({"x": np.asarray(site_x, dtype=np.float64),
                   "y": np.asarray(site_y, dtype=np.float64),
                   "v": np.asarray(site_v, dtype=np.float64)})
    key = ref.hex()

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key + ":lin", lambda: _LinearStage({"ref": ref}, cell))
        return j(batch)

    return queries.map_batches(stage, batch_format="pyarrow")


class _MetricStage:
    """gdal_grid data-metric / nearest kernels over the broadcast site
    table. Reference: `alg/gdalgrid.cpp` GDALGridNearestNeighbor
    (`:879`), GDALGridDataMetric{Minimum,Maximum,Range,Count,
    AverageDistance,AverageDistancePts} (`:966-1507`). Circular search
    radius (the radius1==radius2 ellipse case); a pixel with fewer than
    `min_points` in-radius sites is nodata (dropped), matching the
    reference's nodata emission. All metrics compute in one pass over
    one (batch × sites) distance matrix; `average_distance_pts` uses
    the site-site distance matrix built once per worker."""

    METRICS = ("count", "minimum", "maximum", "range", "average",
               "nearest", "average_distance", "average_distance_pts")

    def __init__(self, wrapped, z, tile_size, metrics, radius, min_points,
                 value_scale=None, dist_scale=None):
        data = ray.get(wrapped["ref"])
        self.sx = data["x"]
        self.sy = data["y"]
        self.sv = data["v"]
        self.z, self.tile_size = z, tile_size
        self.metrics = list(metrics)
        self.r2 = float(radius) * float(radius)
        self.min_points = max(int(min_points), 1)
        # Fixed-point accumulation knobs (reproducibility): with a
        # scale set, each summand is quantized to floor(x*scale + 0.5)
        # BEFORE accumulation, so the sums are integer-exact in float64
        # and independent of summation order — batch splits, BLAS
        # blocking and SQL GROUP BY order all produce the same result.
        # Without them, a round()ed output can sit on a knife edge and
        # flip between runs (sum-order noise in the last ulps).
        self.vscale = float(value_scale) if value_scale else None
        self.dscale = float(dist_scale) if dist_scale else None
        if "average_distance_pts" in self.metrics:
            ddx = self.sx[:, None] - self.sx[None, :]
            ddy = self.sy[:, None] - self.sy[None, :]
            self.site_d = np.sqrt(ddx * ddx + ddy * ddy)
            if self.dscale:
                self.site_d = np.floor(self.site_d * self.dscale + 0.5)

    def __call__(self, batch: pa.Table) -> pa.Table:
        gpx = batch["gpx"].to_numpy(zero_copy_only=False)
        gpy = batch["gpy"].to_numpy(zero_copy_only=False)
        lon, lat = pixel_centers_lonlat(gpx, gpy, self.z, self.tile_size)
        dx = self.sx[None, :] - lon[:, None]
        dy = self.sy[None, :] - lat[:, None]
        d2 = dx * dx + dy * dy
        within = d2 <= self.r2
        m = within.sum(axis=1)
        keep = m >= self.min_points
        out = {}
        for metric in self.metrics:
            if metric == "count":
                out["count"] = m.astype(np.int64)
                continue
            if metric == "nearest":
                d2m = np.where(within, d2, np.inf)
                # stable argmin -> lowest site index wins ties
                out["nearest"] = self.sv[np.argmin(d2m, axis=1)]
                continue
            if metric == "average_distance":
                d = np.sqrt(d2)
                if self.dscale:
                    d = np.floor(d * self.dscale + 0.5)
                s = np.where(within, d, 0.0).sum(axis=1)
                if self.dscale:
                    s = s / self.dscale
                out["average_distance"] = s / np.maximum(m, 1)
                continue
            if metric == "average_distance_pts":
                # with dist_scale the matrix holds integers (exact in
                # float64), so the GEMM is order-independent; without
                # it the result can wobble in the last ulps with batch
                # shape — fine for the engine, set dist_scale when a
                # rounded output must be reproducible.
                w = within.astype(np.float64)
                pair_sum = ((w @ self.site_d) * w).sum(axis=1)
                if self.dscale:
                    pair_sum = pair_sum / self.dscale
                pairs = m * (m - 1)
                out["average_distance_pts"] = np.where(
                    pairs > 0, pair_sum / np.maximum(pairs, 1), 0.0)
                continue
            if metric == "average" and self.vscale:
                vq = np.floor(self.sv * self.vscale + 0.5)
                s = np.where(within, vq[None, :], 0.0).sum(axis=1)
                out["average"] = (s / self.vscale) / np.maximum(m, 1)
                continue
            vm = np.where(within, self.sv[None, :], np.nan)
            with np.errstate(invalid="ignore"):
                if metric == "minimum":
                    out["minimum"] = np.where(m > 0, np.nanmin(vm, axis=1), 0)
                elif metric == "maximum":
                    out["maximum"] = np.where(m > 0, np.nanmax(vm, axis=1), 0)
                elif metric == "range":
                    out["range"] = np.where(
                        m > 0,
                        np.nanmax(vm, axis=1) - np.nanmin(vm, axis=1), 0)
                elif metric == "average":
                    out["average"] = (np.where(within, self.sv[None, :], 0.0)
                                      .sum(axis=1) / np.maximum(m, 1))
                else:
                    raise ValueError(f"unknown metric {metric!r}")
        res = batch
        for name, col in out.items():
            res = res.append_column(name, pa.array(col))
        return res.filter(pa.array(keep))


def grid_metrics(pixels: ray.data.Dataset, site_x: np.ndarray,
                 site_y: np.ndarray, site_v: np.ndarray, z: int,
                 metrics: Sequence[str] = ("count",), radius: float = 1.0,
                 min_points: int = 1,
                 tile_size: int = 256,
                 value_scale=None, dist_scale=None) -> ray.data.Dataset:
    """gdal_grid data metrics / nearest over output pixel rows: one
    column per requested metric; pixels with < min_points in-radius
    sites drop (nodata). Broadcast sites (`ray.put` once, worker-cached
    stage); the 100-TB path swaps the broadcast for the SiteIndex
    cell-ring search exactly as grid_idw mode='knn'."""
    ref = ray.put({"x": np.asarray(site_x, dtype=np.float64),
                   "y": np.asarray(site_y, dtype=np.float64),
                   "v": np.asarray(site_v, dtype=np.float64)})
    key = (ref.hex() + ":met:" + ",".join(metrics)
           + f":{value_scale}:{dist_scale}")

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _MetricStage(
            {"ref": ref}, z, tile_size, metrics, radius, min_points,
            value_scale=value_scale, dist_scale=dist_scale))
        return j(batch)

    return pixels.map_batches(stage, batch_format="pyarrow")


class _InvDistNNStage:
    """Per-quadrant inverse-distance-to-a-power nearest-neighbor
    (`alg/gdalgrid.cpp:629-753` GDALGridInverseDistanceToAPower
    NearestNeighbor with MinPointsPerQuadrant/MaxPointsPerQuadrant):
    quadrants are taken around the grid node (sign of site-minus-node
    deltas); each quadrant contributes its `max_per_quadrant` nearest
    in-radius sites (ties -> lowest site index, stable argsort); a node
    missing `min_per_quadrant` sites in ANY quadrant is nodata."""

    def __init__(self, wrapped, z, tile_size, power, radius,
                 max_per_quadrant, min_per_quadrant):
        data = ray.get(wrapped["ref"])
        self.sx = data["x"]
        self.sy = data["y"]
        self.sv = data["v"]
        self.z, self.tile_size = z, tile_size
        self.power = float(power)
        self.r2 = float(radius) * float(radius)
        self.maxq = int(max_per_quadrant)
        self.minq = int(min_per_quadrant)

    def __call__(self, batch: pa.Table) -> pa.Table:
        gpx = batch["gpx"].to_numpy(zero_copy_only=False)
        gpy = batch["gpy"].to_numpy(zero_copy_only=False)
        lon, lat = pixel_centers_lonlat(gpx, gpy, self.z, self.tile_size)
        dx = self.sx[None, :] - lon[:, None]
        dy = self.sy[None, :] - lat[:, None]
        d2 = dx * dx + dy * dy
        within = d2 <= self.r2
        quad = (dx > 0).astype(np.int8) + 2 * (dy > 0).astype(np.int8)
        n = len(lon)
        sel = np.zeros_like(within)
        ok = np.ones(n, dtype=bool)
        for q in range(4):
            inq = within & (quad == q)
            cq = inq.sum(axis=1)
            ok &= cq >= self.minq
            d2q = np.where(inq, d2, np.inf)
            kq = min(self.maxq, d2q.shape[1])
            idx = np.argsort(d2q, axis=1, kind="stable")[:, :kq]
            rows = np.repeat(np.arange(n), kq)
            cols = idx.ravel()
            chosen = inq[rows, cols]
            sel[rows[chosen], cols[chosen]] = True
        if self.power == 2:
            w = np.where(sel, 1.0 / (d2 + EPS), 0.0)
        else:
            w = np.where(
                sel, 1.0 / (np.power(d2, self.power / 2.0) + EPS), 0.0)
        wsum = w.sum(axis=1)
        ok &= wsum > 0
        val = (w * self.sv[None, :]).sum(axis=1) / np.maximum(wsum, EPS)
        return (batch.append_column("burn", pa.array(val))
                .filter(pa.array(ok)))


def grid_invdistnn(pixels: ray.data.Dataset, site_x: np.ndarray,
                   site_y: np.ndarray, site_v: np.ndarray, z: int,
                   power: float = 2.0, radius: float = 1.0,
                   max_per_quadrant: int = 3, min_per_quadrant: int = 0,
                   tile_size: int = 256) -> ray.data.Dataset:
    """Per-quadrant invdistnn IDW onto output pixel rows (`burn` col);
    nodata pixels drop. Same broadcast/worker-cache shape as grid_idw."""
    ref = ray.put({"x": np.asarray(site_x, dtype=np.float64),
                   "y": np.asarray(site_y, dtype=np.float64),
                   "v": np.asarray(site_v, dtype=np.float64)})
    key = ref.hex() + f":nnq:{power}:{radius}:{max_per_quadrant}:{min_per_quadrant}"

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _InvDistNNStage(
            {"ref": ref}, z, tile_size, power, radius,
            max_per_quadrant, min_per_quadrant))
        return j(batch)

    return pixels.map_batches(stage, batch_format="pyarrow")
