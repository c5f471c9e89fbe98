"""Zonal statistics — the canonical raster×vector join+aggregate.

Reference: `alg/zonal.cpp:37,251-616` (GDALZonalStatsImpl): pixels (or
here, point observations) are assigned to vector zones, then per-zone
count/min/max/mean/sum are reduced. Ray shape: broadcast PIP join
(zones are the small side) → partial+final `grouped_agg` on zone_id —
zero shuffle for the join, one narrow shuffle for the aggregate.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .relational import grouped_agg
from .spatial_join import broadcast_pip_join


class _WeightedZonal:
    """Raster zonal stats with fractional pixel coverage weights
    (`alg/zonal.cpp` optional weights): for each (pixel, zone-box) pair
    the weight is the exact area fraction of the pixel square covered
    by the zone, computed in global-pixel coordinate space."""

    def __init__(self, wrapped, z, tile_size):
        import ray as _ray

        zb = _ray.get(wrapped["ref"])  # dict with zone_id + pixel-space bounds
        self.zone_id = zb["zone_id"]
        self.zx0, self.zy0 = zb["zx0"], zb["zy0"]
        self.zx1, self.zy1 = zb["zx1"], zb["zy1"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .rasterize import unpack_pixel

        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        burn = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        zz, gpx, gpy = unpack_pixel(pix)
        out = []
        for zi in range(len(self.zone_id)):
            w = (np.minimum(gpx + 1.0, self.zx1[zi]) - np.maximum(gpx.astype(np.float64), self.zx0[zi]))
            h = (np.minimum(gpy + 1.0, self.zy1[zi]) - np.maximum(gpy.astype(np.float64), self.zy0[zi]))
            cov = np.clip(w, 0.0, 1.0) * np.clip(h, 0.0, 1.0)
            hit = cov > 0.0
            if hit.any():
                out.append(pa.table({
                    "zone_id": pa.array(np.full(int(hit.sum()), self.zone_id[zi],
                                                dtype=np.int64)),
                    "wv": pa.array(burn[hit] * cov[hit]),
                    "w": pa.array(cov[hit]),
                }))
        if not out:
            return pa.table({"zone_id": pa.array([], pa.int64()),
                             "wv": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        return pa.concat_tables(out)


def zonal_stats_weighted(pixels: ray.data.Dataset, zone_id: np.ndarray,
                         zone_px_bounds, z: int,
                         tile_size: int = 256,
                         shuffle_partitions: Optional[int] = None,
                         quantize: Optional[float] = None) -> ray.data.Dataset:
    """Sparse raster × zone boxes with fractional coverage weights.

    zone_px_bounds = (zx0, zy0, zx1, zy1) in GLOBAL PIXEL coordinates at
    zoom z (callers project zone geometry; keeping the projection at the
    caller makes the weight arithmetic exactly mirrorable in a SQL
    oracle). Returns (zone_id, weighted_sum, weight_sum).

    quantize: fixed-point scale Q — per-pair contributions become
    floor(x*Q + 0.5) integers before the grouped sum, so the zone sums
    are order-independent (block splits / reduce order can't wobble a
    rounded output; same reproducibility knob as
    gridding._MetricStage). Valid while Q × total ≲ 2^53."""
    import ray as _ray

    zx0, zy0, zx1, zy1 = (np.asarray(v, dtype=np.float64) for v in zone_px_bounds)
    ref = _ray.put({"zone_id": np.asarray(zone_id, dtype=np.int64),
                    "zx0": zx0, "zy0": zy0, "zx1": zx1, "zy1": zy1})
    key = ref.hex()

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _WeightedZonal({"ref": ref}, z, tile_size))
        return j(batch)

    pairs = pixels.map_batches(stage, batch_format="pyarrow")
    if quantize:
        q = float(quantize)

        def quant(batch: pa.Table) -> pa.Table:
            wv = batch["wv"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            return (batch.set_column(
                batch.column_names.index("wv"), "wv",
                pa.array(np.floor(wv * q + 0.5)))
                .set_column(batch.column_names.index("w"), "w",
                            pa.array(np.floor(w * q + 0.5))))

        pairs = pairs.map_batches(quant, batch_format="pyarrow")
    from .relational import grouped_agg

    out = grouped_agg(pairs, "zone_id", [
        ("sum", "wv", "weighted_sum"),
        ("sum", "w", "weight_sum"),
    ], shuffle_partitions=shuffle_partitions)
    if not quantize:
        return out

    def unquant(batch: pa.Table) -> pa.Table:
        return pa.table({
            "zone_id": batch["zone_id"],
            "weighted_sum": pc.divide(batch["weighted_sum"], q),
            "weight_sum": pc.divide(batch["weight_sum"], q),
        })

    return out.map_batches(unquant, batch_format="pyarrow")


def zonal_stats(points: ray.data.Dataset, zones: pa.Table,
                zone_wkb_col: str, zone_id_col: str, value_col: str,
                res: float = 5.0,
                lon_col: str = "lon", lat_col: str = "lat",
                round_to: Optional[int] = 4) -> ray.data.Dataset:
    joined = broadcast_pip_join(points, zones, zone_wkb_col, [zone_id_col],
                                res=res, lon_col=lon_col, lat_col=lat_col)
    return grouped_agg(joined, zone_id_col, [
        ("count", None, "n"),
        ("sum", value_col, "sum_val"),
        ("min", value_col, "min_val"),
        ("max", value_col, "max_val"),
        ("mean", value_col, "avg_val"),
    ], round_to=round_to)
