"""Mosaic / overlay and raster warp (grid-to-grid resample).

* `mosaic(datasets)` — reference: `gdal raster mosaic` /
  `gdalbuildvrt` (`apps/gdalbuildvrt_lib.cpp`): later sources overlay
  earlier ones; a pixel takes the value of the LAST source that has it
  (nodata-aware overlay order). One shuffle: side-tagged one-hot value
  and presence columns, `groupby(pix_id)` sums, then a vectorized
  highest-priority-present cascade. Deterministic under retries
  (priority = argument order, not arrival order).

* `warp_nearest(pixels, src_z, dst_z)` — reference: `gdalwarp`
  GRA_NearestNeighbour path (`alg/gdalwarpkernel.cpp`): each source
  pixel center maps through the (here: pure zoom-change) transform and
  re-aggregates on the destination grid. Up-zoom uses child-replication
  is NOT done (sparse semantics: a source pixel maps to the one dst
  pixel containing its center, matching point-sampled nearest).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import ray.data

from .rasterize import pack_pixel, unpack_pixel


def mosaic(datasets: Sequence[ray.data.Dataset]) -> ray.data.Dataset:
    """Overlay sparse pixel datasets; LAST dataset wins per pixel."""
    n = len(datasets)
    if n == 0:
        raise ValueError("mosaic needs at least one dataset")
    if n > 16:
        raise ValueError("mosaic one-hot path supports up to 16 sources; chain calls")

    def tag(i: int):
        def fn(batch: pa.Table) -> pa.Table:
            burn = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
            cols = {"pix_id": batch["pix_id"]}
            for j in range(n):
                zero = np.zeros_like(burn)
                cols[f"v{j}"] = pa.array(burn if j == i else zero)
                cols[f"p{j}"] = pa.array(np.ones_like(burn) if j == i else zero)
            return pa.table(cols)
        return fn

    tagged = datasets[0].map_batches(tag(0), batch_format="pyarrow")
    for i in range(1, n):
        tagged = tagged.union(datasets[i].map_batches(tag(i), batch_format="pyarrow"))

    from ray.data.aggregate import Sum

    aggs = []
    for j in range(n):
        aggs.append(Sum(f"v{j}", alias_name=f"v{j}"))
        aggs.append(Sum(f"p{j}", alias_name=f"p{j}"))
    merged = tagged.groupby("pix_id").aggregate(*aggs)

    def finalize(batch: pa.Table) -> pa.Table:
        out = np.zeros(len(batch), dtype=np.float64)
        for j in range(n):  # ascending: later sources overwrite
            v = batch[f"v{j}"].to_numpy(zero_copy_only=False)
            p = batch[f"p{j}"].to_numpy(zero_copy_only=False)
            out = np.where(p > 0, v, out)
        return pa.table({"pix_id": batch["pix_id"], "burn": pa.array(out)})

    return merged.map_batches(finalize, batch_format="pyarrow")


def warp_nearest(pixels: ray.data.Dataset, dst_z: int,
                 tile_size: int = 256, merge: str = "mean") -> ray.data.Dataset:
    """Re-grid sparse pixels to another zoom (nearest / center-sampled).

    Down-zoom collapses 2^Δ×2^Δ source pixels into one dst pixel —
    `merge` picks mean|sum|max for the collapse (GDAL average/sum/max
    resampling); up-zoom maps each src pixel to the dst pixel containing
    its center."""
    if merge not in ("mean", "sum", "max"):
        raise ValueError("merge must be mean|sum|max")

    def to_dst(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        burn = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        z, gpx, gpy = unpack_pixel(pix)
        if len(z) == 0:
            return pa.table({"pix_id": pa.array([], pa.uint64()),
                             "v": pa.array([], pa.float64()),
                             "c": pa.array([], pa.float64())})
        dz = dst_z - int(z[0])
        if dz >= 0:
            # src center lands in dst pixel: center*2^dz (+ offset inside)
            ngx = (gpx << dz) + ((1 << dz) >> 1) if dz > 0 else gpx
            ngy = (gpy << dz) + ((1 << dz) >> 1) if dz > 0 else gpy
        else:
            ngx, ngy = gpx >> (-dz), gpy >> (-dz)
        t = pa.table({"pix_id": pa.array(pack_pixel(dst_z, ngx, ngy)),
                      "v": pa.array(burn),
                      "c": pa.array(np.ones_like(burn))})
        agg = {"mean": "sum", "sum": "sum", "max": "max"}[merge]
        out = t.group_by(["pix_id"]).aggregate([("v", agg), ("c", "sum")])
        return out.rename_columns(["pix_id", "v", "c"])

    partials = pixels.map_batches(to_dst, batch_format="pyarrow")

    from ray.data.aggregate import Max, Sum

    if merge == "max":
        merged = partials.groupby("pix_id").aggregate(Max("v", alias_name="v"),
                                                      Sum("c", alias_name="c"))
    else:
        merged = partials.groupby("pix_id").aggregate(Sum("v", alias_name="v"),
                                                      Sum("c", alias_name="c"))

    def finalize(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        out = v / c if merge == "mean" else v
        return pa.table({"pix_id": batch["pix_id"], "burn": pa.array(out)})

    return merged.map_batches(finalize, batch_format="pyarrow")
