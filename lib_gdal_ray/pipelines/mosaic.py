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
        # fold: mosaic the first 16 into one layer (last-wins preserved),
        # then overlay the rest on top — arbitrary source counts with the
        # same bounded one-hot shuffle width per round
        head = mosaic(datasets[:16])
        return mosaic([head] + list(datasets[16:]))

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


def warp_bilinear(pixels: ray.data.Dataset, dst_z: int,
                  tile_size: int = 256) -> ray.data.Dataset:
    """Up-zoom re-grid with bilinear resampling (gdalwarp GRA_Bilinear):
    every destination pixel center samples the source grid bilinearly.

    Implementation: destination pixel probes explode to their 4 source
    corners with weights; ONE `groupby(src pix)` matches probes to
    source values; a second tiny `groupby(dst pix)` sums weight×value
    (the same co-partition pattern as interpolate_at_points, fully
    vectorized). Destination extent = children of the source pixels.
    Weights renormalize at sparse edges (missing corners drop out)."""
    import pandas as pd

    dz_probe = dst_z

    def probes(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        z, gpx, gpy = unpack_pixel(pix)
        if len(z) == 0:
            return pa.table({"spix": pa.array([], pa.uint64()),
                             "dpix": pa.array([], pa.uint64()),
                             "w": pa.array([], pa.float64()),
                             "pv": pa.array([], pa.float64()),
                             "side": pa.array([], pa.int8())})
        dz = dst_z - int(z[0])
        if dz <= 0:
            raise ValueError("warp_bilinear is the up-zoom path; use "
                             "warp_nearest for down-zoom")
        scale = 1 << dz
        # destination pixels under each source pixel (scale² children)
        offs = np.arange(scale)
        ox, oy = np.meshgrid(offs, offs, indexing="ij")
        ox, oy = ox.ravel(), oy.ravel()
        n = len(gpx)
        m = len(ox)
        dgx = (gpx[:, None] * scale + ox[None, :]).ravel()
        dgy = (gpy[:, None] * scale + oy[None, :]).ravel()
        # source-grid fractional coords of each dst center
        fx = (dgx + 0.5) / scale - 0.5
        fy = (dgy + 0.5) / scale - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        tx = fx - x0
        ty = fy - y0
        parts = []
        dpix = pack_pixel(dst_z, dgx, dgy)
        for dx, dy, w in ((0, 0, (1 - tx) * (1 - ty)), (1, 0, tx * (1 - ty)),
                          (0, 1, (1 - tx) * ty), (1, 1, tx * ty)):
            sxc = x0 + dx
            syc = y0 + dy
            ok = (sxc >= 0) & (syc >= 0) & (w > 0)
            parts.append(pa.table({
                "spix": pa.array(pack_pixel(int(z[0]), np.maximum(sxc, 0),
                                            np.maximum(syc, 0))),
                "dpix": pa.array(dpix),
                "w": pa.array(w),
                "pv": pa.array(np.zeros(len(w))),
                "side": pa.array(np.ones(len(w), dtype=np.int8)),
            }).filter(pa.array(ok)))
        return pa.concat_tables(parts)

    def src_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "spix": batch["pix_id"],
            "dpix": pa.array(np.zeros(n, dtype=np.uint64)),
            "w": pa.array(np.zeros(n)),
            "pv": pa.array(batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    both = pixels.map_batches(probes, batch_format="pyarrow").union(
        pixels.map_batches(src_rows, batch_format="pyarrow"))
    return _warp_tail(both)


def _src_rows(batch: pa.Table) -> pa.Table:
    n = len(batch)
    return pa.table({
        "spix": batch["pix_id"],
        "dpix": pa.array(np.zeros(n, dtype=np.uint64)),
        "w": pa.array(np.zeros(n)),
        "pv": pa.array(batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)),
        "side": pa.array(np.zeros(n, dtype=np.int8)),
    })


def _warp_tail(both: ray.data.Dataset) -> ray.data.Dataset:
    """Shared resample tail: probe->source match in 256 bounded groups
    (vectorized searchsorted), then per-destination weight-normalized
    sum. The w-normalization IS the density weighting of
    `alg/gdalwarpkernel.cpp:770-790`: absent (nodata/sparse) source
    pixels contribute neither value nor weight, so edge pixels
    renormalize over the taps that exist."""
    def bucket(batch: pa.Table) -> pa.Table:
        pix = batch["spix"].to_numpy(zero_copy_only=False).astype(np.uint64)
        g = ((pix * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)).astype(np.int32)
        return batch.append_column("__g", pa.array(g))

    def match(tbl: pa.Table) -> pa.Table:
        side = tbl["side"].to_numpy(zero_copy_only=False)
        vals = tbl.filter(pa.array(side == 0))
        prb = tbl.filter(pa.array(side == 1))
        empty = pa.table({"dpix": pa.array([], type=pa.uint64()),
                          "wv": pa.array([], type=pa.float64()),
                          "w": pa.array([], type=pa.float64())})
        if len(vals) == 0 or len(prb) == 0:
            return empty
        spix = vals["spix"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pval = vals["pv"].to_numpy(zero_copy_only=False)
        order = np.argsort(spix)
        spix, pval = spix[order], pval[order]
        qpix = prb["spix"].to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.clip(np.searchsorted(spix, qpix), 0, len(spix) - 1)
        found = spix[idx] == qpix
        if not found.any():
            return empty
        w = prb["w"].to_numpy(zero_copy_only=False)[found]
        return pa.table({
            "dpix": pa.array(prb["dpix"].to_numpy(
                zero_copy_only=False).astype(np.uint64)[found]),
            "wv": pa.array(w * pval[idx[found]]),
            "w": pa.array(w),
        })

    matched = (both.map_batches(bucket, batch_format="pyarrow")
               .groupby("__g").map_groups(match, batch_format="pyarrow"))

    from ray.data.aggregate import Sum

    agg = matched.groupby("dpix").aggregate(Sum("wv", alias_name="wv"),
                                            Sum("w", alias_name="w"))

    def finalize(batch: pa.Table) -> pa.Table:
        wv = batch["wv"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        return pa.table({"pix_id": batch["dpix"],
                         "burn": pa.array(wv / np.maximum(w, 1e-300))})

    return agg.map_batches(finalize, batch_format="pyarrow")


def cubic_weight(x: np.ndarray) -> np.ndarray:
    """Catmull-Rom cubic convolution weight, bit-parity with the
    reference `alg/gdalresamplingkernels.h:23` CubicKernel (a = -0.5):
    |x|<=1: x^2*(1.5|x| - 2.5) + 1; 1<|x|<=2: x^2*(-0.5|x| + 2.5) - 4|x| + 2."""
    ax = np.abs(x)
    x2 = x * x
    near = x2 * (1.5 * ax - 2.5) + 1.0
    far = x2 * (-0.5 * ax + 2.5) - 4.0 * ax + 2.0
    return np.where(ax <= 1.0, near, np.where(ax <= 2.0, far, 0.0))


def lanczos_weight(x: np.ndarray) -> np.ndarray:
    """Lanczos windowed sinc, radius 3 — bit-parity with
    `alg/gdalwarpkernel.cpp:3540` GWKLanczosSinc (sin(3t) computed from
    sin(t) via the triple-angle identity, exactly as the reference)."""
    x = np.asarray(x, dtype=np.float64)
    pix = np.pi * x
    pix_over_r = pix / 3.0
    pix2_over_r = pix * pix_over_r
    s = np.sin(pix_over_r)
    s2 = s * s
    num = (3.0 - 4.0 * s2) * s2
    with np.errstate(divide="ignore", invalid="ignore"):
        w = num / pix2_over_r
    w = np.where(x == 0.0, 1.0, w)
    return np.where(np.abs(x) < 3.0, w, 0.0)


def _warp_separable(pixels: ray.data.Dataset, dst_z: int, weight_fn,
                    offsets, tile_size: int = 256) -> ray.data.Dataset:
    """Shared up-zoom resample: per destination center, separable taps
    at `offsets` around the floor base, weights from weight_fn."""

    def probes(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        z, gpx, gpy = unpack_pixel(pix)
        if len(z) == 0:
            return pa.table({"spix": pa.array([], pa.uint64()),
                             "dpix": pa.array([], pa.uint64()),
                             "w": pa.array([], pa.float64()),
                             "pv": pa.array([], pa.float64()),
                             "side": pa.array([], pa.int8())})
        dz = dst_z - int(z[0])
        if dz <= 0:
            raise ValueError("separable warp is the up-zoom path; use "
                             "warp_nearest for down-zoom")
        scale = 1 << dz
        offs = np.arange(scale)
        ox, oy = np.meshgrid(offs, offs, indexing="ij")
        ox, oy = ox.ravel(), oy.ravel()
        dgx = (gpx[:, None] * scale + ox[None, :]).ravel()
        dgy = (gpy[:, None] * scale + oy[None, :]).ravel()
        fx = (dgx + 0.5) / scale - 0.5
        fy = (dgy + 0.5) / scale - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        dpix = pack_pixel(dst_z, dgx, dgy)
        parts = []
        for dx in offsets:
            wx = weight_fn(fx - (x0 + dx))
            for dy in offsets:
                w = wx * weight_fn(fy - (y0 + dy))
                sxc = x0 + dx
                syc = y0 + dy
                ok = (sxc >= 0) & (syc >= 0) & (np.abs(w) > 1e-15)
                parts.append(pa.table({
                    "spix": pa.array(pack_pixel(int(z[0]), np.maximum(sxc, 0),
                                                np.maximum(syc, 0))),
                    "dpix": pa.array(dpix),
                    "w": pa.array(w),
                    "pv": pa.array(np.zeros(len(w))),
                    "side": pa.array(np.ones(len(w), dtype=np.int8)),
                }).filter(pa.array(ok)))
        return pa.concat_tables(parts)

    both = pixels.map_batches(probes, batch_format="pyarrow").union(
        pixels.map_batches(_src_rows, batch_format="pyarrow"))
    return _warp_tail(both)


def warp_lanczos(pixels: ray.data.Dataset, dst_z: int,
                 tile_size: int = 256) -> ray.data.Dataset:
    """Up-zoom re-grid with Lanczos resampling (gdalwarp GRA_Lanczos,
    radius 3 => 6x6 taps), density-weighted via the shared tail."""
    return _warp_separable(pixels, dst_z, lanczos_weight,
                           (-2, -1, 0, 1, 2, 3), tile_size)


def warp_cubic(pixels: ray.data.Dataset, dst_z: int,
               tile_size: int = 256) -> ray.data.Dataset:
    """Up-zoom re-grid with cubic-convolution resampling (gdalwarp
    GRA_Cubic, `alg/gdalwarpkernel.cpp` GWKCubic): each destination
    pixel center samples a 4x4 source neighborhood with separable
    Catmull-Rom weights. Same probe/match/normalize shape as
    warp_bilinear; density weighting comes from the shared tail (absent
    taps renormalize)."""

    def probes(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        z, gpx, gpy = unpack_pixel(pix)
        if len(z) == 0:
            return pa.table({"spix": pa.array([], pa.uint64()),
                             "dpix": pa.array([], pa.uint64()),
                             "w": pa.array([], pa.float64()),
                             "pv": pa.array([], pa.float64()),
                             "side": pa.array([], pa.int8())})
        dz = dst_z - int(z[0])
        if dz <= 0:
            raise ValueError("warp_cubic is the up-zoom path; use "
                             "warp_nearest for down-zoom")
        scale = 1 << dz
        offs = np.arange(scale)
        ox, oy = np.meshgrid(offs, offs, indexing="ij")
        ox, oy = ox.ravel(), oy.ravel()
        dgx = (gpx[:, None] * scale + ox[None, :]).ravel()
        dgy = (gpy[:, None] * scale + oy[None, :]).ravel()
        fx = (dgx + 0.5) / scale - 0.5
        fy = (dgy + 0.5) / scale - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        dpix = pack_pixel(dst_z, dgx, dgy)
        parts = []
        for dx in (-1, 0, 1, 2):
            wx = cubic_weight(fx - (x0 + dx))
            for dy in (-1, 0, 1, 2):
                w = wx * cubic_weight(fy - (y0 + dy))
                sxc = x0 + dx
                syc = y0 + dy
                ok = (sxc >= 0) & (syc >= 0) & (np.abs(w) > 1e-15)
                parts.append(pa.table({
                    "spix": pa.array(pack_pixel(int(z[0]), np.maximum(sxc, 0),
                                                np.maximum(syc, 0))),
                    "dpix": pa.array(dpix),
                    "w": pa.array(w),
                    "pv": pa.array(np.zeros(len(w))),
                    "side": pa.array(np.ones(len(w), dtype=np.int8)),
                }).filter(pa.array(ok)))
        return pa.concat_tables(parts)

    both = pixels.map_batches(probes, batch_format="pyarrow").union(
        pixels.map_batches(_src_rows, batch_format="pyarrow"))
    return _warp_tail(both)


def pansharpen(pan: ray.data.Dataset, bands: List[ray.data.Dataset]
               ) -> ray.data.Dataset:
    """Brovey weighted fusion (`alg/gdalpansharpen.cpp`): each band is
    scaled by pan / (mean of bands) per pixel. Bands and pan must share
    the pixel grid. One shuffle: hot-one side columns co-partition all
    inputs; output rows (pix_id, band, burn)."""
    n = len(bands)

    def tag(i: int):  # i == n → pan
        def fn(batch: pa.Table) -> pa.Table:
            burn = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
            cols = {"pix_id": batch["pix_id"]}
            for j in range(n + 1):
                zero = np.zeros_like(burn)
                cols[f"v{j}"] = pa.array(burn if j == i else zero)
            return pa.table(cols)
        return fn

    tagged = bands[0].map_batches(tag(0), batch_format="pyarrow")
    for i in range(1, n):
        tagged = tagged.union(bands[i].map_batches(tag(i), batch_format="pyarrow"))
    tagged = tagged.union(pan.map_batches(tag(n), batch_format="pyarrow"))

    from ray.data.aggregate import Sum

    merged = tagged.groupby("pix_id").aggregate(
        *[Sum(f"v{j}", alias_name=f"v{j}") for j in range(n + 1)])

    def finalize(batch: pa.Table) -> pa.Table:
        vs = [batch[f"v{j}"].to_numpy(zero_copy_only=False) for j in range(n)]
        p = batch[f"v{n}"].to_numpy(zero_copy_only=False)
        mean = sum(vs) / n
        ratio = np.divide(p, mean, out=np.zeros_like(p), where=mean != 0)
        parts = []
        for j in range(n):
            parts.append(pa.table({
                "pix_id": batch["pix_id"],
                "band": pa.array(np.full(len(p), j, dtype=np.int32)),
                "burn": pa.array(vs[j] * ratio),
            }))
        return pa.concat_tables(parts)

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
