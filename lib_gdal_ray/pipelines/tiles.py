"""Tile-pyramid overview chain (z → z-1) and tile statistics — sparse.

Reference: `gdal raster tile` builds overview zoom levels from the 4
children at z+1 (`apps/gdalalg_raster_tile.cpp:5679-5695`) — a
level-synchronous reduction; band statistics
(`gcore/gdalrasterband.cpp:5392` ComputeStatisticsInternal) as
per-block partials merged globally.

Sparse formulation: a level step maps every finalized pixel row at z to
its parent pixel at z-1 (`map_batches`, with an in-batch pyarrow
combiner) and re-aggregates with one hash `groupby` — no dense arrays,
no per-group Python. Reductions: "sum" (counts — exact) and "max";
"mean" of the 2×2 block = sum/4 for count rasters (emitted by
`how="mean4"`, dividing after the sum — exact for the sparse case where
absent pixels are zero, matching GDAL average-resampling over the full
block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import cells


def overview_pixels(pixels: ray.data.Dataset, how: str = "sum",
                    tile_size: int = 256,
                    shuffle_partitions=None) -> ray.data.Dataset:
    """One overview step on sparse pixel rows: zoom z → z-1.
    shuffle_partitions: see rasterize_pixels — small-shuffle knob.

    Reductions (reference `gcore/overview.cpp:3355-4641`):
    "sum", "max", "mean4" (sum/4 — GDAL average over the FULL 2×2 block
    where absent means zero), "average" (mean over PRESENT children —
    GDAL average with nodata), "rms" (sqrt of mean of squares over
    present children), "mode" (most frequent child value, ties → the
    smallest value; GDAL's tie is hash-order — documented divergence),
    "gauss" (3×3 [1 2 1]⊗[1 2 1] kernel centered on source pixel
    (2x+1, 2y+1), weights renormalized over present pixels),
    "cubicspline" (4×4 B-3 spline convolution at 2× reduction —
    exact integer weights {1,27,121,235}/384 per axis, renormalized
    over present pixels; parents left of the grid are dropped, the
    positive edge is unclamped in sparse space — densify clamps)."""
    if how == "average":
        return _overview_weighted(pixels, mode="average")
    if how == "rms":
        return _overview_weighted(pixels, mode="rms")
    if how == "gauss":
        return _overview_weighted(pixels, mode="gauss")
    if how == "cubicspline":
        return _overview_weighted(pixels, mode="cubicspline")
    if how == "mode":
        return _overview_mode(pixels)
    if how not in ("sum", "max", "mean4"):
        raise ValueError(f"unknown reduction {how}")
    pa_agg = {"sum": "sum", "mean4": "sum", "max": "max"}[how]

    from .rasterize import pack_pixel, unpack_pixel

    def to_parent(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        burn = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        z, gpx, gpy = unpack_pixel(pix)
        parent = pack_pixel(int(z[0]) - 1 if len(z) else 0, gpx >> 1, gpy >> 1)
        t = pa.table({"pix_id": pa.array(parent), "burn": pa.array(burn)})
        out = t.group_by(["pix_id"]).aggregate([("burn", pa_agg)])
        return out.rename_columns(["pix_id", "burn"])

    partials = pixels.map_batches(to_parent, batch_format="pyarrow")

    from .rasterize import combine_pixel_partials

    out = combine_pixel_partials(partials, pa_agg, shuffle_partitions)
    if how == "mean4":
        def div4(batch: pa.Table) -> pa.Table:
            b = batch["burn"].to_numpy(zero_copy_only=False) / 4.0
            return batch.drop_columns(["burn"]).append_column("burn", pa.array(b))
        out = out.map_batches(div4, batch_format="pyarrow")
    return out


def _overview_weighted(pixels: ray.data.Dataset, mode: str) -> ray.data.Dataset:
    """average / rms / gauss as one weighted-sum shuffle: per source
    pixel scatter (parent, w·f(v), w) rows (f = v² for rms; gauss emits
    ≤4 parents with kernel weights, the others exactly one), in-batch
    pyarrow combine, one hash groupby(Sum, Sum), then the final
    division/sqrt — no dense arrays, no per-group Python."""
    from ray.data.aggregate import Sum

    from .rasterize import pack_pixel, unpack_pixel

    def scatter(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        v = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        z, gpx, gpy = unpack_pixel(pix)
        zp = int(z[0]) - 1 if len(z) else 0
        if mode in ("average", "rms"):
            parent = pack_pixel(zp, gpx >> 1, gpy >> 1)
            wv = v * v if mode == "rms" else v
            t = pa.table({"pix_id": pa.array(parent), "wv": pa.array(wv),
                          "w": pa.array(np.ones(len(v)))})
        else:
            if mode == "gauss":
                # x-contribs (dx, wx): even sx -> (sx/2, 1) and
                # (sx/2-1, 1); odd sx -> ((sx-1)/2, 2); same for y
                def axis(c):
                    even = (c & 1) == 0
                    contribs = [(c >> 1, np.where(even, 1.0, 2.0), None)]
                    d_b = np.where(even, (c >> 1) - 1, c >> 1)
                    contribs.append((d_b, np.ones(len(c)),
                                     even & (d_b >= 0)))
                    return contribs
            else:  # cubicspline: B-3 spline at 2x reduction — the
                # kernel samples land on t ∈ {±0.25, ±0.75, ±1.25,
                # ±1.75} whose weights are EXACTLY {235,121,27,1}/384;
                # the /384 normalization cancels in wv/w, so integer
                # weights keep every sum bit-exact (same parity scheme
                # as the SQL oracle). Ref gcore/overview.cpp
                # GDALResampleChunk_Convolution + GWKCubicSpline.
                def axis(c):
                    x0 = c >> 1
                    odd = (c & 1) == 1
                    contribs = []
                    # (offset from x0, weight) for even r=0 / odd r=1
                    for off_e, w_e, off_o, w_o in (
                            (-2, 1.0, -1, 27.0), (-1, 121.0, 0, 235.0),
                            (0, 235.0, 1, 121.0), (1, 27.0, 2, 1.0)):
                        d = np.where(odd, x0 + off_o, x0 + off_e)
                        w = np.where(odd, w_o, w_e)
                        contribs.append((d, w, d >= 0))
                    return contribs

            parts = []
            for dx, wx, kx in axis(gpx):
                for dy, wy, ky in axis(gpy):
                    m = np.ones(len(v), dtype=bool)
                    if kx is not None:
                        m &= kx
                    if ky is not None:
                        m &= ky
                    if not m.any():
                        continue
                    w = (wx * wy)[m]
                    parts.append(pa.table({
                        "pix_id": pa.array(pack_pixel(zp, dx[m], dy[m])),
                        "wv": pa.array(w * v[m]), "w": pa.array(w)}))
            t = (pa.concat_tables(parts) if parts else
                 pa.table({"pix_id": pa.array([], pa.uint64()),
                           "wv": pa.array([], pa.float64()),
                           "w": pa.array([], pa.float64())}))
        out = t.group_by(["pix_id"]).aggregate([("wv", "sum"), ("w", "sum")])
        return out.rename_columns(["pix_id", "wv", "w"])

    partials = pixels.map_batches(scatter, batch_format="pyarrow")
    agg = partials.groupby("pix_id").aggregate(Sum("wv", alias_name="wv"),
                                               Sum("w", alias_name="w"))

    def finalize(batch: pa.Table) -> pa.Table:
        wv = batch["wv"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        val = wv / w
        if mode == "rms":
            val = np.sqrt(val)
        return pa.table({"pix_id": batch["pix_id"], "burn": pa.array(val)})

    return agg.map_batches(finalize, batch_format="pyarrow")


def _overview_mode(pixels: ray.data.Dataset,
                   n_buckets: int = 256) -> ray.data.Dataset:
    """mode: in-batch (parent, value) partial counts, then ONE shuffle
    to `n_buckets` bounded parent-hash buckets whose kernel finishes the
    counts with a pyarrow group_by and picks argmax(count, -value) via
    one lexsort — exact ties -> smallest value."""
    from .rasterize import pack_pixel, unpack_pixel

    def partial(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        z, gpx, gpy = unpack_pixel(pix)
        parent = pack_pixel(int(z[0]) - 1 if len(z) else 0, gpx >> 1, gpy >> 1)
        t = pa.table({"pix_id": pa.array(parent), "burn": batch["burn"]})
        out = t.group_by(["pix_id", "burn"]).aggregate([("burn", "count")])
        out = out.rename_columns(["pix_id", "burn", "cnt"])
        bb = (out["pix_id"].to_numpy(zero_copy_only=False)
              % np.uint64(n_buckets)).astype(np.int32)
        return out.append_column("bb", pa.array(bb))

    def mode_group(tbl: pa.Table) -> pa.Table:
        t = tbl.group_by(["pix_id", "burn"]).aggregate([("cnt", "sum")])
        pix = t["pix_id"].to_numpy(zero_copy_only=False)
        val = t["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = t["cnt_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((val, -cnt, pix))  # per pixel: max cnt, min value
        pix_s = pix[order]
        first = np.ones(len(pix_s), dtype=bool)
        first[1:] = pix_s[1:] != pix_s[:-1]
        return pa.table({"pix_id": pa.array(pix_s[first]),
                         "burn": pa.array(val[order][first])})

    return (pixels.map_batches(partial, batch_format="pyarrow")
            .groupby("bb").map_groups(mode_group, batch_format="pyarrow"))


def overview_pyramid(pixels: ray.data.Dataset, z_base: int, z_min: int,
                     how: str = "sum", tile_size: int = 256,
                     shuffle_partitions=None):
    """Full chain z_base → z_min over sparse pixel rows; {z: Dataset}."""
    levels = {z_base: pixels}
    cur = pixels
    for z in range(z_base - 1, z_min - 1, -1):
        cur = overview_pixels(cur, how=how, tile_size=tile_size,
                              shuffle_partitions=shuffle_partitions)
        levels[z] = cur
    return levels


def overview_to_level(pixels: ray.data.Dataset, z_base: int, z_target: int,
                      how: str = "sum",
                      shuffle_partitions=None) -> ray.data.Dataset:
    """Direct z_base → z_target reduction in ONE shuffle.

    Valid for the DISTRIBUTIVE reducers (sum, max, mean4 = sum/4^L):
    grouping straight to the 2^L×2^L ancestor equals the chained
    per-level reduction, so when only one coarse level is consumed the
    L-1 intermediate groupby barriers of overview_pyramid are pure
    overhead. Non-distributive reducers (average-over-present, rms,
    gauss, mode, cubicspline) MUST use the per-level chain."""
    if how not in ("sum", "max", "mean4"):
        raise ValueError("overview_to_level requires a distributive reducer")
    levels = z_base - z_target
    if levels < 0:
        raise ValueError("z_target must be <= z_base")
    if levels == 0:
        return pixels
    pa_agg = {"sum": "sum", "mean4": "sum", "max": "max"}[how]

    from .rasterize import combine_pixel_partials, pack_pixel, unpack_pixel

    def to_ancestor(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        burn = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        z, gpx, gpy = unpack_pixel(pix)
        anc = pack_pixel(z_target, gpx >> levels, gpy >> levels)
        t = pa.table({"pix_id": pa.array(anc), "burn": pa.array(burn)})
        out = t.group_by(["pix_id"]).aggregate([("burn", pa_agg)])
        return out.rename_columns(["pix_id", "burn"])

    partials = pixels.map_batches(to_ancestor, batch_format="pyarrow")
    out = combine_pixel_partials(partials, pa_agg, shuffle_partitions)
    if how == "mean4":
        scale = float(4 ** levels)

        def div(batch: pa.Table) -> pa.Table:
            b = batch["burn"].to_numpy(zero_copy_only=False) / scale
            return batch.drop_columns(["burn"]).append_column("burn", pa.array(b))

        out = out.map_batches(div, batch_format="pyarrow")
    return out


def tile_stats(tiles: ray.data.Dataset) -> ray.data.Dataset:
    """Pyramid-level summary from tile-summary rows."""
    from .relational import global_agg

    return global_agg(tiles, [
        ("count", None, "n_tiles"),
        ("sum", "nonzero", "nonzero_px"),
        ("sum", "total", "total_burn"),
        ("min", "checksum", "min_checksum"),
        ("max", "checksum", "max_checksum"),
    ])
