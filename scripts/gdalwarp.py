"""gdalwarp analog: reproject a georeferenced raster to a new CRS /
grid (reference: `apps/gdalwarp_lib.cpp` + `alg/gdalwarper.cpp`;
inverse-mapping resampling like GDALWarpOperation).

Usage:
    python scripts/gdalwarp.py SRC DST
        -s_srs EPSG:XXXX -t_srs EPSG:YYYY     # s_srs defaults to the
                                              # source file's EPSG
        [-te XMIN YMIN XMAX YMAX]             # target extent (t_srs
                                              # units; default: source
                                              # footprint transformed)
        [-ts WIDTH HEIGHT | -tr XRES YRES]    # default: source size
        [-r near|bilinear]                    # resampling (default
                                              # bilinear, GDAL default
                                              # is near — pass -r near)
        [--band 0] [--num-cpus N]

Supported CRS pairs: 4326 ↔ 3857 and all WGS84 UTM zones (EPSG
326xx/327xx), composing through 4326 (geom/proj.py registry).

Shape: destination scanline chunks fan out as Ray tasks; each chunk
inverse-transforms its pixel centers to source grid coordinates and
samples the broadcast source plane (one `ray.put`, read per task) —
the distributed unit is the row chunk, the file is the work item.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser(description="gdalwarp analog over Ray Data")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-s_srs", default=None)
    ap.add_argument("-t_srs", required=True)
    ap.add_argument("-te", nargs=4, type=float, default=None,
                    metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    ap.add_argument("-ts", nargs=2, type=int, default=None,
                    metavar=("WIDTH", "HEIGHT"))
    ap.add_argument("-tr", nargs=2, type=float, default=None,
                    metavar=("XRES", "YRES"))
    ap.add_argument("-r", dest="resample", default="bilinear",
                    choices=["near", "bilinear"])
    ap.add_argument("-et", dest="err_threshold", type=float,
                    default=0.125,
                    help="approx-transformer error threshold in source"
                    " pixels (GDALApproxTransformer, alg/"
                    "gdaltransformer.cpp:58; 0 = exact transform "
                    "everywhere, like gdalwarp -et 0)")
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import time

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.geom.proj import Transformer
    from lib_gdal_ray.sources.rasters import open_raster

    t0 = time.perf_counter()
    with open(args.src, "rb") as f:
        buf = f.read()
    _drv, arr, meta = open_raster(buf)
    if arr.ndim == 3:
        arr = arr[:, :, args.band]
    sh, sw = arr.shape
    gt = meta.get("transform")
    if gt is None:
        ap.error("source has no geotransform (need a GeoTIFF)")
    src_epsg = int((args.s_srs or f"EPSG:{meta.get('epsg')}").split(":")[-1])
    dst_epsg = int(args.t_srs.split(":")[-1])
    fwd = Transformer.get(src_epsg, dst_epsg)
    inv = Transformer.get(dst_epsg, src_epsg)

    # default target extent: source boundary ring transformed (corners
    # alone under-cover curved edges; sample the full boundary)
    if args.te:
        xmin, ymin, xmax, ymax = args.te
    else:
        t = np.linspace(0.0, 1.0, 65)
        bx = np.concatenate([t * sw, np.full(65, sw), (1 - t) * sw,
                             np.zeros(65)])
        by = np.concatenate([np.zeros(65), t * sh, np.full(65, sh),
                             (1 - t) * sh])
        gx = gt[0] + bx * gt[1] + by * gt[2]
        gy = gt[3] + bx * gt[4] + by * gt[5]
        tx, ty = fwd.transform(gx, gy)
        xmin, xmax = float(tx.min()), float(tx.max())
        ymin, ymax = float(ty.min()), float(ty.max())
    if args.ts:
        w, h = args.ts
    elif args.tr:
        w = int(round((xmax - xmin) / args.tr[0]))
        h = int(round((ymax - ymin) / args.tr[1]))
    else:
        w, h = sw, sh
    xres, yres = (xmax - xmin) / w, (ymax - ymin) / h

    src_ref = ray.put(np.ascontiguousarray(arr.astype(np.float64)))
    resample = args.resample

    # destination scanline chunks -> inverse map -> sample
    chunk = max(1, min(256, h // max(1, args.num_cpus * 4) or 1))
    rows = ray.data.range(h)

    # approx-transformer threshold: -et is in SOURCE PIXELS; the
    # inverse transform outputs s_srs units, so scale by the source
    # pixel size (GDALCreateApproxTransformer's dfMaxError contract)
    et_units = args.err_threshold * min(abs(gt[1]), abs(gt[5]))

    def warp_rows(batch) -> "pa.Table":
        from lib_gdal_ray.geom.approx import ApproxTransformer
        from lib_gdal_ray.state.worker_cache import get_or_build

        plane = get_or_build("warp:" + src_ref.hex(),
                             lambda: ray.get(src_ref))
        ys = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ry = np.repeat(ys, w)
        rx = np.tile(np.arange(w, dtype=np.int64), len(ys))
        # dst pixel centers in t_srs
        dx = xmin + (rx + 0.5) * xres
        dy = ymax - (ry + 0.5) * yres
        if et_units > 0:
            # per-scanline subdivide-until-linear inverse mapping
            # (alg/gdaltransformer.cpp:58,2624): O(log w) exact
            # transform calls per row instead of w
            at = ApproxTransformer(inv, et_units)
            xs_row = xmin + (np.arange(w, dtype=np.float64) + 0.5) * xres
            sxg = np.empty(len(rx))
            syg = np.empty(len(rx))
            for k, yy in enumerate(ys):
                txr, tyr = at.transform_scanline(
                    xs_row, ymax - (yy + 0.5) * yres)
                sxg[k * w:(k + 1) * w] = txr
                syg[k * w:(k + 1) * w] = tyr
        else:
            sxg, syg = inv.transform(dx, dy)
        # t_srs -> source fractional pixel coords (north-up affine)
        fx = (sxg - gt[0]) / gt[1] - 0.5
        fy = (syg - gt[3]) / gt[5] - 0.5
        if resample == "near":
            ix = np.floor(fx + 0.5).astype(np.int64)
            iy = np.floor(fy + 0.5).astype(np.int64)
            ok = (ix >= 0) & (iy >= 0) & (ix < sw) & (iy < sh)
            val = np.zeros(len(fx))
            val[ok] = plane[iy[ok], ix[ok]]
        else:
            # edge-clamped taps: centers landing in the outer half-pixel
            # band still resample (GDAL behavior) instead of dropping to 0
            x0 = np.clip(np.floor(fx).astype(np.int64), 0, sw - 2)
            y0 = np.clip(np.floor(fy).astype(np.int64), 0, sh - 2)
            tx_ = np.clip(fx - x0, 0.0, 1.0)
            ty_ = np.clip(fy - y0, 0.0, 1.0)
            ok = (fx >= -0.5) & (fy >= -0.5) & (fx <= sw - 0.5) & (fy <= sh - 0.5)
            val = np.zeros(len(fx))
            xo, yo = x0[ok], y0[ok]
            txo, tyo = tx_[ok], ty_[ok]
            val[ok] = (plane[yo, xo] * (1 - txo) * (1 - tyo)
                       + plane[yo, xo + 1] * txo * (1 - tyo)
                       + plane[yo + 1, xo] * (1 - txo) * tyo
                       + plane[yo + 1, xo + 1] * txo * tyo)
        return pa.table({"ry": pa.array(ry), "rx": pa.array(rx),
                         "v": pa.array(val),
                         "ok": pa.array(ok)})

    sampled = rows.map_batches(warp_rows, batch_format="pyarrow",
                               batch_size=chunk)
    refs = sampled.to_arrow_refs()

    @ray.remote
    def compose(*blocks) -> bytes:
        from lib_gdal_ray.codecs.tiff import encode_geotiff

        dense = np.zeros((h, w), dtype=np.float32)
        for blk in blocks:
            if len(blk) == 0:
                continue
            ok = blk["ok"].to_numpy(zero_copy_only=False)
            ry = blk["ry"].to_numpy(zero_copy_only=False)[ok]
            rx = blk["rx"].to_numpy(zero_copy_only=False)[ok]
            dense[ry, rx] = blk["v"].to_numpy(
                zero_copy_only=False)[ok].astype(np.float32)
        transform = (xmin, xres, 0.0, ymax, 0.0, -yres)
        return encode_geotiff(dense, transform=transform, epsg=dst_epsg)

    out = ray.get(compose.remote(*refs))
    tmp = args.dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, args.dst)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "src_epsg": src_epsg, "dst_epsg": dst_epsg,
                      "size": [w, h], "resample": resample,
                      "te": [xmin, ymin, xmax, ymax],
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
