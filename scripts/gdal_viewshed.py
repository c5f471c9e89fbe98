"""gdal_viewshed analog: per-pixel line-of-sight visibility raster
from one observer.

    python scripts/gdal_viewshed.py -ox X -oy Y [-oz 2.0]
        [-vv 255] [-iv 0] [-md MAXDIST] src dst.tif [--num-cpus N]

Reference surface: apps/gdal_viewshed.cpp over `alg/viewshed/`
(observer at georeferenced (ox, oy), height oz above the DEM; output
byte raster: vv = visible, iv = not visible; -md marks pixels beyond
the distance as iv).  Distributed shape: the DEM broadcasts once via
`ray.put`; destination rows split into strips, one Ray task per strip
runs the vectorized lockstep ray-march (`pipelines/viewshed.
line_of_sight`) against its target block.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-ox", type=float, required=True)
    ap.add_argument("-oy", type=float, required=True)
    ap.add_argument("-oz", type=float, default=2.0)
    ap.add_argument("-vv", type=int, default=255)
    ap.add_argument("-iv", type=int, default=0)
    ap.add_argument("-md", type=float, default=None,
                    help="max distance in georeferenced units")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.perf_counter()
        from lib_gdal_ray.codecs.tiff import encode_geotiff
        from lib_gdal_ray.sources.rasters import open_raster_path

        _drv, dem, meta = open_raster_path(args.src)
        if dem.ndim == 3:
            dem = dem[:, :, 0]
        dem = np.ascontiguousarray(dem, dtype=np.float64)
        h, w = dem.shape
        gt = meta.get("transform") or (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
        # observer georeferenced -> pixel (north-up affine)
        ox = int(round((args.ox - gt[0]) / gt[1]))
        oy = int(round((args.oy - gt[3]) / gt[5]))
        if not (0 <= ox < w and 0 <= oy < h):
            raise SystemExit("gdal_viewshed: observer outside the raster")
        md_px = None
        if args.md is not None:
            md_px = args.md / abs(gt[1])  # pixels (square-pixel rasters)

        dem_ref = ray.put(dem)

        @ray.remote
        def strip(dem_r, y0: int, y1: int):
            from lib_gdal_ray.pipelines.viewshed import line_of_sight

            ty, tx = np.mgrid[y0:y1, 0:w]
            tx, ty = tx.ravel(), ty.ravel()
            vis = line_of_sight(dem_r, ox, oy, args.oz, tx, ty)
            if md_px is not None:
                vis &= np.hypot(tx - ox, ty - oy) <= md_px
            out = np.where(vis, np.uint8(args.vv), np.uint8(args.iv))
            return y0, out.reshape(y1 - y0, w).astype(np.uint8)

        n_strips = max(1, min(args.num_cpus * 2, h))
        bounds = np.linspace(0, h, n_strips + 1).astype(int)
        futs = [strip.remote(dem_ref, int(a), int(b))
                for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
        out = np.empty((h, w), dtype=np.uint8)
        for y0, block in ray.get(futs):
            out[y0:y0 + block.shape[0]] = block

        buf = encode_geotiff(out, transform=gt, epsg=meta.get("epsg"))
        tmp = args.dst + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, args.dst)
        n_vis = int((out == args.vv).sum())
        print(json.dumps({"src": args.src, "dst": args.dst,
                          "observer_pixel": [ox, oy],
                          "n_visible": n_vis, "n_total": int(h * w),
                          "sec": round(time.perf_counter() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
