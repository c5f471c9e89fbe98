"""gdal_rasterize analog: burn vector geometries into a GeoTIFF
(reference: `apps/gdal_rasterize_lib.cpp` + `alg/gdalrasterize.cpp`
scanline semantics, re-derived in geom/scanline.py).

Usage:
    python scripts/gdal_rasterize.py SRC DST
        -te XMIN YMIN XMAX YMAX      # target extent (georeferenced)
        (-ts WIDTH HEIGHT | -tr XRES YRES)
        [-burn VALUE | -a ATTRIBUTE]
        [-at]                        # ALL_TOUCHED
        [-add | -count | -max | -min]  # merge algorithm (default: last
                                       # writer wins is GDAL's REPLACE;
                                       # here partials merge with 'max'
                                       # unless -add/-count/-min given)
        [-a_srs EPSG:4326] [--geometry-col geometry] [--num-cpus N]

SRC: any vector format the engine reads (parquet / gpkg / shapefile /
geojson(+seq) / csv-wkt). DST: a georeferenced GeoTIFF.

The burn runs distributed: each geometry splits into bounded scanline
chunks, chunks rasterize + pre-combine in-batch, ONE narrow pixel
shuffle merges, and the single-file output composes in one Ray task.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser(
        description="gdal_rasterize analog over Ray Data")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-te", nargs=4, type=float, required=True,
                    metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    ap.add_argument("-ts", nargs=2, type=int, default=None,
                    metavar=("WIDTH", "HEIGHT"))
    ap.add_argument("-tr", nargs=2, type=float, default=None,
                    metavar=("XRES", "YRES"))
    ap.add_argument("-burn", type=float, default=1.0)
    ap.add_argument("-a", dest="attr", default=None)
    ap.add_argument("-at", action="store_true")
    ap.add_argument("-add", action="store_true")
    ap.add_argument("-count", action="store_true")
    ap.add_argument("-max", dest="use_max", action="store_true")
    ap.add_argument("-min", dest="use_min", action="store_true")
    ap.add_argument("-a_srs", default="EPSG:4326")
    ap.add_argument("--geometry-col", default="geometry")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    xmin, ymin, xmax, ymax = args.te
    if args.ts:
        w, h = args.ts
        xres, yres = (xmax - xmin) / w, (ymax - ymin) / h
    elif args.tr:
        xres, yres = args.tr
        w = int(round((xmax - xmin) / xres))
        h = int(round((ymax - ymin) / yres))
    else:
        ap.error("need -ts or -tr")
    merge = ("add" if args.add else "count" if args.count
             else "min" if args.use_min else "max")

    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import time

    t0 = time.perf_counter()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ogr2ogr import _infer_format, _read

    from lib_gdal_ray.pipelines.rasterize import (rasterize_geometries,
                                                  unpack_pixel)

    ds = _read(args.src, _infer_format(args.src, None), args.geometry_col)

    def to_pixel(x, y):
        return (x - xmin) / xres, (ymax - y) / yres

    z = 0
    while (1 << z) * 256 < max(w, h):
        z += 1
    pixels = rasterize_geometries(
        ds, z, wkb_col=args.geometry_col, burn=args.burn,
        value_col=args.attr, merge_alg=merge, all_touched=args.at,
        to_pixel=to_pixel, grid_w=w, grid_h=h)

    refs = pixels.to_arrow_refs()

    @ray.remote
    def compose(*blocks) -> bytes:
        from lib_gdal_ray.codecs.tiff import encode_geotiff

        dense = np.zeros((h, w), dtype=np.float32)
        for blk in blocks:
            if len(blk) == 0:
                continue
            _z, gx, gy = unpack_pixel(
                blk["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
            ok = (gx < w) & (gy < h)
            dense[gy[ok], gx[ok]] = blk["burn"].to_numpy(
                zero_copy_only=False)[ok].astype(np.float32)
        transform = (xmin, xres, 0.0, ymax, 0.0, -yres)
        return encode_geotiff(dense, transform=transform,
                              epsg=int(args.a_srs.split(":")[-1]))

    buf = ray.get(compose.remote(*refs))
    tmp = args.dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, args.dst)
    print(json.dumps({"src": args.src, "dst": args.dst, "size": [w, h],
                      "merge_alg": merge, "bytes": len(buf),
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
