"""gdal_retile analog: split rasters into a directory of fixed-size
tiles (+ optional shapefile-style tile index as parquet).

    python scripts/gdal_retile.py -targetDir DIR [-ps 256 256]
        [-overlap 0] [-of GTiff|PNG] [--index] src.tif [src2.tif ...]
        [--num-cpus N]

Reference surface: swig/python/gdal-utils/osgeo_utils/gdal_retile.py
(tile naming `<base>_<row>_<col>.<ext>`, 1-based, row-major; edge
tiles keep their partial size; georeferencing windowed through the
affine).  Distributed shape: each source decodes once in a Ray task,
the pixel array goes to the object store, and every tile encodes in
its own task (zero-copy window views) — tile writes are atomic
(tmp + rename), so a re-run skips finished tiles (--resume).
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
    ap.add_argument("srcs", nargs="+")
    ap.add_argument("-targetDir", required=True)
    ap.add_argument("-ps", nargs=2, type=int, default=[256, 256],
                    metavar=("W", "H"))
    ap.add_argument("-overlap", type=int, default=0)
    ap.add_argument("-of", default="GTiff", choices=["GTiff", "PNG"])
    ap.add_argument("--index", action="store_true",
                    help="write tileindex.parquet with tile bboxes")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.time()
        os.makedirs(args.targetDir, exist_ok=True)
        tw, th = args.ps
        ext = ".tif" if args.of == "GTiff" else ".png"

        @ray.remote
        def open_src(path: str):
            from lib_gdal_ray.sources.rasters import open_raster_path

            _drv, arr, meta = open_raster_path(path)
            return arr, meta

        @ray.remote
        def write_tile(arr, meta, y0, x0, hh, ww, dst, fmt):
            window = arr[y0:y0 + hh, x0:x0 + ww]
            if fmt == "PNG":
                import numpy as np

                from lib_gdal_ray.codecs.png import encode_png

                buf = encode_png(np.ascontiguousarray(
                    window).astype(np.uint8))
            else:
                from lib_gdal_ray.codecs.tiff import encode_geotiff

                gt = meta.get("transform")
                sub_gt = None
                if gt is not None:
                    g0, g1, g2, g3, g4, g5 = gt
                    sub_gt = (g0 + x0 * g1 + y0 * g2, g1, g2,
                              g3 + x0 * g4 + y0 * g5, g4, g5)
                import numpy as np

                buf = encode_geotiff(np.ascontiguousarray(window),
                                     transform=sub_gt,
                                     epsg=meta.get("epsg"),
                                     nodata=meta.get("nodata"))
            tmp = dst + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf)
            os.replace(tmp, dst)
            return dst

        n_tiles, skipped, index_rows = 0, 0, []
        step_x, step_y = tw - args.overlap, th - args.overlap
        for src in args.srcs:
            base = os.path.splitext(os.path.basename(src))[0]
            arr, meta = ray.get(open_src.remote(src))
            aref = ray.put(arr)
            h, w = arr.shape[:2]
            futs = []
            row = 0
            for y0 in range(0, h, step_y):
                row += 1
                col = 0
                for x0 in range(0, w, step_x):
                    col += 1
                    hh = min(th, h - y0)
                    ww = min(tw, w - x0)
                    dst = os.path.join(args.targetDir,
                                       f"{base}_{row}_{col}{ext}")
                    if args.resume and os.path.exists(dst):
                        skipped += 1
                        continue
                    futs.append(write_tile.remote(
                        aref, meta, y0, x0, hh, ww, dst, args.of))
                    gt = meta.get("transform")
                    if args.index and gt is not None:
                        g0, g1, g2, g3, g4, g5 = gt
                        xs = [g0 + x * g1 + y * g2
                              for x in (x0, x0 + ww) for y in (y0, y0 + hh)]
                        ys = [g3 + x * g4 + y * g5
                              for x in (x0, x0 + ww) for y in (y0, y0 + hh)]
                        index_rows.append({
                            "location": dst, "xmin": min(xs),
                            "ymin": min(ys), "xmax": max(xs),
                            "ymax": max(ys)})
            ray.get(futs)
            n_tiles += len(futs)
        if args.index and index_rows:
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.Table.from_pylist(index_rows),
                os.path.join(args.targetDir, "tileindex.parquet"))
        print(json.dumps({"target_dir": args.targetDir,
                          "tile_size": [tw, th], "n_tiles": n_tiles,
                          "skipped": skipped,
                          "sec": round(time.time() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
