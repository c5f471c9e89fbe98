"""gdal_contour analog: iso-value contour lines from a raster,
georeferenced, written as vector features (reference:
`alg/contour.cpp:277-384` marching squares +
`alg/marching_squares/segment_merger.h`; engine kernel
`pipelines/contour.py`).

Usage:
    python scripts/gdal_contour.py SRC DST
        (-i INTERVAL [-off OFFSET] | -fl L1 L2 ...)
        [--band 0] [--segments] [--num-cpus N]

DST: .geojsonl (GeoJSONSeq) or .csv (CSV-WKT). Default output: one
stitched polyline summary per contour line (line_id, level, length,
n_segments, bbox envelope as the geometry). --segments instead writes
every marching-squares segment as a georeferenced 2-point LINESTRING
with its level — the exact line work, feature-per-segment.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import open_meta, pixels_ds


def main():
    ap = argparse.ArgumentParser(description="gdal_contour analog")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-i", type=float, default=None, dest="interval")
    ap.add_argument("-off", type=float, default=0.0)
    ap.add_argument("-fl", type=float, nargs="*", default=None)
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--segments", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.geom import wkb as wkb_mod
    from lib_gdal_ray.pipelines.contour import contour_lines, contour_segments
    from lib_gdal_ray.sources.rasters import open_raster

    t0 = time.perf_counter()
    h, w, meta = open_meta(args.src)
    gt = meta.get("transform") or (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    if args.fl:
        levels = list(args.fl)
    elif args.interval:
        with open(args.src, "rb") as f:
            _n, arr, _m = open_raster(f.read())
        if arr.ndim == 3:
            arr = arr[:, :, args.band]
        lo = np.floor((float(arr.min()) - args.off) / args.interval)
        hi = np.ceil((float(arr.max()) - args.off) / args.interval)
        levels = [args.off + k * args.interval
                  for k in range(int(lo), int(hi) + 1)]
        del arr
    else:
        ap.error("need -i INTERVAL or -fl levels")

    px = pixels_ds(args.src, args.band)

    def geo_xy(x, y):
        # segment coords are pixel-CENTER positions (the DEM value at
        # (x, y) is the sample at that center) — same as GDAL contour
        return (gt[0] + (x + 0.5) * gt[1] + (y + 0.5) * gt[2],
                gt[3] + (x + 0.5) * gt[4] + (y + 0.5) * gt[5])

    if args.segments:
        segs = contour_segments(px, levels)

        def to_feature(batch: pa.Table) -> pa.Table:
            x1 = batch["x1"].to_numpy(zero_copy_only=False)
            y1 = batch["y1"].to_numpy(zero_copy_only=False)
            x2 = batch["x2"].to_numpy(zero_copy_only=False)
            y2 = batch["y2"].to_numpy(zero_copy_only=False)
            gx1, gy1 = geo_xy(x1, y1)
            gx2, gy2 = geo_xy(x2, y2)
            geoms = [wkb_mod.linestring_to_wkb(
                np.asarray([[gx1[i], gy1[i]], [gx2[i], gy2[i]]]))
                for i in range(len(x1))]
            return pa.table({"level": batch["level"],
                             "geometry": pa.array(geoms, type=pa.binary())})

        out = segs.map_batches(to_feature, batch_format="pyarrow")
    else:
        lines = contour_lines(px, levels)

        def to_feature(batch: pa.Table) -> pa.Table:
            xmin = batch["x_min"].to_numpy(zero_copy_only=False)
            ymin = batch["y_min"].to_numpy(zero_copy_only=False)
            xmax = batch["x_max"].to_numpy(zero_copy_only=False)
            ymax = batch["y_max"].to_numpy(zero_copy_only=False)
            ax, ay = geo_xy(xmin, ymin)
            bx, by = geo_xy(xmax, ymax)
            geoms = [wkb_mod.box_to_wkb(min(ax[i], bx[i]), min(ay[i], by[i]),
                                        max(ax[i], bx[i]), max(ay[i], by[i]))
                     for i in range(len(ax))]
            t = pa.table({
                "line_id": batch["line_id"], "level": batch["level"],
                "n_segments": batch["n_segments"], "length": batch["length"],
                "geometry": pa.array(geoms, type=pa.binary()),
            })
            return t

        out = lines.map_batches(to_feature, batch_format="pyarrow")

    if args.dst.endswith(".csv"):
        from lib_gdal_ray.sources.vector_formats import write_csv_wkt

        write_csv_wkt(out, args.dst)
    else:
        from lib_gdal_ray.sources.vector_formats import write_geojson_seq

        write_geojson_seq(out, args.dst)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "levels": levels[:12],
                      "mode": "segments" if args.segments else "lines",
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
