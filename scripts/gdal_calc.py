"""gdal_calc analog: per-pixel band math between rasters (reference:
`swig/python/gdal-utils/osgeo_utils/gdal_calc.py` semantics for the
two-input arithmetic core; engine kernel `pipelines/raster_calc.py`).

Usage:
    python scripts/gdal_calc.py -A A.tif [-B B.tif] OUT.tif
        --calc "(A - B) / (A + B)"        # infix band math (gdal_calc
                                          # --calc; swq evaluator)
        --op add|sub|mul|div|min|max      # A op B (needs -B)
        [--scale S] [--offset O]          # else: A*S + O
        [--band-a 0] [--band-b 0] [--num-cpus N]

The co-alignment is ONE groupby(pix) exchange of side-tagged rows;
absent pixels are 0 (gdal_calc's default NoDataValue=0 behavior).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import compose_geotiff, open_meta, pixels_ds


def main():
    ap = argparse.ArgumentParser(description="gdal_calc analog")
    ap.add_argument("dst")
    ap.add_argument("-A", required=True)
    ap.add_argument("-B", default=None)
    ap.add_argument("--op", default=None,
                    choices=["add", "sub", "mul", "div", "min", "max"])
    ap.add_argument("--calc", default=None,
                    help="infix expression over A/B band names "
                    "(gdal_calc --calc analog)")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--offset", type=float, default=0.0)
    ap.add_argument("--band-a", type=int, default=0)
    ap.add_argument("--band-b", type=int, default=0)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()
    if args.B and not (args.op or args.calc):
        ap.error("two inputs need --op or --calc")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.pipelines import raster_calc as rc

    t0 = time.perf_counter()
    h, w, meta = open_meta(args.A)
    a = pixels_ds(args.A, args.band_a)
    if args.calc:
        bands = {"A": a}
        if args.B:
            bands["B"] = pixels_ds(args.B, args.band_b)
        out = rc.pixel_expression(bands, args.calc, keep_empty=True)
    elif args.B:
        b = pixels_ds(args.B, args.band_b)
        out = rc.pixel_calc(a, b, args.op, keep_empty=True)
    else:
        out = rc.pixel_scale(a, scale=args.scale, offset=args.offset)
    nbytes = compose_geotiff(out, h, w, args.dst, meta)
    print(json.dumps({"dst": args.dst,
                      "op": args.calc or args.op or "scale",
                      "bytes": nbytes,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
