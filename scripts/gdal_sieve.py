"""gdal_sieve analog: remove raster regions smaller than a threshold by
merging them into their largest neighbor (reference:
`alg/gdalsievefilter.cpp:129-187`; scripts/gdal_sieve.py).

Usage:
    python scripts/gdal_sieve.py SRC DST -st THRESHOLD
        [-conn 4|8] [--band 0] [--num-cpus N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import compose_geotiff, open_meta, pixels_ds


def main():
    ap = argparse.ArgumentParser(description="gdal_sieve analog")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-st", type=int, required=True, dest="threshold")
    ap.add_argument("-conn", type=int, default=4, choices=[4, 8])
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.pipelines.sieve import sieve

    t0 = time.perf_counter()
    h, w, meta = open_meta(args.src)
    out = sieve(pixels_ds(args.src, args.band), args.threshold,
                connectivity=args.conn)
    nbytes = compose_geotiff(out, h, w, args.dst, meta)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "threshold": args.threshold, "bytes": nbytes,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
