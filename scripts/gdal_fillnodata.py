"""gdal_fillnodata analog: interpolate nodata pixels by inverse
distance weighting of nearby valid pixels (reference:
`alg/rasterfill.cpp:348-403`; scripts/gdal_fillnodata.py).

Usage:
    python scripts/gdal_fillnodata.py SRC DST
        [-md MAX_SEARCH_DIST] [-nodata VALUE] [--band 0] [--num-cpus N]

Valid pixels stream through the tile-halo co-partition IDW fill
(pipelines/fillnodata.py); unreachable pixels stay nodata.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import compose_geotiff, open_meta, pixels_ds


def main():
    ap = argparse.ArgumentParser(description="gdal_fillnodata analog")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-md", type=float, default=16.0, dest="maxdist")
    ap.add_argument("-nodata", type=float, default=0.0)
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as pc

    from lib_gdal_ray.pipelines.fillnodata import fillnodata

    t0 = time.perf_counter()
    h, w, meta = open_meta(args.src)
    px = pixels_ds(args.src, args.band)
    valid = px.map_batches(
        lambda b: b.filter(pc.not_equal(b["burn"], args.nodata)),
        batch_format="pyarrow")
    missing = px.map_batches(
        lambda b: b.filter(pc.equal(b["burn"], args.nodata)),
        batch_format="pyarrow")
    filled = fillnodata(valid, missing, max_search=args.maxdist)
    # output = valid passthrough + filled holes
    out = valid.union(filled)
    nbytes = compose_geotiff(out, h, w, args.dst, meta,
                             fill=args.nodata)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "max_search": args.maxdist, "bytes": nbytes,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
