"""nearblack analog: set near-black collar pixels (connected to the
image edge) to exactly black/white (reference: `apps/nearblack_lib.cpp`
/ `gdalalg_raster_clean_collar.cpp`).

Usage:
    python scripts/nearblack.py SRC DST [-near TOLERANCE] [-setmask V]
        [--band 0] [--num-cpus N]

The collar comes from the distributed edge-flood (per-tile CC + the
image-border seed); only collar pixels rewrite (interior near-black
pixels stay, matching GDAL).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import compose_geotiff, open_meta, pixels_ds


def main():
    ap = argparse.ArgumentParser(description="nearblack analog")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-near", type=float, default=15.0)
    ap.add_argument("-setmask", type=float, default=0.0)
    ap.add_argument("--band", type=int, default=0)
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

    from lib_gdal_ray.pipelines.raster_calc import nearblack_collar
    from lib_gdal_ray.pipelines.rasterize import unpack_pixel

    t0 = time.perf_counter()
    h, w, meta = open_meta(args.src)
    px = pixels_ds(args.src, args.band).materialize()
    collar = nearblack_collar(px, (0, 0, w, h), tolerance=args.near)

    collar = collar.materialize()

    def setmask(batch: pa.Table) -> pa.Table:
        return pa.table({
            "pix_id": batch["pix_id"],
            "burn": pa.array(np.full(len(batch), float(args.setmask))),
        })

    # disjoint union: original pixels MINUS the collar (exact Bloom
    # anti-join — corpus streams) + the rewritten collar pixels
    from lib_gdal_ray.pipelines.joins import bloom_semi_anti_join

    keep = bloom_semi_anti_join(px, collar.select_columns(["pix_id"]),
                                "pix_id", anti=True)
    out = keep.union(collar.map_batches(setmask, batch_format="pyarrow"))
    nbytes = compose_geotiff(out, h, w, args.dst, meta)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "near": args.near, "bytes": nbytes,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
