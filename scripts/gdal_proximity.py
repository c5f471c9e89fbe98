"""gdal_proximity analog: per-pixel distance to the nearest target
pixel, capped at -maxdist (reference: `alg/gdalproximity.cpp:29-101`;
scripts/gdal_proximity.py).

Usage:
    python scripts/gdal_proximity.py SRC DST
        [-maxdist D] [-tv V ...]   # target values (default: nonzero)
        [--band 0] [--shuffle] [--num-cpus N]

--shuffle uses the cell-partitioned big-target variant
(proximity_shuffle); default broadcasts the target pixel set.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import compose_geotiff, open_meta, pixels_ds


def main():
    ap = argparse.ArgumentParser(description="gdal_proximity analog")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-maxdist", type=float, default=64.0)
    ap.add_argument("-tv", type=float, nargs="*", default=None)
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--shuffle", action="store_true")
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

    from lib_gdal_ray.pipelines.proximity import proximity, proximity_shuffle

    t0 = time.perf_counter()
    h, w, meta = open_meta(args.src)
    px = pixels_ds(args.src, args.band)
    tv = args.tv

    def targets(batch: pa.Table) -> pa.Table:
        v = batch["burn"].to_numpy(zero_copy_only=False)
        keep = np.isin(v, tv) if tv else (v != 0)
        return batch.filter(pa.array(keep))

    tgt = px.map_batches(targets, batch_format="pyarrow")
    fn = proximity_shuffle if args.shuffle else proximity
    out = fn(px, tgt, maxdist=args.maxdist)
    nbytes = compose_geotiff(out, h, w, args.dst, meta,
                             value_col="dist", fill=args.maxdist)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "maxdist": args.maxdist,
                      "variant": "shuffle" if args.shuffle else "broadcast",
                      "bytes": nbytes,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
