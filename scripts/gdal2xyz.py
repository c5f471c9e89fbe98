"""gdal2xyz analog: raster → (x, y, value) rows (reference:
`swig/python/gdal-utils/osgeo_utils/gdal2xyz.py`).

Usage:
    python scripts/gdal2xyz.py SRC DST.csv [--band 0] [--skip-zero]
        [--num-cpus N]

Writes a directory of CSV shards (x,y,value — pixel centers through
the affine), streaming; never materializes the raster as rows on the
driver.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import open_meta, pixels_ds


def main():
    ap = argparse.ArgumentParser(description="gdal2xyz analog")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--skip-zero", action="store_true")
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

    from lib_gdal_ray.pipelines.rasterize import unpack_pixel

    t0 = time.perf_counter()
    _h, _w, meta = open_meta(args.src)
    gt = meta.get("transform") or (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

    def to_xyz(batch: pa.Table) -> pa.Table:
        _z, gx, gy = unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
        v = batch["burn"].to_numpy(zero_copy_only=False)
        if args.skip_zero:
            nz = v != 0
            gx, gy, v = gx[nz], gy[nz], v[nz]
        return pa.table({
            "x": pa.array(gt[0] + (gx + 0.5) * gt[1] + (gy + 0.5) * gt[2]),
            "y": pa.array(gt[3] + (gx + 0.5) * gt[4] + (gy + 0.5) * gt[5]),
            "value": pa.array(v),
        })

    out = pixels_ds(args.src, args.band).map_batches(to_xyz,
                                                     batch_format="pyarrow")
    out.write_csv(args.dst)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
