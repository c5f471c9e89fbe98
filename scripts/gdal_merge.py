"""gdal_merge analog: mosaic rasters, last source wins per pixel
(reference: `swig/python/gdal-utils/osgeo_utils/gdal_merge.py`; engine
kernel `pipelines/mosaic.py` one-hot priority cascade).

Default matches the reference: every pixel of a later source overwrites
the earlier one (zeros included). `-n NODATA` skips pixels equal to
NODATA when copying, like gdal_merge's -n.

Usage:
    python scripts/gdal_merge.py -o OUT.tif SRC1 SRC2 [...]
        [-n NODATA] [--band 0] [--num-cpus N]

Inputs must share a grid (same geotransform family); the output canvas
is the first source's frame (pixels outside it are dropped by the
compose window, matching -ul_lr on the first input).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import compose_geotiff, open_meta, pixels_ds


def main():
    ap = argparse.ArgumentParser(description="gdal_merge analog")
    ap.add_argument("srcs", nargs="+")
    ap.add_argument("-o", dest="dst", required=True)
    ap.add_argument("-n", dest="nodata", type=float, default=None,
                    help="skip source pixels equal to this value")
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

    from lib_gdal_ray.pipelines.mosaic import mosaic

    import pyarrow as pa
    import pyarrow.compute as pc

    t0 = time.perf_counter()
    h, w, meta = open_meta(args.srcs[0])

    nodata = args.nodata

    def drop_nodata(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["burn"], nodata))

    layers = [pixels_ds(s, args.band) for s in args.srcs]
    if nodata is not None:  # -n: nodata pixels do not overwrite
        layers = [lyr.map_batches(drop_nodata, batch_format="pyarrow")
                  for lyr in layers]
    out = mosaic(layers)
    nbytes = compose_geotiff(out, h, w, args.dst, meta)
    print(json.dumps({"dst": args.dst, "n_sources": len(args.srcs),
                      "bytes": nbytes,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
