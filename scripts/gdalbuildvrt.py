"""gdalbuildvrt analog: author a mosaic VRT over georeferenced rasters
(reference: `apps/gdalbuildvrt_lib.cpp`/`apps/gdalbuildvrt_bin.cpp`;
engine `sources/vrt.py` build_vrt). Header-only — no pixel data is
read; the VRT is a plan the readers (`open_vrt`, `read_vrt_pixels`)
execute later with one Ray task per source tile.

Usage:
    python scripts/gdalbuildvrt.py OUT.vrt SRC1.tif SRC2.tif [...]
        [-resolution highest|lowest|average] [-srcnodata V]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="gdalbuildvrt analog")
    ap.add_argument("dst")
    ap.add_argument("srcs", nargs="+")
    ap.add_argument("-resolution", choices=["highest", "lowest", "average"],
                    default="highest")
    ap.add_argument("-srcnodata", type=float, default=None)
    args = ap.parse_args()

    from lib_gdal_ray.sources.vrt import build_vrt, write_vrt

    t0 = time.perf_counter()
    ds = build_vrt(args.srcs, resolution=args.resolution,
                   src_nodata=args.srcnodata)
    write_vrt(ds, args.dst)
    print(json.dumps({"dst": args.dst, "xsize": ds.xsize, "ysize": ds.ysize,
                      "bands": len(ds.bands), "n_sources": len(args.srcs),
                      "sec": round(time.perf_counter() - t0, 3)}))


if __name__ == "__main__":
    main()
