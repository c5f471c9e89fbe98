"""gdal_edit analog: edit a raster's georeferencing metadata in place.

    python scripts/gdal_edit.py file.tif [-a_srs EPSG:4326]
        [-a_ullr ULX ULY LRX LRY] [-a_nodata V] [-tr XRES YRES]
        [--num-cpus N]

Reference surface: swig/python/gdal-utils/osgeo_utils/gdal_edit.py.
GDAL rewrites only the header; our pure-python GeoTIFF writer
re-encodes the (unchanged) pixels with the new metadata — the pixel
payload round-trips bit-identical, the georef keys change.
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


def _epsg(s: str) -> int:
    return int(s.split(":")[-1])


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("file")
    ap.add_argument("-a_srs", default=None)
    ap.add_argument("-a_ullr", nargs=4, type=float, default=None,
                    metavar=("ULX", "ULY", "LRX", "LRY"))
    ap.add_argument("-a_nodata", type=float, default=None)
    ap.add_argument("-tr", nargs=2, type=float, default=None,
                    metavar=("XRES", "YRES"))
    ap.add_argument("--num-cpus", type=int, default=4)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.time()

        @ray.remote
        def edit(path, a_srs, a_ullr, a_nodata, tr):
            from lib_gdal_ray.codecs.tiff import encode_geotiff
            from lib_gdal_ray.sources.rasters import open_raster_path

            _drv, arr, meta = open_raster_path(path)
            gt = list(meta.get("transform") or (0, 1, 0, 0, 0, -1))
            h, w = arr.shape[:2]
            if a_ullr is not None:
                ulx, uly, lrx, lry = a_ullr
                gt = [ulx, (lrx - ulx) / w, 0.0, uly, 0.0, (lry - uly) / h]
            if tr is not None:
                gt[1] = tr[0]
                gt[5] = -abs(tr[1])
            epsg = _epsg(a_srs) if a_srs else meta.get("epsg")
            nodata = a_nodata if a_nodata is not None else \
                meta.get("nodata")
            buf = encode_geotiff(arr, transform=tuple(gt), epsg=epsg,
                                 nodata=nodata)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf)
            os.replace(tmp, path)
            return {"size": [w, h], "transform": gt, "epsg": epsg,
                    "nodata": nodata}

        rep = ray.get(edit.remote(args.file, args.a_srs, args.a_ullr,
                                  args.a_nodata, args.tr))
        rep.update({"file": args.file, "sec": round(time.time() - t0, 3)})
        print(json.dumps(rep))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
