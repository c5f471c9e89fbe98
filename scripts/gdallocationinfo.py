"""gdallocationinfo analog: probe raster values at coordinates
(reference: `apps/gdallocationinfo.cpp`).

Usage:
    python scripts/gdallocationinfo.py SRC X Y [X Y ...]
        [-geoloc]            # X Y are georeferenced (default: pixel/line)
    python scripts/gdallocationinfo.py SRC -csv POINTS.csv [-geoloc]
        # CSV with x,y header — batch probes

Prints one JSON object with per-point (x, y, pixel, line, values per
band). Like GDAL, the unit of work is one raster; batch CSV probes
sample vectorized.
"""

import argparse
import csv
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser(
        description="gdallocationinfo analog")
    ap.add_argument("src")
    ap.add_argument("coords", nargs="*", type=float)
    ap.add_argument("-csv", dest="csv_path", default=None)
    ap.add_argument("-geoloc", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from lib_gdal_ray.sources.rasters import open_raster

    with open(args.src, "rb") as f:
        buf = f.read()
    _drv, arr, meta = open_raster(buf)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    gt = meta.get("transform")

    if args.csv_path:
        with open(args.csv_path) as f:
            rows = list(csv.DictReader(f))
        xs = np.asarray([float(r["x"]) for r in rows])
        ys = np.asarray([float(r["y"]) for r in rows])
    else:
        if len(args.coords) % 2:
            ap.error("need X Y pairs")
        xs = np.asarray(args.coords[0::2], dtype=np.float64)
        ys = np.asarray(args.coords[1::2], dtype=np.float64)

    if args.geoloc:
        if gt is None:
            ap.error("-geoloc needs a georeferenced source")
        px = (xs - gt[0]) / gt[1]
        ln = (ys - gt[3]) / gt[5]
    else:
        px, ln = xs, ys
    ix = np.floor(px).astype(int)
    iy = np.floor(ln).astype(int)
    out = []
    for i in range(len(xs)):
        ok = 0 <= ix[i] < w and 0 <= iy[i] < h
        out.append({
            "x": float(xs[i]), "y": float(ys[i]),
            "pixel": int(ix[i]), "line": int(iy[i]),
            "in_raster": bool(ok),
            "values": ([float(arr[iy[i], ix[i], b]) for b in range(bands)]
                       if ok else None),
        })
    print(json.dumps({"src": args.src, "n": len(out), "points": out}))


if __name__ == "__main__":
    main()
