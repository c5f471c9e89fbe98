"""gdal_translate analog: raster format conversion with windowing,
resizing, scaling and dtype casting (reference:
`apps/gdal_translate_lib.cpp`).

Usage:
    python scripts/gdal_translate.py SRC DST
        [-of GTiff|PNG|BMP|JPEG|AAIGrid|XYZ]  # inferred from DST if omitted
        [-b BAND]...                   # band selection (0-based)
        [-srcwin XOFF YOFF XSIZE YSIZE]
        [-outsize W H]                 # nearest resampling
        [-scale [SRCMIN SRCMAX [DSTMIN DSTMAX]]]
        [-ot Byte|UInt16|Int16|UInt32|Int32|Float32|Float64]
        [-a_srs EPSG:XXXX]             # override/assign CRS (GTiff)

Like GDAL, the unit of work is one raster: decode, window, resample,
scale, cast and re-encode run in one Ray task per file (pass multiple
SRC files to fan out — each translates independently). Georeferencing
is windowed/rescaled through the affine for GTiff outputs.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

_DTYPES = {"Byte": "uint8", "UInt16": "uint16", "Int16": "int16",
           "UInt32": "uint32", "Int32": "int32",
           "Float32": "float32", "Float64": "float64"}

_EXT_TO_DRIVER = {".tif": "GTiff", ".tiff": "GTiff", ".png": "PNG",
                  ".bmp": "BMP", ".jpg": "JPEG", ".jpeg": "JPEG",
                  ".asc": "AAIGrid", ".xyz": "XYZ",
                  ".jp2": "JP2OpenJPEG", ".j2k": "JP2OpenJPEG"}


def translate_one(buf: bytes, opts: dict, path: str = "") -> bytes:
    import numpy as np

    from lib_gdal_ray.sources.rasters import (identify, open_raster,
                                              open_raster_path,
                                              write_raster)

    if identify(buf) is not None or not path:
        _drv, arr, meta = open_raster(buf)
    else:
        _drv, arr, meta = open_raster_path(path)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    gt = list(meta.get("transform") or (0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
    if opts["bands"]:
        arr = arr[:, :, opts["bands"]]
    if opts["srcwin"]:
        xo, yo, xs, ys = opts["srcwin"]
        arr = arr[yo:yo + ys, xo:xo + xs]
        gt[0] += xo * gt[1]
        gt[3] += yo * gt[5]
    if opts["outsize"]:
        w2, h2 = opts["outsize"]
        h1, w1 = arr.shape[:2]
        iy = np.minimum((np.arange(h2) + 0.5) * h1 / h2, h1 - 1).astype(int)
        ix = np.minimum((np.arange(w2) + 0.5) * w1 / w2, w1 - 1).astype(int)
        arr = arr[iy][:, ix]
        gt[1] *= w1 / w2
        gt[5] *= h1 / h2
    if opts["scale"] is not None:
        s = opts["scale"]
        if len(s) == 0:
            smin, smax = float(arr.min()), float(arr.max())
            dmin, dmax = 0.0, 255.0
        else:
            smin, smax = s[0], s[1]
            dmin, dmax = (s[2], s[3]) if len(s) == 4 else (0.0, 255.0)
        den = (smax - smin) or 1.0
        arr = (arr.astype(np.float64) - smin) * (dmax - dmin) / den + dmin
        arr = np.clip(arr, min(dmin, dmax), max(dmin, dmax))
        if opts["ot"] is None:
            opts = dict(opts, ot="uint8")
    if opts["ot"]:
        np_t = np.dtype(opts["ot"])
        if np_t.kind in "ui":
            arr = np.clip(np.floor(arr.astype(np.float64) + 0.5),
                          np.iinfo(np_t).min, np.iinfo(np_t).max)
        arr = arr.astype(np_t)
    if arr.shape[2] == 1:
        arr = arr[:, :, 0]
    kw = {}
    if opts["driver"] in ("GTiff", "JP2OpenJPEG"):
        kw["transform"] = tuple(gt)
        kw["epsg"] = opts["a_srs"] or meta.get("epsg")
    elif opts["driver"] in ("AAIGrid", "XYZ"):
        kw["transform"] = tuple(gt)
    return write_raster(np.ascontiguousarray(arr), opts["driver"], **kw)


def main():
    ap = argparse.ArgumentParser(
        description="gdal_translate analog over Ray Data")
    ap.add_argument("src", nargs="+")
    ap.add_argument("dst")
    ap.add_argument("-of", dest="driver", default=None)
    ap.add_argument("-b", dest="bands", action="append", type=int,
                    default=[])
    ap.add_argument("-srcwin", nargs=4, type=int, default=None,
                    metavar=("XOFF", "YOFF", "XSIZE", "YSIZE"))
    ap.add_argument("-outsize", nargs=2, type=int, default=None,
                    metavar=("W", "H"))
    ap.add_argument("-scale", nargs="*", type=float, default=None)
    ap.add_argument("-ot", default=None, choices=sorted(_DTYPES))
    ap.add_argument("-a_srs", default=None)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import time

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")

    t0 = time.perf_counter()
    driver = args.driver or _EXT_TO_DRIVER.get(
        os.path.splitext(args.dst)[1].lower(), "GTiff")
    opts = {"bands": args.bands, "srcwin": args.srcwin,
            "outsize": args.outsize, "scale": args.scale,
            "ot": _DTYPES.get(args.ot), "driver": driver,
            "a_srs": int(args.a_srs.split(":")[-1]) if args.a_srs else None}

    @ray.remote
    def one(path: str, dst: str) -> dict:
        with open(path, "rb") as f:
            buf = f.read()
        out = translate_one(buf, opts, path=path)
        tmp = dst + ".tmp"
        with open(tmp, "wb") as f:
            f.write(out)
        os.replace(tmp, dst)
        return {"src": path, "dst": dst, "bytes": len(out)}

    if len(args.src) == 1:
        jobs = [one.remote(args.src[0], args.dst)]
    else:  # fan out: DST is a directory, one output per input
        os.makedirs(args.dst, exist_ok=True)
        ext = {"GTiff": ".tif", "PNG": ".png", "BMP": ".bmp",
               "JP2OpenJPEG": ".jp2",
               "JPEG": ".jpg", "AAIGrid": ".asc", "XYZ": ".xyz"}[driver]
        jobs = [one.remote(p, os.path.join(
            args.dst, os.path.splitext(os.path.basename(p))[0] + ext))
            for p in args.src]
    results = ray.get(jobs)
    print(json.dumps({"driver": driver, "n": len(results),
                      "results": results,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
