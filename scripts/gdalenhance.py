"""gdalenhance analog: histogram-equalize a raster to Byte.

    python scripts/gdalenhance.py src dst.tif [-equalize]
        [--nbins 256] [--num-cpus N]

Reference surface: apps/gdalenhance.cpp (per-band histogram →
cumulative-distribution LUT → enhanced Byte output).  Distributed
shape: the pixel array broadcasts once; strip tasks return per-band
histogram partials (nbins ints each — tiny), the driver folds them
into the equalization LUT, and a second strip fan-out applies the LUT.
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


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-equalize", action="store_true", default=True)
    ap.add_argument("--nbins", type=int, default=256)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.perf_counter()
        from lib_gdal_ray.codecs.tiff import encode_geotiff
        from lib_gdal_ray.sources.rasters import open_raster_path

        _drv, arr, meta = open_raster_path(args.src)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, bands = arr.shape
        arr = np.ascontiguousarray(arr)
        ref = ray.put(arr)
        nbins = args.nbins
        lo = arr.reshape(-1, bands).min(axis=0).astype(np.float64)
        hi = arr.reshape(-1, bands).max(axis=0).astype(np.float64)
        hi = np.where(hi > lo, hi, lo + 1)

        n_strips = max(1, min(args.num_cpus * 2, h))
        bounds = np.linspace(0, h, n_strips + 1).astype(int)

        @ray.remote
        def hist_strip(a, y0, y1):
            out = np.zeros((bands, nbins), dtype=np.int64)
            for b in range(bands):
                v = a[y0:y1, :, b].ravel().astype(np.float64)
                idx = np.clip(((v - lo[b]) / (hi[b] - lo[b])
                               * nbins).astype(np.int64), 0, nbins - 1)
                out[b] = np.bincount(idx, minlength=nbins)
            return out

        parts = ray.get([hist_strip.remote(ref, int(a), int(b))
                         for a, b in zip(bounds[:-1], bounds[1:])
                         if b > a])
        hist = np.sum(parts, axis=0)
        # equalization LUT per band: cdf -> [0, 255]
        cdf = np.cumsum(hist, axis=1).astype(np.float64)
        cdf /= cdf[:, -1:]
        lut = np.clip((cdf * 255.999).astype(np.int64), 0,
                      255).astype(np.uint8)
        lut_ref = ray.put(lut)

        @ray.remote
        def apply_strip(a, lut_r, y0, y1):
            out = np.empty((y1 - y0, w, bands), dtype=np.uint8)
            for b in range(bands):
                v = a[y0:y1, :, b].astype(np.float64)
                idx = np.clip(((v - lo[b]) / (hi[b] - lo[b])
                               * nbins).astype(np.int64), 0, nbins - 1)
                out[:, :, b] = lut_r[b][idx]
            return y0, out

        out = np.empty((h, w, bands), dtype=np.uint8)
        for y0, block in ray.get([
                apply_strip.remote(ref, lut_ref, int(a), int(b))
                for a, b in zip(bounds[:-1], bounds[1:]) if b > a]):
            out[y0:y0 + block.shape[0]] = block
        if bands == 1:
            out = out[:, :, 0]

        buf = encode_geotiff(out, transform=meta.get("transform"),
                             epsg=meta.get("epsg"))
        tmp = args.dst + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, args.dst)
        print(json.dumps({"src": args.src, "dst": args.dst,
                          "bands": bands, "nbins": nbins,
                          "sec": round(time.perf_counter() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
