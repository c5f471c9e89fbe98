"""gdal_pansharpen analog: Brovey pansharpening of multispectral
bands with a higher-resolution panchromatic band.

    python scripts/gdal_pansharpen.py pan.tif spectral.tif out.tif
        [--bands 0 1 2] [--num-cpus N]

The pan raster streams as sparse pixel rows; each spectral band
upsamples to the pan grid and the Brovey ratio applies per-pixel in
ONE co-partitioned shuffle (`pipelines/mosaic.pansharpen` — the
weight/ratio math mirrors `alg/gdalpansharpen.cpp` WEIGHTED_BROVEY).

Reference: swig/python/gdal-utils/osgeo_utils/gdal_pansharpen.py
(surface), alg/gdalpansharpen.cpp (math).
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
    ap.add_argument("pan")
    ap.add_argument("spectral")
    ap.add_argument("dst")
    ap.add_argument("--bands", nargs="*", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        t0 = time.time()
        import numpy as np

        import _raster_cli as rc
        from lib_gdal_ray.codecs.tiff import encode_geotiff
        from lib_gdal_ray.pipelines.mosaic import pansharpen
        from lib_gdal_ray.pipelines.rasterize import unpack_pixel
        from lib_gdal_ray.sources.rasters import open_raster

        h, w, meta = rc.open_meta(args.pan)
        pan = rc.pixels_ds(args.pan, band=0)

        with open(args.spectral, "rb") as f:
            head = f.read()
        _fmt, sarr, _smeta = open_raster(head)
        nb = sarr.shape[2] if sarr.ndim == 3 else 1
        band_idx = (args.bands if args.bands is not None
                    else list(range(nb)))
        bands = [rc.pixels_ds(args.spectral, band=b) for b in band_idx]

        sharp = pansharpen(pan, bands)
        df = sharp.to_pandas()   # (pix_id, band, burn) rows
        _z, gx, gy = unpack_pixel(
            df["pix_id"].to_numpy().astype(np.uint64))
        b = df["band"].to_numpy()
        v = df["burn"].to_numpy().astype(np.float32)
        planes = np.zeros((h, w, len(band_idx)), np.float32)
        ok = (gx < w) & (gy < h) & (b < len(band_idx))
        planes[gy[ok], gx[ok], b[ok]] = v[ok]
        buf = encode_geotiff(planes, transform=meta.get("transform"),
                             epsg=meta.get("epsg"))
        tmp = args.dst + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, args.dst)
        print(json.dumps({"dst": args.dst, "size": [w, h],
                          "n_bands": len(band_idx),
                          "sec": round(time.time() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
