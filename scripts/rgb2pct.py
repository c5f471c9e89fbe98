"""rgb2pct analog: quantize a 24-bit RGB raster to a paletted image.

    python scripts/rgb2pct.py src.tif dst.png [-n 16] [--dither]
        [--num-cpus N]

Distributed shape mirrors the reference's two-phase algorithm
(swig/python/gdal-utils/osgeo_utils/rgb2pct.py surface;
alg/gdalmediancut.cpp + alg/gdaldither.cpp math): the global color
histogram is a packed-RGB groupby over pixel batches, median cut
runs driver-side over the UNIQUE colors, and palette application /
Floyd-Steinberg dithering fan out per tile
(`pipelines/palette.quantize` / `dither_tile`).

Output is a palette-applied RGB raster (palette colors substituted
per pixel) in any writable raster format — the engine carries
palettes as explicit RGB, not indexed color tables.
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
    ap.add_argument("-n", "--n-colors", type=int, default=16)
    ap.add_argument("--dither", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.pipelines.palette import (dither_tile, median_cut,
                                                color_histogram, quantize)
    from lib_gdal_ray.sources.rasters import open_raster_path, write_raster

    t0 = time.time()
    driver, arr, meta = open_raster_path(args.src)
    if arr.ndim != 3 or arr.shape[2] < 3:
        raise SystemExit("rgb2pct: source must have >= 3 bands")
    h, w = arr.shape[:2]

    rows = pa.table({
        "y": pa.array(np.repeat(np.arange(h, dtype=np.int32), w)),
        "x": pa.array(np.tile(np.arange(w, dtype=np.int32), h)),
        "r": pa.array(arr[:, :, 0].ravel().astype(np.uint8)),
        "g": pa.array(arr[:, :, 1].ravel().astype(np.uint8)),
        "b": pa.array(arr[:, :, 2].ravel().astype(np.uint8)),
    })
    ds = ray.data.from_arrow(rows)

    if args.dither:
        hist = color_histogram(ds)
        pal = median_cut(hist, args.n_colors)
        idx = dither_tile(arr[:, :, :3], pal)
    else:
        out, pal = quantize(ds, n_colors=args.n_colors)
        df = out.to_pandas()
        idx = np.zeros((h, w), np.int32)
        idx[df["y"].to_numpy(), df["x"].to_numpy()] = \
            df["palette_idx"].to_numpy()

    result = pal[idx].astype(np.uint8)
    ext = os.path.splitext(args.dst)[1].lower()
    drv = {".tif": "GTiff", ".tiff": "GTiff", ".png": "PNG",
           ".bmp": "BMP", ".jpg": "JPEG"}.get(ext, "PNG")
    kw = {}
    if drv == "GTiff" and meta.get("transform") is not None:
        kw = {"transform": meta["transform"], "epsg": meta.get("epsg")}
    with open(args.dst, "wb") as fh:
        fh.write(write_raster(result, drv, **kw))
    ray.shutdown()
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "n_colors": int(len(pal)),
                      "dither": bool(args.dither),
                      "size": [w, h], "sec": round(time.time() - t0, 3)}))


if __name__ == "__main__":
    main()
