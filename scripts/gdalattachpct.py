"""gdalattachpct analog: attach a color table to an index raster.

    python scripts/gdalattachpct.py palette.txt src dst.png [--num-cpus N]

Reference surface: swig/python/gdal-utils/osgeo_utils/gdalattachpct.py.
The palette file is the GDAL color-file format: one `value R G B [A]`
line per entry (gdaldem color-relief style, # comments allowed).  The
source's first band is written as a paletted PNG (color type 3 + PLTE,
tRNS when any alpha < 255).
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


def parse_color_file(path: str):
    """-> (palette (256,3) uint8, alpha (256,) uint8, n_entries)."""
    import numpy as np

    pal = np.zeros((256, 3), dtype=np.uint8)
    alpha = np.full(256, 255, dtype=np.uint8)
    n = 0
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.replace(",", " ").split()
            v = int(float(parts[0]))
            if not 0 <= v <= 255:
                continue
            pal[v] = [int(float(p)) for p in parts[1:4]]
            if len(parts) > 4:
                alpha[v] = int(float(parts[4]))
            n = max(n, v + 1)
    return pal, alpha, n


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("palette")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--num-cpus", type=int, default=4)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.time()
        pal, alpha, n = parse_color_file(args.palette)

        @ray.remote
        def attach(src: str, dst: str, pal, alpha, n: int):
            import numpy as np

            from lib_gdal_ray.codecs.png import encode_png_palette
            from lib_gdal_ray.sources.rasters import open_raster_path

            _drv, arr, _meta = open_raster_path(src)
            if arr.ndim == 3:
                arr = arr[:, :, 0]
            idx = np.clip(arr, 0, 255).astype(np.uint8)
            trns = alpha[:n] if (alpha[:n] != 255).any() else None
            buf = encode_png_palette(idx, pal[:max(n, 1)], trns)
            with open(dst, "wb") as f:
                f.write(buf)
            return list(idx.shape)

        shape = ray.get(attach.remote(args.src, args.dst, pal, alpha, n))
        print(json.dumps({"src": args.src, "dst": args.dst,
                          "size": shape[::-1], "n_colors": n,
                          "sec": round(time.time() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
