"""pct2rgb analog: expand a paletted raster to RGB(A).

    python scripts/pct2rgb.py src.png dst.tif [-rgba] [--num-cpus N]

Reference surface: swig/python/gdal-utils/osgeo_utils/pct2rgb.py
(color-table lookup per pixel).  The source must carry a color table
— a paletted PNG (color type 3; `codecs/png.decode_png_indexed`).
The palette LUT gather is one vectorized numpy take; the unit of work
is one raster per Ray task (pass several sources to fan out).
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
    ap.add_argument("-rgba", action="store_true",
                    help="emit a 4th alpha band from tRNS")
    ap.add_argument("--num-cpus", type=int, default=4)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.time()

        @ray.remote
        def expand(src: str, dst: str, want_alpha: bool):
            import numpy as np

            from lib_gdal_ray.codecs.png import decode_png_indexed

            with open(src, "rb") as f:
                idx, palette, trns = decode_png_indexed(f.read())
            rgb = palette[idx]
            if want_alpha:
                alpha = np.full(len(palette), 255, dtype=np.uint8)
                if trns is not None:
                    alpha[:len(trns)] = trns
                rgb = np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
            low = dst.lower()
            if low.endswith(".png"):
                from lib_gdal_ray.codecs.png import encode_png

                buf = encode_png(rgb)
            elif low.endswith(".bmp") and rgb.shape[2] == 3:
                from lib_gdal_ray.codecs.bmp import encode_bmp

                buf = encode_bmp(rgb)
            else:
                from lib_gdal_ray.codecs.tiff import encode_geotiff

                buf = encode_geotiff(rgb)
            with open(dst, "wb") as f:
                f.write(buf)
            return list(idx.shape), int(rgb.shape[2])

        shape, bands = ray.get(expand.remote(args.src, args.dst,
                                             args.rgba))
        print(json.dumps({"src": args.src, "dst": args.dst,
                          "size": shape[::-1], "bands": bands,
                          "sec": round(time.time() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
