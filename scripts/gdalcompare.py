"""gdalcompare analog: count the differences between two rasters.

    python scripts/gdalcompare.py golden.tif new.tif [--num-cpus N]

Reference surface: swig/python/gdal-utils/osgeo_utils/gdalcompare.py —
per-band checksum compare (the GDALChecksumImage currency), plus
geotransform / SRS / size / band-count / dtype checks; exit code = the
number of differences found, 0 when identical.  Band pixel compares
fan out one Ray task per band.
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
    ap.add_argument("golden")
    ap.add_argument("new")
    ap.add_argument("--num-cpus", type=int, default=4)
    args = ap.parse_args()

    import numpy as np
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.time()

        @ray.remote
        def open_one(path: str):
            from lib_gdal_ray.sources.rasters import open_raster_path

            drv, arr, meta = open_raster_path(path)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return drv, arr, meta

        (gd, ga, gm), (nd, na, nm) = ray.get(
            [open_one.remote(args.golden), open_one.remote(args.new)])

        diffs = []
        if ga.shape[:2] != na.shape[:2]:
            diffs.append(f"size {ga.shape[1::-1]} vs {na.shape[1::-1]}")
        if ga.shape[2] != na.shape[2]:
            diffs.append(f"band count {ga.shape[2]} vs {na.shape[2]}")
        if ga.dtype != na.dtype:
            diffs.append(f"dtype {ga.dtype} vs {na.dtype}")
        gt_g = gm.get("transform")
        gt_n = nm.get("transform")
        if (gt_g is None) != (gt_n is None) or (
                gt_g is not None and not np.allclose(
                    gt_g, gt_n, rtol=0, atol=1e-10)):
            diffs.append(f"geotransform {gt_g} vs {gt_n}")
        if gm.get("epsg") != nm.get("epsg"):
            diffs.append(f"srs {gm.get('epsg')} vs {nm.get('epsg')}")

        band_report = []
        if ga.shape == na.shape:
            @ray.remote
            def cmp_band(g, n, i):
                from lib_gdal_ray.pipelines.rasterize import gdal_checksum

                cs_g = int(gdal_checksum(g))
                cs_n = int(gdal_checksum(n))
                gd_ = g.astype(np.float64)
                nd_ = n.astype(np.float64)
                return {"band": i + 1, "checksum_golden": cs_g,
                        "checksum_new": cs_n,
                        "max_abs_diff": float(np.abs(gd_ - nd_).max())}

            band_report = ray.get([
                cmp_band.remote(ga[:, :, i], na[:, :, i], i)
                for i in range(ga.shape[2])])
            for r in band_report:
                if r["checksum_golden"] != r["checksum_new"]:
                    diffs.append(
                        f"band {r['band']} checksum "
                        f"{r['checksum_golden']} vs {r['checksum_new']}")

        print(json.dumps({"golden": args.golden, "new": args.new,
                          "differences": len(diffs), "details": diffs,
                          "bands": band_report,
                          "sec": round(time.time() - t0, 3)}))
        sys.exit(min(len(diffs), 125))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
