"""gdalmove analog: re-project a raster's GEOREFERENCING without
warping pixels.

    python scripts/gdalmove.py file.tif -t_srs EPSG:3857
        [-s_srs EPSG:4326] [--et ERROR_THRESHOLD] [--num-cpus N]

Reference surface: swig/python/gdal-utils/osgeo_utils/gdalmove.py —
transform a grid of control points through the CRS transform and
least-squares-fit a NEW geotransform in the target CRS; pixels are
untouched.  The fit error (max corner deviation in target units) is
reported like the reference's cr_error.
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
    ap.add_argument("-t_srs", required=True)
    ap.add_argument("-s_srs", default=None)
    ap.add_argument("--et", type=float, default=0.0,
                    help="report-only error threshold (target units)")
    ap.add_argument("--num-cpus", type=int, default=4)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.time()

        @ray.remote
        def move(path, s_srs, t_srs):
            import numpy as np

            from lib_gdal_ray.codecs.tiff import encode_geotiff
            from lib_gdal_ray.geom.proj import GeoTransform, Transformer
            from lib_gdal_ray.sources.rasters import open_raster_path

            _drv, arr, meta = open_raster_path(path)
            h, w = arr.shape[:2]
            gt = meta.get("transform")
            if gt is None:
                raise SystemExit("gdalmove: source has no geotransform")
            src_epsg = _epsg(s_srs) if s_srs else meta.get("epsg") or 4326
            dst_epsg = _epsg(t_srs)
            tr = Transformer.get(src_epsg, dst_epsg)
            # 5x5 control grid in pixel space (reference uses corner +
            # edge points; a denser grid tightens the LSQ fit)
            cols, rows = np.meshgrid(np.linspace(0, w, 5),
                                     np.linspace(0, h, 5))
            cols, rows = cols.ravel(), rows.ravel()
            gx, gy = GeoTransform(gt).pixel_to_geo(cols, rows)
            tx, ty = tr.transform(gx, gy)
            # LSQ fit: [1 col row] @ [g0 g1 g2; g3 g4 g5] = [tx ty]
            a = np.stack([np.ones_like(cols), cols, rows], axis=1)
            cx, res_x, *_ = np.linalg.lstsq(a, tx, rcond=None)
            cy, res_y, *_ = np.linalg.lstsq(a, ty, rcond=None)
            new_gt = (float(cx[0]), float(cx[1]), float(cx[2]),
                      float(cy[0]), float(cy[1]), float(cy[2]))
            fit_x = a @ cx
            fit_y = a @ cy
            err = float(np.hypot(fit_x - tx, fit_y - ty).max())
            buf = encode_geotiff(arr, transform=new_gt, epsg=dst_epsg,
                                 nodata=meta.get("nodata"))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf)
            os.replace(tmp, path)
            return {"size": [w, h], "old_transform": list(gt),
                    "new_transform": list(new_gt),
                    "src_epsg": src_epsg, "dst_epsg": dst_epsg,
                    "max_fit_error": err}

        rep = ray.get(move.remote(args.file, args.s_srs, args.t_srs))
        rep.update({"file": args.file, "sec": round(time.time() - t0, 3)})
        print(json.dumps(rep))
        if args.et and rep["max_fit_error"] > args.et:
            print(f"gdalmove: fit error {rep['max_fit_error']:.6g} "
                  f"exceeds threshold {args.et}", file=sys.stderr)
            sys.exit(1)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
