"""gdaltransform analog: transform coordinate pairs between CRSs or
through GCP-derived transforms.

    echo "10 45" | python scripts/gdaltransform.py \
        -s_srs EPSG:4326 -t_srs EPSG:3857
    python scripts/gdaltransform.py -gcp 0 0 100 200 -gcp 10 0 110 200 \
        -gcp 0 10 100 190 [-order 1|2|3 | -tps] [-i] [--coords FILE]

Reference surface: apps/gdaltransform.cpp (stdin "x y [z]" lines →
transformed "x y z" lines; -i inverts; -gcp + -order/-tps selects the
GCP polynomial / thin-plate-spline transformer).  Distributed shape:
input lines chunk into one Ray task per ~64k points; each task runs
the vectorized transformer over its whole chunk.
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

_CHUNK = 65536


def _epsg(s: str) -> int:
    return int(s.split(":")[-1])


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-s_srs", default=None)
    ap.add_argument("-t_srs", default=None)
    ap.add_argument("-gcp", nargs=4, type=float, action="append",
                    default=None, metavar=("PIXEL", "LINE", "X", "Y"))
    ap.add_argument("-order", type=int, default=None, choices=[1, 2, 3])
    ap.add_argument("-tps", action="store_true")
    ap.add_argument("-i", dest="inverse", action="store_true")
    ap.add_argument("--coords", default=None,
                    help="read 'x y' lines from FILE instead of stdin")
    ap.add_argument("--num-cpus", type=int, default=4)
    args = ap.parse_args()

    import numpy as np
    import ray

    if args.coords:
        with open(args.coords) as f:
            text = f.read()
    else:
        text = sys.stdin.read()
    rows = [ln.split() for ln in text.splitlines() if ln.strip()]
    if not rows:
        print(json.dumps({"n_points": 0}))
        return
    xs = np.array([float(r[0]) for r in rows])
    ys = np.array([float(r[1]) for r in rows])

    spec = {"s_srs": args.s_srs, "t_srs": args.t_srs, "gcp": args.gcp,
            "order": args.order, "tps": args.tps,
            "inverse": args.inverse}

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        t0 = time.time()

        @ray.remote
        def transform_chunk(x, y, spec):
            from lib_gdal_ray.geom.gcp import (GCPPolynomialTransformer,
                                               TPSTransformer)
            from lib_gdal_ray.geom.proj import Transformer

            if spec["gcp"]:
                g = np.asarray(spec["gcp"], dtype=np.float64)
                if spec["tps"]:
                    tr = TPSTransformer(g[:, 0], g[:, 1], g[:, 2], g[:, 3])
                else:
                    order = spec["order"] or 1
                    tr = GCPPolynomialTransformer(
                        g[:, 0], g[:, 1], g[:, 2], g[:, 3], order=order)
                fn = tr.geo_to_pixel if spec["inverse"] else tr.pixel_to_geo
                return fn(x, y)
            s = _epsg(spec["s_srs"] or "EPSG:4326")
            t = _epsg(spec["t_srs"] or "EPSG:4326")
            if spec["inverse"]:
                s, t = t, s
            return Transformer.get(s, t).transform(x, y)

        futs = [transform_chunk.remote(xs[i:i + _CHUNK], ys[i:i + _CHUNK],
                                       spec)
                for i in range(0, len(xs), _CHUNK)]
        parts = ray.get(futs)
        ox = np.concatenate([p[0] for p in parts])
        oy = np.concatenate([p[1] for p in parts])
        for x, y in zip(ox, oy):
            print(f"{x:.10g} {y:.10g} 0")
        print(json.dumps({"n_points": len(ox),
                          "sec": round(time.time() - t0, 3)}),
              file=sys.stderr)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
