"""ogrinfo analog: vector layer summary (reference `apps/ogrinfo_bin
.cpp` / `gdalalg_vector_info`): feature count, field schema, geometry
type census, layer extent — computed DISTRIBUTED (count/extent are
Dataset aggregates over the WKB envelope stage; nothing materializes
driver-side).

Usage:
    python scripts/ogrinfo.py SRC [-where "expr"] [--geometry-col g]
        [--num-cpus N]

Prints ONE JSON line: {"path", "format", "n_features", "fields",
"geom_types", "extent": [xmin, ymin, xmax, ymax]}.
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser(description="ogrinfo analog")
    ap.add_argument("src")
    ap.add_argument("-where", default=None)
    ap.add_argument("--geometry-col", default="geometry")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa

    from lib_gdal_ray.sources.vrt_vector import read_vector

    t0 = time.perf_counter()
    ds = read_vector(args.src, geometry_col=args.geometry_col)
    if args.where:
        from lib_gdal_ray.functions.swq import attribute_filter

        ds = attribute_filter(ds, args.where)

    schema = ds.schema()
    fields = {n: str(t) for n, t in zip(schema.names, schema.types)
              if n != args.geometry_col}
    gcol = args.geometry_col
    has_geom = gcol in schema.names

    def summarize(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if has_geom and n:
            from lib_gdal_ray.geom import wkb as wkbm

            geoms = [g for g in batch[gcol].to_pylist() if g is not None]
            kinds = {}
            if geoms:
                bb = wkbm.wkb_bbox(np.asarray(geoms, dtype=object))
                xmin, ymin = bb[:, 0].min(), bb[:, 1].min()
                xmax, ymax = bb[:, 2].max(), bb[:, 3].max()
                for g in geoms:
                    k = wkbm.parse_wkb(g)[0]
                    kinds[k] = kinds.get(k, 0) + 1
            else:
                xmin = ymin = np.inf
                xmax = ymax = -np.inf
            return pa.table({
                "n": pa.array([n], pa.int64()),
                "xmin": pa.array([float(xmin)]),
                "ymin": pa.array([float(ymin)]),
                "xmax": pa.array([float(xmax)]),
                "ymax": pa.array([float(ymax)]),
                "kinds": pa.array([json.dumps(kinds)]),
            })
        return pa.table({"n": pa.array([n], pa.int64()),
                         "xmin": pa.array([np.inf]),
                         "ymin": pa.array([np.inf]),
                         "xmax": pa.array([-np.inf]),
                         "ymax": pa.array([-np.inf]),
                         "kinds": pa.array(["{}"])})

    parts = ds.map_batches(summarize, batch_format="pyarrow").take_all()
    n = int(sum(p["n"] for p in parts))
    kinds: dict = {}
    for p in parts:
        for k, v in json.loads(p["kinds"]).items():
            kinds[k] = kinds.get(k, 0) + v
    extent = None
    if has_geom and kinds:
        extent = [min(p["xmin"] for p in parts),
                  min(p["ymin"] for p in parts),
                  max(p["xmax"] for p in parts),
                  max(p["ymax"] for p in parts)]
    print(json.dumps({"path": args.src,
                      "n_features": n,
                      "fields": fields,
                      "geom_types": kinds,
                      "extent": extent,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
