"""ogrmerge analog: merge several vector sources into one output.

    python scripts/ogrmerge.py -o out.parquet a.shp b.geojson c.mif
        [-f parquet|gpkg|...] [--src-layer-field-name SRC]
        [--num-cpus N]

Sources read through the registered driver set (`read_vector`), union
with schema merge (`pipelines/relational.union_all` — the distributed
union never funnels through the driver), optional per-feature source
tag column, then one write through the ogr2ogr sink set.

Reference: swig/python/gdal-utils/osgeo_utils/ogrmerge.py (surface
only — single-layer mode).
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
    ap.add_argument("sources", nargs="+")
    ap.add_argument("-o", dest="dst", required=True)
    ap.add_argument("-f", dest="fmt", default=None)
    ap.add_argument("--src-layer-field-name", default=None,
                    help="add a column carrying each feature's source")
    ap.add_argument("--geometry-col", default="geometry")
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        t0 = time.time()
        import pyarrow as pa

        from lib_gdal_ray.pipelines import relational
        from lib_gdal_ray.sources.vrt_vector import read_vector

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import ogr2ogr as o2o

        parts = []
        for src in args.sources:
            ds = read_vector(src, geometry_col=args.geometry_col)
            if args.src_layer_field_name:
                tag = os.path.splitext(os.path.basename(src))[0]
                field = args.src_layer_field_name

                def add_tag(batch: pa.Table, tag=tag) -> pa.Table:
                    return batch.append_column(
                        field, pa.array([tag] * len(batch)))

                ds = ds.map_batches(add_tag, batch_format="pyarrow")
            parts.append(ds)
        merged = relational.union_all(parts) if len(parts) > 1 else parts[0]
        fmt = o2o._infer_format(args.dst, args.fmt)
        if fmt == "parquet":
            merged.write_parquet(args.dst)
            rows = -1
        else:
            rows = o2o._write(merged, args.dst, fmt, "merged",
                              args.geometry_col)
        print(json.dumps({"dst": args.dst, "dst_format": fmt,
                          "n_sources": len(parts), "rows": rows,
                          "sec": round(time.time() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
