"""ogr_layer_algebra analog: the 7 layer-algebra spatial overlays as a
CLI over any two vector layers.

    python scripts/ogr_layer_algebra.py
        Union|Intersection|SymDifference|Identity|Update|Clip|Erase
        -input_ds a.parquet -method_ds b.parquet -output_ds out.parquet
        [-res 5.0] [--num-cpus N]

Reference surface: swig/python/gdal-utils/osgeo_utils/ogr_layer_algebra.py
over `OGRLayer::Intersection/Union/...` (ogrlayer.cpp:5204-7665).
Distributed shape: the method layer is the broadcast side (collected
into one Arrow table, `ray.put` once, per-worker cell index); the
input layer streams through `map_batches` — the same kernels the
SQL-verified catalog overlays use (pipelines/spatial_join.py).

Representation notes (documented divergence in FORM, not coverage):
overlay outputs are fragment rows (one per intersecting pair /
residual piece) rather than per-feature dissolved multipolygons —
exact in area and point-set.  Clip emits input∩method fragments with
the input schema only; for a method layer whose polygons overlap each
other the covered region is fragment-duplicated (GDAL unions the
method side first).
"""

import argparse
import importlib.util
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get(
    "PYTHONPATH", "")

_OPS = ["Union", "Intersection", "SymDifference", "Identity", "Update",
        "Clip", "Erase"]


def _ogr2ogr():
    spec = importlib.util.spec_from_file_location(
        "ogr2ogr_cli", os.path.join(_REPO, "scripts", "ogr2ogr.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("op", choices=_OPS)
    ap.add_argument("-input_ds", required=True)
    ap.add_argument("-method_ds", required=True)
    ap.add_argument("-output_ds", required=True)
    ap.add_argument("-f", dest="fmt", default=None)
    ap.add_argument("-res", type=float, default=5.0,
                    help="cell-index resolution for the candidate probe")
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        t0 = time.time()
        o2o = _ogr2ogr()
        from lib_gdal_ray.pipelines import spatial_join as sj

        src_fmt = o2o._infer_format(args.input_ds, None)
        mth_fmt = o2o._infer_format(args.method_ds, None)
        input_ds = o2o._read(args.input_ds, src_fmt, "geometry")
        method_ds = o2o._read(args.method_ds, mth_fmt, "geometry")
        mtbls = [t for t in ray.get(method_ds.to_arrow_refs())
                 if t.num_rows]
        method = pa.concat_tables(mtbls, promote_options="permissive")
        mcols = [c for c in method.column_names if c != "geometry"]

        op = args.op
        if op == "Intersection":
            out = sj.broadcast_polygon_intersection(
                input_ds, method, mcols, res=args.res)
        elif op == "Clip":
            out = sj.broadcast_polygon_intersection(
                input_ds, method, [], res=args.res)
            out = out.drop_columns(["intersection_area"])
        elif op == "Identity":
            out = sj.broadcast_overlay_pass(
                input_ds, method, mcols, res=args.res,
                emit_intersections=True)
        elif op == "Erase":
            out = sj.broadcast_polygon_erase(input_ds, method,
                                             res=args.res)
        elif op == "Update":
            out = sj.layer_update(input_ds, method, res=args.res)
        elif op == "Union":
            out = sj.layer_union(input_ds, method, res=args.res)
        else:  # SymDifference
            out = sj.layer_symmetric_difference(input_ds, method,
                                                res=args.res)

        dst_fmt = o2o._infer_format(args.output_ds, args.fmt)
        if dst_fmt == "parquet" or args.output_ds.endswith(".parquet"):
            import shutil

            import pyarrow.parquet as pq

            tmp = args.output_ds + ".tmpdir"
            shutil.rmtree(tmp, ignore_errors=True)
            out.write_parquet(tmp)
            tab = pa.concat_tables(
                [pq.read_table(os.path.join(tmp, f))
                 for f in sorted(os.listdir(tmp))],
                promote_options="permissive")
            pq.write_table(tab, args.output_ds)
            shutil.rmtree(tmp)
            rows = tab.num_rows
        else:
            rows = o2o._write(out, args.output_ds, dst_fmt, "layer",
                              "geometry")
        print(json.dumps({"op": op, "input": args.input_ds,
                          "method": args.method_ds,
                          "output": args.output_ds, "rows": rows,
                          "sec": round(time.time() - t0, 3)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
