"""ogrinfo -sql analog: run an OGR SQL SELECT over parquet/gpkg/
shapefile layers from the command line.

Usage:
    python scripts/ogrsql.py --sql "SELECT ... FROM events ..." \
        [--sf-dir /root/testdata/sf0.01] [--layer name=path ...] \
        [--limit-print 50] [--num-cpus 8]

Layers: every table in --sf-dir is pre-registered under its table
name; --layer name=path adds/overrides (path may be .parquet, a .gpkg
file/dir, or a shapefile dir).
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray workers do NOT inherit driver sys.path — propagate via env so the
# library imports inside map_batches tasks too.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def _load(path: str):
    import ray.data

    if path.endswith(".gpkg") or (os.path.isdir(path) and any(
            f.endswith(".gpkg") for f in os.listdir(path))):
        from lib_gdal_ray.sources.gpkg import read_gpkg

        return read_gpkg(path)
    if path.endswith(".shp") or (os.path.isdir(path) and any(
            f.endswith(".shp") for f in os.listdir(path))):
        from lib_gdal_ray.sources.shapefile import read_shapefile

        return read_shapefile(path)
    return ray.data.read_parquet(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sql", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--layer", action="append", default=[],
                    metavar="NAME=PATH")
    ap.add_argument("--limit-print", type=int, default=50)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.functions.ogrsql import execute_sql

    layers = {}
    if os.path.isdir(args.sf_dir):
        for f in sorted(os.listdir(args.sf_dir)):
            if f.endswith(".parquet"):
                name = f[:-len(".parquet")]
                layers[name] = (lambda p=os.path.join(args.sf_dir, f): _load(p))
    for spec in args.layer:
        name, path = spec.split("=", 1)
        layers[name] = (lambda p=path: _load(p))

    out = execute_sql(args.sql, layers)
    df = out.to_pandas()
    with_idx = df.head(args.limit_print)
    print(with_idx.to_string(index=False))
    if len(df) > args.limit_print:
        print(f"... ({len(df)} rows total)")
    ray.shutdown()


if __name__ == "__main__":
    main()
