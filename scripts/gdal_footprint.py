"""gdal_footprint analog: compute the valid-data footprint polygon(s)
of a raster as a vector layer.

    python scripts/gdal_footprint.py src dst
        [-b 0] [-srcnodata V] [-conn 4|8] [--num-cpus N]

Reference surface: apps/gdal_footprint.cpp (mask band → polygonize →
only the valid part, georeferenced).  DST: .geojsonl / .csv (WKT) /
.parquet.  Distributed shape: the raster streams as sparse pixel rows,
valid pixels collapse to one mask value, the shared polygonize kernel
(per-tile CC + cross-tile union-find + ring tracing with holes) emits
one polygon per connected valid region.
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
    ap.add_argument("-b", type=int, default=0, help="band (0-based)")
    ap.add_argument("-srcnodata", type=float, default=None,
                    help="override the invalid value (default: the "
                         "raster's nodata, else 0)")
    ap.add_argument("-conn", type=int, default=4, choices=[4, 8])
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.geom import wkb as wkb_mod
    from lib_gdal_ray.pipelines.polygonize import polygonize_wkb
    from lib_gdal_ray.pipelines.rasterize import pack_pixel
    from lib_gdal_ray.sources.rasters import (open_raster_path,
                                              read_raster_pixels)

    t0 = time.perf_counter()
    _drv, arr0, meta = open_raster_path(args.src)
    del arr0
    gt = meta.get("transform") or (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    nodata = args.srcnodata
    if nodata is None:
        nodata = meta.get("nodata")
    if nodata is None:
        nodata = 0.0

    pixels = read_raster_pixels(args.src)

    def to_mask(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy(zero_copy_only=False)
        keep = band == args.b
        x = batch["x"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)[keep]
        valid = v != nodata
        return pa.table({
            "pix_id": pa.array(pack_pixel(0, x[valid], y[valid])),
            "burn": pa.array(np.ones(int(valid.sum()), dtype=np.float64))})

    regions = polygonize_wkb(
        pixels.map_batches(to_mask, batch_format="pyarrow"),
        connectivity=args.conn)

    def georef(batch: pa.Table) -> pa.Table:
        geoms = batch["geometry"].to_numpy(zero_copy_only=False)
        out = [wkb_mod.transform_wkb(
            g, lambda px, py: (gt[0] + px * gt[1] + py * gt[2],
                               gt[3] + px * gt[4] + py * gt[5]))
            for g in geoms]
        t = batch.drop_columns(["geometry", "value"])
        return t.append_column("geometry", pa.array(out, pa.binary()))

    geo = regions.map_batches(georef, batch_format="pyarrow")

    if args.dst.endswith(".csv"):
        from lib_gdal_ray.sources.vector_formats import write_csv_wkt

        n = write_csv_wkt(geo, args.dst)
    elif args.dst.endswith(".parquet"):
        tab = pa.concat_tables(
            [t for t in ray.get(geo.to_arrow_refs()) if t.num_rows],
            promote_options="permissive")
        import pyarrow.parquet as pq

        pq.write_table(tab, args.dst)
        n = tab.num_rows
    else:
        from lib_gdal_ray.sources.vector_formats import write_geojson_seq

        n = write_geojson_seq(geo, args.dst)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "n_polygons": n if isinstance(n, int) else None,
                      "nodata": nodata,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
