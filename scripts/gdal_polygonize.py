"""gdal_polygonize analog: raster → vector polygons of connected
same-value regions, with traced rings + holes, georeferenced through
the source affine (reference: `alg/polygonize.cpp` +
`alg/polygonize_polygonizer.cpp`; ring tracing re-derived as snap-grid
edge cancellation in geom/rings.py).

Usage:
    python scripts/gdal_polygonize.py SRC DST
        [-conn 4|8] [--band 0] [--skip-zero] [--num-cpus N]

SRC: any registered raster format. DST: .geojsonl (GeoJSONSeq) or
.csv (CSV-WKT) vector output with region_id / value / n_pixels
attributes. Distributed: per-tile CC labeling + cross-tile union-find,
per-region ring tracing in a grouped kernel, streaming vector sink.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser(
        description="gdal_polygonize analog over Ray Data")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-conn", type=int, default=4, choices=[4, 8])
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--skip-zero", action="store_true",
                    help="drop zero-valued pixels (GDAL -mask analog)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import time

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
    from lib_gdal_ray.sources.rasters import open_raster, read_raster_pixels

    t0 = time.perf_counter()
    with open(args.src, "rb") as f:
        head = f.read()
    _n, arr0, meta = open_raster(head)
    del arr0
    gt = meta.get("transform") or (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)

    pixels = read_raster_pixels(args.src)

    def to_pix(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy(zero_copy_only=False)
        keep = band == args.band
        x = batch["x"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)[keep]
        if args.skip_zero:
            nz = v != 0
            x, y, v = x[nz], y[nz], v[nz]
        return pa.table({"pix_id": pa.array(pack_pixel(0, x, y)),
                         "burn": pa.array(v.astype(np.float64))})

    regions = polygonize_wkb(pixels.map_batches(to_pix,
                                                batch_format="pyarrow"),
                             connectivity=args.conn)

    def georef(batch: pa.Table) -> pa.Table:
        geoms = batch["geometry"].to_numpy(zero_copy_only=False)
        out = [wkb_mod.transform_wkb(
            g, lambda px, py: (gt[0] + px * gt[1] + py * gt[2],
                               gt[3] + px * gt[4] + py * gt[5]))
            for g in geoms]
        return batch.drop_columns(["geometry"]).append_column(
            "geometry", pa.array(out, type=pa.binary()))

    geo = regions.map_batches(georef, batch_format="pyarrow")

    if args.dst.endswith(".csv"):
        from lib_gdal_ray.sources.vector_formats import write_csv_wkt

        write_csv_wkt(geo, args.dst)
    else:
        from lib_gdal_ray.sources.vector_formats import write_geojson_seq

        write_geojson_seq(geo, args.dst)
    print(json.dumps({"src": args.src, "dst": args.dst,
                      "connectivity": args.conn,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
