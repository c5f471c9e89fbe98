"""gdaltindex analog: build a tile index over raster files
(reference `apps/gdaltindex_bin.cpp` / `apps/gdaltindex_lib.cpp`) —
one footprint row per raster with its bounds polygon, written as any
registered vector format. Header-only for GeoTIFF (tags parsed,
pixels never decompressed; `sources/rasters.raster_index`), full
decode for headerless formats. With -vrt also writes a mosaic VRT
over the same files (gdaltindex + gdalbuildvrt in one scan).

Usage:
    python scripts/gdaltindex.py INDEX.{geojsonl|parquet|gpkg} SRC...
        [-vrt MOSAIC.vrt] [--num-cpus N]
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
    ap = argparse.ArgumentParser(description="gdaltindex analog")
    ap.add_argument("dst")
    ap.add_argument("srcs", nargs="+")
    ap.add_argument("-vrt", dest="vrt", default=None,
                    help="also write a mosaic VRT over the inputs")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from lib_gdal_ray.geom import wkb as wkbm
    from lib_gdal_ray.sources.rasters import raster_index

    t0 = time.perf_counter()
    idx = raster_index(args.srcs)

    def footprint(batch: pa.Table) -> pa.Table:
        geoms = [wkbm.box_to_wkb(xmin, ymin, xmax, ymax)
                 for xmin, ymin, xmax, ymax in zip(
                     batch["xmin"].to_pylist(), batch["ymin"].to_pylist(),
                     batch["xmax"].to_pylist(), batch["ymax"].to_pylist())]
        return batch.append_column("geometry",
                                   pa.array(geoms, pa.binary()))

    layer = idx.map_batches(footprint, batch_format="pyarrow")

    low = args.dst.lower()
    if low.endswith((".geojsonl", ".ndjson")):
        from lib_gdal_ray.sources.vector_formats import write_geojson_seq

        write_geojson_seq(layer.drop_columns(["driver", "dtype"]),
                          args.dst)
        n = -1
    elif low.endswith(".gpkg"):
        from lib_gdal_ray.sources.gpkg import merge_gpkg_dir, write_gpkg

        shard_dir = args.dst + ".shards"
        write_gpkg(layer, shard_dir, layer="tileindex")
        n = merge_gpkg_dir(shard_dir, args.dst, layer="tileindex")
    else:
        layer.write_parquet(args.dst)
        n = -1
    report = {"dst": args.dst, "n_rasters": len(args.srcs),
              "rows": n, "sec": round(time.perf_counter() - t0, 3)}
    if args.vrt:
        from lib_gdal_ray.sources.vrt import build_vrt, write_vrt

        vds = build_vrt(args.srcs)
        write_vrt(vds, args.vrt)
        report["vrt"] = {"path": args.vrt, "xsize": vds.xsize,
                         "ysize": vds.ysize, "bands": len(vds.bands)}
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
