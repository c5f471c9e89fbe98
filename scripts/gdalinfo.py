"""gdalinfo analog: report raster metadata + per-band statistics +
GDAL checksum (reference: `apps/gdalinfo_lib.cpp`; checksum per
`alg/gdalchecksum.cpp` — bit-exact incl. the float→Int32 cast).

Usage:
    python scripts/gdalinfo.py SRC [-stats] [-checksum] [--num-cpus N]

Prints ONE JSON object: driver, size, bands, dtype, georeferencing
(GeoTIFF transform + EPSG when present), and with -stats / -checksum
the distributed per-band min/max/mean/std and GDALChecksumImage value
(both computed as streaming Ray aggregations over pixel rows — the
raster is never materialized on the driver).
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser(description="gdalinfo analog over Ray Data")
    ap.add_argument("src")
    ap.add_argument("-stats", action="store_true")
    ap.add_argument("-checksum", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa

    from lib_gdal_ray.sources.rasters import open_raster_path

    driver, arr, meta = open_raster_path(args.src)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    info = {
        "driver": driver,
        "size": [w, h],
        "bands": bands,
        "dtype": str(arr.dtype),
        "file_bytes": os.path.getsize(args.src),
    }
    if meta.get("transform") is not None:
        info["geotransform"] = list(meta["transform"])
    if meta.get("epsg") is not None:
        info["epsg"] = meta["epsg"]
    del arr

    if args.stats or args.checksum:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        from ray.data.aggregate import Sum

        from lib_gdal_ray.pipelines.rasterize import checksum_contrib
        from lib_gdal_ray.pipelines.relational import grouped_agg
        from lib_gdal_ray.sources.rasters import read_raster_pixels

        pixels = read_raster_pixels(args.src)
        if args.stats:
            stats = grouped_agg(pixels, ["band"], [
                ("count", None, "n"),
                ("min", "value", "min"),
                ("max", "value", "max"),
                ("mean", "value", "mean"),
                ("std_pop", "value", "std"),
            ]).to_pandas().sort_values("band")
            info["stats"] = [
                {"band": int(r.band), "n": int(r.n),
                 "min": float(r.min), "max": float(r.max),
                 "mean": round(float(r.mean), 6),
                 "std": round(float(r.std), 6)}
                for r in stats.itertuples()]
        if args.checksum:
            # GDALChecksumImage over the whole raster per band:
            # contribution = Int32(v) % prime[(x + y*w) % 11], summed
            # mod 65536 (alg/gdalchecksum.cpp)
            def contrib(batch: pa.Table) -> pa.Table:
                x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
                y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
                v = batch["value"].to_numpy(zero_copy_only=False)
                cs = checksum_contrib((x + y * w).astype(np.int64), v, 0)
                return pa.table({"band": batch["band"],
                                 "cs": pa.array(cs.astype(np.int64))})

            agg = (pixels.map_batches(contrib, batch_format="pyarrow")
                   .groupby("band").aggregate(Sum("cs", alias_name="cs"))
                   .to_pandas().sort_values("band"))
            info["checksum"] = [
                {"band": int(r.band), "checksum": int(r.cs) % 65536}
                for r in agg.itertuples()]
        ray.shutdown()

    print(json.dumps(info))


if __name__ == "__main__":
    main()
