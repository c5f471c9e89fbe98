"""gdaldem analog: DEM analysis from a real raster file to a real
GeoTIFF (reference: `apps/gdaldem_lib.cpp` / `apps/gdaldem_bin.cpp`).

Usage:
    python scripts/gdaldem.py MODE SRC DST [options]

    MODE: hillshade | slope | aspect | TRI | TPI | roughness
          | color-relief
    SRC:  any registered raster format (GeoTIFF/PNG/BMP/JPEG)
    DST:  output GeoTIFF (georeferencing copied from a GeoTIFF source)

Options:
    -z Z            vertical exaggeration (default 1.0)
    -s SCALE        ground units per pixel (cellsize, default 1.0)
    -az AZIMUTH     hillshade light azimuth (default 315)
    -alt ALTITUDE   hillshade light altitude (default 45)
    -alg Horn|ZevenbergenThorne   gradient stencil (default Horn)
    -combined / -multidirectional / -igor   hillshade variants
    -ramp FILE      color-relief stops: lines of "value r g b"
    --band N        source band (default 0)
    --num-cpus N

The per-pixel math runs distributed (tile-halo focal kernels over
sparse pixel rows); the single-file output is composed in one Ray task
— GDAL's unit of work is likewise one raster. For tiled web output at
scale use scripts/run_tiling_job.py (GeoTIFF XYZ tile sink).

Edge semantics: pixels whose 3×3 stencil leaves the raster are written
as 0 (GDAL's edge replication is a dense-edge concept; the engine's
sparse kernels emit full-stencil pixels — `full_only`).
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

_MODES = {"hillshade", "slope", "aspect", "tri", "tpi", "roughness",
          "color-relief"}


def main():
    ap = argparse.ArgumentParser(description="gdaldem analog over Ray Data")
    ap.add_argument("mode", choices=sorted(_MODES) + ["TRI", "TPI"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-z", type=float, default=1.0, dest="zf")
    ap.add_argument("-s", type=float, default=1.0, dest="scale")
    ap.add_argument("-az", type=float, default=315.0)
    ap.add_argument("-alt", type=float, default=45.0)
    ap.add_argument("-alg", default="Horn",
                    choices=["Horn", "ZevenbergenThorne"])
    ap.add_argument("-combined", action="store_true")
    ap.add_argument("-multidirectional", action="store_true")
    ap.add_argument("-igor", action="store_true")
    ap.add_argument("-ramp", default=None)
    ap.add_argument("--band", type=int, default=0)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()
    mode = args.mode.lower()

    import json
    import time

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.pipelines import raster_calc as rc
    from lib_gdal_ray.pipelines.rasterize import pack_pixel, unpack_pixel
    from lib_gdal_ray.sources.rasters import open_raster, read_raster_pixels

    t0 = time.perf_counter()
    # source metadata (shape + georef) from a header decode
    with open(args.src, "rb") as f:
        head = f.read()
    _name, arr0, meta = open_raster(head)
    h, w = arr0.shape[:2]
    del arr0

    pixels = read_raster_pixels(args.src)

    def to_pix(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy(zero_copy_only=False)
        keep = band == args.band
        x = batch["x"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"pix_id": pa.array(pack_pixel(0, x, y)),
                         "burn": pa.array(v.astype(np.float64))})

    ds = pixels.map_batches(to_pix, batch_format="pyarrow")

    nbands = 1
    if mode == "color-relief":
        if not args.ramp:
            ap.error("color-relief requires -ramp FILE")
        ramp = []
        with open(args.ramp) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 4:
                    ramp.append((float(parts[0]), float(parts[1]),
                                 float(parts[2]), float(parts[3])))
        out = rc.color_relief(ds, ramp)
        nbands = 3
    else:
        kernel = {"hillshade": "hillshade", "slope": "slope",
                  "aspect": "aspect", "tri": "tri", "tpi": "tpi",
                  "roughness": "roughness"}[mode]
        if mode == "hillshade":
            if args.multidirectional:
                kernel = "hillshade_md"
            elif args.combined:
                kernel = "hillshade_combined"
            elif args.igor:
                kernel = "hillshade_igor"
        alg = "zevenbergen" if args.alg == "ZevenbergenThorne" else "horn"
        out = rc.focal(ds, kernel, cellsize=args.scale, z_factor=args.zf,
                       altitude=args.alt, azimuth=args.az, alg=alg)

    # compose + encode the single-file deliverable in ONE Ray task
    refs = out.to_arrow_refs()

    @ray.remote
    def compose(transform, epsg, *blocks) -> bytes:
        from lib_gdal_ray.codecs.tiff import encode_geotiff

        if nbands == 3:
            dense = np.zeros((h, w, 3), dtype=np.uint8)
        else:
            dtype = np.uint8 if mode == "hillshade" else np.float32
            dense = np.zeros((h, w), dtype=dtype)
        for blk in blocks:
            if len(blk) == 0:
                continue
            _z, gx, gy = unpack_pixel(
                blk["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
            ok = (gx < w) & (gy < h)
            gx, gy = gx[ok], gy[ok]
            if nbands == 3:
                for i, c in enumerate("rgb"):
                    dense[gy, gx, i] = blk[c].to_numpy(
                        zero_copy_only=False)[ok].astype(np.uint8)
            else:
                dense[gy, gx] = blk["burn"].to_numpy(
                    zero_copy_only=False)[ok].astype(dense.dtype)
        return encode_geotiff(dense, transform=transform, epsg=epsg)

    transform = meta.get("transform")
    epsg = meta.get("epsg")
    buf = ray.get(compose.remote(transform, epsg, *refs))
    tmp = args.dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, args.dst)
    print(json.dumps({"mode": mode, "src": args.src, "dst": args.dst,
                      "shape": [h, w, nbands],
                      "bytes": len(buf),
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
