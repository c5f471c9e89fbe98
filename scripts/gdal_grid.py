"""gdal_grid analog: interpolate scattered vector points onto a raster
grid (reference: `apps/gdal_grid_lib.cpp` + `alg/gdalgrid.cpp`).

Usage:
    python scripts/gdal_grid.py SRC DST
        -zfield COLUMN
        -txe XMIN XMAX -tye YMIN YMAX -outsize W H
        [-a invdist[:power=2] | nearest[:radius=R]]
        [--x-col lon --y-col lat] [--num-cpus N]

SRC: any vector format the engine reads (parquet / gpkg / shapefile /
geojson(+seq) / csv-wkt) with point coordinates in x/y columns.
DST: a georeferenced GeoTIFF.

Shape: destination scanline chunks fan out as Ray tasks; each chunk
interpolates its node centers against the broadcast site table (one
`ray.put`, hydrated once per worker process) — GDAL likewise holds all
points in memory per grid job. Library-level gridding over huge site
sets uses `pipelines/gridding.py`'s distributed variants.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _raster_cli import _REPO  # noqa: F401  (sys.path + PYTHONPATH setup)


def main():
    ap = argparse.ArgumentParser(description="gdal_grid analog")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-zfield", required=True)
    ap.add_argument("-txe", nargs=2, type=float, required=True,
                    metavar=("XMIN", "XMAX"))
    ap.add_argument("-tye", nargs=2, type=float, required=True,
                    metavar=("YMIN", "YMAX"))
    ap.add_argument("-outsize", nargs=2, type=int, required=True,
                    metavar=("W", "H"))
    ap.add_argument("-a", dest="alg", default="invdist")
    ap.add_argument("--x-col", default="lon")
    ap.add_argument("--y-col", default="lat")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    parts = args.alg.split(":")
    alg = parts[0]
    opts = dict(kv.split("=") for kv in parts[1:] if "=" in kv)
    power = float(opts.get("power", 2.0))
    radius = float(opts.get("radius", 0.0))
    if alg not in ("invdist", "nearest"):
        ap.error("supported -a: invdist[:power=P], nearest[:radius=R]")

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ogr2ogr import _infer_format, _read

    t0 = time.perf_counter()
    xmin, xmax = args.txe
    ymin, ymax = args.tye
    w, h = args.outsize
    xres, yres = (xmax - xmin) / w, (ymax - ymin) / h

    # site table: small side, collected in one task then broadcast
    src_ds = _read(args.src, _infer_format(args.src, None), "geometry")
    blocks = src_ds.select_columns(
        [args.x_col, args.y_col, args.zfield]).to_arrow_refs()

    @ray.remote
    def collect(*bs):
        xs = np.concatenate([
            b[args.x_col].to_numpy(zero_copy_only=False) for b in bs
            if len(b)]) if bs else np.empty(0)
        ys = np.concatenate([
            b[args.y_col].to_numpy(zero_copy_only=False) for b in bs
            if len(b)]) if bs else np.empty(0)
        vs = np.concatenate([
            b[args.zfield].to_numpy(zero_copy_only=False).astype(np.float64)
            for b in bs if len(b)]) if bs else np.empty(0)
        return {"x": xs.astype(np.float64), "y": ys.astype(np.float64),
                "v": vs}

    site_ref = collect.remote(*blocks)
    n_sites = int(len(ray.get(site_ref)["x"]))

    chunk = max(1, min(128, h // max(1, args.num_cpus * 4) or 1))
    rows = ray.data.range(h)

    def grid_rows(batch) -> "pa.Table":
        from lib_gdal_ray.state.worker_cache import get_or_build

        s = get_or_build("grid:" + site_ref.hex(),
                         lambda: ray.get(site_ref))
        sx, sy, sv = s["x"], s["y"], s["v"]
        ys_ = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ry = np.repeat(ys_, w)
        rx = np.tile(np.arange(w, dtype=np.int64), len(ys_))
        nx = xmin + (rx + 0.5) * xres
        ny = ymax - (ry + 0.5) * yres
        if len(sx) == 0:
            val = np.zeros(len(nx))
        else:
            dx = nx[:, None] - sx[None, :]
            dy = ny[:, None] - sy[None, :]
            d2 = dx * dx + dy * dy
            if alg == "nearest":
                j = np.argmin(d2, axis=1)
                val = sv[j]
                if radius > 0:
                    val = np.where(d2[np.arange(len(j)), j] <= radius ** 2,
                                   val, 0.0)
            else:
                wgt = 1.0 / (np.power(d2, power / 2.0) + 1e-12)
                val = (wgt * sv[None, :]).sum(axis=1) / wgt.sum(axis=1)
        return pa.table({"ry": pa.array(ry), "rx": pa.array(rx),
                         "v": pa.array(val)})

    sampled = rows.map_batches(grid_rows, batch_format="pyarrow",
                               batch_size=chunk)
    refs = sampled.to_arrow_refs()

    @ray.remote
    def compose(*bs) -> bytes:
        from lib_gdal_ray.codecs.tiff import encode_geotiff

        dense = np.zeros((h, w), dtype=np.float32)
        for blk in bs:
            if len(blk) == 0:
                continue
            dense[blk["ry"].to_numpy(zero_copy_only=False),
                  blk["rx"].to_numpy(zero_copy_only=False)] = \
                blk["v"].to_numpy(zero_copy_only=False).astype(np.float32)
        return encode_geotiff(dense,
                              transform=(xmin, xres, 0.0, ymax, 0.0, -yres),
                              epsg=4326)

    buf = ray.get(compose.remote(*refs))
    tmp = args.dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, args.dst)
    print(json.dumps({"src": args.src, "dst": args.dst, "alg": alg,
                      "size": [w, h], "n_sites": n_sites,
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
