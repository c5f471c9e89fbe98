#!/usr/bin/env python
"""CLI driver for the resumable tiling job — the `ray job submit`
entrypoint of the north rule.

    ray job submit -- python scripts/run_tiling_job.py \
        --out /tmp/tiles_run --zoom 8 --bands 16 --n-docs 1000000

Re-running the same command after a kill resumes from the manifest
(completed bands are skipped; changed inputs recompute via lineage).
Owns its Ray session (scripts only — the library never calls ray.init).
"""

import argparse
import hashlib
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray workers do NOT inherit driver sys.path — propagate via env so the
# job also works when launched from outside the repo root
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--zoom", type=int, default=8)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--fail-on-band", type=int, default=None,
                    help="inject a crash before this band (resume demo)")
    ap.add_argument("--format", choices=["parquet", "geotiff", "gpkg"],
                    default="parquet",
                    help="tile output: parquet pixel parts, one real "
                         "GeoTIFF per XYZ tile, or one raster "
                         "GeoPackage per band")
    ap.add_argument("--tiling-scheme", default="WebMercatorQuad",
                    help="OGC TileMatrixSet: WebMercatorQuad, "
                         "GoogleCRS84Quad, WorldCRS84Quad, "
                         "WorldMercatorWGS84Quad, or a TMS JSON file "
                         "(gdal raster tile --tiling-scheme parity)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from lib_gdal_ray.pipelines.tiling_job import run_tiling_job
    from lib_gdal_ray.sources.synth import interleaved_docs

    lineage = hashlib.blake2b(
        f"interleaved_docs:n={args.n_docs}:z={args.zoom}:fmt={args.format}"
        f":tms={args.tiling_scheme}".encode(),
        digest_size=8).hexdigest()

    def source():
        return interleaved_docs(args.n_docs,
                                override_num_blocks=max(16, args.n_docs // 50_000))

    t0 = time.perf_counter()
    res = run_tiling_job(source, args.out, z=args.zoom, lineage=lineage,
                         n_bands=args.bands, value_col="value",
                         fail_on_band=args.fail_on_band,
                         output_format=args.format,
                         tms=args.tiling_scheme)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "ran": res["ran"], "skipped": res["skipped"],
        "counters": res["counters"], "sec": round(dt, 2),
        "docs_per_sec": round(args.n_docs / dt, 1),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
