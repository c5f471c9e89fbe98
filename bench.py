"""Benchmark harness — headline spatial-join + tiling pipeline.

Usage:
    python bench.py                 # full bench over $GRAFT_SF_DIR (default sf0.1)
    python bench.py --scaling       # same job at num_cpus=8 and num_cpus=32 in
                                    # fresh processes; prints throughput + efficiency

Prints ONE JSON line:
    {"metric": "...", "value": <headline seconds>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N}

The headline pipeline is the north-star job (BASELINE.json): synthesize
the interleaved text+media doc table (spans + WKB geometry), two-phase
PIP spatial join against zone polygons, rasterize to z8 tiles and
reduce the overview chain to z5 — measured end-to-end in docs/sec.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def headline_pipeline(sf_dir: str, n_docs: int):
    """North-star job: interleaved docs → PIP join → rasterize + overviews.

    Returns (docs_processed, joined_rows, n_tiles).
    """
    from lib_gdal_ray.pipelines import rasterize as rast
    from lib_gdal_ray.pipelines import tiles as tiles_mod
    from lib_gdal_ray.pipelines.catalog import zone_polygon_table
    from lib_gdal_ray.pipelines.spatial_join import broadcast_pip_join
    from lib_gdal_ray.sources.synth import interleaved_docs

    docs = interleaved_docs(n_docs, override_num_blocks=max(64, n_docs // 50_000))
    zones = zone_polygon_table(sf_dir)
    joined = broadcast_pip_join(docs, zones, "geometry", ["zone_id"], res=5.0,
                                concurrency=(1, 32))
    # post-combiner shuffles are small (<=1 row per touched pixel per
    # block): bound slices = blocks x partitions (see rasterize_pixels)
    base = rast.rasterize_pixels(joined, 8, value_col="value", merge_alg="add",
                                 shuffle_partitions=16)
    # only z5 is consumed and "sum" is distributive -> ONE shuffle
    # straight to the ancestor level (overview_to_level) instead of the
    # 3 chained per-level groupbys
    z5 = tiles_mod.overview_to_level(base, 8, 5, how="sum",
                                     shuffle_partitions=16)
    tiles_z5 = rast.tile_summary(z5, shuffle_partitions=8).to_pandas()
    n_tiles = len(tiles_z5)
    return n_docs, n_tiles


def gpkg_translate_bench() -> float:
    """The reference's flagship vector benchmark config: 50,000 point
    features x 21 fields, GPKG → GPKG translate
    (autotest/benchmark/test_ogr2ogr.py:26-58). Source layer synthesis
    is excluded from the timing; the measured span is read (parallel
    rowid splits) → write (partitioned atomic shards)."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data

    from lib_gdal_ray.geom import wkb as wkb_mod
    from lib_gdal_ray.sources import gpkg as gpkg_mod

    n = 50_000
    src, dst = "/tmp/bench_gpkg_src", "/tmp/bench_gpkg_dst"

    def synth(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = (i * 733) % 36000 / 100.0 - 180.0
        lat = (i * 547) % 17000 / 100.0 - 85.0
        cols = {"fid_src": pa.array(i)}
        for f in range(10):
            cols[f"int_f{f}"] = pa.array((i * (f + 3)) % 100_000)
        for f in range(5):
            cols[f"real_f{f}"] = pa.array((i * (f + 1)) % 977 / 9.77)
        for f in range(5):
            cols[f"str_f{f}"] = pa.array([f"v{f}_{x % 1000}" for x in i])
        cols["geometry"] = pa.array(list(wkb_mod.points_to_wkb(lon, lat)),
                                    type=pa.binary())
        return pa.table(cols)

    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    layer = ray.data.range(n, override_num_blocks=8).map_batches(
        synth, batch_format="pyarrow")
    gpkg_mod.write_gpkg(layer, src, layer="pts", geometry_type="POINT")

    t0 = time.perf_counter()
    gpkg_mod.write_gpkg(gpkg_mod.read_gpkg(src), dst, layer="pts",
                        geometry_type="POINT")
    dt = time.perf_counter() - t0
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    return dt


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    _init_ray(num_cpus)
    from lib_gdal_ray.pipelines.catalog import QUERIES

    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_docs_map = {"0.001": 20_000, "0.01": 100_000, "0.1": 1_000_000}
    n_docs = n_docs_map.get(sf, 1_000_000)

    t0 = time.perf_counter()
    n, n_tiles = headline_pipeline(sf_dir, n_docs)
    headline_sec = time.perf_counter() - t0

    timings = {}
    bench_queries = ["pricing_summary", "bbox_join", "knn", "reproject",
                     "rasterize_tiles", "tile_overview", "zonal_stats",
                     "dedup_documents", "token_stats", "ann_topk", "minhash_near_dup",
                     "grid_idw", "intersection_overlay", "raster_calc_ratio",
                     "where_filter", "media_features",
                     # round-2 additions
                     "rasterize_polygons", "reproject_utm", "shuffle_join",
                     "lang_stopword_quality", "buffer_zones", "swq_functions",
                     "embedding_near_dup",
                     # round-3 additions
                     "gopher_repetition", "decontaminate", "hash_sample",
                     "source_quota", "grid_metrics", "proximity_dist",
                     "contour",
                     # round-3 real codecs / drivers / scrub
                     "media_decode", "geotiff_roundtrip", "pii_scrub",
                     # round-3 second half
                     "chunk_documents", "chunk_dedup", "gpkg_roundtrip",
                     "color_relief", "hillshade_multidirectional",
                     "shapefile_roundtrip", "tfidf_top_terms",
                     "ogrsql_report", "isobands",
                     # round-3 session 4
                     "polygonize_regions", "sieve_filter",
                     "minhash_dedup_keep",
                     # round-4 additions
                     "fgb_roundtrip", "zarr_roundtrip", "netcdf_roundtrip",
                     "ogrsql_spatial", "pixfn_norm_diff",
                     "pixfn_expression", "homography_roundtrip",
                     "geoloc_roundtrip",
                     # round-4 second half
                     "vrt_mosaic", "hdf5_roundtrip", "mvt_roundtrip",
                     "pmtiles_roundtrip", "mbtiles_roundtrip",
                     "gpx_roundtrip", "kml_roundtrip", "gml_roundtrip",
                     "envi_roundtrip", "grib_roundtrip",
                     "osm_roundtrip", "osm_ways", "mif_roundtrip", "dxf_roundtrip", "filegdb_roundtrip",
                     # round-4 session 4
                     "spatialite_roundtrip", "xlsx_roundtrip",
                     # round-4 session 6
                     "rraster_roundtrip", "jml_roundtrip",
                     "georss_roundtrip",
                     # round-5 additions
                     "gpkg_raster_roundtrip", "zarr_v3_roundtrip",
                     "hdf4_roundtrip", "jp2_roundtrip",
                     "rasterize_geodetic"]
    import gc

    # BENCH_REPEATS=3 -> per-query median-of-3 (host variance at sf0.1
    # swings single runs up to 3x; medians make round-over-round
    # regressions detectable per query). Default 1 keeps the driver's
    # per-round bench cheap; medians additionally land in "median3".
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "1")))
    medians = {}
    for name in bench_queries:
        fn, _sql = QUERIES[name]
        runs = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(sf_dir)
            if hasattr(out, "count"):
                out.count()  # execute; small results only
            runs.append(round(time.perf_counter() - t0, 3))
            # drop the result refs before the next query so the object
            # store doesn't accumulate across the (long) query list —
            # later queries otherwise inherit a degraded session
            del out
            gc.collect()
        timings[name] = runs[0]
        if repeats >= 3:
            medians[name] = sorted(runs)[len(runs) // 2]
    if medians:
        timings_median3 = medians
    else:
        timings_median3 = None

    # the reference's flagship ogr2ogr benchmark shape (50k x 21 fields)
    timings["gpkg_translate_50k_21f"] = round(gpkg_translate_bench(), 3)

    out = {
        "metric": "spatial_join_tiling_headline",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "docs_per_sec": round(n / headline_sec, 1),
        "n_docs": n,
        "n_tiles_z5": n_tiles,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": num_cpus,
    }
    if timings_median3:
        out["median3"] = timings_median3
        out["bench_repeats"] = repeats
    return out


def run_scaling(sf_dir: str) -> dict:
    """Same headline job at num_cpus=8, 16 and 32 in fresh processes.

    Two efficiency ratios are reported because the 8-cpu leg is
    object-store-bandwidth bound on this host, which makes the 8->32
    ratio superlinear (an easy >=0.8); the 16->32 leg is the honest
    compute-scaling number (ideal speedup 2.0)."""
    results = {}
    for cpus in (8, 16, 32):
        code = (
            "import json, time, sys; sys.path.insert(0, '.');"
            "import bench; bench._init_ray({c});"
            "t0=time.perf_counter();"
            "n,_=bench.headline_pipeline('{sf}', 8_000_000);"
            "dt=time.perf_counter()-t0;"
            "print(json.dumps({{'cpus': {c}, 'sec': dt, 'docs_per_sec': n/dt}}))"
        ).format(c=cpus, sf=sf_dir)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t16, t32 = (results[c]["docs_per_sec"] for c in (8, 16, 32))
    return {
        "metric": "scaling_efficiency",
        "throughput_cpus8": round(t8, 1),
        "throughput_cpus16": round(t16, 1),
        "throughput_cpus32": round(t32, 1),
        "speedup_8_to_32": round(t32 / t8, 3),
        "efficiency_8_to_32": round((t32 / t8) / 4.0, 3),
        "speedup_16_to_32": round(t32 / t16, 3),
        "efficiency_16_to_32": round((t32 / t16) / 2.0, 3),
        # legacy field names (ratio the north rule names: N -> 4N)
        "speedup": round(t32 / t8, 3),
        "efficiency": round((t32 / t8) / 4.0, 3),
        "unit": "docs/sec",
        "sf_dir": sf_dir,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        print(json.dumps(run_bench(sf_dir, num_cpus)))
    import ray

    if ray.is_initialized():
        ray.shutdown()
