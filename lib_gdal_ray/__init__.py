"""lib_gdal_ray — a Ray-Data-native spatial-join + tiling engine.

Built from scratch against the *semantics* of GDAL 3.12 (reference at
/root/reference, surveyed in SURVEY.md): vector spatial joins
(point-in-polygon via ray casting over cell-indexed partitions), kNN
with cell-ring expansion, coordinate reprojection, rasterize /
tile-pyramid generation, plus the relational surface of OGR SQL
(filter / project / aggregate / join / sort / distinct) — all expressed
as ray.data.Dataset pipelines over zero-copy Arrow batches.

No GDAL/GEOS/PROJ code is used or linked; geometry travels as WKB
binary columns (GDAL's own Arrow contract, ogrlayerarrow.cpp:679-706)
and every kernel is numpy-vectorized.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import lib_gdal_ray` dependency-free
    until an operator is touched)."""
    _API = {
        # spatial joins / layer algebra
        "broadcast_pip_join": "lib_gdal_ray.pipelines.spatial_join",
        "shuffle_pip_join": "lib_gdal_ray.pipelines.spatial_join",
        "broadcast_box_intersection": "lib_gdal_ray.pipelines.spatial_join",
        "broadcast_polygon_intersection": "lib_gdal_ray.pipelines.spatial_join",
        "broadcast_polygon_erase": "lib_gdal_ray.pipelines.spatial_join",
        "layer_update": "lib_gdal_ray.pipelines.spatial_join",
        "knn_join": "lib_gdal_ray.pipelines.knn",
        "shuffle_knn_join": "lib_gdal_ray.pipelines.knn",
        # raster
        "rasterize_pixels": "lib_gdal_ray.pipelines.rasterize",
        "tile_summary": "lib_gdal_ray.pipelines.rasterize",
        "overview_pyramid": "lib_gdal_ray.pipelines.tiles",
        "polygonize": "lib_gdal_ray.pipelines.polygonize",
        "polygonize_wkb": "lib_gdal_ray.pipelines.polygonize",
        "contour_lines": "lib_gdal_ray.pipelines.contour",
        "sieve": "lib_gdal_ray.pipelines.sieve",
        "proximity": "lib_gdal_ray.pipelines.proximity",
        "fillnodata": "lib_gdal_ray.pipelines.fillnodata",
        "grid_idw": "lib_gdal_ray.pipelines.gridding",
        "mosaic": "lib_gdal_ray.pipelines.mosaic",
        "warp_nearest": "lib_gdal_ray.pipelines.mosaic",
        "warp_bilinear": "lib_gdal_ray.pipelines.mosaic",
        "pansharpen": "lib_gdal_ray.pipelines.mosaic",
        "focal": "lib_gdal_ray.pipelines.raster_calc",
        "focal_nxn": "lib_gdal_ray.pipelines.raster_calc",
        "pixel_calc": "lib_gdal_ray.pipelines.raster_calc",
        "interpolate_at_points": "lib_gdal_ray.pipelines.interpolate",
        "viewshed_counts": "lib_gdal_ray.pipelines.viewshed",
        "zonal_stats": "lib_gdal_ray.pipelines.zonal",
        "zonal_stats_weighted": "lib_gdal_ray.pipelines.zonal",
        # relational / text / dedup
        "grouped_agg": "lib_gdal_ray.pipelines.relational",
        "broadcast_hash_join": "lib_gdal_ray.pipelines.relational",
        "select": "lib_gdal_ray.pipelines.relational",
        "union_all": "lib_gdal_ray.pipelines.relational",
        "attribute_filter": "lib_gdal_ray.functions.swq",
        "exact_dedup": "lib_gdal_ray.pipelines.dedup",
        "minhash_lsh_pairs": "lib_gdal_ray.pipelines.dedup",
        "simhash64": "lib_gdal_ray.pipelines.dedup",
        "near_dup_clusters": "lib_gdal_ray.pipelines.dedup",
        "near_dup_keep": "lib_gdal_ray.pipelines.dedup",
        "bucket_lookup_join": "lib_gdal_ray.pipelines.relational",
        "bloom_semi_anti_join": "lib_gdal_ray.pipelines.joins",
        "rasterize_pixels_multi": "lib_gdal_ray.pipelines.rasterize",
        "brute_topk": "lib_gdal_ray.pipelines.ann",
        "run_pipeline": "lib_gdal_ray.pipelines.spec",
        "run_tiling_job": "lib_gdal_ray.pipelines.tiling_job",
        "interleaved_docs": "lib_gdal_ray.sources.synth",
        "reproject": "lib_gdal_ray.stages.reproject",
    }
    if name in _API:
        import importlib

        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module 'lib_gdal_ray' has no attribute {name!r}")
