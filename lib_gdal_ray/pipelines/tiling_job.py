"""Resumable partitioned tiling job — the north rule's checkpointed
`ray job submit` workload.

Reference pattern: `gdal raster tile --resume` generates only missing
tiles (`apps/gdalalg_raster_tile.cpp:280,5867`) with per-job tile
ranges (`:3910-3927`); we add an explicit per-partition manifest with
lineage + counters (`state.manifest`).

Partitioning: the tile grid at zoom z is split into `n_bands`
horizontal tile-row bands. Each band runs as its own bounded Ray Data
pipeline — filter (cheap early prune) → rasterize → write parquet to
`part=<band>` (write-tmp + atomic rename) → manifest commit. A killed
run resumes by anti-joining bands against the manifest; changed input
(lineage mismatch) recomputes everything.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import cells
from ..state.manifest import Manifest
from .rasterize import rasterize_pixels, with_tile_cols


def band_of_tile_y(ty: np.ndarray, z: int, n_bands: int,
                   n_rows: int = None) -> np.ndarray:
    n = n_rows if n_rows is not None else (1 << z)
    rows_per_band = max(1, (n + n_bands - 1) // n_bands)
    return np.minimum(ty // rows_per_band, n_bands - 1).astype(np.int64)


def run_tiling_job(source_fn: Callable[[], ray.data.Dataset], out_dir: str,
                   z: int, lineage: str, n_bands: int = 8,
                   lon_col: str = "lon", lat_col: str = "lat",
                   value_col: Optional[str] = None, merge_alg: str = "add",
                   fail_on_band: Optional[int] = None,
                   output_format: str = "parquet",
                   tms: Optional[object] = None) -> dict:
    """Run (or resume) the tiling job. Returns {"ran": [...],
    "skipped": [...], "counters": {...}}.

    output_format: "parquet" (pixel-table parts), "geotiff" (one real
    GeoTIFF per XYZ tile via codecs/tiff.py, `gdal raster tile` output
    parity) or "gpkg" (one valid raster GeoPackage per band —
    `gdal raster tile --output-format GPKG` parity; fold the part
    files with sources.gpkg_tiles.merge_gpkg_tiles for a single-file
    deliverable). All commit per band atomically and resume
    identically. fail_on_band injects a crash before that band
    (tests only).

    tms: None (WebMercatorQuad) or a `geom.tms.get_tms` scheme
    name/instance — band partitioning, pixel assignment and tile
    georeferencing then follow that OGC TileMatrixSet
    (`gdal raster tile --tiling-scheme` parity).
    """
    scheme = None
    n_rows = None
    if tms is not None:
        from ..geom.tms import get_tms

        scheme = get_tms(tms)
        if scheme.identifier == "WebMercatorQuad":
            scheme = None
        else:
            n_rows = scheme.matrix_height(z)
    man = Manifest(out_dir)
    man.clean_orphans()
    for name in os.listdir(out_dir):  # tmp dirs from a crashed run
        if name.startswith(".tmp-"):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    all_bands = list(range(n_bands))
    done = man.completed(lineage)
    pending = [b for b in all_bands if str(b) not in done]
    skipped = [b for b in all_bands if str(b) in done]
    ran = []

    if pending:
        # ONE pass over the input for ALL pending bands (VERDICT r1
        # item 8: the per-band loop re-scanned the source n_bands
        # times). Rows of already-committed bands are pruned at the
        # first map stage; the finalized pixels are written
        # hive-partitioned by band, then each band directory commits
        # into the manifest atomically (rename + commit, in band
        # order), so a crash mid-commit resumes with only the
        # uncommitted bands.
        pending_arr = np.asarray(pending, dtype=np.int64)
        src = source_fn()

        def band_filter(batch: pa.Table) -> pa.Table:
            lon = batch[lon_col].to_numpy(zero_copy_only=False)
            lat = batch[lat_col].to_numpy(zero_copy_only=False)
            if scheme is None:
                _tx, ty = cells.lonlat_to_tile(lon, lat, z)
            else:
                _tx, ty = scheme.lonlat_to_tile(lon, lat, z)
            keep = np.isin(band_of_tile_y(ty, z, n_bands, n_rows),
                           pending_arr)
            return batch.filter(pa.array(keep))

        banded = src.map_batches(band_filter, batch_format="pyarrow")
        raw_pixels = rasterize_pixels(
            banded, z, lon_col=lon_col, lat_col=lat_col,
            value_col=value_col, merge_alg=merge_alg, tms=scheme)

        tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp, exist_ok=True)
        if output_format == "geotiff":
            from ..sources.geotiff import write_geotiff_tiles

            manifest = write_geotiff_tiles(
                raw_pixels, tmp, dtype=np.float64,
                subdir_fn=lambda _zi, _tx, ty:
                    f"band={band_of_tile_y(np.asarray([ty]), z, n_bands, n_rows)[0]}",
                tms=scheme
            ).to_pandas()  # small: one row per tile
            band_pixels = manifest.assign(
                band=[int(p[len(tmp) + 1:].split(os.sep)[0].split("=")[1])
                      for p in manifest["path"]]
            ).groupby("band")["n_pixels"].sum().to_dict()

            def band_count(final: str) -> float:
                return float(band_pixels.get(
                    int(os.path.basename(final).split("=")[1]), 0.0))
        elif output_format == "gpkg":
            from ..sources.gpkg_tiles import (render_tile_blobs,
                                              write_gpkg_raster)

            # parallel tile encode ONCE for all pending bands; the
            # per-band sqlite assembly is bounded driver-side work
            # (one writer lock per file is a format property)
            tiles = render_tile_blobs(raw_pixels).materialize()

            def with_band(batch: pa.Table) -> pa.Table:
                ty = batch["tile_y"].to_numpy(zero_copy_only=False)
                return batch.append_column(
                    "band", pa.array(band_of_tile_y(ty, z, n_bands,
                                                    n_rows)))

            tiles_b = tiles.map_batches(
                with_band, batch_format="pyarrow").materialize()
            band_pixels = {}
            for row in tiles_b.select_columns(
                    ["band", "n_pixels"]).to_pandas().itertuples():
                band_pixels[int(row.band)] = \
                    band_pixels.get(int(row.band), 0) + int(row.n_pixels)
            for band in pending:
                bdir = os.path.join(tmp, f"band={band}")
                os.makedirs(bdir, exist_ok=True)
                one = tiles_b.filter(
                    lambda r, b=band: r["band"] == b)
                if one.count() > 0:
                    write_gpkg_raster(one.drop_columns(["band"]),
                                      os.path.join(bdir, "tiles.gpkg"),
                                      tms=scheme)

            def band_count(final: str) -> float:
                return float(band_pixels.get(
                    int(os.path.basename(final).split("=")[1]), 0.0))
        else:
            pixels = with_tile_cols(raw_pixels)

            def add_band(batch: pa.Table) -> pa.Table:
                _z, _tx, ty = cells.unpack_tile(
                    batch["tile_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
                return batch.append_column(
                    "band", pa.array(band_of_tile_y(ty, z, n_bands,
                                                    n_rows)))

            pixels.map_batches(add_band, batch_format="pyarrow").write_parquet(
                tmp, partition_cols=["band"])
            import pyarrow.parquet as pq

            def band_count(final: str) -> float:
                return float(sum(
                    pq.read_metadata(os.path.join(final, f)).num_rows
                    for f in os.listdir(final) if f.endswith(".parquet")))

        for band in pending:
            if fail_on_band is not None and band == fail_on_band:
                raise RuntimeError(f"injected failure at band {band}")
            src_dir = os.path.join(tmp, f"band={band}")
            final = os.path.join(out_dir, f"part={band}")
            if os.path.exists(final):
                shutil.rmtree(final)  # uncommitted output from a crashed run
            os.makedirs(src_dir, exist_ok=True)  # empty band still commits
            os.replace(src_dir, final)
            man.commit(str(band), lineage, {"pixels": band_count(final)})
            ran.append(band)
        shutil.rmtree(tmp, ignore_errors=True)

    return {"ran": ran, "skipped": skipped, "counters": man.counters_total()}


def read_tiling_output(out_dir: str) -> ray.data.Dataset:
    parts = sorted(p for p in os.listdir(out_dir) if p.startswith("part="))
    files = [os.path.join(out_dir, p, f)
             for p in parts
             for f in sorted(os.listdir(os.path.join(out_dir, p)))
             if f.endswith(".parquet")]
    return ray.data.read_parquet(files)
