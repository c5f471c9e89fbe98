"""GeoTIFF raster source/sink over Ray Data pixel tables.

Bridges the engine's sparse pixel representation — `(pix_id, burn)`
rows, `pack_pixel(z, gx, gy)` global web-mercator pixel coords
(`pipelines/rasterize.py`) — to real on-disk GeoTIFFs via the
pure-numpy codec (`codecs/tiff.py`). GDAL analog: the GTiff driver +
gdal2tiles XYZ layout (reference `frmts/gtiff/geotiff.cpp`,
`swig/python/gdal-utils/osgeo_utils/gdal2tiles.py` semantics, not
code).

Sink: one GeoTIFF per XYZ tile, written inside the per-group kernel
(side-effect file write; the returned manifest row carries path +
pixel count + checksum) — the partitioned, resumable layout the north
rule requires: a re-run can prune finished tiles by manifest.

Source: `read_geotiff_pixels` streams files (read_binary_files splits
per file) and explodes each raster back to sparse pixel rows.
"""

from __future__ import annotations

import os
from typing import List, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..codecs.tiff import decode_geotiff, encode_geotiff

# EPSG:3857 world extent (meters)
_MERC_MAX = 20037508.342789244


def tile_transform_3857(z: int, tx: int, ty: int, tile_size: int = 256):
    """GDAL affine for XYZ tile (z, tx, ty): EPSG:3857, north-up."""
    span = 2 * _MERC_MAX / (1 << z)
    px = span / tile_size
    x0 = -_MERC_MAX + tx * span
    y0 = _MERC_MAX - ty * span
    return (x0, px, 0.0, y0, 0.0, -px)


def _crs_epsg(crs: str) -> int:
    return {"EPSG:3857": 3857, "EPSG:3395": 3395,
            "CRS84": 4326, "EPSG:4326": 4326}.get(crs, 0)


def write_geotiff_tiles(pixels: ray.data.Dataset, out_dir: str,
                        tile_size: int = 256,
                        dtype=np.float32,
                        compression: str = "deflate",
                        inner_tiled: bool = False,
                        subdir_fn=None,
                        tms=None) -> ray.data.Dataset:
    """Sparse pixel rows -> {out_dir}/{z}/{tx}/{ty}.tif, one GeoTIFF
    per XYZ tile (EPSG:3857 georeferencing), returning the manifest
    Dataset (z, tx, ty, path, n_pixels, checksum). The groupby is the
    pipeline's one wide exchange; each group densifies only its own
    tile_size x tile_size window."""
    from ..pipelines.rasterize import gdal_checksum, unpack_pixel

    def key(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        z, gx, gy = unpack_pixel(pix)
        tid = (z.astype(np.int64) << 50) | ((gx // tile_size).astype(np.int64) << 25) \
            | (gy // tile_size).astype(np.int64)
        return batch.append_column("tile_id", pa.array(tid))

    np_dtype = np.dtype(dtype)

    def write_tile(group: pa.Table) -> pa.Table:
        pix = group["pix_id"].to_numpy(zero_copy_only=False)
        burn = group["burn"].to_numpy(zero_copy_only=False)
        z, gx, gy = unpack_pixel(pix)
        zi = int(z[0])
        tx = int(gx[0]) // tile_size
        ty = int(gy[0]) // tile_size
        dense = np.zeros((tile_size, tile_size), dtype=np_dtype)
        dense[gy - ty * tile_size, gx - tx * tile_size] = burn.astype(np_dtype)
        if tms is None:
            transform = tile_transform_3857(zi, tx, ty, tile_size)
            epsg = 3857
        else:  # OGC TileMatrixSet georeferencing (geom/tms.py)
            transform = tms.tile_transform(zi, tx, ty)
            epsg = _crs_epsg(tms.crs)
        buf = encode_geotiff(dense, transform=transform,
                             epsg=epsg, compression=compression,
                             tile_size=(tile_size if inner_tiled and
                                        tile_size % 16 == 0 else None))
        sub = subdir_fn(zi, tx, ty) if subdir_fn else ""
        path = os.path.join(out_dir, sub, str(zi), str(tx), f"{ty}.tif")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)  # atomic per-tile commit (resume-safe)
        return pa.table({
            "z": pa.array([zi], pa.int32()), "tx": pa.array([tx], pa.int32()),
            "ty": pa.array([ty], pa.int32()), "path": pa.array([path]),
            "n_pixels": pa.array([len(group)], pa.int64()),
            "checksum": pa.array([int(gdal_checksum(dense.astype(np.float64)))],
                                 pa.int64()),
        })

    keyed = pixels.map_batches(key, batch_format="pyarrow")
    return keyed.groupby("tile_id").map_groups(write_tile, batch_format="pyarrow")


def read_geotiff_pixels(paths: Union[str, List[str]],
                        drop_zero: bool = True, **kwargs) -> ray.data.Dataset:
    """GeoTIFF file(s) -> sparse pixel rows (pix_id, burn), inverting
    the sink layout: z/tx/ty parsed from the path, pixel ids re-packed
    to global coords. Parallelizes per file; each decode touches only
    its own raster."""
    from ..pipelines.rasterize import pack_pixel

    kwargs.setdefault("file_extensions", ["tif", "tiff"])
    raw = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def explode(batch: pa.Table) -> pa.Table:
        pix_out, burn_out = [], []
        for path, buf in zip(batch["path"].to_pylist(),
                             batch["bytes"].to_pylist()):
            arr, meta = decode_geotiff(buf)
            parts = os.path.normpath(path).split(os.sep)
            ty = int(os.path.splitext(parts[-1])[0])
            tx = int(parts[-2])
            z = int(parts[-3])
            ts = arr.shape[0]
            if drop_zero:
                gy, gx = np.nonzero(arr)
            else:
                gy, gx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
                gy, gx = gy.ravel(), gx.ravel()
            vals = arr[gy, gx].astype(np.float64)
            pix_out.append(pack_pixel(z, tx * ts + gx.astype(np.int64),
                                      ty * ts + gy.astype(np.int64))
                           .astype(np.int64))
            burn_out.append(vals)
        if not pix_out:
            return pa.table({"pix_id": pa.array([], pa.int64()),
                             "burn": pa.array([], pa.float64())})
        return pa.table({"pix_id": pa.array(np.concatenate(pix_out)),
                         "burn": pa.array(np.concatenate(burn_out))})

    return raw.map_batches(explode, batch_format="pyarrow")
