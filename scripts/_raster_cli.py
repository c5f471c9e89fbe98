"""Shared plumbing for the raster utility CLIs (gdal_sieve /
gdal_fillnodata / gdal_proximity / gdaldem): read a raster file into
sparse pixel rows and compose sparse results back into a GeoTIFF."""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def open_meta(src: str):
    from lib_gdal_ray.sources.rasters import open_raster

    with open(src, "rb") as f:
        head = f.read()
    _n, arr, meta = open_raster(head)
    h, w = arr.shape[:2]
    del arr
    return h, w, meta


def pixels_ds(src: str, band: int = 0):
    """File -> Dataset of (pix_id, burn) at z=0 grid coords."""
    import numpy as np
    import pyarrow as pa

    from lib_gdal_ray.pipelines.rasterize import pack_pixel
    from lib_gdal_ray.sources.rasters import read_raster_pixels

    def to_pix(batch: pa.Table) -> pa.Table:
        b = batch["band"].to_numpy(zero_copy_only=False)
        keep = b == band
        x = batch["x"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"pix_id": pa.array(pack_pixel(0, x, y)),
                         "burn": pa.array(v.astype(np.float64))})

    return read_raster_pixels(src).map_batches(to_pix,
                                               batch_format="pyarrow")


def compose_geotiff(ds, h: int, w: int, dst: str, meta: dict,
                    dtype="float32", value_col: str = "burn",
                    fill: float = 0.0) -> int:
    """Sparse (pix_id, value) rows -> dense GeoTIFF written atomically
    (compose runs in ONE Ray task from block refs)."""
    import numpy as np
    import ray

    refs = ds.to_arrow_refs()

    @ray.remote
    def compose(*blocks) -> bytes:
        from lib_gdal_ray.codecs.tiff import encode_geotiff
        from lib_gdal_ray.pipelines.rasterize import unpack_pixel

        dense = np.full((h, w), fill, dtype=np.dtype(dtype))
        for blk in blocks:
            if len(blk) == 0:
                continue
            _z, gx, gy = unpack_pixel(
                blk["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
            ok = (gx < w) & (gy < h)
            dense[gy[ok], gx[ok]] = blk[value_col].to_numpy(
                zero_copy_only=False)[ok].astype(dense.dtype)
        return encode_geotiff(dense, transform=meta.get("transform"),
                              epsg=meta.get("epsg"))

    buf = ray.get(compose.remote(*refs))
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, dst)
    return len(buf)
