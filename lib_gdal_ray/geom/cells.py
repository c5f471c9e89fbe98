"""Deterministic cell grids used as partitioning keys.

Two grids (per SURVEY.md §7.0):

1. **WebMercatorQuad tiles** — the OGC tile matrix GDAL's tiling engine
   defaults to (reference: ``apps/gdalalg_raster_tile.cpp:199-210``,
   ``gcore/tilematrixset.cpp``). ``lonlat_to_tile`` reproduces the
   standard slippy-map math; used by rasterize / tile-pyramid stages.

2. **Flat lon/lat grid** — equirectangular cells of ``res`` degrees,
   used as the spatial-join / kNN partitioning key (H3/S2-compatible
   API surface: ``cell_id``/``covering``/``ring``, per the north rule;
   the concrete scheme is swappable behind these functions).

Cell ids pack to uint64 so they shuffle as a single integer column.
All functions are vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

MAX_MERC_LAT = 85.05112878

# ---------------------------------------------------------------------------
# WebMercatorQuad tiles: id = (z << 58) | (x << 29) | y   (z <= 29)
# ---------------------------------------------------------------------------


def lonlat_to_tile(lon: np.ndarray, lat: np.ndarray, z: int):
    """(lon, lat) -> integer (tx, ty) at zoom z, slippy-map convention.

    Matches ``floor((lon+180)/360 * 2^z)`` and the mercator y formula
    exactly as a SQL oracle would compute them (verified bit-identical
    vs DuckDB in tests).
    """
    n = 1 << z
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERC_LAT, MAX_MERC_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    rad = np.radians(lat)
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    ty = np.floor((1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n).astype(np.int64)
    np.clip(tx, 0, n - 1, out=tx)
    np.clip(ty, 0, n - 1, out=ty)
    return tx, ty


def tile_pixel(lon, lat, z: int, tile_size: int = 256):
    """Global pixel coordinates -> (tx, ty, px, py) at zoom z."""
    n = 1 << z
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERC_LAT, MAX_MERC_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    rad = np.radians(lat)
    fx = (lon + 180.0) / 360.0 * n
    fy = (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n
    gx = np.floor(fx * tile_size).astype(np.int64)
    gy = np.floor(fy * tile_size).astype(np.int64)
    np.clip(gx, 0, n * tile_size - 1, out=gx)
    np.clip(gy, 0, n * tile_size - 1, out=gy)
    return gx // tile_size, gy // tile_size, gx % tile_size, gy % tile_size


def pack_tile(z, tx, ty) -> np.ndarray:
    z = np.asarray(z, dtype=np.uint64)
    return (z << np.uint64(58)) | (np.asarray(tx, dtype=np.uint64) << np.uint64(29)) | np.asarray(ty, dtype=np.uint64)


def unpack_tile(cell):
    cell = np.asarray(cell, dtype=np.uint64)
    z = (cell >> np.uint64(58)).astype(np.int64)
    tx = ((cell >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
    ty = (cell & np.uint64((1 << 29) - 1)).astype(np.int64)
    return z, tx, ty


def parent_tile(cell) -> np.ndarray:
    """Parent cell one zoom up (4:1 reduction, overview chain key)."""
    z, tx, ty = unpack_tile(cell)
    return pack_tile(z - 1, tx >> 1, ty >> 1)


# ---------------------------------------------------------------------------
# Flat lon/lat grid: res degrees; id = (ix << 16) | iy  with
# ix in [0, ceil(360/res)), iy in [0, ceil(180/res))  (res >= 0.01)
# ---------------------------------------------------------------------------


def grid_shape(res: float):
    nx = int(np.ceil(360.0 / res))
    ny = int(np.ceil(180.0 / res))
    return nx, ny


def grid_xy(lon, lat, res: float):
    """(lon, lat) -> integer grid (ix, iy); iy grows northward from -90."""
    nx, ny = grid_shape(res)
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / res).astype(np.int64)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / res).astype(np.int64)
    np.clip(ix, 0, nx - 1, out=ix)
    np.clip(iy, 0, ny - 1, out=iy)
    return ix, iy


def pack_grid(ix, iy) -> np.ndarray:
    return (np.asarray(ix, dtype=np.uint64) << np.uint64(20)) | np.asarray(iy, dtype=np.uint64)


def unpack_grid(cell):
    cell = np.asarray(cell, dtype=np.uint64)
    return (cell >> np.uint64(20)).astype(np.int64), (cell & np.uint64((1 << 20) - 1)).astype(np.int64)


def grid_cell(lon, lat, res: float) -> np.ndarray:
    ix, iy = grid_xy(lon, lat, res)
    return pack_grid(ix, iy)


def covering_grid(xmin, ymin, xmax, ymax, res: float):
    """Cells covered by each bbox.

    Returns (offsets, cells): bbox i covers cells[offsets[i]:offsets[i+1]].
    This is the key-assignment stage of the two-phase join (reference
    analog: envelope pretest + spatial-filter install,
    ``ogr/ogrsf_frmts/generic/ogrlayer.cpp:5285-5308``).
    """
    x0, y0 = grid_xy(xmin, ymin, res)
    x1, y1 = grid_xy(xmax, ymax, res)
    counts = (x1 - x0 + 1) * (y1 - y0 + 1)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    # fully vectorized ragged cartesian product (x-major, matching the
    # old per-box meshgrid order): no per-box Python loop
    box_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    local = np.arange(total, dtype=np.int64) - offsets[box_of]
    ny = (y1 - y0 + 1)[box_of]
    gx = x0[box_of] + local // ny
    gy = y0[box_of] + local % ny
    return offsets, pack_grid(gx, gy)


def zorder_key(ix: np.ndarray, iy: np.ndarray, bits: int = 24) -> np.ndarray:
    """Morton/Z-order interleave of two grid indices — the spatial sort
    key used before partitioned writes (FlatGeobuf packed-Hilbert/Z
    ordering analog, `ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:78`)."""
    x = np.asarray(ix, dtype=np.uint64)
    y = np.asarray(iy, dtype=np.uint64)
    out = np.zeros(len(x), dtype=np.uint64)
    for b in range(bits):
        bit = np.uint64(1) << np.uint64(b)
        out |= ((x & bit) << np.uint64(b)) | ((y & bit) << np.uint64(b + 1))
    return out


def ring_cells(cell: int, k: int, res: float) -> np.ndarray:
    """Cells at Chebyshev distance exactly k from `cell` (k=0 -> itself).

    The kNN cell-ring expansion key (reference analog: CPLQuadTree ring
    search in ``alg/gdalgrid.cpp:853-900``). Clamped at grid edges (no
    antimeridian wrap in v0 — documented limitation).
    """
    nx, ny = grid_shape(res)
    cx, cy = unpack_grid(np.asarray([cell], dtype=np.uint64))
    cx, cy = int(cx[0]), int(cy[0])
    if k == 0:
        return np.asarray([cell], dtype=np.uint64)
    xs, ys = [], []
    for x in range(cx - k, cx + k + 1):
        if 0 <= x < nx:
            if cy - k >= 0:
                xs.append(x); ys.append(cy - k)
            if cy + k < ny:
                xs.append(x); ys.append(cy + k)
    for y in range(cy - k + 1, cy + k):
        if 0 <= y < ny:
            if cx - k >= 0:
                xs.append(cx - k); ys.append(y)
            if cx + k < nx:
                xs.append(cx + k); ys.append(y)
    if not xs:
        return np.empty(0, dtype=np.uint64)
    return pack_grid(np.asarray(xs, dtype=np.int64), np.asarray(ys, dtype=np.int64))
