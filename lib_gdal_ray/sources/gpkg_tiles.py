"""GeoPackage raster tile pyramids — the GPKG `tiles` data type.

Parity target: the reference GPKG driver's raster side
(`ogr/ogrsf_frmts/gpkg/ogrgeopackagedataset.cpp` raster open /
`gdalgeopackagerasterband.cpp` tile IO; `gdal raster tile` writes the
same container) and `autotest/gdrivers/gpkg.py` fixtures (byte.gpkg:
band-1 checksum 4672). A raster GPKG is a SQLite file holding

* `gpkg_contents` row with ``data_type='tiles'`` and the raster's
  geographic window (min_x..max_y),
* `gpkg_tile_matrix_set` — the tiling grid's full extent per table,
* `gpkg_tile_matrix` — per-zoom matrix width/height, tile size and
  pixel size,
* the tile user-data table ``(id, zoom_level, tile_column, tile_row,
  tile_data)`` with tile_row counted TOP-DOWN (XYZ order — unlike
  MBTiles' TMS flip) and tile_data an encoded PNG/JPEG blob.

Ray-Data shape mirrors the other sqlite containers (sources/gpkg.py,
sources/mbtiles.py): tile ENCODE is the parallel stage (one
`groupby(tile_id).map_groups` densify+encode per tile — the pipeline's
single wide exchange); the single-file sqlite assembly is driver-side
(one writer lock is a format property, not a pipeline one; at scale
each shard/band writes its own valid .gpkg and `merge_gpkg_tiles`
folds on demand). Reads split the tile table into rowid ranges — each
task opens read-only and decodes only its own tiles back to sparse
pixel rows, so downstream checksum/overview/zonal pipelines compose
unchanged.
"""

from __future__ import annotations

import os
import sqlite3
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

# WebMercatorQuad (GoogleMapsCompatible) grid constants — shared with
# geom/cells.py tile math: zoom z has 2^z x 2^z tiles over +-HALF.
WEBMERC_HALF = 20037508.342789244

_SRS_ROWS = [
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    ("WGS 84", 4326, "EPSG", 4326,
     'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
     '298.257223563]],PRIMEM["Greenwich",0],'
     'UNIT["degree",0.0174532925199433]]', None),
    ("WGS 84 / Pseudo-Mercator", 3857, "EPSG", 3857,
     'PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",DATUM['
     '"WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM['
     '"Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION['
     '"Mercator_1SP"],PARAMETER["central_meridian",0],PARAMETER['
     '"scale_factor",1],PARAMETER["false_easting",0],PARAMETER['
     '"false_northing",0],UNIT["metre",1]]', None),
]


# ---------------------------------------------------------------------------
# parallel tile encode: sparse pixel rows -> (z, tile_x, tile_y, data)
# ---------------------------------------------------------------------------


def render_tile_blobs(pixels: ray.data.Dataset, fmt: str = "png",
                      tile_size: int = 256,
                      dtype=np.uint8) -> ray.data.Dataset:
    """Sparse pixel rows (pix_id, burn) -> one encoded image blob per
    XYZ tile: Dataset (z, tile_x, tile_y, data, n_pixels, checksum).
    Values are cast to ``dtype`` (callers clamp first — the GPKG PNG
    tile is 8/16-bit). The groupby is the one wide exchange; each
    group densifies only its own tile window (write_geotiff_tiles
    shape, sources/geotiff.py:44)."""
    from ..pipelines.rasterize import gdal_checksum, unpack_pixel

    np_dtype = np.dtype(dtype)
    if fmt not in ("png", "jpeg"):
        raise ValueError("fmt must be png|jpeg")

    def key(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        z, gx, gy = unpack_pixel(pix)
        tid = ((z.astype(np.int64) << 50)
               | ((gx // tile_size).astype(np.int64) << 25)
               | (gy // tile_size).astype(np.int64))
        return batch.append_column("tile_id", pa.array(tid))

    def encode_tile(group: pa.Table) -> pa.Table:
        pix = group["pix_id"].to_numpy(zero_copy_only=False)
        burn = group["burn"].to_numpy(zero_copy_only=False)
        z, gx, gy = unpack_pixel(pix)
        zi = int(z[0])
        tx = int(gx[0]) // tile_size
        ty = int(gy[0]) // tile_size
        dense = np.zeros((tile_size, tile_size), dtype=np_dtype)
        if np_dtype.kind in "ui":   # clamp, don't wrap (GDAL Byte cast)
            lo, hi = np.iinfo(np_dtype).min, np.iinfo(np_dtype).max
            burn = np.clip(burn, lo, hi)
        dense[gy - ty * tile_size, gx - tx * tile_size] = \
            burn.astype(np_dtype)
        if fmt == "png":
            from ..codecs.png import encode_png

            blob = encode_png(dense)
        else:
            from ..codecs.jpeg import encode_jpeg

            blob = encode_jpeg(dense)
        return pa.table({
            "z": pa.array([zi], pa.int32()),
            "tile_x": pa.array([tx], pa.int64()),
            "tile_y": pa.array([ty], pa.int64()),
            "data": pa.array([blob], pa.binary()),
            "n_pixels": pa.array([len(group)], pa.int64()),
            "checksum": pa.array(
                [int(gdal_checksum(dense.astype(np.float64)))], pa.int64()),
        })

    return (pixels.map_batches(key, batch_format="pyarrow")
            .groupby("tile_id").map_groups(encode_tile,
                                           batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# write: tile Dataset -> ONE .gpkg (driver-side sqlite assembly)
# ---------------------------------------------------------------------------


def _tile_matrix_rows(zooms: List[int], tile_size: int, tms=None):
    """gpkg_tile_matrix rows. Default WebMercatorQuad: zoom z =
    2^z x 2^z matrix, pixel size = world / (2^z * tile_size);
    otherwise taken from the OGC TileMatrixSet (geom/tms.py)."""
    rows = []
    for z in sorted(zooms):
        if tms is None:
            n = 1 << z
            px = 2.0 * WEBMERC_HALF / (n * tile_size)
            rows.append((z, n, n, tile_size, tile_size, px, px))
        else:
            r = tms.res(z)
            rows.append((z, tms.matrix_width(z), tms.matrix_height(z),
                         tms.tile_size, tms.tile_size, r, r))
    return rows


def write_gpkg_raster(tiles: ray.data.Dataset, out_path: str,
                      table: str = "tiles", fmt: str = "png",
                      tile_size: int = 256,
                      bounds: Optional[Tuple[float, float, float, float]]
                      = None,
                      tms=None) -> int:
    """Tile Dataset (z, tile_x, tile_y, data) -> ONE raster .gpkg with
    the full registry (contents/tile_matrix_set/tile_matrix) on the
    WebMercatorQuad grid. Blobs were encoded in parallel upstream
    (render_tile_blobs); this is the bounded driver-side assembly —
    the same role as write_mbtiles / the PMTiles stitch. tile_row is
    stored TOP-DOWN (gpkg spec), i.e. XYZ tile_y unchanged. Returns
    the tile count."""
    rows = []
    zooms = set()
    for ref in tiles.to_arrow_refs():
        import ray as _ray

        t = _ray.get(ref)
        if len(t) == 0 or "z" not in t.column_names:
            continue
        zs = t["z"].to_numpy(zero_copy_only=False)
        xs = t["tile_x"].to_numpy(zero_copy_only=False)
        ys = t["tile_y"].to_numpy(zero_copy_only=False)
        blobs = t["data"].to_pylist()
        for z, x, y, b in zip(zs, xs, ys, blobs):
            rows.append((int(z), int(x), int(y), b))
            zooms.add(int(z))
    if not rows:
        raise ValueError("no tiles to write")
    rows.sort(key=lambda r: (r[0], r[1], r[2]))

    if tms is not None and tms.identifier == "WebMercatorQuad":
        tms = None  # the default constants ARE WebMercatorQuad
    srs_id = 3857
    tms_extent = (-WEBMERC_HALF, -WEBMERC_HALF,
                  WEBMERC_HALF, WEBMERC_HALF)
    if tms is not None:
        srs_id = {"EPSG:3857": 3857, "EPSG:3395": 3395,
                  "CRS84": 4326, "EPSG:4326": 4326}.get(tms.crs, 0)
        tms_extent = tms.extent()
        tile_size = tms.tile_size

    if bounds is None:
        # content window = union of present tiles at the max zoom
        zmax = max(zooms)
        txs = [r[1] for r in rows if r[0] == zmax]
        tys = [r[2] for r in rows if r[0] == zmax]
        if tms is None:
            w = 2.0 * WEBMERC_HALF / (1 << zmax)
            bounds = (-WEBMERC_HALF + min(txs) * w,
                      WEBMERC_HALF - (max(tys) + 1) * w,
                      -WEBMERC_HALF + (max(txs) + 1) * w,
                      WEBMERC_HALF - min(tys) * w)
        else:
            lo = tms.tile_bounds(zmax, min(txs), max(tys))
            hi = tms.tile_bounds(zmax, max(txs), min(tys))
            bounds = (lo[0], lo[1], hi[2], hi[3])

    tmp = out_path + ".tmp"
    if os.path.exists(tmp):
        os.unlink(tmp)
    con = sqlite3.connect(tmp)
    try:
        con.execute("PRAGMA application_id = 1196444487")   # 'GPKG'
        con.execute("PRAGMA user_version = 10300")          # 1.3.0
        con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL,
            organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)""")
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            _SRS_ROWS)
        con.execute("""CREATE TABLE gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME NOT NULL
                DEFAULT '2000-01-01T00:00:00.000Z',
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER)""")
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (table, "tiles", table, bounds[0], bounds[1], bounds[2],
             bounds[3], srs_id))
        con.execute("""CREATE TABLE gpkg_tile_matrix_set (
            table_name TEXT NOT NULL PRIMARY KEY, srs_id INTEGER NOT NULL,
            min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL,
            max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL)""")
        con.execute("INSERT INTO gpkg_tile_matrix_set VALUES (?,?,?,?,?,?)",
                    (table, srs_id, *tms_extent))
        con.execute("""CREATE TABLE gpkg_tile_matrix (
            table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,
            matrix_width INTEGER NOT NULL, matrix_height INTEGER NOT NULL,
            tile_width INTEGER NOT NULL, tile_height INTEGER NOT NULL,
            pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT NULL,
            PRIMARY KEY (table_name, zoom_level))""")
        con.executemany(
            "INSERT INTO gpkg_tile_matrix VALUES "
            f"('{table}',?,?,?,?,?,?,?)",
            _tile_matrix_rows(sorted(zooms), tile_size, tms))
        con.execute(f"""CREATE TABLE "{table}" (
            id INTEGER PRIMARY KEY AUTOINCREMENT,
            zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL,
            tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL,
            UNIQUE (zoom_level, tile_column, tile_row))""")
        con.executemany(
            f'INSERT INTO "{table}" (zoom_level, tile_column, tile_row,'
            " tile_data) VALUES (?,?,?,?)", rows)
        con.commit()
    finally:
        con.close()
    os.replace(tmp, out_path)
    return len(rows)


def merge_gpkg_tiles(shard_paths: List[str], out_path: str,
                     table: str = "tiles") -> int:
    """Fold per-band raster .gpkg shards into ONE (driver-side;
    sqlite has one writer). Registry rows come from the first shard;
    gpkg_tile_matrix rows union; contents bounds union."""
    import shutil

    if not shard_paths:
        raise ValueError("no shards")
    shutil.copy(shard_paths[0], out_path + ".tmp")
    con = sqlite3.connect(out_path + ".tmp")
    try:
        total = con.execute(
            f'SELECT count(*) FROM "{table}"').fetchone()[0]
        for f in shard_paths[1:]:
            con.execute("ATTACH DATABASE ? AS src", (f,))
            con.execute(
                f'INSERT INTO "{table}" (zoom_level, tile_column,'
                " tile_row, tile_data) SELECT zoom_level, tile_column,"
                f' tile_row, tile_data FROM src."{table}"')
            con.execute(
                "INSERT OR IGNORE INTO gpkg_tile_matrix "
                "SELECT * FROM src.gpkg_tile_matrix")
            b = con.execute(
                "SELECT min_x, min_y, max_x, max_y FROM src.gpkg_contents"
                " WHERE table_name = ?", (table,)).fetchone()
            if b is not None:
                con.execute(
                    "UPDATE gpkg_contents SET min_x = min(min_x, ?),"
                    " min_y = min(min_y, ?), max_x = max(max_x, ?),"
                    " max_y = max(max_y, ?) WHERE table_name = ?",
                    (*b, table))
            total += con.execute(
                f'SELECT count(*) FROM src."{table}"').fetchone()[0]
            con.commit()
            con.execute("DETACH DATABASE src")
        con.commit()
    finally:
        con.close()
    os.replace(out_path + ".tmp", out_path)
    return total


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def gpkg_raster_info(path: str, table: Optional[str] = None) -> Dict:
    """Driver-side registry peek: contents window, tile matrix set
    extent, per-zoom pixel sizes. Raises if the file has no tiles
    layer (vector GPKGs route through sources/gpkg.py)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        q = "SELECT table_name, min_x, min_y, max_x, max_y, srs_id " \
            "FROM gpkg_contents WHERE data_type IN ('tiles'," \
            " '2d-gridded-coverage')"
        rows = con.execute(q).fetchall()
        names = [r[0] for r in rows]
        if table is None:
            if not names:
                raise ValueError(f"{path}: no raster tile layers")
            table = names[0]
        elif table not in names:
            raise ValueError(f"{path}: {table!r} not in {names}")
        c = rows[names.index(table)]
        tms = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_tile_matrix_set"
            " WHERE table_name = ?", (table,)).fetchone()
        tm = con.execute(
            "SELECT zoom_level, matrix_width, matrix_height, tile_width,"
            " tile_height, pixel_x_size, pixel_y_size FROM gpkg_tile_matrix"
            " WHERE table_name = ? ORDER BY zoom_level", (table,)).fetchall()
        return {
            "table": table, "srs_id": int(c[5]),
            "contents": (c[1], c[2], c[3], c[4]),
            "tms": tuple(tms),
            "zooms": {int(r[0]): {"width": int(r[1]), "height": int(r[2]),
                                  "tile_w": int(r[3]), "tile_h": int(r[4]),
                                  "px_x": float(r[5]), "px_y": float(r[6])}
                      for r in tm},
        }
    finally:
        con.close()


def read_gpkg_tiles(path: str, table: Optional[str] = None,
                    zoom: Optional[int] = None,
                    rows_per_split: int = 256) -> ray.data.Dataset:
    """Raster .gpkg -> Dataset (z, tile_x, tile_y, data) of raw blobs.
    tile_row is already top-down — no TMS flip. Rowid-range splits;
    each task opens read-only and SELECTs only its range."""
    info = gpkg_raster_info(path, table)
    table = info["table"]
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    where = f" WHERE zoom_level = {int(zoom)}" if zoom is not None else ""
    lo_hi = con.execute(
        f'SELECT min(rowid), max(rowid) FROM "{table}"{where}').fetchone()
    con.close()
    if lo_hi[0] is None:
        return ray.data.from_arrow(pa.table(
            {"z": pa.array([], pa.int32()),
             "tile_x": pa.array([], pa.int64()),
             "tile_y": pa.array([], pa.int64()),
             "data": pa.array([], pa.binary())}))
    lo, hi = int(lo_hi[0]), int(lo_hi[1])
    splits = [{"a": a, "b": min(a + rows_per_split - 1, hi)}
              for a in range(lo, hi + 1, rows_per_split)]

    def fetch(batch: pa.Table) -> pa.Table:
        zs, xs, ys, blobs = [], [], [], []
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            q = ("SELECT zoom_level, tile_column, tile_row, tile_data "
                 f'FROM "{table}" WHERE rowid BETWEEN {a} AND {b}') + \
                (f" AND zoom_level = {int(zoom)}" if zoom is not None
                 else "")
            for z, x, y, blob in con.execute(q):
                zs.append(z)
                xs.append(x)
                ys.append(y)
                blobs.append(blob)
        con.close()
        return pa.table({"z": pa.array(zs, pa.int32()),
                         "tile_x": pa.array(xs, pa.int64()),
                         "tile_y": pa.array(ys, pa.int64()),
                         "data": pa.array(blobs, pa.binary())})

    return ray.data.from_items(
        splits, override_num_blocks=min(64, len(splits))
    ).map_batches(fetch, batch_format="pyarrow")


def read_gpkg_raster_pixels(path: str, table: Optional[str] = None,
                            zoom: Optional[int] = None,
                            band: int = 1,
                            drop_zero: bool = True) -> ray.data.Dataset:
    """Raster .gpkg -> sparse pixel rows (pix_id, burn): each read task
    decodes its own tile blobs (PNG/JPEG sniffed per blob) and emits
    global pixel ids, clipped to the contents window — so checksum /
    overview / zonal pipelines compose unchanged. ``band`` is 1-based
    (multi-channel tiles: gray+alpha or RGB(A))."""
    info = gpkg_raster_info(path, table)
    tiles = read_gpkg_tiles(path, info["table"], zoom=zoom)
    zooms = info["zooms"]
    tms = info["tms"]
    cx0, cy0, cx1, cy1 = info["contents"]
    from ..pipelines.rasterize import pack_pixel

    def decode(batch: pa.Table) -> pa.Table:
        from ..codecs.png import decode_png

        pix_out, val_out = [], []
        zs = batch["z"].to_numpy(zero_copy_only=False)
        xs = batch["tile_x"].to_numpy(zero_copy_only=False)
        ys = batch["tile_y"].to_numpy(zero_copy_only=False)
        for j in range(len(batch)):
            blob = batch["data"][j].as_py()
            if blob[:8] == b"\x89PNG\r\n\x1a\n":
                arr = decode_png(blob)
            else:
                from ..codecs.jpeg import decode_jpeg

                arr = decode_jpeg(blob)
            if arr.ndim == 3:
                arr = arr[:, :, band - 1]
            zi = int(zs[j])
            zm = zooms[zi]
            tw, th = zm["tile_w"], zm["tile_h"]
            # global pixel origin of this tile in the tile-matrix grid
            gx0 = int(xs[j]) * tw
            gy0 = int(ys[j]) * th
            # contents window in pixel coords at this zoom (clip)
            wx0 = int(round((cx0 - tms[0]) / zm["px_x"]))
            wy0 = int(round((tms[3] - cy1) / zm["px_y"]))
            wx1 = int(round((cx1 - tms[0]) / zm["px_x"]))
            wy1 = int(round((tms[3] - cy0) / zm["px_y"]))
            yy, xx = np.nonzero(arr != 0) if drop_zero else \
                np.unravel_index(np.arange(arr.size),
                                 arr.shape)
            gx = gx0 + xx
            gy = gy0 + yy
            m = (gx >= wx0) & (gx < wx1) & (gy >= wy0) & (gy < wy1)
            pix_out.append(pack_pixel(zi, gx[m].astype(np.int64),
                                      gy[m].astype(np.int64)))
            val_out.append(arr[yy[m], xx[m]].astype(np.float64))
        if not pix_out:
            return pa.table({"pix_id": pa.array([], pa.uint64()),
                             "burn": pa.array([], pa.float64())})
        return pa.table({"pix_id": pa.array(np.concatenate(pix_out)),
                         "burn": pa.array(np.concatenate(val_out))})

    return tiles.map_batches(decode, batch_format="pyarrow")


def read_gpkg_raster(path: str, table: Optional[str] = None,
                     zoom: Optional[int] = None,
                     band: int = 1) -> Tuple[np.ndarray, Dict]:
    """Driver-side dense read of the contents window (small fixtures /
    gdalinfo parity): assembles band ``band`` over the highest (or
    given) zoom. Returns (array, meta) like the raster registry's
    decode contract."""
    info = gpkg_raster_info(path, table)
    if zoom is None:
        zoom = max(info["zooms"])
    zm = info["zooms"][zoom]
    tms = info["tms"]
    cx0, cy0, cx1, cy1 = info["contents"]
    wx0 = int(round((cx0 - tms[0]) / zm["px_x"]))
    wy0 = int(round((tms[3] - cy1) / zm["px_y"]))
    wx1 = int(round((cx1 - tms[0]) / zm["px_x"]))
    wy1 = int(round((tms[3] - cy0) / zm["px_y"]))
    out = None
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        from ..codecs.png import decode_png

        for x, y, blob in con.execute(
                f'SELECT tile_column, tile_row, tile_data FROM '
                f'"{info["table"]}" WHERE zoom_level = ?', (zoom,)):
            if blob[:8] == b"\x89PNG\r\n\x1a\n":
                arr = decode_png(blob)
            else:
                from ..codecs.jpeg import decode_jpeg

                arr = decode_jpeg(blob)
            if arr.ndim == 3:
                arr = arr[:, :, band - 1]
            if out is None:
                out = np.zeros((wy1 - wy0, wx1 - wx0), dtype=arr.dtype)
            gx0 = x * zm["tile_w"]
            gy0 = y * zm["tile_h"]
            # overlap of this tile with the contents window
            ox0 = max(gx0, wx0)
            oy0 = max(gy0, wy0)
            ox1 = min(gx0 + arr.shape[1], wx1)
            oy1 = min(gy0 + arr.shape[0], wy1)
            if ox1 <= ox0 or oy1 <= oy0:
                continue
            out[oy0 - wy0:oy1 - wy0, ox0 - wx0:ox1 - wx0] = \
                arr[oy0 - gy0:oy1 - gy0, ox0 - gx0:ox1 - gx0]
    finally:
        con.close()
    if out is None:
        raise ValueError(f"{path}: no tiles at zoom {zoom}")
    meta = {"transform": (cx0, zm["px_x"], 0.0, cy1, 0.0, -zm["px_y"]),
            "epsg": info["srs_id"], "zoom": zoom,
            "width": out.shape[1], "height": out.shape[0]}
    return out, meta
