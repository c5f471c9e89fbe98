"""MBTiles sqlite tile archives.

Parity target: `frmts/mbtiles/mbtilesdataset.cpp` — the
`tiles(zoom_level, tile_column, tile_row, tile_data)` schema with
TMS row order (y flipped vs XYZ) and the `metadata` key/value table
(name/format/bounds/minzoom/maxzoom). Payloads are opaque tile blobs
(MVT .pbf or PNG/JPEG images — both real codecs here).

Ray shape mirrors `sources/gpkg.py`: the sqlite file is one artifact,
so the write is tile-parallel upstream (the MVT/GeoTIFF tile sinks)
with a driver-side INSERT pass; reads split the tiles table into
rowid ranges — each task opens the file read-only and SELECTs only
its own range.
"""

from __future__ import annotations

import os
import sqlite3
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import ray.data


def write_mbtiles(tile_dir: str, out_path: str,
                  fmt: str = "pbf",
                  metadata: Optional[Dict[str, str]] = None) -> int:
    """{tile_dir}/{z}/{x}/{y}.{fmt} tree (the MVT / GeoTIFF tile
    sinks' layout) -> ONE .mbtiles file. Tiles were encoded in
    parallel upstream; this is the driver-side assembly (same role as
    the PMTiles / FGB stitches). Returns the tile count."""
    rows: List = []
    zs: List[int] = []
    for z_name in sorted(os.listdir(tile_dir)):
        zdir = os.path.join(tile_dir, z_name)
        if not (z_name.isdigit() and os.path.isdir(zdir)):
            continue
        z = int(z_name)
        for x_name in sorted(os.listdir(zdir)):
            xdir = os.path.join(zdir, x_name)
            if not os.path.isdir(xdir):
                continue
            x = int(x_name)
            for y_file in sorted(os.listdir(xdir)):
                stem, ext = os.path.splitext(y_file)
                if ext.lstrip(".") != fmt:
                    continue
                y = int(stem)
                tms_y = (1 << z) - 1 - y          # XYZ -> TMS flip
                with open(os.path.join(xdir, y_file), "rb") as f:
                    rows.append((z, x, tms_y, f.read()))
                zs.append(z)
    if not rows:
        raise ValueError(f"no .{fmt} tiles under {tile_dir}")
    tmp = out_path + ".tmp"
    if os.path.exists(tmp):
        os.unlink(tmp)
    con = sqlite3.connect(tmp)
    con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
    con.execute("CREATE TABLE tiles (zoom_level INTEGER, "
                "tile_column INTEGER, tile_row INTEGER, tile_data BLOB)")
    con.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                "(zoom_level, tile_column, tile_row)")
    md = {"name": "lib_gdal_ray", "format": fmt,
          "minzoom": str(min(zs)), "maxzoom": str(max(zs)),
          "bounds": "-180.0,-85.0511,180.0,85.0511"}
    md.update(metadata or {})
    con.executemany("INSERT INTO metadata VALUES (?, ?)",
                    sorted(md.items()))
    con.executemany("INSERT INTO tiles VALUES (?, ?, ?, ?)", rows)
    con.commit()
    con.close()
    os.replace(tmp, out_path)
    return len(rows)


def read_mbtiles_meta(path: str) -> Dict[str, str]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    md = dict(con.execute("SELECT name, value FROM metadata"))
    con.close()
    return md


def read_mbtiles_tiles(path: str, zoom: Optional[int] = None,
                       rows_per_split: int = 1024) -> ray.data.Dataset:
    """.mbtiles -> Dataset (z, tile_x, tile_y (XYZ order), data).
    The tiles table splits into rowid ranges; each task opens the
    file read-only and SELECTs only its own range (the gpkg read
    shape)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    where = f" WHERE zoom_level = {int(zoom)}" if zoom is not None else ""
    lo_hi = con.execute(
        f"SELECT min(rowid), max(rowid) FROM tiles{where}").fetchone()
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
                 f"FROM tiles WHERE rowid BETWEEN {a} AND {b}") + \
                (f" AND zoom_level = {int(zoom)}" if zoom is not None
                 else "")
            for z, x, ty, blob in con.execute(q):
                zs.append(z)
                xs.append(x)
                ys.append((1 << z) - 1 - ty)      # TMS -> XYZ
                blobs.append(blob)
        con.close()
        return pa.table({"z": pa.array(zs, pa.int32()),
                         "tile_x": pa.array(xs, pa.int64()),
                         "tile_y": pa.array(ys, pa.int64()),
                         "data": pa.array(blobs, pa.binary())})

    return ray.data.from_items(
        splits, override_num_blocks=min(64, len(splits))
    ).map_batches(fetch, batch_format="pyarrow")


def read_mbtiles_features(path: str, **kwargs) -> ray.data.Dataset:
    """MVT-format .mbtiles -> feature rows (the mvt.read_mvt_features
    schema), decoding each tile blob in its read task."""
    import json

    from .mvt import decode_mvt_tile

    tiles = read_mbtiles_tiles(path, **kwargs)

    def explode(batch: pa.Table) -> pa.Table:
        cols = {"z": [], "tile_x": [], "tile_y": [], "layer": [],
                "geom_type": [], "n_parts": [], "n_points": [],
                "x": [], "y": [], "properties": []}
        for j in range(len(batch)):
            zz = batch["z"][j].as_py()
            tx = batch["tile_x"][j].as_py()
            ty = batch["tile_y"][j].as_py()
            for lname, layer in decode_mvt_tile(
                    batch["data"][j].as_py()).items():
                for f in layer["features"]:
                    cols["z"].append(zz)
                    cols["tile_x"].append(tx)
                    cols["tile_y"].append(ty)
                    cols["layer"].append(lname)
                    cols["geom_type"].append(f["type"])
                    cols["n_parts"].append(len(f["parts"]))
                    cols["n_points"].append(sum(len(p) for p in f["parts"]))
                    p0 = f["parts"][0][0] if f["parts"] else (0, 0)
                    cols["x"].append(int(p0[0]))
                    cols["y"].append(int(p0[1]))
                    cols["properties"].append(
                        json.dumps(f["properties"], sort_keys=True))
        return pa.table({
            "z": pa.array(cols["z"], pa.int32()),
            "tile_x": pa.array(cols["tile_x"], pa.int64()),
            "tile_y": pa.array(cols["tile_y"], pa.int64()),
            "layer": pa.array(cols["layer"], pa.string()),
            "geom_type": pa.array(cols["geom_type"], pa.int32()),
            "n_parts": pa.array(cols["n_parts"], pa.int64()),
            "n_points": pa.array(cols["n_points"], pa.int64()),
            "x": pa.array(cols["x"], pa.int64()),
            "y": pa.array(cols["y"], pa.int64()),
            "properties": pa.array(cols["properties"], pa.string()),
        })

    return tiles.map_batches(explode, batch_format="pyarrow")
