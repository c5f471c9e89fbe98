"""GeoPackage (OGC GPKG 1.x) vector driver over stdlib sqlite3.

The reference's most-exercised vector format (ogr/ogrsf_frmts/gpkg;
GPKG→GPKG translate is its flagship benchmark,
autotest/benchmark/test_ogr2ogr.py:26-58). A .gpkg file is a SQLite
database with registry tables (gpkg_contents, gpkg_geometry_columns,
gpkg_spatial_ref_sys) and one table per feature layer whose geometry
column holds GeoPackageBinary blobs: a "GP" header (version, flags,
srs_id, optional envelope) followed by ISO WKB
(gpkg spec §2.1.3 / reference ogr/ogrsf_frmts/gpkg/ogrgeopackageutility.cpp
GPkgHeaderFromWKB / GPkgGeometryToWKB).

Ray-Data shape:
* read — one task per (file, rowid-range) split: the driver peeks at
  sqlite_master/gpkg registry cheaply (driver-side, one connection) to
  plan splits; each task re-opens its file read-only and scans ONE
  rowid range, so a directory of shard files or one big file both
  parallelize. SQLite files are immutable inputs here — concurrent
  read-only connections are safe.
* write — partitioned sink: one fully-valid .gpkg per block written
  atomically (tmp + rename), mirroring the tile/GeoTIFF sinks'
  resumable layout. A single-file sqlite write cannot be distributed
  (one writer lock), so the partitioned directory IS the scalable
  layout; `merge_gpkg_dir` folds shards into one file driver-side when
  a single .gpkg deliverable is required (bounded by the final file
  size, not the pipeline width).
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import ray.data

_SRS_WGS84 = (
    "WGS 84", 4326, "EPSG", 4326,
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
)


# ---------------------------------------------------------------------------
# GeoPackageBinary blob codec
# ---------------------------------------------------------------------------


def wkb_to_gpkg_blob(wkb: Optional[bytes], srs_id: int = 4326) -> Optional[bytes]:
    """ISO WKB -> GeoPackageBinary: magic GP, version 0, flags 0x01
    (little-endian header, no envelope), srs_id, then the WKB."""
    if wkb is None:
        return None
    return b"GP\x00\x01" + struct.pack("<i", srs_id) + wkb


def gpkg_blob_to_wkb(blob: Optional[bytes]) -> Optional[bytes]:
    """GeoPackageBinary -> ISO WKB (skips the GP header + envelope)."""
    if blob is None:
        return None
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob")
    flags = blob[3]
    env_ind = (flags >> 1) & 0x07
    env_doubles = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get(env_ind)
    if env_doubles is None:
        raise ValueError(f"invalid envelope indicator {env_ind}")
    return blob[8 + 8 * env_doubles:]


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

_ARROW_SQLITE = [
    (pa.types.is_boolean, "INTEGER"),
    (pa.types.is_integer, "INTEGER"),
    (pa.types.is_floating, "REAL"),
    (pa.types.is_string, "TEXT"),
    (pa.types.is_binary, "BLOB"),
]


def _sqlite_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_SQLITE:
        if pred(t):
            return name
    raise ValueError(f"unsupported arrow type for GPKG: {t}")


def _write_one_gpkg(path: str, table: pa.Table, layer: str,
                    geometry_col: str, geometry_type: str,
                    srs_id: int) -> int:
    """Write one complete, spec-shaped .gpkg file (registry + layer)."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        os.unlink(tmp)
    con = sqlite3.connect(tmp)
    try:
        con.execute("PRAGMA application_id = 1196444487")   # 'GPKG'
        con.execute("PRAGMA user_version = 10300")          # 1.3.0
        con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)""")
        con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
                    _SRS_WGS84)
        con.execute("""CREATE TABLE gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME NOT NULL DEFAULT '2000-01-01T00:00:00.000Z',
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER)""")
        con.execute("""CREATE TABLE gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            PRIMARY KEY (table_name, column_name))""")
        attr_cols = [c for c in table.column_names if c != geometry_col]
        defs = ", ".join(
            f'"{c}" {_sqlite_type(table.schema.field(c).type)}' for c in attr_cols)
        has_geom = geometry_col in table.column_names
        geom_def = f', "{geometry_col}" BLOB' if has_geom else ""
        con.execute(f'CREATE TABLE "{layer}" '
                    f"(fid INTEGER PRIMARY KEY AUTOINCREMENT{', ' if defs else ''}"
                    f"{defs}{geom_def})")
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id)"
            " VALUES (?,?,?,?)",
            (layer, "features" if has_geom else "attributes", layer, srs_id))
        if has_geom:
            con.execute("INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
                        (layer, geometry_col, geometry_type, srs_id))
        cols = attr_cols + ([geometry_col] if has_geom else [])
        names = ", ".join(f'"{c}"' for c in cols)
        marks = ", ".join("?" for _ in cols)
        data = [table[c].to_pylist() for c in attr_cols]
        if has_geom:
            data.append([wkb_to_gpkg_blob(g, srs_id)
                         for g in table[geometry_col].to_pylist()])
        con.executemany(f'INSERT INTO "{layer}" ({names}) VALUES ({marks})',
                        list(zip(*data)) if cols else [])
        con.commit()
    finally:
        con.close()
    os.replace(tmp, path)
    return table.num_rows


def write_gpkg(ds: ray.data.Dataset, out_dir: str, layer: str = "layer",
               geometry_col: str = "geometry",
               geometry_type: str = "GEOMETRY",
               srs_id: int = 4326) -> None:
    """Dataset -> directory of .gpkg shard files (one valid GeoPackage
    per block, atomic tmp+rename per shard — resumable layout)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        # deterministic shard name: same block content -> same file
        # (re-runs overwrite atomically instead of duplicating)
        import hashlib

        key = hashlib.md5(
            repr((batch[batch.column_names[0]].to_pylist()[0],
                  batch.num_rows)).encode()).hexdigest()[:12]
        path = os.path.join(out_dir, f"part-{key}-{batch.num_rows}.gpkg")
        n = _write_one_gpkg(path, batch, layer, geometry_col,
                            geometry_type, srs_id)
        return pa.table({"path": pa.array([path]),
                         "n_rows": pa.array([n], pa.int64())})

    # materialize the tiny manifest to force the writes
    ds.map_batches(write_block, batch_format="pyarrow").materialize()


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def _gpkg_layer_info(path: str, layer: Optional[str]):
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents ORDER BY table_name").fetchall()
        names = [r[0] for r in rows]
        if layer is None:
            if not names:
                raise ValueError(f"{path}: no layers in gpkg_contents")
            layer = names[0]
        elif layer not in names:
            raise ValueError(f"{path}: layer {layer!r} not in {names}")
        g = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,)).fetchone()
        geom_col = g[0] if g else None
        lo, hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{layer}"').fetchone()
        return layer, geom_col, lo, hi
    finally:
        con.close()


def read_gpkg(paths: Union[str, List[str]], layer: Optional[str] = None,
              columns: Optional[Sequence[str]] = None,
              rows_per_task: int = 200_000) -> ray.data.Dataset:
    """GeoPackage file(s)/directory -> Dataset with WKB `geometry`.

    Planning is driver-side and cheap (registry peek + rowid bounds per
    file); scanning fans out one task per (file, rowid-range), so both
    many-shards and one-big-file inputs parallelize. `columns` prunes
    at the SQL level (only requested attrs leave SQLite)."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith(".gpkg"))
        else:
            files = [paths]
    else:
        files = list(paths)
    if not files:
        raise ValueError("no .gpkg files found")

    splits = []
    for f in files:
        lyr, geom_col, lo, hi = _gpkg_layer_info(f, layer)
        if lo is None:
            continue
        start = lo
        while start <= hi:
            end = min(start + rows_per_task - 1, hi)
            splits.append({"path": f, "layer": lyr, "geom_col": geom_col or "",
                           "lo": start, "hi": end})
            start = end + 1
    if not splits:
        raise ValueError("gpkg input is empty")

    want = list(columns) if columns else None

    def scan(batch: pa.Table) -> pa.Table:
        out: List[pa.Table] = []
        for row in batch.to_pylist():
            con = sqlite3.connect(f"file:{row['path']}?mode=ro", uri=True)
            try:
                cur = con.execute(f'SELECT * FROM "{row["layer"]}" LIMIT 0')
                all_cols = [d[0] for d in cur.description]
                geom_col = row["geom_col"] or None
                sel = want if want is not None else \
                    [c for c in all_cols if c != "fid"]
                names = ", ".join(f'"{c}"' for c in sel)
                cur = con.execute(
                    f'SELECT {names} FROM "{row["layer"]}"'
                    " WHERE rowid BETWEEN ? AND ?", (row["lo"], row["hi"]))
                data = list(zip(*cur.fetchall()))
                cols = {}
                for i, c in enumerate(sel):
                    vals = list(data[i]) if data else []
                    if c == geom_col:
                        cols["geometry"] = pa.array(
                            [gpkg_blob_to_wkb(v) for v in vals],
                            type=pa.binary())
                    else:
                        cols[c] = pa.array(vals)
                out.append(pa.table(cols))
            finally:
                con.close()
        return pa.concat_tables(out) if out else pa.table({})

    return (ray.data.from_items(splits)
            .map_batches(scan, batch_format="pyarrow", batch_size=1))


def merge_gpkg_dir(shard_dir: str, out_path: str, layer: str = "layer",
                   geometry_col: str = "geometry") -> int:
    """Fold a write_gpkg shard directory into ONE .gpkg (driver-side,
    for single-file deliverables; sequential by nature — sqlite has one
    writer). Returns total rows."""
    files = sorted(os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
                   if f.endswith(".gpkg"))
    if not files:
        raise ValueError("no shards to merge")
    import shutil

    shutil.copy(files[0], out_path + ".tmp")
    con = sqlite3.connect(out_path + ".tmp")
    try:
        total = con.execute(f'SELECT count(*) FROM "{layer}"').fetchone()[0]
        for f in files[1:]:
            con.execute("ATTACH DATABASE ? AS src", (f,))
            cur = con.execute(f'SELECT * FROM src."{layer}" LIMIT 0')
            cols = [d[0] for d in cur.description if d[0] != "fid"]
            names = ", ".join(f'"{c}"' for c in cols)
            con.execute(f'INSERT INTO "{layer}" ({names}) '
                        f'SELECT {names} FROM src."{layer}"')
            total += con.execute(
                f'SELECT count(*) FROM src."{layer}"').fetchone()[0]
            con.commit()
            con.execute("DETACH DATABASE src")
        con.commit()
    finally:
        con.close()
    os.replace(out_path + ".tmp", out_path)
    return total
