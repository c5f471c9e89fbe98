"""SQLite / SpatiaLite vector driver over stdlib sqlite3.

The reference's SQLite driver (ogr/ogrsf_frmts/sqlite) reads plain
SQLite tables and SpatiaLite-enabled databases whose geometry columns
hold GAIA internal blobs: 0x00 start byte, endianness byte, int32
SRID, 4-double MBR, 0x7C MBR-end marker, int32 geometry class, the
coordinate body, 0xFE end byte (layout per
ogr/ogrsf_frmts/sqlite/ogrsqlitelayer.cpp:2654,3454; class enum
ogr_sqlite.h:63-130).  Class codes mirror ISO WKB with +1000 Z,
+2000 M offsets plus a +1000000 "compressed" family where every
intermediate vertex is a float32 DELTA from the previous vertex and
only the first/last vertices of a line/ring are full doubles
(ogrsqlitelayer.cpp:1403-1470 LineString XY Compressed).

Ray-Data shape (same as the GPKG driver, `sources/gpkg.py`):
* read — driver peeks geometry_columns/sqlite_master once to plan
  (file, rowid-range) splits; one task scans one range read-only, so
  a directory of shards or one big file both parallelize; `columns`
  prunes at the SQL level.
* write — partitioned sink: one fully-valid SpatiaLite .sqlite per
  block (legacy 3.x registry schema, the layout of the reference's
  own test fixture autotest/ogr/data/sqlite/poly_spatialite.sqlite),
  atomic tmp+rename; `merge_spatialite_dir` folds shards driver-side
  when one deliverable file is required.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import ray.data

# geometry class codes (ogr_sqlite.h:63-130)
_BASE = {"point": 1, "linestring": 2, "polygon": 3, "multipoint": 4,
         "multilinestring": 5, "multipolygon": 6, "geometrycollection": 7}
_COMPR = 1000000


# ---------------------------------------------------------------------------
# GAIA blob -> ISO WKB
# ---------------------------------------------------------------------------


def _class_dims(cls: int):
    """class code -> (base 1..7, ndims, compressed)."""
    compressed = cls >= _COMPR
    c = cls - _COMPR if compressed else cls
    dim_code, base = divmod(c, 1000)
    if base < 1 or base > 7 or dim_code > 3:
        raise ValueError(f"unsupported spatialite class {cls}")
    ndims = {0: 2, 1: 3, 2: 3, 3: 4}[dim_code]
    return base, ndims, compressed, dim_code


def _iso_type(base: int, dim_code: int) -> int:
    return base + 1000 * dim_code


def _read_seq(buf, off, npts, ndims, compressed):
    """One coordinate run -> ((npts, ndims) float64, next offset).
    Compressed runs keep first/last vertices as doubles and store
    intermediates as float32 deltas (ogrsqlitelayer.cpp:1431-1466)."""
    if not compressed or npts <= 2:
        arr = np.frombuffer(buf, "<f8", count=npts * ndims, offset=off)
        return arr.reshape(npts, ndims).copy(), off + npts * ndims * 8
    out = np.empty((npts, ndims))
    out[0] = np.frombuffer(buf, "<f8", count=ndims, offset=off)
    off += ndims * 8
    mid = np.frombuffer(buf, "<f4", count=(npts - 2) * ndims,
                        offset=off).reshape(npts - 2, ndims)
    off += (npts - 2) * ndims * 4
    # cumulative deltas from the first vertex
    out[1:-1] = out[0] + np.cumsum(mid.astype(np.float64), axis=0)
    out[-1] = np.frombuffer(buf, "<f8", count=ndims, offset=off)
    off += ndims * 8
    return out, off


def _coords_wkb(arr: np.ndarray) -> bytes:
    return arr.astype("<f8").tobytes()


def _gaia_geom_to_wkb(buf, off, cls) -> tuple:
    """One geometry body at `off` with class `cls` -> (wkb, next off)."""
    base, ndims, compressed, dim_code = _class_dims(cls)
    hdr = b"\x01" + struct.pack("<I", _iso_type(base, dim_code))
    if base == 1:  # point (never compressed)
        arr = np.frombuffer(buf, "<f8", count=ndims, offset=off)
        return hdr + _coords_wkb(arr), off + ndims * 8
    if base == 2:  # linestring
        (npts,) = struct.unpack_from("<i", buf, off)
        arr, off = _read_seq(buf, off + 4, npts, ndims, compressed)
        return hdr + struct.pack("<I", npts) + _coords_wkb(arr), off
    if base == 3:  # polygon
        (nrings,) = struct.unpack_from("<i", buf, off)
        off += 4
        body = [struct.pack("<I", nrings)]
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<i", buf, off)
            arr, off = _read_seq(buf, off + 4, npts, ndims, compressed)
            body.append(struct.pack("<I", npts) + _coords_wkb(arr))
        return hdr + b"".join(body), off
    # multi*/collection: n entities, each 0x69 marker + int32 class
    (n,) = struct.unpack_from("<i", buf, off)
    off += 4
    parts = [struct.pack("<I", n)]
    for _ in range(n):
        if buf[off] != 0x69:
            raise ValueError("missing spatialite entity marker 0x69")
        (sub_cls,) = struct.unpack_from("<i", buf, off + 1)
        wkb, off = _gaia_geom_to_wkb(buf, off + 5, sub_cls)
        parts.append(wkb)
    return hdr + b"".join(parts), off


def gaia_to_wkb(blob: Optional[bytes]) -> Optional[bytes]:
    """SpatiaLite GAIA internal blob -> ISO WKB (decompressing the
    float32-delta compressed family)."""
    if blob is None:
        return None
    if len(blob) < 44 or blob[0] != 0x00 or blob[38] != 0x7C \
            or blob[-1] != 0xFE:
        raise ValueError("not a SpatiaLite geometry blob")
    if blob[1] != 0x01:
        raise ValueError("big-endian spatialite blobs not supported")
    (cls,) = struct.unpack_from("<i", blob, 39)
    wkb, _ = _gaia_geom_to_wkb(blob, 43, cls)
    return wkb


def gaia_srid(blob: bytes) -> int:
    return struct.unpack_from("<i", blob, 2)[0]


# ---------------------------------------------------------------------------
# ISO WKB -> GAIA blob (uncompressed, like the reference's default
# ExportSpatiaLiteGeometry without COMPRESS_COLUMNS)
# ---------------------------------------------------------------------------


def _seq_body(arr: np.ndarray) -> bytes:
    return struct.pack("<i", len(arr)) + arr.astype("<f8").tobytes()


def _payload_body(kind: str, payload, dim_code: int) -> bytes:
    base = _BASE[kind]
    if kind == "point":
        return np.asarray(payload)[0].astype("<f8").tobytes()
    if kind == "linestring":
        return _seq_body(np.asarray(payload))
    if kind == "polygon":
        return struct.pack("<i", len(payload)) + b"".join(
            _seq_body(np.asarray(r)) for r in payload)
    if kind == "multipoint":
        pts = np.asarray(payload)
        cls = _iso_type(1, dim_code)
        return struct.pack("<i", len(pts)) + b"".join(
            b"\x69" + struct.pack("<i", cls)
            + p.astype("<f8").tobytes() for p in pts)
    if kind == "multilinestring":
        cls = _iso_type(2, dim_code)
        return struct.pack("<i", len(payload)) + b"".join(
            b"\x69" + struct.pack("<i", cls) + _seq_body(np.asarray(c))
            for c in payload)
    if kind == "multipolygon":
        cls = _iso_type(3, dim_code)
        return struct.pack("<i", len(payload)) + b"".join(
            b"\x69" + struct.pack("<i", cls)
            + _payload_body("polygon", rings, dim_code) for rings in payload)
    if kind == "geometrycollection":
        out = [struct.pack("<i", len(payload))]
        for mk, mp in payload:
            out.append(b"\x69" + struct.pack(
                "<i", _iso_type(_BASE[mk], dim_code)))
            out.append(_payload_body(mk, mp, dim_code))
        return b"".join(out)
    raise ValueError(f"unsupported kind {kind}")


def _payload_xy(kind, payload) -> np.ndarray:
    from ..geom.wkb import _all_coords

    return _all_coords(kind, payload)


def wkb_to_gaia(wkb: Optional[bytes], srid: int = 4326) -> Optional[bytes]:
    """ISO WKB -> uncompressed GAIA blob (header layout per
    ogrsqlitelayer.cpp:3454 ExportSpatiaLiteGeometry)."""
    if wkb is None:
        return None
    from ..geom.wkb import parse_wkb_z

    kind, payload = parse_wkb_z(wkb)
    # probe ndims from the payload
    if kind == "point":
        ndims = np.asarray(payload).shape[1]
    elif kind == "linestring":
        ndims = np.asarray(payload).shape[1]
    elif kind == "polygon":
        ndims = np.asarray(payload[0]).shape[1]
    elif kind == "multipoint":
        ndims = np.asarray(payload).shape[1]
    elif kind == "multilinestring":
        ndims = np.asarray(payload[0]).shape[1]
    elif kind == "multipolygon":
        ndims = np.asarray(payload[0][0]).shape[1]
    else:  # collection: from the first member
        ndims = 2
        if payload:
            return _collection_gaia(kind, payload, srid)
    dim_code = {2: 0, 3: 1, 4: 3}[ndims]
    xy = _payload_xy(kind, payload)[:, :2]
    body = _payload_body(kind, payload, dim_code)
    cls = _iso_type(_BASE[kind], dim_code)
    return (b"\x00\x01" + struct.pack("<i", srid)
            + struct.pack("<4d", xy[:, 0].min(), xy[:, 1].min(),
                          xy[:, 0].max(), xy[:, 1].max())
            + b"\x7c" + struct.pack("<i", cls) + body + b"\xfe")


def _collection_gaia(kind, payload, srid) -> bytes:
    xs = [_payload_xy(mk, mp)[:, :2] for mk, mp in payload]
    xy = np.vstack(xs)
    body = _payload_body(kind, payload, 0)
    return (b"\x00\x01" + struct.pack("<i", srid)
            + struct.pack("<4d", xy[:, 0].min(), xy[:, 1].min(),
                          xy[:, 0].max(), xy[:, 1].max())
            + b"\x7c" + struct.pack("<i", 7) + body + b"\xfe")


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def _layer_info(path: str, layer: Optional[str]):
    """-> (layer, geom_col, lo, hi).  Handles both the legacy 2.x/3.x
    geometry_columns schema (type TEXT, coord_dimension TEXT) and the
    v4 one (geometry_type INTEGER) — the reference sniffs the same way
    (ogrsqlitedatasource.cpp OpenTable)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        have = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type IN ('table','view')")}
        geom_map = {}
        if "geometry_columns" in have:
            for t, g in con.execute(
                    "SELECT f_table_name, f_geometry_column"
                    " FROM geometry_columns"):
                geom_map.setdefault(t, g)
        if layer is None:
            if geom_map:
                layer = sorted(geom_map)[0]
            else:
                sys = {"geometry_columns", "spatial_ref_sys",
                       "spatialite_history", "sqlite_sequence",
                       "views_geometry_columns", "virts_geometry_columns",
                       "geometry_columns_auth", "SpatialIndex"}
                cands = sorted(t for t in have if t not in sys
                               and not t.startswith(("idx_", "sqlite_")))
                if not cands:
                    raise ValueError(f"{path}: no feature tables")
                layer = cands[0]
        geom_col = geom_map.get(layer)
        lo, hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{layer}"').fetchone()
        return layer, geom_col, lo, hi
    finally:
        con.close()


def read_spatialite(paths: Union[str, List[str]],
                    layer: Optional[str] = None,
                    columns: Optional[Sequence[str]] = None,
                    rows_per_task: int = 200_000) -> ray.data.Dataset:
    """SpatiaLite/SQLite file(s)/directory -> Dataset with ISO-WKB
    `geometry` (GAIA blobs transcoded, compressed family included).
    Planning is a cheap driver-side registry peek; scanning fans out
    one task per (file, rowid-range)."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if f.endswith((".sqlite", ".db")))
        else:
            files = [paths]
    else:
        files = list(paths)
    if not files:
        raise ValueError("no .sqlite files found")

    splits = []
    for f in files:
        lyr, geom_col, lo, hi = _layer_info(f, layer)
        if lo is None:
            continue
        start = lo
        while start <= hi:
            end = min(start + rows_per_task - 1, hi)
            splits.append({"path": f, "layer": lyr,
                           "geom_col": geom_col or "",
                           "lo": start, "hi": end})
            start = end + 1
    if not splits:
        raise ValueError("spatialite input is empty")

    want = list(columns) if columns else None

    def scan(batch: pa.Table) -> pa.Table:
        out: List[pa.Table] = []
        for row in batch.to_pylist():
            con = sqlite3.connect(f"file:{row['path']}?mode=ro", uri=True)
            try:
                cur = con.execute(f'SELECT * FROM "{row["layer"]}" LIMIT 0')
                all_cols = [d[0] for d in cur.description]
                # sqlite column names are case-insensitive; the v4
                # registry may carry a different case than the table
                gl = (row["geom_col"] or "").lower()
                geom_col = next((c for c in all_cols if c.lower() == gl),
                                None) if gl else None
                sel = want if want is not None else \
                    [c for c in all_cols if c.lower() not in ("ogc_fid", "fid")]
                names = ", ".join(f'"{c}"' for c in sel)
                cur = con.execute(
                    f'SELECT {names} FROM "{row["layer"]}"'
                    " WHERE rowid BETWEEN ? AND ?", (row["lo"], row["hi"]))
                data = list(zip(*cur.fetchall()))
                cols = {}
                for i, c in enumerate(sel):
                    vals = list(data[i]) if data else []
                    if geom_col is not None and c == geom_col:
                        cols["geometry"] = pa.array(
                            [gaia_to_wkb(v) for v in vals], type=pa.binary())
                    else:
                        cols[c] = pa.array(vals)
                out.append(pa.table(cols))
            finally:
                con.close()
        return pa.concat_tables(out) if out else pa.table({})

    return (ray.data.from_items(splits)
            .map_batches(scan, batch_format="pyarrow", batch_size=1))


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

_ARROW_SQLITE = [
    (pa.types.is_boolean, "INTEGER"),
    (pa.types.is_integer, "INTEGER"),
    (pa.types.is_floating, "FLOAT"),
    (pa.types.is_string, "VARCHAR"),
    (pa.types.is_binary, "BLOB"),
]


def _sqlite_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_SQLITE:
        if pred(t):
            return name
    raise ValueError(f"unsupported arrow type for spatialite: {t}")


def _write_one(path: str, table: pa.Table, layer: str, geometry_col: str,
               geometry_type: str, srid: int) -> int:
    """One complete legacy-schema SpatiaLite file (the reference
    fixture's layout: spatial_ref_sys + geometry_columns TEXT type)."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        os.unlink(tmp)
    con = sqlite3.connect(tmp)
    try:
        con.execute("""CREATE TABLE spatial_ref_sys (
            srid INTEGER NOT NULL PRIMARY KEY, auth_name TEXT NOT NULL,
            auth_srid INTEGER NOT NULL, ref_sys_name TEXT,
            proj4text TEXT NOT NULL, srs_wkt TEXT)""")
        con.execute("INSERT INTO spatial_ref_sys VALUES (?,?,?,?,?,'')",
                    (srid, "epsg", srid, f"EPSG:{srid}", ""))
        con.execute("""CREATE TABLE geometry_columns (
            f_table_name TEXT NOT NULL, f_geometry_column TEXT NOT NULL,
            type TEXT NOT NULL, coord_dimension TEXT NOT NULL,
            srid INTEGER NOT NULL, spatial_index_enabled INTEGER NOT NULL)""")
        attr_cols = [c for c in table.column_names if c != geometry_col]
        defs = ", ".join(
            f'"{c}" {_sqlite_type(table.schema.field(c).type)}'
            for c in attr_cols)
        has_geom = geometry_col in table.column_names
        geom_def = f', "GEOMETRY" {geometry_type}' if has_geom else ""
        con.execute(f'CREATE TABLE "{layer}" '
                    f"(OGC_FID INTEGER PRIMARY KEY AUTOINCREMENT"
                    f"{', ' if defs else ''}{defs}{geom_def})")
        if has_geom:
            con.execute("INSERT INTO geometry_columns VALUES (?,?,?,?,?,0)",
                        (layer, "GEOMETRY", geometry_type, "XY", srid))
        cols = attr_cols + ([geometry_col] if has_geom else [])
        names = ", ".join('"GEOMETRY"' if c == geometry_col else f'"{c}"'
                          for c in cols)
        marks = ", ".join("?" for _ in cols)
        data = [table[c].to_pylist() for c in attr_cols]
        if has_geom:
            data.append([wkb_to_gaia(g, srid)
                         for g in table[geometry_col].to_pylist()])
        con.executemany(f'INSERT INTO "{layer}" ({names}) VALUES ({marks})',
                        list(zip(*data)) if cols else [])
        con.commit()
    finally:
        con.close()
    os.replace(tmp, path)
    return table.num_rows


def write_spatialite(ds: ray.data.Dataset, out_dir: str,
                     layer: str = "layer", geometry_col: str = "geometry",
                     geometry_type: str = "GEOMETRY",
                     srid: int = 4326) -> None:
    """Dataset -> directory of SpatiaLite .sqlite shard files (one
    valid database per block, atomic tmp+rename — resumable layout,
    one writer lock per file so the partitioned directory IS the
    scalable form)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        import hashlib

        key = hashlib.md5(
            repr((batch[batch.column_names[0]].to_pylist()[0],
                  batch.num_rows)).encode()).hexdigest()[:12]
        path = os.path.join(out_dir, f"part-{key}-{batch.num_rows}.sqlite")
        n = _write_one(path, batch, layer, geometry_col,
                       geometry_type, srid)
        return pa.table({"path": pa.array([path]),
                         "n_rows": pa.array([n], pa.int64())})

    ds.map_batches(write_block, batch_format="pyarrow").materialize()


def merge_spatialite_dir(shard_dir: str, out_path: str,
                         layer: str = "layer") -> int:
    """Fold a shard directory into ONE .sqlite (driver-side, single
    sqlite writer). Returns total rows."""
    files = sorted(os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
                   if f.endswith(".sqlite"))
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
            cols = [d[0] for d in cur.description if d[0] != "OGC_FID"]
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
