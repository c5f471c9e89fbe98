"""ESRI Shapefile vector driver (pure struct codec, no deps).

The reference's historical default vector format
(ogr/ogrsf_frmts/shape; ESRI Shapefile Technical Description 1998).
A layer is a .shp (geometry records), .shx (record index) and .dbf
(dBASE III attributes) triple.

Ray-Data shape:
* read — one task per (triple, record-range): the driver reads the tiny
  .shx driver-side to plan byte-exact splits, so one big shapefile
  parallelizes across tasks (each seeks straight to its slice of .shp
  and the fixed-width .dbf).
* write — partitioned sink: one complete triple per block, atomic
  tmp+rename, same resumable layout as the GPKG/GeoTIFF sinks.

Geometry mapping (shape type <-> WKB):
  1 Point <-> POINT, 8 MultiPoint <-> MULTIPOINT,
  3 PolyLine <-> LINESTRING / MULTILINESTRING (parts),
  5 Polygon <-> POLYGON / MULTIPOLYGON — outer rings CW, holes CCW per
  the spec; on read, holes attach to the shell whose outer ring
  contains their first vertex (OGRShapeLayer organizePolygons analog).
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import wkb as wkb_mod

_SHP_NULL, _SHP_POINT, _SHP_POLYLINE, _SHP_POLYGON, _SHP_MULTIPOINT = 0, 1, 3, 5, 8


# ---------------------------------------------------------------------------
# geometry codec
# ---------------------------------------------------------------------------


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    cross = (y > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = x + (py - y) * (x1 - x) / (y1 - y)
    return bool(np.count_nonzero(cross & (px < xin)) % 2)


def _parts_to_bytes(shape_type: int, parts: List[np.ndarray]) -> bytes:
    allpts = np.vstack(parts)
    bbox = (allpts[:, 0].min(), allpts[:, 1].min(),
            allpts[:, 0].max(), allpts[:, 1].max())
    offsets = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype(np.int32)
    out = struct.pack("<i4d", shape_type, *bbox)
    out += struct.pack("<2i", len(parts), len(allpts))
    out += offsets.astype("<i4").tobytes()
    out += allpts.astype("<f8").tobytes()
    return out


def wkb_to_shp_record(wkb: Optional[bytes]):
    """WKB -> (shape_type, record content bytes after the record header)."""
    if wkb is None:
        return _SHP_NULL, struct.pack("<i", _SHP_NULL)
    kind, payload = wkb_mod.parse_wkb(wkb)
    if kind == "point":
        x, y = float(payload[0, 0]), float(payload[0, 1])
        return _SHP_POINT, struct.pack("<i2d", _SHP_POINT, x, y)
    if kind == "multipoint":
        pts = np.asarray(payload, dtype=np.float64)
        bbox = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        out = struct.pack("<i4d", _SHP_MULTIPOINT, *bbox)
        out += struct.pack("<i", len(pts)) + pts.astype("<f8").tobytes()
        return _SHP_MULTIPOINT, out
    if kind == "linestring":
        return _SHP_POLYLINE, _parts_to_bytes(
            _SHP_POLYLINE, [np.asarray(payload, dtype=np.float64)])
    if kind == "multilinestring":
        return _SHP_POLYLINE, _parts_to_bytes(
            _SHP_POLYLINE, [np.asarray(p, dtype=np.float64) for p in payload])
    if kind in ("polygon", "multipolygon"):
        polys = [payload] if kind == "polygon" else payload
        rings = []
        for poly in polys:
            for i, ring in enumerate(poly):
                r = np.asarray(ring, dtype=np.float64)
                area = _ring_signed_area(r)
                # spec: outer CW (negative shoelace), holes CCW
                if (i == 0 and area > 0) or (i > 0 and area < 0):
                    r = r[::-1]
                rings.append(r)
        return _SHP_POLYGON, _parts_to_bytes(_SHP_POLYGON, rings)
    raise ValueError(f"unsupported geometry for shapefile: {kind}")


def _read_parts(buf: bytes, off: int):
    nparts, npts = struct.unpack_from("<2i", buf, off)
    off += 8
    offsets = np.frombuffer(buf, "<i4", nparts, off).astype(np.int64)
    off += 4 * nparts
    pts = np.frombuffer(buf, "<f8", npts * 2, off).reshape(npts, 2)
    bounds = np.append(offsets, npts)
    return [pts[bounds[i]:bounds[i + 1]].copy() for i in range(nparts)]


def shp_record_to_wkb(content: bytes) -> Optional[bytes]:
    """Shapefile record content -> WKB (None for null shapes)."""
    (stype,) = struct.unpack_from("<i", content, 0)
    if stype == _SHP_NULL:
        return None
    if stype == _SHP_POINT:
        x, y = struct.unpack_from("<2d", content, 4)
        return wkb_mod.points_to_wkb(np.array([x]), np.array([y]))[0]
    if stype == _SHP_MULTIPOINT:
        (npts,) = struct.unpack_from("<i", content, 36)
        pts = np.frombuffer(content, "<f8", npts * 2, 40).reshape(npts, 2)
        return wkb_mod.multipoint_to_wkb(pts)
    if stype == _SHP_POLYLINE:
        parts = _read_parts(content, 36)
        if len(parts) == 1:
            return wkb_mod.linestring_to_wkb(parts[0])
        return wkb_mod.multilinestring_to_wkb(parts)
    if stype == _SHP_POLYGON:
        rings = _read_parts(content, 36)
        shells, holes = [], []
        for r in rings:
            (shells if _ring_signed_area(r) < 0 else holes).append(r)
        if not shells:            # degenerate: treat all as shells
            shells, holes = holes, []
        polys = [[s[::-1].copy()] for s in shells]   # WKB outer ring CCW
        for h in holes:
            px, py = float(h[0, 0]), float(h[0, 1])
            target = 0
            for i, s in enumerate(shells):
                if _point_in_ring(px, py, s):
                    target = i
                    break
            polys[target].append(h[::-1].copy())     # WKB holes CW
        if len(polys) == 1:
            return wkb_mod.polygon_to_wkb(polys[0])
        return wkb_mod.multipolygon_to_wkb(polys)
    raise ValueError(f"unsupported shape type {stype}")


# ---------------------------------------------------------------------------
# DBF codec
# ---------------------------------------------------------------------------


def _dbf_fields_for(table: pa.Table, attr_cols: List[str]):
    fields = []
    for c in attr_cols:
        t = table.schema.field(c).type
        if pa.types.is_boolean(t):
            fields.append((c, "L", 1, 0))
        elif pa.types.is_integer(t):
            fields.append((c, "N", 18, 0))
        elif pa.types.is_floating(t):
            fields.append((c, "N", 24, 10))
        elif pa.types.is_string(t):
            vals = [v for v in table[c].to_pylist() if v is not None]
            width = min(max((len(v.encode()) for v in vals), default=1), 254)
            fields.append((c, "C", max(width, 1), 0))
        else:
            raise ValueError(f"unsupported dbf type for column {c}: {t}")
    return fields


def _dbf_write(path: str, table: pa.Table, attr_cols: List[str]) -> None:
    fields = _dbf_fields_for(table, attr_cols)
    n = table.num_rows
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(f[2] for f in fields)
    with open(path, "wb") as f:
        f.write(struct.pack("<B3BI2H20x", 0x03, 126, 1, 1, n, hdr_size, rec_size))
        for name, typ, width, dec in fields:
            f.write(struct.pack("<11sc4xBB14x", name.encode()[:11],
                                typ.encode(), width, dec))
        f.write(b"\x0d")
        cols = [table[c].to_pylist() for c in attr_cols]
        for i in range(n):
            row = b" "
            for (name, typ, width, dec), col in zip(fields, cols):
                v = col[i]
                if typ == "C":
                    s = ("" if v is None else str(v)).encode()[:width]
                    row += s.ljust(width)
                elif typ == "L":
                    row += b"?" if v is None else (b"T" if v else b"F")
                else:
                    if v is None:
                        s = b""
                    elif dec == 0:
                        s = str(int(v)).encode()
                    else:
                        s = (f"%.{dec}f" % float(v)).encode()
                    row += s[:width].rjust(width)
            f.write(row)
        f.write(b"\x1a")


def _dbf_read_header(buf: bytes):
    n, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode()
        typ = chr(buf[off + 11])
        width, dec = buf[off + 16], buf[off + 17]
        fields.append((name, typ, width, dec))
        off += 32
    return n, hdr_size, rec_size, fields


def _dbf_parse_records(buf: bytes, fields, rec_size: int, start: int, count: int):
    cols = {name: [] for name, *_ in fields}
    for r in range(count):
        off = start + r * rec_size + 1      # skip deletion flag
        for name, typ, width, dec in fields:
            raw = buf[off:off + width]
            off += width
            if typ == "C":
                cols[name].append(raw.rstrip().decode() or None)
            elif typ == "L":
                cols[name].append(None if raw in (b"?", b" ")
                                  else raw in (b"T", b"t", b"Y", b"y"))
            else:
                s = raw.strip()
                if not s:
                    cols[name].append(None)
                elif dec == 0:
                    cols[name].append(int(s))
                else:
                    cols[name].append(float(s))
    return cols


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------


def _shp_header(shape_type: int, bbox, file_words: int) -> bytes:
    return (struct.pack(">i20xi", 9994, file_words)
            + struct.pack("<2i", 1000, shape_type)
            + struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3], 0, 0, 0, 0))


def _write_one_shapefile(base: str, table: pa.Table, geometry_col: str) -> int:
    recs, stypes = [], set()
    for g in table[geometry_col].to_pylist():
        st, content = wkb_to_shp_record(g)
        recs.append(content)
        if st != _SHP_NULL:
            stypes.add(st)
    if len(stypes) > 1:
        raise ValueError(f"mixed shape types in one layer: {sorted(stypes)}")
    stype = stypes.pop() if stypes else _SHP_NULL
    boxes = wkb_mod.wkb_bbox(np.asarray(
        [g for g in table[geometry_col].to_pylist() if g is not None],
        dtype=object))
    bbox = ((float(np.min(boxes[:, 0])), float(np.min(boxes[:, 1])),
             float(np.max(boxes[:, 2])), float(np.max(boxes[:, 3])))
            if len(boxes) else (0.0, 0.0, 0.0, 0.0))

    shp_words = 50
    shx_body = b""
    shp_body = b""
    for i, content in enumerate(recs):
        words = len(content) // 2
        shx_body += struct.pack(">2i", shp_words, words)
        shp_body += struct.pack(">2i", i + 1, words) + content
        shp_words += 4 + words

    for ext, data in (("shp", _shp_header(stype, bbox, shp_words) + shp_body),
                      ("shx", _shp_header(stype, bbox, 50 + 4 * len(recs))
                       + shx_body)):
        with open(f"{base}.{ext}.tmp", "wb") as f:
            f.write(data)
    attr_cols = [c for c in table.column_names if c != geometry_col]
    _dbf_write(f"{base}.dbf.tmp", table, attr_cols)
    for ext in ("shp", "shx", "dbf"):
        os.replace(f"{base}.{ext}.tmp", f"{base}.{ext}")
    return table.num_rows


def write_shapefile(ds: ray.data.Dataset, out_dir: str,
                    geometry_col: str = "geometry") -> None:
    """Dataset -> directory of shapefile triples (one .shp/.shx/.dbf per
    block, atomic rename per file — resumable layout)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        import hashlib

        key = hashlib.md5(
            repr((batch[batch.column_names[0]].to_pylist()[0],
                  batch.num_rows)).encode()).hexdigest()[:12]
        base = os.path.join(out_dir, f"part-{key}-{batch.num_rows}")
        n = _write_one_shapefile(base, batch, geometry_col)
        return pa.table({"path": pa.array([base + ".shp"]),
                         "n_rows": pa.array([n], pa.int64())})

    ds.map_batches(write_block, batch_format="pyarrow").materialize()


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def read_shapefile(paths: Union[str, List[str]],
                   columns: Optional[Sequence[str]] = None,
                   rows_per_task: int = 200_000) -> ray.data.Dataset:
    """Shapefile(s)/directory -> Dataset with WKB `geometry` + dbf
    attribute columns. The driver plans (file, record-range) splits from
    the tiny .shx index, so one big shapefile fans out across tasks."""
    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(os.path.join(paths, f) for f in os.listdir(paths)
                           if f.endswith(".shp"))
        else:
            files = [paths]
    else:
        files = list(paths)
    if not files:
        raise ValueError("no .shp files found")

    splits = []
    for f in files:
        with open(f[:-4] + ".shx", "rb") as fh:
            shx = fh.read()
        n_recs = (len(shx) - 100) // 8
        for start in range(0, max(n_recs, 1), rows_per_task):
            if start >= n_recs:
                break
            count = min(rows_per_task, n_recs - start)
            (off_words,) = struct.unpack_from(">i", shx, 100 + 8 * start)
            splits.append({"path": f, "start": start, "count": count,
                           "shp_off": off_words * 2})
    if not splits:
        raise ValueError("shapefile input is empty")

    want = list(columns) if columns else None

    def scan(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            with open(row["path"], "rb") as fh:
                fh.seek(row["shp_off"])
                shp = fh.read()
            geoms, off = [], 0
            for _ in range(row["count"]):
                _rec, words = struct.unpack_from(">2i", shp, off)
                geoms.append(shp_record_to_wkb(shp[off + 8:off + 8 + 2 * words]))
                off += 8 + 2 * words
            with open(row["path"][:-4] + ".dbf", "rb") as fh:
                dbf = fh.read()
            n, hdr_size, rec_size, fields = _dbf_read_header(dbf)
            cols = _dbf_parse_records(
                dbf, fields, rec_size, hdr_size + rec_size * row["start"],
                row["count"])
            t = {}
            for name, vals in cols.items():
                if want is None or name in want:
                    t[name] = pa.array(vals)
            if want is None or "geometry" in want:
                t["geometry"] = pa.array(geoms, type=pa.binary())
            out.append(pa.table(t))
        return pa.concat_tables(out) if out else pa.table({})

    return (ray.data.from_items(splits)
            .map_batches(scan, batch_format="pyarrow", batch_size=1))


def read_dbf_table(path: str) -> pa.Table:
    """Bare .dbf (no .shp) -> attribute-only Arrow table — the OGR
    shapefile driver's geometry-less dBASE layer (what VRT
    PointFromColumns datasources feed on)."""
    with open(path, "rb") as f:
        buf = f.read()
    n, hdr_size, rec_size, fields = _dbf_read_header(buf)
    cols = _dbf_parse_records(buf, fields, rec_size, hdr_size, n)
    out = {}
    for name, typ, width, dec in fields:
        vals = cols[name]
        if typ == "C":
            out[name] = pa.array(vals, pa.string())
        elif typ == "L":
            out[name] = pa.array(vals, pa.bool_())
        elif typ in ("N", "F") and dec == 0:
            out[name] = pa.array(vals, pa.int64())
        else:
            out[name] = pa.array(
                [None if v is None else float(v) for v in vals],
                pa.float64())
    return pa.table(out)
