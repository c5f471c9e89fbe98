"""ESRI FileGeodatabase (OpenFileGDB) vector driver — read + minimal
write.

Reference parity: `ogr/ogrsf_frmts/openfilegdb/filegdbtable.cpp`
(Even Rouault's reverse-engineered reader) — layout re-derived:

  * .gdbtable V3: 40-byte header (u32 version=3, i32 valid-record
    count @4, u32 max-row-blob @8, u64 field-desc offset @32), field
    descriptor section (UTF-16 names, per-type flag/default layout,
    geometry field with WKT SRS + origin/scale/tolerance block +
    spatial-index grid resolutions), rows = u32 blob length + null
    bitmap (one bit per NULLABLE field, LSB-first) + values in field
    order (OBJECTID occupies no bytes).
  * .gdbtablx V3: u32 version, u32 1024-blocks, i32 total records,
    u32 offset width (4-6 B), packed row offsets, 16-byte trailer
    with an optional sparse-block bitmap.
  * geometry blobs: varuint shape type with EXT flags (Z 0x80000000,
    M 0x40000000, curves 0x20000000); points as offset-scaled
    varuints (value-1)/scale+origin with 0 = NaN; line/polygon parts
    as FileGDB signed varints (6-bit first byte, 0x40 sign) deltas
    over the scaled grid; rings organized into polygons by
    containment.

Ray shape: headers and the (narrow) .gdbtablx offset table parse
driver-side; row ranges fan out over `from_items -> map_batches`
tasks that each seek only their own row blobs — a billion-row table
splits into offset-sorted ranges with no driver-side row data.  The
hot coordinate decode (delta varints) is a vectorized numpy kernel
shared with the OSM driver's approach.

Write side: a minimal V3 point-table writer (header/field-desc/rows/
tablx exactly as the reader expects, mirroring
filegdbtable_write.cpp's header layout) — enough for SQL-exact
round-trips; curves, rasters and indexes are out of scope
(documented).
"""

from __future__ import annotations

import math
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..geom import wkb as wkbm

FGFT_INT16, FGFT_INT32, FGFT_FLOAT32, FGFT_FLOAT64 = 0, 1, 2, 3
FGFT_STRING, FGFT_DATETIME, FGFT_OBJECTID, FGFT_GEOMETRY = 4, 5, 6, 7
FGFT_BINARY, FGFT_RASTER, FGFT_GUID, FGFT_GLOBALID = 8, 9, 10, 11
FGFT_XML, FGFT_INT64, FGFT_DATE, FGFT_TIME = 12, 13, 14, 15
FGFT_DATETIME_WITH_OFFSET = 16

EXT_Z, EXT_M, EXT_CURVE = 0x80000000, 0x40000000, 0x20000000

_ARROW = {FGFT_INT16: pa.int16(), FGFT_INT32: pa.int32(),
          FGFT_FLOAT32: pa.float32(), FGFT_FLOAT64: pa.float64(),
          FGFT_STRING: pa.string(), FGFT_DATETIME: pa.timestamp("us"),
          FGFT_OBJECTID: pa.int64(), FGFT_GEOMETRY: pa.binary(),
          FGFT_BINARY: pa.binary(), FGFT_GUID: pa.string(),
          FGFT_GLOBALID: pa.string(), FGFT_XML: pa.string(),
          FGFT_INT64: pa.int64(), FGFT_DATE: pa.timestamp("us"),
          FGFT_TIME: pa.string(),
          FGFT_DATETIME_WITH_OFFSET: pa.timestamp("us")}

_EPOCH_DAYS = 25569  # 1899-12-30 -> 1970-01-01 in days


# ------------------------------------------------------------------
# varint helpers

def read_varuint(buf: bytes, pos: int) -> Tuple[int, int]:
    v, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, pos
        shift += 7


def decode_fgdb_svarints(buf, pos: int, count: int
                         ) -> Tuple[np.ndarray, int]:
    """`count` FileGDB signed varints (6-bit first byte, 0x40 sign
    bit) starting at pos — vectorized: boundary scan, per-byte shift
    scatter, reduceat, sign from each group's first byte."""
    a = np.frombuffer(buf, np.uint8, count=len(buf) - pos, offset=pos)
    ends = (a & 0x80) == 0
    end_idx = np.flatnonzero(ends)
    last = end_idx[count - 1]
    a = a[:last + 1]
    ends = ends[:last + 1]
    starts = np.empty(a.size, bool)
    starts[0] = True
    starts[1:] = ends[:-1]
    start_idx = np.flatnonzero(starts)
    gid = np.cumsum(starts) - 1
    off = np.arange(a.size, dtype=np.int64) - start_idx[gid]
    shift = np.where(off == 0, 0, 6 + 7 * (off - 1)).astype(np.uint64)
    mask = np.where(off == 0, np.uint64(0x3F), np.uint64(0x7F))
    contrib = (a.astype(np.uint64) & mask) << shift
    mag = np.add.reduceat(contrib, start_idx)
    neg = (a[start_idx] & 0x40) != 0
    vals = np.where(neg, -(mag.astype(np.int64)), mag.astype(np.int64))
    return vals, pos + last + 1


# ------------------------------------------------------------------
# .gdbtablx

def read_tablx(path: str):
    """-> (offsets ndarray indexed by corrected row, total_records,
    block_presence bool array or None)."""
    with open(path, "rb") as f:
        hdr = f.read(16)
        version, n1024, total, osize = struct.unpack("<IIiI", hdr)
        if osize < 4 or osize > 6:
            raise ValueError(f"gdbtablx offset size {osize}")
        raw = f.read(osize * 1024 * n1024)
        trailer = f.read(16)
        presence = None
        if len(trailer) == 16:
            nbmw, nbits, n1024bis, _lead = struct.unpack("<IIII", trailer)
            if nbmw != 0:
                bm = np.frombuffer(f.read((nbits + 7) // 8), np.uint8)
                presence = ((bm[np.arange(nbits) // 8]
                             >> (np.arange(nbits) % 8)) & 1).astype(bool)
    a = np.frombuffer(raw, np.uint8).reshape(-1, osize)
    pad = np.zeros((a.shape[0], 8 - osize), np.uint8)
    offsets = np.ascontiguousarray(
        np.concatenate([a, pad], axis=1)).view("<u8").ravel()
    return offsets, total, presence


def row_offsets(table_path: str) -> np.ndarray:
    """Per-row byte offsets in the .gdbtable (0 = absent/deleted),
    indexed by 0-based row id."""
    tablx = os.path.splitext(table_path)[0] + ".gdbtablx"
    offsets, total, presence = read_tablx(tablx)
    if presence is None:
        return offsets[:total]
    out = np.zeros(total, np.uint64)
    corrected = 0
    for blk in range(len(presence)):
        if not presence[blk]:
            continue
        lo = blk * 1024
        n = min(1024, total - lo)
        if n <= 0:
            break
        out[lo:lo + n] = offsets[corrected * 1024:corrected * 1024 + n]
        corrected += 1
    return out


# ------------------------------------------------------------------
# .gdbtable header + field descriptors

def _utf16(buf: bytes, pos: int, nchars: int) -> Tuple[str, int]:
    s = buf[pos:pos + 2 * nchars].decode("utf-16-le", "replace")
    return s, pos + 2 * nchars


class Field:
    def __init__(self, name, ftype, nullable):
        self.name = name
        self.type = ftype
        self.nullable = nullable
        # geometry extras
        self.xorigin = self.yorigin = 0.0
        self.xyscale = 1.0
        self.zorigin = self.morigin = 0.0
        self.zscale = self.mscale = 1.0
        self.has_z = self.has_m = False
        self.wkt = ""


def parse_table_header(path: str) -> dict:
    with open(path, "rb") as f:
        hdr = f.read(40)
        version = struct.unpack("<i", hdr[:4])[0]
        if version != 3:
            raise ValueError(f"gdbtable version {version} unsupported")
        n_valid = struct.unpack("<i", hdr[4:8])[0]
        off_fields = struct.unpack("<Q", hdr[32:40])[0]
        f.seek(off_fields)
        sec = f.read(14)
        length = struct.unpack("<I", sec[:4])[0]
        geom_type = sec[8]
        utf8 = (sec[9] & 1) != 0
        geom_flags = sec[11]
        has_m = (geom_flags & (1 << 6)) != 0
        has_z = (geom_flags & (1 << 7)) != 0
        nfields = struct.unpack("<H", sec[12:14])[0]
        buf = f.read(length - 10)
    fields: List[Field] = []
    pos = 0
    for _ in range(nfields):
        ncar = buf[pos]
        pos += 1
        name, pos = _utf16(buf, pos, ncar)
        ncar = buf[pos]
        pos += 1
        _alias, pos = _utf16(buf, pos, ncar)
        ftype = buf[pos]
        pos += 1
        if ftype not in (FGFT_GEOMETRY, FGFT_RASTER):
            if ftype == FGFT_STRING:
                _w = struct.unpack_from("<i", buf, pos)[0]
                flags = buf[pos + 4]
                pos += 5
                dlen, pos = read_varuint(buf, pos)
            elif ftype in (FGFT_OBJECTID, FGFT_BINARY, FGFT_GUID,
                           FGFT_GLOBALID, FGFT_XML):
                flags = buf[pos + 1]
                pos += 2
                dlen = 0
            else:
                flags = buf[pos + 1]
                dlen = buf[pos + 2]
                pos += 3
            if flags & 4:               # editable: default value bytes
                pos += dlen
            fields.append(Field(name, ftype, (flags & 1) != 0))
        elif ftype == FGFT_GEOMETRY:
            flags = buf[pos + 1]
            pos += 2
            nwkt = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            wkt, pos = _utf16(buf, pos, nwkt // 2)
            gf = Field(name, ftype, (flags & 1) != 0)
            gf.wkt = wkt
            gflags = buf[pos]
            pos += 1
            has_m_ost = (gflags & 2) != 0
            has_z_ost = (gflags & 4) != 0
            gf.xorigin, gf.yorigin, gf.xyscale = struct.unpack_from(
                "<ddd", buf, pos)
            pos += 24
            if has_m_ost:
                gf.morigin, gf.mscale = struct.unpack_from("<dd", buf, pos)
                pos += 16
            if has_z_ost:
                gf.zorigin, gf.zscale = struct.unpack_from("<dd", buf, pos)
                pos += 16
            pos += 8                    # xy tolerance
            if has_m_ost:
                pos += 8
            if has_z_ost:
                pos += 8
            # bbox + optional z/m range + spatial index grids
            pos += 4 * 8
            if has_z:
                pos += 2 * 8
            if has_m:
                pos += 2 * 8
            pos += 1
            ngrid = struct.unpack_from("<I", buf, pos)[0]
            pos += 4 + 8 * ngrid
            gf.has_z, gf.has_m = has_z, has_m
            fields.append(gf)
        else:
            raise ValueError("FileGDB raster fields unsupported")
    return {"n_valid": n_valid, "fields": fields, "utf8": utf8,
            "geom_type": geom_type, "has_z": has_z, "has_m": has_m}


# ------------------------------------------------------------------
# geometry blob -> WKB

def _scaled(v: np.ndarray, scale: float, origin: float) -> np.ndarray:
    return v / scale + origin


def decode_shape(blob: bytes, gf: Field) -> Optional[bytes]:
    pos = 0
    gtype, pos = read_varuint(blob, pos)
    base = gtype & 0xFF
    has_z = bool(gtype & EXT_Z) or base in (9, 11, 10, 13, 19, 15, 20, 18)
    has_m = bool(gtype & EXT_M) or base in (21, 11, 23, 13, 25, 15, 28, 18)
    has_curves = bool(gtype & EXT_CURVE)
    if base == 0:
        return None
    if base in (1, 21, 11, 9, 52):              # point family
        x, pos = read_varuint(blob, pos)
        y, pos = read_varuint(blob, pos)
        dfx = math.nan if x == 0 else (x - 1) / gf.xyscale + gf.xorigin
        dfy = math.nan if y == 0 else (y - 1) / gf.xyscale + gf.yorigin
        if has_z:
            z, pos = read_varuint(blob, pos)
            dfz = math.nan if z == 0 else (z - 1) / gf.zscale + gf.zorigin
            return wkbm.point_z_to_wkb(dfx, dfy, dfz)
        return wkbm.points_to_wkb(np.array([dfx]), np.array([dfy]))[0]
    if base in (8, 28, 18, 20, 53):             # multipoint
        npts, pos = read_varuint(blob, pos)
        if npts == 0:
            return wkbm.multipoint_to_wkb(np.zeros((0, 2)))
        for _ in range(4):
            _v, pos = read_varuint(blob, pos)   # bbox
        dx, pos = decode_fgdb_svarints(blob, pos, 2 * npts)
        xy = dx.reshape(-1, 2).cumsum(axis=0)
        pts = np.stack([_scaled(xy[:, 0], gf.xyscale, gf.xorigin),
                        _scaled(xy[:, 1], gf.xyscale, gf.yorigin)], axis=1)
        return wkbm.multipoint_to_wkb(pts)
    if base in (3, 23, 13, 10, 50, 5, 25, 15, 19, 51):  # line/polygon
        is_poly = base in (5, 25, 15, 19, 51)
        npts, pos = read_varuint(blob, pos)
        if npts == 0:
            return (wkbm.multipolygon_to_wkb([]) if is_poly
                    else wkbm.multilinestring_to_wkb([]))
        nparts, pos = read_varuint(blob, pos)
        if has_curves:
            ncurves, pos = read_varuint(blob, pos)
            if ncurves:
                raise ValueError("FileGDB curve segments unsupported")
        for _ in range(4):
            _v, pos = read_varuint(blob, pos)   # bbox
        counts = []
        for _ in range(max(0, nparts - 1)):
            c, pos = read_varuint(blob, pos)
            counts.append(c)
        counts.append(npts - sum(counts))
        dxy, pos = decode_fgdb_svarints(blob, pos, 2 * npts)
        xy = dxy.reshape(-1, 2).cumsum(axis=0)
        coords = np.stack(
            [_scaled(xy[:, 0], gf.xyscale, gf.xorigin),
             _scaled(xy[:, 1], gf.xyscale, gf.yorigin)], axis=1)
        zs = None
        if has_z:
            dz, pos = decode_fgdb_svarints(blob, pos, npts)
            zs = _scaled(dz.cumsum(), gf.zscale, gf.zorigin)
        parts = []
        at = 0
        for c in counts:
            seg = coords[at:at + c]
            if zs is not None:
                seg = np.concatenate([seg, zs[at:at + c, None]], axis=1)
            parts.append(seg)
            at += c
        if not is_poly:
            if zs is not None:
                return _mls_z(parts)
            return wkbm.multilinestring_to_wkb(parts)
        return _rings_to_multipolygon(parts, zs is not None)
    raise ValueError(f"FileGDB shape type {base} unsupported")


def _mls_z(parts) -> bytes:
    body = struct.pack("<BII", 1, 0x80000005, len(parts))
    for seg in parts:
        body += (struct.pack("<BII", 1, 0x80000002, len(seg))
                 + np.ascontiguousarray(seg, "<f8").tobytes())
    return body


def _rings_to_multipolygon(rings, is3d: bool) -> bytes:
    """organizePolygons-lite: a ring inside the current outer is a
    hole, else it opens a new polygon."""
    from ..geom import pip

    polys: List[List[np.ndarray]] = []
    for ring in rings:
        placed = False
        for poly in polys:
            if pip.points_in_ring(ring[:1, 0], ring[:1, 1],
                                  np.asarray(poly[0])[:, :2])[0]:
                poly.append(ring)
                placed = True
                break
        if not placed:
            polys.append([ring])
    if not is3d:
        return wkbm.multipolygon_to_wkb([[r[:, :2] for r in poly]
                                         for poly in polys])
    body = struct.pack("<BII", 1, 0x80000006, len(polys))
    for poly in polys:
        body += struct.pack("<BII", 1, 0x80000003, len(poly))
        for r in poly:
            body += struct.pack("<I", len(r))
            body += np.ascontiguousarray(r, "<f8").tobytes()
    return body


# ------------------------------------------------------------------
# row decode

def _guid_str(b: bytes) -> str:
    d1 = struct.unpack("<I", b[:4])[0]
    d2 = struct.unpack("<H", b[4:6])[0]
    d3 = struct.unpack("<H", b[6:8])[0]
    return ("{%08X-%04X-%04X-%s-%s}"
            % (d1, d2, d3, b[8:10].hex().upper(), b[10:16].hex().upper()))


def decode_rows(table_path: str, meta: dict, rows: np.ndarray,
                offsets: np.ndarray, want_geom_wkb: bool = True
                ) -> Dict[str, list]:
    """Row ids + their table offsets -> column lists."""
    fields = meta["fields"]
    nullable = [f for f in fields if f.nullable]
    nbytes_null = (len(nullable) + 7) // 8
    cols: Dict[str, list] = {f.name: [] for f in fields}
    cols["__fid"] = []
    with open(table_path, "rb") as f:
        for rid, off in zip(rows, offsets):
            if off == 0:
                continue
            f.seek(off)
            (bloblen,) = struct.unpack("<I", f.read(4))
            if bloblen >= 0x80000000:
                continue                        # deleted
            blob = f.read(bloblen)
            nulls = blob[:nbytes_null]
            pos = nbytes_null
            inull = 0
            cols["__fid"].append(int(rid) + 1)
            for fd in fields:
                if fd.nullable:
                    is_null = (nulls[inull >> 3] >> (inull & 7)) & 1
                    inull += 1
                    if is_null:
                        cols[fd.name].append(None)
                        continue
                t = fd.type
                if t == FGFT_OBJECTID:
                    cols[fd.name].append(int(rid) + 1)
                elif t == FGFT_INT16:
                    cols[fd.name].append(
                        struct.unpack_from("<h", blob, pos)[0])
                    pos += 2
                elif t == FGFT_INT32:
                    cols[fd.name].append(
                        struct.unpack_from("<i", blob, pos)[0])
                    pos += 4
                elif t == FGFT_INT64:
                    cols[fd.name].append(
                        struct.unpack_from("<q", blob, pos)[0])
                    pos += 8
                elif t == FGFT_FLOAT32:
                    cols[fd.name].append(
                        struct.unpack_from("<f", blob, pos)[0])
                    pos += 4
                elif t == FGFT_FLOAT64:
                    cols[fd.name].append(
                        struct.unpack_from("<d", blob, pos)[0])
                    pos += 8
                elif t in (FGFT_DATETIME, FGFT_DATE):
                    days = struct.unpack_from("<d", blob, pos)[0]
                    pos += 8
                    us = int(round((days - _EPOCH_DAYS) * 86400)) * 1_000_000
                    cols[fd.name].append(us)
                elif t == FGFT_DATETIME_WITH_OFFSET:
                    days = struct.unpack_from("<d", blob, pos)[0]
                    pos += 10
                    us = int(round((days - _EPOCH_DAYS) * 86400)) * 1_000_000
                    cols[fd.name].append(us)
                elif t == FGFT_TIME:
                    frac = struct.unpack_from("<d", blob, pos)[0]
                    pos += 8
                    secs = int(round(frac * 86400))
                    cols[fd.name].append(
                        "%02d:%02d:%02d" % (secs // 3600,
                                            (secs // 60) % 60, secs % 60))
                elif t in (FGFT_STRING, FGFT_XML):
                    n, pos = read_varuint(blob, pos)
                    raw = blob[pos:pos + n]
                    pos += n
                    cols[fd.name].append(
                        raw.decode("utf-8", "replace") if meta["utf8"]
                        else raw.decode("utf-16-le", "replace"))
                elif t == FGFT_BINARY:
                    n, pos = read_varuint(blob, pos)
                    cols[fd.name].append(blob[pos:pos + n])
                    pos += n
                elif t in (FGFT_GUID, FGFT_GLOBALID):
                    cols[fd.name].append(_guid_str(blob[pos:pos + 16]))
                    pos += 16
                elif t == FGFT_GEOMETRY:
                    n, pos = read_varuint(blob, pos)
                    g = blob[pos:pos + n]
                    pos += n
                    cols[fd.name].append(
                        decode_shape(g, fd) if want_geom_wkb else g)
                else:
                    raise ValueError(f"field type {t}")
    return cols


# ------------------------------------------------------------------
# public readers

def _cols_to_table(meta, cols) -> pa.Table:
    arrs = {"fid": pa.array(cols["__fid"], pa.int64())}
    for fd in meta["fields"]:
        typ = _ARROW[fd.type]
        name = "geometry" if fd.type == FGFT_GEOMETRY else fd.name
        if fd.type in (FGFT_DATETIME, FGFT_DATE, FGFT_DATETIME_WITH_OFFSET):
            arrs[name] = pa.array(cols[fd.name], pa.int64()).cast(
                pa.timestamp("us"))
        else:
            arrs[name] = pa.array(cols[fd.name], typ)
    return pa.table(arrs)


def read_gdbtable(table_path: str, *, rows_per_task: int = 65536,
                  ) -> ray.data.Dataset:
    """One .gdbtable -> Dataset (typed columns, WKB `geometry`, and
    `fid` = OBJECTID).  Row ranges fan out as offset-sorted tasks."""
    meta = parse_table_header(table_path)
    offs = row_offsets(table_path)
    present = np.flatnonzero(offs != 0)
    items = [{"start": int(present[i]),
              "stop": int(present[min(i + rows_per_task,
                                      len(present)) - 1]) + 1}
             for i in range(0, len(present), rows_per_task)]
    schema_tab = _cols_to_table(meta, {f.name: [] for f in meta["fields"]}
                                | {"__fid": []})
    if not items:
        return ray.data.from_arrow(schema_tab)

    def task(batch) -> pa.Table:
        out = []
        local_offs = row_offsets(table_path)
        lmeta = parse_table_header(table_path)
        for start, stop in zip(batch["start"], batch["stop"]):
            rows = np.arange(start, stop)
            sel = local_offs[start:stop]
            keep = sel != 0
            cols = decode_rows(table_path, lmeta, rows[keep], sel[keep])
            out.append(_cols_to_table(lmeta, cols))
        return pa.concat_tables(out)

    return (ray.data.from_items(items,
                                override_num_blocks=len(items))
            .map_batches(task, batch_format="numpy"))


def list_layers(gdb_dir: str) -> Dict[str, str]:
    """GDB_SystemCatalog (a00000001.gdbtable) -> {name: table path}."""
    cat = os.path.join(gdb_dir, "a00000001.gdbtable")
    meta = parse_table_header(cat)
    offs = row_offsets(cat)
    rows = np.flatnonzero(offs != 0)
    cols = decode_rows(cat, meta, rows, offs[rows])
    out = {}
    for fid, name in zip(cols["__fid"], cols["Name"]):
        path = os.path.join(gdb_dir, "a%08x.gdbtable" % fid)
        if os.path.exists(path):
            out[name] = path
    return out


def read_filegdb(gdb_dir: str, layer: str,
                 **kwargs) -> ray.data.Dataset:
    """OpenFileGDB datasource: resolve `layer` through the system
    catalog, read its table."""
    layers = list_layers(gdb_dir)
    for name, path in layers.items():
        if name.lower() == layer.lower():
            return read_gdbtable(path, **kwargs)
    raise ValueError(f"layer {layer!r} not in {sorted(layers)}")


# ------------------------------------------------------------------
# minimal writer (V3 point tables, own-reader round-trip grade)

def _varuint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_desc_bytes(fields: List[Tuple[str, int]], gf: Field) -> bytes:
    """Field descriptor section: OBJECTID + attrs + geometry."""

    def name16(s):
        e = s.encode("utf-16-le")
        return bytes([len(s)]) + e

    body = b""
    body += name16("OBJECTID") + name16("OBJECTID") + bytes([FGFT_OBJECTID])
    body += bytes([0, 2])                       # width?, flags=required
    for name, ftype in fields:
        body += name16(name) + name16(name) + bytes([ftype])
        if ftype == FGFT_STRING:
            body += struct.pack("<i", 65536) + bytes([1]) + _varuint(0)
        else:
            body += bytes([0, 1, 0])            # width, nullable, dlen
    body += name16("SHAPE") + name16("SHAPE") + bytes([FGFT_GEOMETRY])
    body += bytes([0, 1])                       # flags: nullable
    wkt = 'GEOGCS["GCS_WGS_1984"]'
    w = wkt.encode("utf-16-le")
    body += struct.pack("<H", len(w)) + w
    body += bytes([0])                          # no z/m origin blocks
    body += struct.pack("<ddd", -400.0, -400.0, 1e9)   # x/y origin, scale
    body += struct.pack("<d", 8.983152841195215e-09)   # xy tolerance
    body += struct.pack("<dddd", -400.0, -400.0, 400.0, 400.0)  # bbox
    body += bytes([0])
    body += struct.pack("<I", 1) + struct.pack("<d", 1.0)  # one grid res
    header = struct.pack("<I", len(body) + 10) + struct.pack("<I", 4)
    header += bytes([1, 1, 0, 0])               # point geom, utf8 strings
    header += struct.pack("<H", len(fields) + 2)
    return header + body


class _FGDBRow:
    pass


def write_point_gdbtable(ds: ray.data.Dataset, table_path: str,
                         geometry_col: str = "geometry") -> int:
    """Dataset (point WKB + int64/float64/string attrs) -> one
    .gdbtable/.gdbtablx pair the reader round-trips exactly.  Row
    blobs encode in parallel map_batches tasks (each block returns
    packed rows + lengths); the driver concatenates bytes and builds
    the offset table — same assembly shape as the PBF writer."""
    schema = ds.schema()
    attr_fields: List[Tuple[str, int]] = []
    for n, t in zip(schema.names, schema.types):
        if n == geometry_col:
            continue
        if pa.types.is_integer(t):
            attr_fields.append((n, FGFT_INT32 if pa.types.is_int32(t)
                                else FGFT_INT64))
        elif pa.types.is_floating(t):
            attr_fields.append((n, FGFT_FLOAT64))
        else:
            attr_fields.append((n, FGFT_STRING))
    gf = Field("SHAPE", FGFT_GEOMETRY, True)
    gf.xorigin = gf.yorigin = -400.0
    gf.xyscale = 1e9

    def enc(batch: pa.Table) -> pa.Table:
        geoms = batch[geometry_col].to_pylist()
        attrs = {n: batch[n].to_pylist() for n, _t in attr_fields
                 if n in batch.column_names}
        nullable = 1 + len(attr_fields)   # attrs + geometry (not OBJECTID)
        nbytes = (nullable + 7) // 8
        rows = []
        for i, g in enumerate(geoms):
            nulls = bytearray(nbytes)
            vals = b""
            bit = 0
            for n, t in attr_fields:
                v = attrs.get(n, [None] * len(geoms))[i]
                if v is None:
                    nulls[bit >> 3] |= 1 << (bit & 7)
                elif t == FGFT_INT32:
                    vals += struct.pack("<i", int(v))
                elif t == FGFT_INT64:
                    vals += struct.pack("<q", int(v))
                elif t == FGFT_FLOAT64:
                    vals += struct.pack("<d", float(v))
                else:
                    e = str(v).encode("utf-8")
                    vals += _varuint(len(e)) + e
                bit += 1
            if g is None:
                nulls[bit >> 3] |= 1 << (bit & 7)
            else:
                x, y = wkbm.parse_wkb(g)[1][0]
                ex = int(round((x - gf.xorigin) * gf.xyscale)) + 1
                ey = int(round((y - gf.yorigin) * gf.xyscale)) + 1
                shape = _varuint(1) + _varuint(ex) + _varuint(ey)
                vals += _varuint(len(shape)) + shape
            rows.append(bytes(nulls) + vals)
        lens = np.array([len(r) for r in rows], np.int64)
        return pa.table({"data": pa.array([b"".join(
            struct.pack("<I", len(r)) + r for r in rows)], pa.binary()),
            "lens": pa.array([lens.tolist()],
                             pa.list_(pa.int64()))})

    parts = ds.map_batches(enc, batch_format="pyarrow").to_pandas()
    all_lens = np.concatenate([np.asarray(x, np.int64)
                               for x in parts["lens"]]) \
        if len(parts) else np.zeros(0, np.int64)
    n = int(len(all_lens))
    fdesc = _field_desc_bytes(attr_fields, gf)
    max_blob = int(all_lens.max()) if n else 0

    data_start = 40
    body = b"".join(parts["data"]) if len(parts) else b""
    off_fields = data_start + len(body)
    header = struct.pack("<IIIIII", 3, n, max_blob, 5, 0, 0)
    header += struct.pack("<Q", off_fields + len(fdesc))   # file size
    header += struct.pack("<Q", off_fields)
    with open(table_path + ".tmp", "wb") as f:
        f.write(header + body + fdesc)
    os.replace(table_path + ".tmp", table_path)

    # .gdbtablx
    offsets = data_start + np.concatenate(
        [[0], np.cumsum(all_lens[:-1] + 4)]).astype(np.uint64) \
        if n else np.zeros(0, np.uint64)
    osize = 5
    n1024 = (n + 1023) // 1024
    padded = np.zeros(n1024 * 1024, np.uint64)
    padded[:n] = offsets
    raw = padded.astype("<u8").view(np.uint8).reshape(-1, 8)[:, :osize]
    tablx = os.path.splitext(table_path)[0] + ".gdbtablx"
    with open(tablx + ".tmp", "wb") as f:
        f.write(struct.pack("<IIiI", 3, n1024, n, osize))
        f.write(np.ascontiguousarray(raw).tobytes())
        f.write(struct.pack("<IIII", 0, n1024, n1024, 0))
    os.replace(tablx + ".tmp", tablx)
    return n
