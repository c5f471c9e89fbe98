"""Idrisi vector (.vct) reader with .vdc documentation and .adc/.avl
attribute join.

Layout: byte 0 = id-type flag, u32 feature count at offset 1,
features from offset 0x105.  Point: f64 id, x, y.  Line: f64 id +
4×f64 bbox, u32 node count, nodes as (x, y) f64 pairs.  Polygon:
f64 id + bbox, u32 part count, u32 total nodes, part node counts,
then all nodes (first part = exterior ring).  The .vdc sidecar names
the object type and the ref system / min-max extent; the .adc/.avl
pair adds tab-separated attribute columns joined on the id (field 0
of the .avl is the id and is not duplicated).

Reference: ogr/ogrsf_frmts/idrisi/ogridrisilayer.cpp (:47 count,
:229 data offset, :254-440 per-type records, :85-150 adc parse);
autotest ogr_idrisi.py pins points/lines/polygons counts, extents,
and attribute values. Re-derived; no code copied.
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkb_mod

_DATA_OFF = 0x105


def _read_vdc(path: str) -> dict:
    kv = {}
    vdc = os.path.splitext(path)[0] + ".vdc"
    if not os.path.exists(vdc):
        return kv
    with open(vdc, "r", encoding="latin-1") as f:
        for ln in f:
            if ":" in ln:
                k, v = ln.split(":", 1)
                kv[k.strip().lower()] = v.strip()
    return kv


def _read_avl(path: str):
    """-> (field names+types from .adc, rows from .avl) or None."""
    base = os.path.splitext(path)[0]
    adc, avl = base + ".adc", base + ".avl"
    if not (os.path.exists(adc) and os.path.exists(avl)):
        return None
    fields = []
    cur_name = None
    with open(adc, "r", encoding="latin-1") as f:
        for ln in f:
            low = ln.strip().lower()
            if low.startswith("field "):
                cur_name = ln.split(":", 1)[1].strip()
            elif low.startswith("data type") and cur_name is not None:
                fields.append((cur_name, ln.split(":", 1)[1].strip()))
                cur_name = None
    rows = []
    with open(avl, "r", encoding="latin-1") as f:
        for ln in f:
            ln = ln.rstrip("\r\n")
            if ln:
                rows.append(ln.split("\t"))
    return fields, rows


def read_idrisi_vct(path: str) -> pa.Table:
    """.vct file -> Arrow table (id + joined attributes + WKB)."""
    with open(path, "rb") as f:
        buf = f.read()
    (count,) = struct.unpack_from("<I", buf, 1)
    vdc = _read_vdc(path)
    otype = vdc.get("object type", "point").lower()

    ids, geoms = [], []
    pos = _DATA_OFF
    for _ in range(count):
        if otype == "point":
            fid, x, y = struct.unpack_from("<ddd", buf, pos)
            pos += 24
            geoms.append(bytes(wkb_mod.points_to_wkb(
                np.array([x]), np.array([y]))[0]))
        elif otype == "line":
            fid = struct.unpack_from("<d", buf, pos)[0]
            pos += 8 + 32  # id + bbox
            (n,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            pts = np.frombuffer(buf, "<f8", n * 2, pos).reshape(-1, 2)
            pos += n * 16
            geoms.append(wkb_mod.linestring_to_wkb(pts))
        else:  # polygon
            fid = struct.unpack_from("<d", buf, pos)[0]
            pos += 8 + 32
            nparts, ntotal = struct.unpack_from("<II", buf, pos)
            pos += 8
            counts = np.frombuffer(buf, "<u4", nparts, pos)
            pos += nparts * 4
            pts = np.frombuffer(buf, "<f8", ntotal * 2,
                                pos).reshape(-1, 2)
            pos += ntotal * 16
            rings = []
            at = 0
            for c in counts:
                rings.append(pts[at:at + int(c)])
                at += int(c)
            geoms.append(wkb_mod.polygon_to_wkb(rings))
        ids.append(float(fid))

    cols = {"id": pa.array(ids, pa.float64())}
    attr = _read_avl(path)
    if attr:
        fields, rows = attr
        by_id = {row[0]: row for row in rows}
        for i, (name, ftype) in enumerate(fields):
            if i == 0:
                continue  # the id column itself
            vals = []
            for fid in ids:
                key = str(int(fid)) if fid == int(fid) else str(fid)
                row = by_id.get(key)
                v = row[i] if row and i < len(row) else None
                vals.append(v)
            if ftype == "integer":
                cols[name] = pa.array(
                    [int(v) if v not in (None, "") else None
                     for v in vals], pa.int64())
            elif ftype == "real":
                cols[name] = pa.array(
                    [float(v) if v not in (None, "") else None
                     for v in vals], pa.float64())
            else:
                cols[name] = pa.array(vals, pa.string())
    cols["geometry"] = pa.array(geoms, pa.binary())
    tab = pa.table(cols)
    meta = {}
    for k in ("ref. system", "min. x", "max. x", "min. y", "max. y"):
        if k in vdc:
            meta[("idrisi_" + k.replace(". ", "_")).encode()] = \
                vdc[k].encode()
    return tab.replace_schema_metadata(meta or None)


def identify_idrisi_vct(path: str) -> Optional[str]:
    return "IDRISI" if path.lower().endswith(".vct") and \
        os.path.exists(os.path.splitext(path)[0] + ".vdc") else None
