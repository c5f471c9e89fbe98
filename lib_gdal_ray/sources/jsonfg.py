"""OGC Features & Geometries JSON (JSON-FG) driver.

Parity: `ogr/ogrsf_frmts/jsonfg/` — detection via conformsTo
(ogc-json-fg / json-fg-1 URIs) or featureType/place members; per-
feature geometry = "place" (in coordRefSys) when set, else "geometry"
(WGS84); coordRefSys forms "[EPSG:x]", OGC URI, or {"href": ...};
lat-first authority axis order swapped to GIS order on read and back
on write; "time" -> time / time_start / time_end fields (prefixed
jsonfg_ on collision with a property, like OGR); Prism place
geometries expand to LINESTRING Z / MULTIPOLYGON Z walls /
POLYHEDRALSURFACE Z per the OGR driver.

Geometries keep full ISO fidelity (curves, Z/M/ZM, polyhedra) through
`geom/iso.py` extended WKB.
"""

from __future__ import annotations

import json
import os
import re
from typing import List, Optional, Tuple, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import iso

# EPSG geographic codes are lat-first under authority-compliant axis
# order; OGC:CRS84(h) is lon-first by definition.
_GEOGRAPHIC_LATFIRST = re.compile(r"^4\d{3}$")

_CURVE_CODES = {"Point": 1, "LineString": 2, "Polygon": 3,
                "MultiPoint": 4, "MultiLineString": 5,
                "MultiPolygon": 6, "GeometryCollection": 7,
                "CircularString": 8, "CompoundCurve": 9,
                "CurvePolygon": 10, "MultiCurve": 11,
                "MultiSurface": 12, "Polyhedron": 15}


def identify_jsonfg(text: str) -> bool:
    head = text[:10000]
    if "json-fg" in head or "JSON-FG" in head:
        return True
    return '"place"' in head and '"type"' in head


def _crs_to_epsg(crs) -> Optional[Union[int, str]]:
    """coordRefSys -> EPSG int, 'CRS84', or None."""
    if crs is None:
        return None
    if isinstance(crs, dict):
        crs = crs.get("href")
        if crs is None:
            return None
    s = str(crs)
    m = re.match(r"^\[EPSG:(\d+)\]$", s)
    if m:
        return int(m.group(1))
    m = re.search(r"/def/crs/EPSG/\d+(?:\.\d+)*/(\d+)$", s)
    if m:
        return int(m.group(1))
    if "CRS84" in s or "OGC/1.3/CRS84" in s:
        return "CRS84"
    m = re.match(r"^\[?OGC:CRS84h?\]?$", s)
    if m:
        return "CRS84"
    return None


def _lat_first(epsg) -> bool:
    if not isinstance(epsg, int):
        return False
    return bool(_GEOGRAPHIC_LATFIRST.match(str(epsg)))


def _swap_xy(g: iso.Geom) -> iso.Geom:
    def sw(a):
        a = np.asarray(a, np.float64).copy()
        if a.ndim == 1:
            a[[0, 1]] = a[[1, 0]]
        else:
            a[:, [0, 1]] = a[:, [1, 0]]
        return a

    if g.code == 1:
        return iso.Geom(1, g.dim, sw(g.payload))
    if g.code in (2, 8):
        return iso.Geom(g.code, g.dim, sw(g.payload))
    if g.code in (3, 17):
        return iso.Geom(g.code, g.dim, [sw(r) for r in g.payload])
    return iso.Geom(g.code, g.dim, [_swap_xy(m) for m in g.payload])


def _json_geom_to_iso(g: Optional[dict],
                      measures: bool = False) -> Optional[iso.Geom]:
    if g is None:
        return None
    t = g["type"]
    if t == "Prism":
        return _prism_to_iso(g)
    if t == "Polyhedron":
        # coordinates: array of shells, each an array of polygons
        shells = g["coordinates"]
        polys = []
        for shell in shells:
            for poly in shell:
                rings = [np.asarray(r, np.float64) for r in poly]
                polys.append(iso.Geom(3, "Z", rings))
        return iso.Geom(15, "Z", polys)
    # a "measures" member applies to this geometry AND its children
    measures = measures or bool((g.get("measures") or {}).get("enabled"))

    def dim_of(ncoord: int) -> str:
        if ncoord >= 4:
            return "ZM"
        if ncoord == 3:
            return "M" if measures else "Z"
        return ""

    code = _CURVE_CODES.get(t)
    if code is None:
        raise ValueError(f"JSON-FG: unknown geometry type {t!r}")
    if "geometries" in g and code in (7, 9, 10, 11, 12):
        members = [_json_geom_to_iso(m, measures)
                   for m in g["geometries"]]
        dim = members[0].dim if members else ""
        return iso.Geom(code, dim, members)
    c = g.get("coordinates")
    if code == 1:
        a = np.asarray(c, np.float64)
        return iso.Geom(1, dim_of(len(a)), a)
    if code in (2, 8):
        a = np.asarray(c, np.float64)
        return iso.Geom(code, dim_of(a.shape[1]), a)
    if code == 3:
        rings = [np.asarray(r, np.float64) for r in c]
        return iso.Geom(3, dim_of(rings[0].shape[1] if rings else 2),
                        rings)
    if code == 4:
        pts = [iso.Geom(1, dim_of(len(p)), np.asarray(p, np.float64))
               for p in c]
        return iso.Geom(4, pts[0].dim if pts else "", pts)
    if code == 5:
        ls = [iso.Geom(2, dim_of(np.asarray(l).shape[1]),
                       np.asarray(l, np.float64)) for l in c]
        return iso.Geom(5, ls[0].dim if ls else "", ls)
    if code == 6:
        polys = []
        for poly in c:
            rings = [np.asarray(r, np.float64) for r in poly]
            polys.append(iso.Geom(
                3, dim_of(rings[0].shape[1] if rings else 2), rings))
        return iso.Geom(6, polys[0].dim if polys else "", polys)
    raise ValueError(f"JSON-FG: cannot decode {t!r}")


def _prism_to_iso(g: dict) -> iso.Geom:
    """Prism expansion, matching the OGR driver: point base ->
    vertical LINESTRING Z; line base -> MULTIPOLYGON Z of wall quads;
    polygon base -> closed POLYHEDRALSURFACE Z (bottom, walls, top)."""
    base = g["base"]
    lower = float(g.get("lower", 0.0))
    upper = float(g["upper"])
    bt = base["type"]
    if bt == "Point":
        x, y = float(base["coordinates"][0]), float(
            base["coordinates"][1])
        return iso.Geom(2, "Z", np.array([[x, y, lower],
                                          [x, y, upper]]))
    if bt == "LineString":
        a = np.asarray(base["coordinates"], np.float64)[:, :2]
        polys = []
        for i in range(len(a) - 1):
            (x0, y0), (x1, y1) = a[i], a[i + 1]
            ring = np.array([[x0, y0, lower], [x1, y1, lower],
                             [x1, y1, upper], [x0, y0, upper],
                             [x0, y0, lower]])
            polys.append(iso.Geom(3, "Z", [ring]))
        return iso.Geom(6, "Z", polys)
    if bt == "Polygon":
        ring = np.asarray(base["coordinates"][0], np.float64)[:, :2]
        faces = []
        bottom = np.column_stack([ring, np.full(len(ring), lower)])
        faces.append(iso.Geom(3, "Z", [bottom]))
        for i in range(len(ring) - 1):
            (x0, y0), (x1, y1) = ring[i], ring[i + 1]
            quad = np.array([[x0, y0, lower], [x1, y1, lower],
                             [x1, y1, upper], [x0, y0, upper],
                             [x0, y0, lower]])
            faces.append(iso.Geom(3, "Z", [quad]))
        top = np.column_stack([ring, np.full(len(ring), upper)])
        faces.append(iso.Geom(3, "Z", [top]))
        return iso.Geom(15, "Z", faces)
    raise ValueError(f"JSON-FG: unsupported prism base {bt!r}")


_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _time_fields(features: List[dict]) -> Tuple[List[str], List[dict]]:
    """Scan 'time' members -> (field names, per-feature values).
    Date-only values render '2023/06/05'; timestamps
    '2023/06/05 12:34:56+00' (OGR field formatting). Mixed date /
    datetime promotes to datetime with ' 00:00:00' like OGR."""
    has_instant = has_interval = False
    instant_dt = interval_dt = False
    for f in features:
        t = f.get("time")
        if not t:
            continue
        if "date" in t:
            has_instant = True
        if "timestamp" in t:
            has_instant = instant_dt = True
        if "interval" in t:
            has_interval = True
            for v in t["interval"]:
                if v != ".." and not _DATE_RE.match(v):
                    interval_dt = True

    def render(v, as_dt):
        if v is None or v == "..":
            return None
        if _DATE_RE.match(v):
            d = v.replace("-", "/")
            return d + " 00:00:00" if as_dt else d
        v = v.replace("-", "/", 2).replace("T", " ")
        return v.replace("Z", "+00")

    names = []
    if has_instant:
        names.append("time")
    if has_interval:
        names += ["time_start", "time_end"]
    vals = []
    for f in features:
        t = f.get("time") or {}
        row = {}
        if has_instant:
            v = t.get("timestamp", t.get("date"))
            row["time"] = render(v, instant_dt)
        if has_interval:
            iv = t.get("interval")
            row["time_start"] = render(iv[0], interval_dt) if iv else None
            row["time_end"] = render(iv[1], interval_dt) if iv else None
        vals.append(row)
    return names, vals


def parse_jsonfg(text: str, geometry_element: str = "auto"):
    """One JSON-FG document -> (pyarrow.Table, meta). Geometry column
    is full-fidelity ISO WKB (geom/iso.py)."""
    doc = json.loads(text)
    if doc.get("type") == "Feature":
        features = [doc]
        coll_crs = _crs_to_epsg(doc.get("coordRefSys"))
    elif doc.get("type") in _CURVE_CODES or doc.get("type") == "Prism":
        # bare geometry document -> one feature with it as place
        features = [{"type": "Feature", "place": doc,
                     "coordRefSys": doc.get("coordRefSys")}]
        coll_crs = _crs_to_epsg(doc.get("coordRefSys"))
    else:
        features = doc.get("features", [])
        coll_crs = _crs_to_epsg(doc.get("coordRefSys"))

    def feat_place_crs(f):
        # coordRefSys may sit on the feature OR on the place object
        place = f.get("place") or {}
        return (_crs_to_epsg(place.get("coordRefSys"))
                or _crs_to_epsg(f.get("coordRefSys")) or coll_crs)

    feat_crs = [feat_place_crs(f) for f in features]
    # layer CRS: the common per-feature/collection CRS; place implies
    # its coordRefSys, plain geometry implies CRS84 — but a
    # collection-level coordRefSys also governs geometry-only
    # features (OGR reprojects their WGS84 geometry into it)
    eff = []
    for f, fc in zip(features, feat_crs):
        use_place = (geometry_element != "geometry"
                     and f.get("place") is not None)
        eff.append((fc or "CRS84") if use_place
                   else (coll_crs or "CRS84")
                   if f.get("geometry") is not None else None)
    crs_set = {e for e in eff if e is not None}
    layer_crs = crs_set.pop() if len(crs_set) == 1 else None

    def reproject(g: iso.Geom, src, dst) -> iso.Geom:
        # CRS84 and 4979 are WGS84 lon/lat for transform purposes
        norm = {"CRS84": 4326, 4979: 4326}
        src = norm.get(src, src)
        dst = norm.get(dst, dst)
        if src == dst or dst is None or src is None:
            return g
        from ..geom.proj import Transformer

        tr = Transformer.get(src, dst)

        def tx(a):
            a = np.asarray(a, np.float64).copy()
            one = a.ndim == 1
            if one:
                a = a[None, :]
            a[:, 0], a[:, 1] = tr.transform(a[:, 0].copy(),
                                            a[:, 1].copy())
            return a[0] if one else a

        def walk(n: iso.Geom) -> iso.Geom:
            if n.code == 1 or n.code in (2, 8):
                return iso.Geom(n.code, n.dim, tx(n.payload))
            if n.code in (3, 17):
                return iso.Geom(n.code, n.dim,
                                [tx(r) for r in n.payload])
            return iso.Geom(n.code, n.dim,
                            [walk(m) for m in n.payload])

        return walk(g)

    geoms, ids = [], []
    for f, fc in zip(features, feat_crs):
        g = None
        if geometry_element == "geometry":
            g = _json_geom_to_iso(f.get("geometry"))
        else:
            if f.get("place") is not None:
                g = _json_geom_to_iso(f["place"])
                if _lat_first(fc or "CRS84"):
                    g = _swap_xy(g)
                if layer_crs is not None and (fc or "CRS84") != \
                        layer_crs:
                    g = reproject(g, fc or "CRS84", layer_crs)
            elif f.get("geometry") is not None:
                g = _json_geom_to_iso(f["geometry"])
                if layer_crs not in (None, "CRS84", 4326):
                    g = reproject(g, "CRS84", layer_crs)
        geoms.append(iso.geom_to_wkb(g) if g is not None else None)
        ids.append(f.get("id"))

    prop_names: dict = {}
    for f in features:
        for k in (f.get("properties") or {}):
            prop_names.setdefault(k, None)
    tnames, tvals = _time_fields(features)
    cols = {}
    if any(i is not None for i in ids):
        cols["id"] = pa.array(ids)
    for p in prop_names:
        cols[p] = pa.array([(f.get("properties") or {}).get(p)
                            for f in features])
    for tn in tnames:
        out_name = "jsonfg_" + tn if tn in prop_names else tn
        cols[out_name] = pa.array([row.get(tn) for row in tvals])
    cols["geometry"] = pa.array(geoms, type=pa.binary())
    meta = {"epsg": layer_crs if isinstance(layer_crs, int) else
            (4326 if layer_crs == "CRS84" else None),
            "crs": layer_crs,
            "feature_type": doc.get("featureType")
            or next((f.get("featureType") for f in features
                     if f.get("featureType")), None)}
    return pa.table(cols), meta


def read_jsonfg(paths: Union[str, List[str]],
                geometry_element: str = "auto",
                **kwargs) -> ray.data.Dataset:
    """JSON-FG file(s) -> Dataset (one parse task per document)."""
    raw = ray.data.read_binary_files(paths, include_paths=True,
                                     **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for buf in batch["bytes"].to_pylist():
            t, _meta = parse_jsonfg(buf.decode("utf-8"),
                                    geometry_element)
            tables.append(t)
        if not tables:
            return pa.table({"geometry": pa.array([], pa.binary())})
        return pa.concat_tables(tables, promote_options="default")

    return raw.map_batches(parse, batch_format="pyarrow")


# ------------------------------------------------------------------
# Writer
# ------------------------------------------------------------------

def _iso_to_json_geom(g: iso.Geom, measures: bool) -> dict:
    name = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
            5: "MultiLineString", 6: "MultiPolygon",
            7: "GeometryCollection", 8: "CircularString",
            9: "CompoundCurve", 10: "CurvePolygon", 11: "MultiCurve",
            12: "MultiSurface", 15: "Polyhedron"}[g.code]
    out: dict = {"type": name}
    if g.code == 15:
        out["coordinates"] = [[[r.tolist() for r in m.payload]
                               for m in g.payload]]
        return out
    if g.code == 1:
        out["coordinates"] = np.asarray(g.payload).tolist()
    elif g.code in (2, 8):
        out["coordinates"] = np.asarray(g.payload).tolist()
    elif g.code == 3:
        out["coordinates"] = [np.asarray(r).tolist() for r in g.payload]
    elif g.code in (4, 5, 6):
        out["coordinates"] = [
            _iso_to_json_geom(m, measures)["coordinates"]
            for m in g.payload]
    else:
        out["geometries"] = [_iso_to_json_geom(m, measures)
                             for m in g.payload]
    if measures and "M" in g.dim:
        out["measures"] = {"enabled": True}
    return out


def write_jsonfg(ds: ray.data.Dataset, path: str,
                 geometry_col: str = "geometry",
                 epsg: Optional[int] = None,
                 feature_type: str = "features") -> None:
    """Dataset -> one JSON-FG FeatureCollection. Non-CRS84 epsg
    writes "place" (+ null geometry); CRS84/4326 writes "geometry"
    (like the OGR writer). conformsTo gains /conf/circular-arcs,
    /conf/measures, /conf/polyhedra as used."""
    rows = ds.take_all()
    feats = []
    used_arcs = used_measures = used_polyhedra = False
    used_place = False
    for r in rows:
        wkb = r.get(geometry_col)
        props = {k: v for k, v in r.items() if k != geometry_col}
        g = None
        if wkb is not None:
            g, _ = iso.parse_iso_wkb(bytes(wkb))
            codes = _all_codes(g)
            if codes & {8, 9, 10, 11, 12}:
                used_arcs = True
            if codes & {15, 16}:
                used_polyhedra = True
            if "M" in g.dim:
                used_measures = True
        f: dict = {"type": "Feature", "properties": props or None}
        if g is None:
            f["geometry"] = None
            f["place"] = None
        elif epsg is None or epsg in (4326, 4979) or epsg == "CRS84":
            lat_first = _lat_first(epsg) if isinstance(epsg, int) \
                else False
            simple = not (used_arcs or used_polyhedra
                          or "M" in g.dim)
            if simple:
                f["geometry"] = _iso_to_json_geom(g, False)
                f["place"] = None
            else:
                f["geometry"] = None
                f["place"] = _iso_to_json_geom(
                    _swap_xy(g) if lat_first else g, True)
                used_place = True
        else:
            f["geometry"] = None
            f["place"] = _iso_to_json_geom(
                _swap_xy(g) if _lat_first(epsg) else g, True)
            used_place = True
        f["time"] = None
        feats.append(f)
    conforms = ["http://www.opengis.net/spec/json-fg-1/0.2/conf/core"]
    if used_arcs:
        conforms.append(
            "http://www.opengis.net/spec/json-fg-1/0.2/conf/circular-arcs")
    if used_measures:
        conforms.append(
            "http://www.opengis.net/spec/json-fg-1/0.2/conf/measures")
    if used_polyhedra:
        conforms.append(
            "http://www.opengis.net/spec/json-fg-1/0.2/conf/polyhedra")
    doc = {"type": "FeatureCollection", "conformsTo": conforms,
           "featureType": feature_type, "features": feats}
    if isinstance(epsg, int) and (epsg != 4326 or used_place):
        doc["coordRefSys"] = \
            f"http://www.opengis.net/def/crs/EPSG/0/{epsg}"
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, path)


def _all_codes(g: iso.Geom) -> set:
    out = {g.code}
    if isinstance(g.payload, list) and g.payload and \
            isinstance(g.payload[0], iso.Geom):
        for m in g.payload:
            out |= _all_codes(m)
    return out
