"""TopoJSON vector reader.

The reference reads Topology documents (ogr/ogrsf_frmts/geojson
TopoJSON flavor; autotest/ogr/ogr_topojson.py pins the semantics):
shared ``arcs`` hold the coordinates — delta-encoded integers scaled
by ``transform.scale``/``translate`` when quantized, absolute
positions otherwise; geometries reference arcs by index, a negative
index ``~i`` meaning arc *i* reversed; consecutive stitched arcs
share their joint vertex (dropped on concat).  GeometryCollection
objects become their own layer (named by the object's ``id`` in
objects-array form, by the member key in objects-dict form); every
other top-level geometry lands in the catch-all ``TopoJSON`` layer.
Malformed arcs / coordinates degrade to typed EMPTY geometries, not
errors (topojson1.topojson is a torture file of those).

Ray-Data shape: the document parses once driver-side (a Topology is
a single JSON object by construction); the decoded arc table is
``ray.put`` once and geometry assembly (arc stitching → WKB) fans
out over the object list in map_batches.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

_KIND_CODE = {"Point": 1, "LineString": 2, "Polygon": 3,
              "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6}

def _loads_lenient(text: str):
    """json-c (the reference's parser) accepts trailing commas; the
    stdlib doesn't — strip them outside of strings."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        import re as _re

        return json.loads(_re.sub(
            r',(\s*[\]}])', r'\1',
            _re.sub(r'"(?:[^"\\]|\\.)*"',
                    lambda m: m.group(0).replace(",", "\x00"), text))
            .replace("\x00", ","))


def _num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _decode_arcs(doc: dict) -> List[Optional[np.ndarray]]:
    """arcs -> absolute (K,2) float64 arrays (cumsum+scale when the
    Topology is quantized); malformed arcs -> None."""
    tf = doc.get("transform") or None
    scale = np.array(tf["scale"], float) if tf else None
    trans = np.array(tf["translate"], float) if tf else None
    out: List[Optional[np.ndarray]] = []
    for arc in doc.get("arcs") or []:
        if not isinstance(arc, list) or len(arc) < 2:
            out.append(None)
            continue
        if not all(isinstance(p, list) and len(p) >= 2
                   and _num(p[0]) and _num(p[1]) for p in arc):
            out.append(None)
            continue
        pts = np.array([[p[0], p[1]] for p in arc], float)
        if tf is not None:
            pts = np.cumsum(pts, axis=0) * scale + trans
        out.append(pts)
    return out


def _stitch(idxs, arcs) -> Optional[np.ndarray]:
    """Arc index list -> stitched coordinate run (None = EMPTY)."""
    if not isinstance(idxs, list) or not idxs:
        return None
    parts = []
    for i in idxs:
        if not isinstance(i, int) or isinstance(i, bool):
            return None
        j = i if i >= 0 else ~i
        if j < 0 or j >= len(arcs) or arcs[j] is None:
            return None
        a = arcs[j] if i >= 0 else arcs[j][::-1]
        if parts and np.array_equal(parts[-1][-1], a[0]):
            a = a[1:]
        parts.append(a)
    return np.vstack(parts)


def _pt(doc_coords, tf_scale, tf_trans) -> Optional[np.ndarray]:
    c = doc_coords
    if not isinstance(c, list) or len(c) < 2 or not _num(c[0]) \
            or not _num(c[1]):
        return None
    p = np.array([[c[0], c[1]]], float)
    if tf_scale is not None:
        p = p * tf_scale + tf_trans
    return p


def _wkb(kind_code: int, body: bytes) -> bytes:
    return b"\x01" + struct.pack("<I", kind_code) + body


def _seq(arr: np.ndarray) -> bytes:
    return struct.pack("<I", len(arr)) + arr.astype("<f8").tobytes()


def _ring_close(arr: np.ndarray) -> np.ndarray:
    if len(arr) and not np.array_equal(arr[0], arr[-1]):
        return np.vstack([arr, arr[:1]])
    return arr


def geometry_to_wkb(g: dict, arcs, tf) -> Tuple[Optional[str],
                                                Optional[bytes]]:
    """One TopoJSON geometry -> (kind, ISO WKB); EMPTY encodings are
    zero-count bodies (NaN point for POINT EMPTY, OGR's convention)."""
    t = g.get("type")
    if not _kept(g):
        return None, None
    scale = np.array(tf["scale"], float) if tf else None
    trans = np.array(tf["translate"], float) if tf else None
    code = _KIND_CODE[t]
    if t == "Point":
        p = _pt(g.get("coordinates"), scale, trans)
        if p is None:
            return "point", _wkb(1, struct.pack("<2d", float("nan"),
                                                float("nan")))
        return "point", _wkb(1, p[0].astype("<f8").tobytes())
    if t == "MultiPoint":
        cs = g.get("coordinates")
        pts = []
        if isinstance(cs, list):
            for c in cs:
                p = _pt(c, scale, trans)
                if p is None:
                    pts = []
                    break
                pts.append(p[0])
        body = struct.pack("<I", len(pts)) + b"".join(
            _wkb(1, p.astype("<f8").tobytes()) for p in pts)
        return "multipoint", _wkb(4, body)
    if t == "LineString":
        run = _stitch(g.get("arcs"), arcs)
        return "linestring", _wkb(2, _seq(run if run is not None
                                          else np.empty((0, 2))))
    if t == "Polygon":
        rings = []
        ra = g.get("arcs")
        if isinstance(ra, list):
            for ring_idxs in ra:
                run = _stitch(ring_idxs, arcs)
                if run is None:
                    rings = []
                    break
                rings.append(_ring_close(run))
        body = struct.pack("<I", len(rings)) + b"".join(
            _seq(r) for r in rings)
        return "polygon", _wkb(3, body)
    if t == "MultiLineString":
        lines = []
        ra = g.get("arcs")
        if isinstance(ra, list):
            for li in ra:
                run = _stitch(li, arcs)
                if run is None:
                    lines = []
                    break
                lines.append(run)
        body = struct.pack("<I", len(lines)) + b"".join(
            _wkb(2, _seq(ln)) for ln in lines)
        return "multilinestring", _wkb(5, body)
    # MultiPolygon
    polys = []
    ra = g.get("arcs")
    if isinstance(ra, list):
        for poly in ra:
            rings = []
            ok = isinstance(poly, list)
            if ok:
                for ring_idxs in poly:
                    run = _stitch(ring_idxs, arcs)
                    if run is None:
                        ok = False
                        break
                    rings.append(_ring_close(run))
            if not ok or not rings:  # ring-less member poisons the multi
                polys = []
                break
            polys.append(rings)
    body = struct.pack("<I", len(polys)) + b"".join(
        _wkb(3, struct.pack("<I", len(rs)) + b"".join(_seq(r) for r in rs))
        for rs in polys)
    return "multipolygon", _wkb(6, body)


def _kept(g: dict) -> bool:
    """The reference only materializes geometries whose coordinate
    member exists AND is a JSON array (missing / null / string
    coordinates are dropped, not EMPTY — ogr_topojson.py row set)."""
    t = g.get("type")
    if not isinstance(t, str) or t not in _KIND_CODE:
        return False
    member = "coordinates" if t in ("Point", "MultiPoint") else "arcs"
    return isinstance(g.get(member), list)


def _layers_of(doc: dict) -> Dict[str, List[dict]]:
    """objects (dict or array) -> {layer_name: [geometries]}."""
    objects = doc.get("objects")
    layers: Dict[str, List[dict]] = {}
    catch: List[dict] = []

    def add_collection(name, obj):
        geoms = obj.get("geometries")
        if isinstance(geoms, list):
            layers.setdefault(name, []).extend(
                g for g in geoms if isinstance(g, dict))

    if isinstance(objects, dict):
        for key, obj in objects.items():
            if not isinstance(obj, dict):
                continue
            if obj.get("type") == "GeometryCollection":
                add_collection(key, obj)
            elif isinstance(obj.get("type"), str) \
                    and obj.get("type") in _KIND_CODE:
                catch.append(obj)
    elif isinstance(objects, list):
        for obj in objects:
            if not isinstance(obj, dict):
                continue
            if obj.get("type") == "GeometryCollection":
                name = obj.get("id")
                if isinstance(name, str):
                    add_collection(name, obj)
            elif isinstance(obj.get("type"), str) \
                    and obj.get("type") in _KIND_CODE:
                catch.append(obj)
    if catch:
        layers["TopoJSON"] = catch
    return layers


def topojson_layers(path: str) -> List[str]:
    with open(path) as fh:
        return list(_layers_of(_loads_lenient(fh.read())))


def read_topojson(path: str, layer: Optional[str] = None,
                  geoms_per_task: int = 10_000) -> ray.data.Dataset:
    """One TopoJSON layer -> Dataset with WKB `geometry` plus the
    union of feature property columns (`id` from the geometry id or
    properties, promoted through the same type lattice the
    spreadsheet drivers use — conflicting types become strings)."""
    with open(path) as fh:
        doc = _loads_lenient(fh.read())
    layers = _layers_of(doc)
    if not layers:
        raise ValueError(f"{path}: no TopoJSON objects")
    if layer is None:
        layer = next(iter(layers))
    if layer not in layers:
        raise ValueError(f"{path}: layer {layer!r} not in {list(layers)}")
    geoms = [g for g in layers[layer] if _kept(g)]
    tf = doc.get("transform") or None
    arcs_ref = ray.put(_decode_arcs(doc))

    # columns: 'id' first (geometry id / properties.id), then property
    # keys in first-seen order; values promoted to string on conflict
    cols: List[str] = ["id"]
    for g in geoms:
        props = g.get("properties")
        if isinstance(props, dict):
            for k in props:
                if k not in cols:
                    cols.append(k)

    def fetch(g, col):
        props = g.get("properties")
        v = props.get(col) if isinstance(props, dict) else None
        if col == "id" and v is None:
            v = g.get("id")
        if v is None or isinstance(v, (dict, list)):
            return None
        return v

    col_types = {}
    for c in cols:
        seen = {type(fetch(g, c)) for g in geoms} - {type(None)}
        if seen == {int}:
            col_types[c] = pa.int64()
        elif seen <= {int, float} and seen:
            col_types[c] = pa.float64()
        elif seen == {bool}:
            col_types[c] = pa.bool_()
        else:
            col_types[c] = pa.string()

    items = [{"i": i} for i in range(0, len(geoms), geoms_per_task)]
    geoms_ref = ray.put(geoms)

    def build(batch: pa.Table) -> pa.Table:
        arcs = ray.get(arcs_ref)
        all_geoms = ray.get(geoms_ref)
        out = []
        for row in batch.to_pylist():
            chunk = all_geoms[row["i"]:row["i"] + geoms_per_task]
            wkbs = [geometry_to_wkb(g, arcs, tf)[1] for g in chunk]
            data = {"geometry": pa.array(wkbs, pa.binary())}
            for c in cols:
                vals = [fetch(g, c) for g in chunk]
                if col_types[c] == pa.string():
                    vals = [None if v is None else
                            (str(v).lower() if isinstance(v, bool)
                             else str(v)) for v in vals]
                data[c] = pa.array(vals, type=col_types[c])
            out.append(pa.table(data))
        return pa.concat_tables(out) if out else pa.table({})

    return (ray.data.from_items(items)
            .map_batches(build, batch_format="pyarrow", batch_size=1))
