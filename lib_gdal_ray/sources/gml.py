"""GML vector driver (GML2/GML3 simple features subset).

Parity target: `ogr/ogrsf_frmts/gml/` + `ogr/gml2ogrgeometry.cpp` —
featureMember/member traversal, geometry elements Point / LineString
/ Polygon (outerBoundaryIs|exterior) / Multi* / posList / pos /
coordinates. The <gml:coordinates> parser is lenient about the
tuple-vs-ordinate separator the way the reference's is (both
"0,0 1,1" and "0 0,1 1" occur in the wild and in GDAL's own test
data). XLink/xsd-schema resolution and nested feature properties are
out of scope (flattened to their text).

Ray shape: one parse task per file (an XML document is one parse
unit); single-document writes assemble via the shared streaming
driver-side concat.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple, Union
from xml.sax.saxutils import escape

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import wkb as wkbm
from .xml_vectors import _concat_xml, _strip

_GEOM_TAGS = {"Point", "LineString", "Polygon", "MultiPoint",
              "MultiLineString", "MultiPolygon", "MultiSurface",
              "MultiCurve", "Curve", "Surface", "MultiGeometry"}


def _parse_coordinates(text: str) -> List[Tuple[float, float]]:
    """<gml:coordinates> with auto-detected separators
    (gml2ogrgeometry.cpp ParseGMLCoordinates' leniency)."""
    t = (text or "").strip()
    if not t:
        return []
    if "," not in t:
        # pure whitespace stream (posList style): pairs
        vals = [float(v) for v in t.split()]
        return list(zip(vals[0::2], vals[1::2]))
    # decide: "x,y x,y" (tuple sep = space) vs "x y,x y" (tuple sep = ,)
    first_space = t.split()[0]
    if "," in first_space:
        tuples = t.split()
        out = []
        for tok in tuples:
            parts = tok.split(",")
            out.append((float(parts[0]), float(parts[1])))
        return out
    out = []
    for tok in t.split(","):
        parts = tok.split()
        out.append((float(parts[0]), float(parts[1])))
    return out


def _parse_pos_list(text: str, dim: int = 2) -> List[Tuple[float, float]]:
    vals = [float(v) for v in (text or "").split()]
    return [(vals[i], vals[i + 1]) for i in range(0, len(vals), dim)]


def _ring_coords(ring_el) -> List[Tuple[float, float]]:
    for ch in ring_el.iter():
        t = _strip(ch.tag)
        if t == "coordinates":
            return _parse_coordinates(ch.text)
        if t == "posList":
            dim = int(ch.get("srsDimension", 2))
            return _parse_pos_list(ch.text, dim)
    return []


def _curve_segments(el) -> Optional[bytes]:
    """gml:Curve/gml:segments -> curve-preserving WKB: Arc/ArcString
    segments become CIRCULARSTRING, LineStringSegment LINESTRING; a
    mix becomes COMPOUNDCURVE (gml2ogrgeometry.cpp GML3 curve path).
    Returns None when the Curve has no <segments> (GML2-style posList
    Curves fall through to the linestring reader)."""
    segments = None
    for ch in el:
        if _strip(ch.tag) == "segments":
            segments = ch
            break
    if segments is None:
        return None
    members: List[bytes] = []
    for seg in segments:
        st = _strip(seg.tag)
        coords = _ring_coords(seg)
        if not coords:
            continue
        if st in ("Arc", "ArcString", "Circle"):
            members.append(wkbm.circularstring_to_wkb(coords))
        else:  # LineStringSegment / GeodesicString
            members.append(wkbm.linestring_to_wkb(coords))
    if not members:
        return None
    if len(members) == 1:
        return members[0]
    return wkbm.compoundcurve_to_wkb(members)


def gml_geom_to_wkb(el) -> Optional[bytes]:
    """A gml:* geometry element -> WKB (gml2ogrgeometry.cpp)."""
    t = _strip(el.tag)
    if t == "Point":
        for ch in el:
            ct = _strip(ch.tag)
            if ct == "coordinates":
                c = _parse_coordinates(ch.text)
            elif ct == "pos":
                c = _parse_pos_list(ch.text)
            else:
                continue
            return wkbm.points_to_wkb(np.array([c[0][0]]),
                                      np.array([c[0][1]]))[0]
        return None
    if t in ("LineString", "Curve"):
        if t == "Curve":
            segs = _curve_segments(el)
            if segs is not None:
                return segs
        c = _ring_coords(el)
        return wkbm.linestring_to_wkb(c) if c else None
    if t in ("Polygon", "Surface"):
        # curve rings: gml:Ring with curveMember (GML3) -> CurvePolygon
        ring_members = []
        for ch in el.iter():
            if _strip(ch.tag) == "Ring":
                for cm in ch.iter():
                    if _strip(cm.tag) in ("Curve", "LineString"):
                        w = gml_geom_to_wkb(cm)
                        if w is not None:
                            ring_members.append(w)
                break
        if ring_members:
            return wkbm.curvepolygon_to_wkb(ring_members)
        outer: List = []
        holes: List = []
        for ch in el.iter():
            ct = _strip(ch.tag)
            if ct in ("outerBoundaryIs", "exterior"):
                outer = _ring_coords(ch)
            elif ct in ("innerBoundaryIs", "interior"):
                holes.append(_ring_coords(ch))
        if not outer:
            return None
        return wkbm.polygon_to_wkb([outer] + holes)
    if t in ("MultiPolygon", "MultiSurface"):
        polys = []
        for ch in el.iter():
            if _strip(ch.tag) in ("Polygon", "Surface"):
                w = gml_geom_to_wkb(ch)
                if w is not None:
                    _k, rings = wkbm.parse_wkb(w)
                    polys.append(rings)
        return wkbm.multipolygon_to_wkb(polys)
    if t in ("MultiLineString", "MultiCurve"):
        lines = []
        for ch in el.iter():
            if _strip(ch.tag) in ("LineString", "Curve"):
                c = _ring_coords(ch)
                if c:
                    lines.append(c)
        return wkbm.multilinestring_to_wkb(lines)
    if t == "MultiPoint":
        pts = []
        for ch in el.iter():
            if _strip(ch.tag) == "Point":
                w = gml_geom_to_wkb(ch)
                if w is not None:
                    _k, p = wkbm.parse_wkb(w)
                    pts.append((p[0][0], p[0][1]))
        return wkbm.multipoint_to_wkb(pts)
    if t == "MultiGeometry":
        members = []
        for ch in el.iter():
            if ch is not el and _strip(ch.tag) in _GEOM_TAGS:
                w = gml_geom_to_wkb(ch)
                if w is not None:
                    members.append(w)
        return wkbm.geometrycollection_to_wkb(members)
    return None


def parse_gml(text: str) -> List[dict]:
    """FeatureCollection -> [{fid, <properties...>, geometry}]."""
    root = ET.fromstring(text)
    feats: List[dict] = []
    for fm in root.iter():
        if _strip(fm.tag) not in ("featureMember", "member",
                                  "featureMembers"):
            continue
        for feat_el in fm:
            f: dict = {"fid": ""}
            for k, v in feat_el.attrib.items():
                if _strip(k) == "id":
                    f["fid"] = v
            for prop in feat_el:
                pt = _strip(prop.tag)
                geom_child = next((ch for ch in prop
                                   if _strip(ch.tag) in _GEOM_TAGS), None)
                if _strip(prop.tag) in _GEOM_TAGS:
                    f["geometry"] = gml_geom_to_wkb(prop)
                elif geom_child is not None:
                    f.setdefault("geometry", gml_geom_to_wkb(geom_child))
                else:
                    txt = (prop.text or "").strip()
                    if txt:
                        f[pt] = txt
            feats.append(f)
    return feats


def read_gml(paths: Union[str, List[str]],
             properties: Optional[List[str]] = None,
             **kwargs) -> ray.data.Dataset:
    """GML file(s) -> feature rows (fid, requested property columns,
    WKB geometry). One parse task per file."""
    props = properties or []
    kwargs.setdefault("file_extensions", ["gml", "xml"])
    raw = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"path": [], "fid": [], "geometry": []}
        pvals = {c: [] for c in props}
        for path, buf in zip(batch["path"].to_pylist(),
                             batch["bytes"].to_pylist()):
            for f in parse_gml(buf.decode("utf-8")):
                rows["path"].append(path)
                rows["fid"].append(f.get("fid", ""))
                rows["geometry"].append(f.get("geometry"))
                for c in props:
                    pvals[c].append(f.get(c))
        cols = {"path": pa.array(rows["path"], pa.string()),
                "fid": pa.array(rows["fid"], pa.string())}
        for c in props:
            cols[c] = pa.array(pvals[c], pa.string())
        cols["geometry"] = pa.array(rows["geometry"], pa.binary())
        return pa.table(cols)

    return raw.map_batches(parse, batch_format="pyarrow")


def _coords_text(pts) -> str:
    # GDAL's GML2 writer layout: ordinates by ",", tuples by " "
    return " ".join(f"{float(p[0])!r},{float(p[1])!r}" for p in pts)


def _pos_list(pts) -> str:
    return " ".join(f"{float(p[0])!r} {float(p[1])!r}" for p in pts)


def _curve_wkb_to_gml(kind: str, payload) -> str:
    """Curve kinds -> GML3 (Curve/segments/ArcString; Polygon/Ring
    with curveMember for CurvePolygon) — the reference GML writer's
    curve path (`ogr2gmlgeometry.cpp` GML3 options)."""
    if kind == "circularstring":
        return ("<gml:Curve><gml:segments><gml:ArcString>"
                f"<gml:posList>{_pos_list(payload)}</gml:posList>"
                "</gml:ArcString></gml:segments></gml:Curve>")
    if kind == "compoundcurve":
        segs = []
        for k, p in payload:
            if k == "circularstring":
                segs.append(f"<gml:ArcString><gml:posList>{_pos_list(p)}"
                            "</gml:posList></gml:ArcString>")
            else:
                segs.append(
                    f"<gml:LineStringSegment><gml:posList>{_pos_list(p)}"
                    "</gml:posList></gml:LineStringSegment>")
        return (f"<gml:Curve><gml:segments>{''.join(segs)}"
                "</gml:segments></gml:Curve>")
    if kind == "curvepolygon":
        rings = []
        for k, p in payload:
            if k == "linestring":
                member = (f"<gml:LineString><gml:posList>{_pos_list(p)}"
                          "</gml:posList></gml:LineString>")
            else:
                member = _curve_wkb_to_gml(k, p)
            rings.append(member)
        inner = "".join(f"<gml:curveMember>{m}</gml:curveMember>"
                        for m in rings)
        return ("<gml:Polygon><gml:exterior><gml:Ring>"
                f"{inner}</gml:Ring></gml:exterior></gml:Polygon>")
    raise ValueError(f"GML writer: unsupported curve kind {kind}")


def wkb_to_gml(g: bytes) -> str:
    if wkbm.wkb_geom_type(g) in (8, 9, 10):
        kind, payload = wkbm.parse_wkb_curved(g)
        return _curve_wkb_to_gml(kind, payload)
    kind, payload = wkbm.parse_wkb(g)
    if kind == "point":
        return (f"<gml:Point><gml:coordinates>"
                f"{_coords_text(payload)}</gml:coordinates></gml:Point>")
    if kind == "linestring":
        return (f"<gml:LineString><gml:coordinates>{_coords_text(payload)}"
                f"</gml:coordinates></gml:LineString>")
    if kind == "polygon":
        parts = [f"<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>"
                 f"{_coords_text(payload[0])}</gml:coordinates>"
                 f"</gml:LinearRing></gml:outerBoundaryIs>"]
        for hole in payload[1:]:
            parts.append(
                f"<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>"
                f"{_coords_text(hole)}</gml:coordinates></gml:LinearRing>"
                f"</gml:innerBoundaryIs>")
        return f"<gml:Polygon>{''.join(parts)}</gml:Polygon>"
    if kind == "multipolygon":
        inner = "".join(
            f"<gml:polygonMember>{wkb_to_gml(wkbm.polygon_to_wkb(r))}"
            f"</gml:polygonMember>" for r in payload)
        return f"<gml:MultiPolygon>{inner}</gml:MultiPolygon>"
    if kind == "multilinestring":
        inner = "".join(
            f"<gml:lineStringMember>"
            f"{wkb_to_gml(wkbm.linestring_to_wkb(seg))}"
            f"</gml:lineStringMember>" for seg in payload)
        return f"<gml:MultiLineString>{inner}</gml:MultiLineString>"
    if kind == "multipoint":
        inner = "".join(
            f"<gml:pointMember>"
            f"{wkb_to_gml(wkbm.points_to_wkb(np.array([p[0]]), np.array([p[1]]))[0])}"
            f"</gml:pointMember>" for p in payload)
        return f"<gml:MultiPoint>{inner}</gml:MultiPoint>"
    raise ValueError(f"GML writer: unsupported {kind}")


def write_gml(ds: ray.data.Dataset, path: str,
              geometry_col: str = "geometry",
              layer: str = "feature") -> int:
    """WKB Dataset -> ONE GML2 FeatureCollection. Property columns
    ride as child elements named after the column."""

    def to_lines(batch: pa.Table) -> pa.Table:
        names = [c for c in batch.column_names if c != geometry_col]
        cols = {c: batch[c].to_pylist() for c in names}
        out = []
        for i, g in enumerate(batch[geometry_col].to_pylist()):
            props = "".join(
                f"<ogr:{c}>{escape(str(cols[c][i]))}</ogr:{c}>"
                for c in names if cols[c][i] is not None)
            out.append(
                f"<gml:featureMember><ogr:{layer}>"
                f"<ogr:geometryProperty>{wkb_to_gml(g)}"
                f"</ogr:geometryProperty>{props}"
                f"</ogr:{layer}></gml:featureMember>")
        return pa.table({"text": pa.array(out)})

    return _concat_xml(
        ds, to_lines, path,
        header='<?xml version="1.0" encoding="utf-8" ?>\n'
               '<ogr:FeatureCollection '
               'xmlns:ogr="http://ogr.maptools.org/" '
               'xmlns:gml="http://www.opengis.net/gml">\n',
        footer="</ogr:FeatureCollection>\n")


def read_gml_fragments(paths: Union[str, List[str]],
                       properties: Optional[List[str]] = None,
                       **kwargs) -> ray.data.Dataset:
    """Parallel GML read for line-per-featureMember documents (the
    write_gml layout): each line parses independently, wrapped in a
    namespace-declaring root so the gml:/ogr: prefixes bind."""
    from .xml_vectors import _fragment_lines

    props = properties or []
    lines = _fragment_lines(paths, "featureMember", **kwargs)
    wrap = ('<R xmlns:gml="http://www.opengis.net/gml" '
            'xmlns:ogr="http://ogr.maptools.org/">{}</R>')

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"fid": [], "geometry": []}
        pvals = {c: [] for c in props}
        for ln in batch["text"].to_pylist():
            root = ET.fromstring(wrap.format(ln))
            for f in parse_gml_member(root):
                rows["fid"].append(f.get("fid", ""))
                rows["geometry"].append(f.get("geometry"))
                for c in props:
                    pvals[c].append(f.get(c))
        cols = {"fid": pa.array(rows["fid"], pa.string())}
        for c in props:
            cols[c] = pa.array(pvals[c], pa.string())
        cols["geometry"] = pa.array(rows["geometry"], pa.binary())
        return pa.table(cols)

    return lines.map_batches(parse, batch_format="pyarrow")


def parse_gml_member(root) -> List[dict]:
    """Features under any featureMember descendants of `root` (shared
    by the whole-document and fragment parsers)."""
    feats: List[dict] = []
    for fm in root.iter():
        if _strip(fm.tag) not in ("featureMember", "member",
                                  "featureMembers"):
            continue
        for feat_el in fm:
            f: dict = {"fid": ""}
            for k, v in feat_el.attrib.items():
                if _strip(k) == "id":
                    f["fid"] = v
            for prop in feat_el:
                pt = _strip(prop.tag)
                geom_child = next((ch for ch in prop
                                   if _strip(ch.tag) in _GEOM_TAGS), None)
                if _strip(prop.tag) in _GEOM_TAGS:
                    f["geometry"] = gml_geom_to_wkb(prop)
                elif geom_child is not None:
                    f.setdefault("geometry", gml_geom_to_wkb(geom_child))
                else:
                    txt = (prop.text or "").strip()
                    if txt:
                        f[pt] = txt
            feats.append(f)
    return feats
