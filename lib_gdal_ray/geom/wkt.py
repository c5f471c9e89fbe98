"""WKT (Well-Known Text) geometry codec.

OGR core API parity: `OGRGeometryFactory::createFromWkt` /
`OGRGeometry::exportToWkt` (reference `ogr/ogrgeometryfactory.cpp`,
`ogr/ogrgeometry.cpp`) — re-derived from the SFA-SQL grammar on top of
this repo's WKB structures (`geom/wkb.py parse_wkb` shapes). Supports
POINT / LINESTRING / POLYGON / MULTIPOINT / MULTILINESTRING /
MULTIPOLYGON / GEOMETRYCOLLECTION, EMPTY, and Z coordinates on point
and linestring (the same Z surface the WKB layer carries).

Numbers format with %.17g-equivalent shortest-roundtrip (`repr`),
integers without a trailing '.0' — so parse(format(g)) is bit-exact.
"""

from __future__ import annotations

import re

import numpy as np

from . import wkb as wkb_mod

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"
_TOKEN = re.compile(r"\s*([A-Za-z]+|\(|\)|,|" + _NUM + r")")


def _fmt(v: float) -> str:
    f = float(v)
    return str(int(f)) if f.is_integer() and abs(f) < 1e15 else repr(f)


def _fmt_coords(coords) -> str:
    a = np.asarray(coords, dtype=np.float64)
    if a.ndim == 1:
        a = a[None, :]
    return ", ".join(" ".join(_fmt(v) for v in pt) for pt in a)


def _ring_str(rings) -> str:
    return ", ".join(f"({_fmt_coords(r)})" for r in rings)


def wkb_to_wkt(buf: bytes) -> str:
    """WKB bytes -> WKT string.

    The engine's WKB parse flattens Z/M to 2-D (OGR-flatten semantics,
    `geom/wkb.py _read_coords`); POINT Z is special-cased back through
    `wkb_point_z` so point elevation survives the text round-trip."""
    if wkb_mod.wkb_geom_type(buf) in (8, 9, 10, 11, 12):
        kind, payload = wkb_mod.parse_wkb_curved(buf)
        return _curve_to_wkt(kind, payload)
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "point":
        z = wkb_mod.wkb_point_z(buf)
        if z == z:  # not nan -> 3-D point
            a = np.asarray(payload, dtype=np.float64)
            return (f"POINT Z ({_fmt(a[0, 0])} {_fmt(a[0, 1])} {_fmt(z)})")
    return _geom_to_wkt(kind, payload)


def _curve_to_wkt(kind: str, payload, bare: bool = False) -> str:
    """Curve kinds -> OGR-style WKT. ``bare`` drops the LINESTRING tag
    inside COMPOUNDCURVE/CURVEPOLYGON/MULTICURVE members and the
    CURVEPOLYGON tag for plain polygons inside MULTISURFACE — OGR's
    exportToWkt convention (`autotest/ogr/ogr_geom.py` curve cases)."""
    if kind == "circularstring":
        a = np.asarray(payload, dtype=np.float64)
        if a.size == 0:
            return "CIRCULARSTRING EMPTY"
        return f"CIRCULARSTRING{_zsuffix(a)} ({_fmt_coords(a)})"
    if kind == "linestring":
        a = np.asarray(payload, dtype=np.float64)
        return (f"({_fmt_coords(a)})" if bare
                else f"LINESTRING ({_fmt_coords(a)})")
    if kind == "compoundcurve":
        if not payload:
            return "COMPOUNDCURVE EMPTY"
        inner = ", ".join(_curve_to_wkt(k, p, bare=True)
                          for k, p in payload)
        return f"COMPOUNDCURVE ({inner})"
    if kind == "curvepolygon":
        if not payload:
            return "CURVEPOLYGON EMPTY"
        inner = ", ".join(_curve_to_wkt(k, p, bare=True)
                          for k, p in payload)
        return f"CURVEPOLYGON ({inner})"
    if kind == "multicurve":
        if not payload:
            return "MULTICURVE EMPTY"
        inner = ", ".join(_curve_to_wkt(k, p, bare=True)
                          for k, p in payload)
        return f"MULTICURVE ({inner})"
    if kind == "multisurface":
        if not payload:
            return "MULTISURFACE EMPTY"
        parts = []
        for k, p in payload:
            if k == "polygon":
                parts.append(f"({_ring_str(p)})")
            else:
                parts.append(_curve_to_wkt(k, p))
        return "MULTISURFACE (" + ", ".join(parts) + ")"
    if kind == "polygon":
        return f"({_ring_str(payload)})" if bare \
            else f"POLYGON ({_ring_str(payload)})"
    return _geom_to_wkt(kind, payload)


def _zsuffix(coords) -> str:
    a = np.asarray(coords if not isinstance(coords, list) else coords[0],
                   dtype=np.float64)
    if a.ndim == 1:
        a = a[None, :]
    return " Z" if a.shape[1] >= 3 else ""


def _geom_to_wkt(kind: str, payload) -> str:
    if kind == "point":
        a = np.asarray(payload, dtype=np.float64)
        if a.size == 0:
            return "POINT EMPTY"
        return f"POINT{_zsuffix(a)} ({_fmt_coords(a)})"
    if kind == "linestring":
        a = np.asarray(payload, dtype=np.float64)
        if a.size == 0:
            return "LINESTRING EMPTY"
        return f"LINESTRING{_zsuffix(a)} ({_fmt_coords(a)})"
    if kind == "polygon":
        if not payload:
            return "POLYGON EMPTY"
        return f"POLYGON ({_ring_str(payload)})"
    if kind == "multipoint":
        a = np.asarray(payload, dtype=np.float64)
        if a.size == 0:
            return "MULTIPOINT EMPTY"
        return "MULTIPOINT (" + ", ".join(f"({_fmt_coords(p)})" for p in a) + ")"
    if kind == "multilinestring":
        if not payload:
            return "MULTILINESTRING EMPTY"
        return f"MULTILINESTRING ({_ring_str(payload)})"
    if kind == "multipolygon":
        if not payload:
            return "MULTIPOLYGON EMPTY"
        return "MULTIPOLYGON (" + ", ".join(
            f"({_ring_str(rings)})" for rings in payload) + ")"
    if kind == "geometrycollection":
        if not payload:
            return "GEOMETRYCOLLECTION EMPTY"
        return "GEOMETRYCOLLECTION (" + ", ".join(
            _geom_to_wkt(k, p) for k, p in payload) + ")"
    raise ValueError(f"cannot format geometry kind {kind!r}")


class _Tokens:
    def __init__(self, text: str):
        self.toks = _TOKEN.findall(text)
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of WKT")
        self.pos += 1
        return t

    def expect(self, want: str):
        t = self.next()
        if t != want:
            raise ValueError(f"expected {want!r}, got {t!r}")
        return t


def _parse_coords(tk: _Tokens) -> np.ndarray:
    tk.expect("(")
    pts = []
    while True:
        pt = []
        while tk.peek() not in (",", ")"):
            pt.append(float(tk.next()))
        pts.append(pt)
        if tk.next() == ")":
            break
    width = max(len(p) for p in pts)
    a = np.full((len(pts), width), np.nan)
    for i, p in enumerate(pts):
        a[i, :len(p)] = p
    return a


def _parse_ring_list(tk: _Tokens):
    tk.expect("(")
    rings = []
    while True:
        rings.append(_parse_coords(tk))
        if tk.next() == ")":
            break
    return rings


def _coords_to_point_wkb(a: np.ndarray) -> bytes:
    if a.shape[1] >= 3:
        return wkb_mod.point_z_to_wkb(a[0, 0], a[0, 1], a[0, 2])
    return wkb_mod.points_to_wkb(a[:1, 0], a[:1, 1])[0]


def _parse_geometry(tk: _Tokens) -> bytes:
    tag = tk.next().upper()
    if tk.peek() is not None and tk.peek().upper() in ("Z", "M", "ZM"):
        tk.next()  # dims are inferred from coordinate width
    if tk.peek() is not None and tk.peek().upper() == "EMPTY":
        tk.next()
        if tag == "POLYGON":
            return wkb_mod.polygon_to_wkb([])
        if tag == "MULTIPOLYGON":
            return wkb_mod.multipolygon_to_wkb([])
        if tag == "MULTILINESTRING":
            return wkb_mod.multilinestring_to_wkb([])
        if tag == "MULTIPOINT":
            return wkb_mod.multipoint_to_wkb(np.empty((0, 2)))
        if tag == "GEOMETRYCOLLECTION":
            return wkb_mod.geometrycollection_to_wkb([])
        if tag == "LINESTRING":
            return wkb_mod.linestring_to_wkb(np.empty((0, 2)))
        if tag == "CIRCULARSTRING":
            return wkb_mod.circularstring_to_wkb(np.empty((0, 2)))
        if tag == "COMPOUNDCURVE":
            return wkb_mod.compoundcurve_to_wkb([])
        if tag == "CURVEPOLYGON":
            return wkb_mod.curvepolygon_to_wkb([])
        if tag == "MULTICURVE":
            return wkb_mod.multicurve_to_wkb([])
        if tag == "MULTISURFACE":
            return wkb_mod.multisurface_to_wkb([])
        raise ValueError(f"{tag} EMPTY not representable")
    if tag == "POINT":
        return _coords_to_point_wkb(_parse_coords(tk))
    if tag == "LINESTRING":
        a = _parse_coords(tk)
        return (wkb_mod.linestring_z_to_wkb(a) if a.shape[1] >= 3
                else wkb_mod.linestring_to_wkb(a))
    if tag == "POLYGON":
        return wkb_mod.polygon_to_wkb([r[:, :2] for r in _parse_ring_list(tk)])
    if tag == "MULTIPOINT":
        tk.expect("(")
        pts = []
        while True:
            if tk.peek() == "(":
                pts.append(_parse_coords(tk)[0])
            else:  # bare "x y" form is also legal WKT
                pt = []
                while tk.peek() not in (",", ")"):
                    pt.append(float(tk.next()))
                pts.append(np.asarray(pt))
            if tk.next() == ")":
                break
        return wkb_mod.multipoint_to_wkb(np.vstack([p[:2] for p in pts]))
    if tag == "MULTILINESTRING":
        return wkb_mod.multilinestring_to_wkb(
            [r[:, :2] for r in _parse_ring_list(tk)])
    if tag == "MULTIPOLYGON":
        tk.expect("(")
        polys = []
        while True:
            polys.append([r[:, :2] for r in _parse_ring_list(tk)])
            if tk.next() == ")":
                break
        return wkb_mod.multipolygon_to_wkb(polys)
    if tag == "GEOMETRYCOLLECTION":
        tk.expect("(")
        members = []
        while True:
            members.append(_parse_geometry(tk))
            if tk.next() == ")":
                break
        return wkb_mod.geometrycollection_to_wkb(members)
    if tag == "CIRCULARSTRING":
        return wkb_mod.circularstring_to_wkb(_parse_coords(tk)[:, :2])
    if tag in ("COMPOUNDCURVE", "CURVEPOLYGON", "MULTICURVE"):
        tk.expect("(")
        members = []
        while True:
            if tk.peek() == "(":     # bare coord list = LINESTRING
                members.append(wkb_mod.linestring_to_wkb(
                    _parse_coords(tk)[:, :2]))
            else:
                members.append(_parse_geometry(tk))
            if tk.next() == ")":
                break
        maker = {"COMPOUNDCURVE": wkb_mod.compoundcurve_to_wkb,
                 "CURVEPOLYGON": wkb_mod.curvepolygon_to_wkb,
                 "MULTICURVE": wkb_mod.multicurve_to_wkb}[tag]
        return maker(members)
    if tag == "MULTISURFACE":
        tk.expect("(")
        members = []
        while True:
            if tk.peek() == "(":     # bare ring list = POLYGON
                members.append(wkb_mod.polygon_to_wkb(
                    [r[:, :2] for r in _parse_ring_list(tk)]))
            else:
                members.append(_parse_geometry(tk))
            if tk.next() == ")":
                break
        return wkb_mod.multisurface_to_wkb(members)
    raise ValueError(f"unsupported WKT type {tag!r}")


def wkt_to_wkb(text: str, strict: bool = False) -> bytes:
    """WKT string -> WKB bytes (little-endian ISO).

    Trailing text after the geometry is ignored by default —
    OGR's importFromWkt leaves its cursor there rather than failing
    (the reference's own wkb_wkt corpus carries such strays);
    strict=True restores the hard error."""
    tk = _Tokens(text)
    out = _parse_geometry(tk)
    if strict and tk.peek() is not None:
        raise ValueError(f"trailing tokens in WKT: {tk.toks[tk.pos:]}")
    return out
