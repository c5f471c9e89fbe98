"""Exact ISO WKB <-> ISO WKT, full geometry model fidelity.

Unlike `geom/wkb.py` (which deliberately flattens to the 2-D analytic
model and linearizes arcs for the spatial pipelines), this module
round-trips the FULL ISO model: Z / M / ZM dimensions and the extended
types CircularString(8) CompoundCurve(9) CurvePolygon(10)
MultiCurve(11) MultiSurface(12) PolyhedralSurface(15) TIN(16)
Triangle(17).

Parity: OGR's importFromWkt/exportToIsoWkt
(`ogr/ogrgeometry.cpp`, type codes `ogr/ogr_core.h:404-515`); number
formatting matches OGRFormatDouble's %.15g trim so pinned WKT strings
compare byte-equal.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

_NAMES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
          5: "MULTILINESTRING", 6: "MULTIPOLYGON",
          7: "GEOMETRYCOLLECTION", 8: "CIRCULARSTRING",
          9: "COMPOUNDCURVE", 10: "CURVEPOLYGON", 11: "MULTICURVE",
          12: "MULTISURFACE", 15: "POLYHEDRALSURFACE", 16: "TIN",
          17: "TRIANGLE"}
_CODES = {v: k for k, v in _NAMES.items()}

# dimension flag: "" Z M ZM  ->  ISO offset 0 / 1000 / 2000 / 3000
_DIMS = {"": (0, 2), "Z": (1000, 3), "M": (2000, 3), "ZM": (3000, 4)}
_OFF_TO_DIM = {0: "", 1: "Z", 2: "M", 3: "ZM"}

# container member sets (which children each type holds)
_CURVE_KINDS = (2, 8, 9)
_SURFACE_KINDS = (3, 10)


class Geom:
    """A parsed ISO geometry node: (code, dim, payload).

    payload by code:
      1 point           -> (ncoord,) float array (nan-pair = EMPTY)
      2/8 linestring    -> (N, ncoord) array
      3/17 polygon      -> [ring arrays]
      9 compoundcurve   -> [Geom] (code 2 or 8 members)
      10 curvepolygon   -> [Geom] (ring curves)
      4/5/6/7/11/12/15/16 -> [Geom]
    """

    __slots__ = ("code", "dim", "payload")

    def __init__(self, code: int, dim: str, payload):
        self.code = code
        self.dim = dim
        self.payload = payload


def _fmt(v: float) -> str:
    # OGRFormatDouble: %.15g, strip exponent-free trailing zeros
    s = "%.15g" % v
    return s


def _coords_str(a: np.ndarray) -> str:
    return ",".join(" ".join(_fmt(v) for v in row) for row in a)


# --------------------------------------------------------------- WKB in

def parse_iso_wkb(buf: bytes, off: int = 0) -> Tuple[Geom, int]:
    fmt = "<" if buf[off] == 1 else ">"
    (raw,) = struct.unpack_from(fmt + "I", buf, off + 1)
    off += 5
    # EWKB flags or ISO offsets
    zflag = bool(raw & 0x80000000)
    mflag = bool(raw & 0x40000000)
    if raw & 0x20000000:
        off += 4  # skip EWKB SRID
    base = raw & 0x0FFFFFFF
    if not (zflag or mflag):
        iso = base // 1000
        zflag = iso in (1, 3)
        mflag = iso in (2, 3)
    code = base % 1000
    dim = ("Z" if zflag else "") + ("M" if mflag else "")
    ncoord = 2 + int(zflag) + int(mflag)
    if code == 1:
        a = np.frombuffer(buf, fmt + "f8", ncoord, off).copy()
        return Geom(1, dim, a), off + ncoord * 8
    if code in (2, 8):
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        a = np.frombuffer(buf, fmt + "f8", n * ncoord,
                          off).reshape(n, ncoord).copy()
        return Geom(code, dim, a), off + n * ncoord * 8
    if code in (3, 17):
        (nr,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            rings.append(np.frombuffer(buf, fmt + "f8", n * ncoord,
                                       off).reshape(n, ncoord).copy())
            off += n * ncoord * 8
        return Geom(code, dim, rings), off
    # all remaining types hold sub-geometries with their own headers
    (n,) = struct.unpack_from(fmt + "I", buf, off)
    off += 4
    members = []
    for _ in range(n):
        g, off = parse_iso_wkb(buf, off)
        members.append(g)
    return Geom(code, dim, members), off


# -------------------------------------------------------------- WKB out

def geom_to_wkb(g: Geom) -> bytes:
    isooff, _nc = _DIMS[g.dim]
    head = struct.pack("<BI", 1, g.code + isooff)
    if g.code == 1:
        return head + np.asarray(g.payload, np.float64).tobytes()
    if g.code in (2, 8):
        a = np.asarray(g.payload, np.float64)
        return head + struct.pack("<I", len(a)) + a.tobytes()
    if g.code in (3, 17):
        out = [head, struct.pack("<I", len(g.payload))]
        for r in g.payload:
            a = np.asarray(r, np.float64)
            out.append(struct.pack("<I", len(a)))
            out.append(a.tobytes())
        return b"".join(out)
    out = [head, struct.pack("<I", len(g.payload))]
    for m in g.payload:
        out.append(geom_to_wkb(m))
    return b"".join(out)


# -------------------------------------------------------------- WKT out

def _body(g: Geom) -> str:
    """Parenthesized body without the type tag."""
    if g.code == 1:
        a = np.asarray(g.payload)
        if np.isnan(a).all():
            return "EMPTY"
        return "(" + " ".join(_fmt(v) for v in a) + ")"
    if g.code in (2, 8):
        a = np.asarray(g.payload)
        if len(a) == 0:
            return "EMPTY"
        return "(" + _coords_str(a) + ")"
    if g.code in (3, 17):
        if not g.payload:
            return "EMPTY"
        return "(" + ",".join("(" + _coords_str(np.asarray(r)) + ")"
                              for r in g.payload) + ")"
    if not g.payload:
        return "EMPTY"
    parts = []
    for m in g.payload:
        if g.code in (9, 10, 11, 12) and m.code in (2, 3):
            # linear members of curve containers print bare bodies
            parts.append(_body(m))
        elif g.code in (4,):  # multipoint members: bare coords
            parts.append(_body(m))
        elif g.code in (5, 6, 15, 16):
            parts.append(_body(m))
        else:
            parts.append(geom_to_iso_wkt(m))
    return "(" + ",".join(parts) + ")"


def geom_to_iso_wkt(g: Geom) -> str:
    tag = _NAMES[g.code]
    dim = (" " + g.dim) if g.dim else ""
    body = _body(g)
    sep = " " if body else ""
    return f"{tag}{dim}{sep}{body}"


def wkb_to_iso_wkt(buf: bytes) -> str:
    g, _ = parse_iso_wkb(buf)
    return geom_to_iso_wkt(g)


# --------------------------------------------------------------- WKT in

class _Tok:
    def __init__(self, text: str):
        import re

        self.toks = re.findall(r"[A-Za-z]+|[-+0-9.eE]+|\(|\)|,", text)
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        self.i += 1
        return t

    def expect(self, want: str):
        t = self.next()
        if t != want:
            raise ValueError(f"WKT: expected {want!r}, got {t!r}")


def _tok_coords(tk: _Tok, ncoord: int) -> np.ndarray:
    rows = []
    while True:
        row = []
        while tk.peek() not in (",", ")"):
            row.append(float(tk.next()))
        rows.append(row)
        if tk.peek() == ",":
            tk.next()
            continue
        break
    a = np.asarray(rows, np.float64)
    if a.ndim == 2 and a.shape[1] != ncoord:
        raise ValueError(f"WKT: expected {ncoord} coords per point")
    return a


def _tok_ring_list(tk: _Tok, ncoord: int) -> List[np.ndarray]:
    tk.expect("(")
    rings = []
    while True:
        tk.expect("(")
        rings.append(_tok_coords(tk, ncoord))
        tk.expect(")")
        if tk.peek() == ",":
            tk.next()
            continue
        tk.expect(")")
        return rings


def _parse_wkt_geom(tk: _Tok) -> Geom:
    tag = tk.next()
    if tag is None:
        raise ValueError("WKT: empty input")
    code = _CODES[tag.upper()]
    dim = ""
    if tk.peek() is not None and tk.peek().upper() in ("Z", "M", "ZM"):
        dim = tk.next().upper()
    ncoord = _DIMS[dim][1]
    if tk.peek() is not None and tk.peek().upper() == "EMPTY":
        tk.next()
        if code == 1:
            return Geom(1, dim, np.full(ncoord, np.nan))
        if code in (2, 8):
            return Geom(code, dim, np.empty((0, ncoord)))
        return Geom(code, dim, [])
    if code == 1:
        tk.expect("(")
        a = _tok_coords(tk, ncoord)
        tk.expect(")")
        return Geom(1, dim, a[0])
    if code in (2, 8):
        tk.expect("(")
        a = _tok_coords(tk, ncoord)
        tk.expect(")")
        return Geom(code, dim, a)
    if code in (3, 17):
        return Geom(code, dim, _tok_ring_list(tk, ncoord))
    if code in (9, 11):  # compoundcurve/multicurve: curve members,
        tk.expect("(")   # bare bodies mean linestrings
        members = []
        while True:
            if tk.peek() == "(":
                tk.expect("(")
                members.append(Geom(2, dim, _tok_coords(tk, ncoord)))
                tk.expect(")")
            else:
                members.append(_parse_wkt_geom(tk))
            if tk.peek() == ",":
                tk.next()
                continue
            tk.expect(")")
            return Geom(code, dim, members)
    if code in (10, 12):  # curvepolygon/multisurface: surface/ring
        tk.expect("(")    # members, bare ring-lists mean polygons
        members = []
        while True:
            if tk.peek() == "(":
                if code == 10:
                    tk.expect("(")
                    members.append(Geom(2, dim,
                                        _tok_coords(tk, ncoord)))
                    tk.expect(")")
                else:
                    members.append(Geom(3, dim,
                                        _tok_ring_list(tk, ncoord)))
            else:
                members.append(_parse_wkt_geom(tk))
            if tk.peek() == ",":
                tk.next()
                continue
            tk.expect(")")
            return Geom(code, dim, members)
    if code in (4, 5, 6, 15, 16):
        tk.expect("(")
        members = []
        sub = {4: 1, 5: 2, 6: 3, 15: 3, 16: 17}[code]
        while True:
            if tk.peek() == "(":
                if sub == 1:
                    tk.expect("(")
                    members.append(Geom(1, dim,
                                        _tok_coords(tk, ncoord)[0]))
                    tk.expect(")")
                elif sub == 2:
                    tk.expect("(")
                    members.append(Geom(2, dim,
                                        _tok_coords(tk, ncoord)))
                    tk.expect(")")
                else:
                    members.append(Geom(sub, dim,
                                        _tok_ring_list(tk, ncoord)))
            else:  # MULTIPOINT (1 2, 3 4) bare form
                row = []
                while tk.peek() not in (",", ")"):
                    row.append(float(tk.next()))
                members.append(Geom(1, dim, np.asarray(row)))
            if tk.peek() == ",":
                tk.next()
                continue
            tk.expect(")")
            return Geom(code, dim, members)
    if code == 7:
        tk.expect("(")
        members = []
        while True:
            members.append(_parse_wkt_geom(tk))
            if tk.peek() == ",":
                tk.next()
                continue
            tk.expect(")")
            return Geom(7, dim, members)
    raise ValueError(f"WKT: unsupported type {tag}")


def iso_wkt_to_geom(text: str) -> Geom:
    return _parse_wkt_geom(_Tok(text))


def iso_wkt_to_wkb(text: str) -> bytes:
    return geom_to_wkb(iso_wkt_to_geom(text))
