"""WKB codec in pure numpy.

Geometry columns travel as ISO WKB little-endian `binary` Arrow columns
— GDAL's own Arrow contract (`ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:679-706`,
`CreateSchemaForWKBGeometryColumn`). Supported types in v0: Point (1),
LineString (2), Polygon (3), MultiPolygon (6) — the types the
spatial-join / rasterize / tiling paths need. Serialization layout per
OGC 06-103r4 (same as `ogr/ogr_wkb.cpp`, re-derived from the spec).

Point encode/decode is fully vectorized (fixed 21-byte records);
polygons are parsed per-geometry with vectorized coordinate reads.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

_POINT_SIZE = 21  # 1 byte order + 4 type + 8 x + 8 y


def points_to_wkb(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized encode of N points -> object array of 21-byte WKB."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    buf = np.zeros((n, _POINT_SIZE), dtype=np.uint8)
    buf[:, 0] = 1  # little-endian
    buf[:, 1] = WKB_POINT
    buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    raw = buf.tobytes()
    return np.asarray(
        [raw[i * _POINT_SIZE:(i + 1) * _POINT_SIZE] for i in range(n)], dtype=object
    )


def points_to_wkb_arrow(x: np.ndarray, y: np.ndarray):
    """Vectorized encode of N points -> Arrow binary array, built
    directly from one data buffer + arithmetic offsets (no per-row
    Python bytes objects — the hot path of the doc synthesizer)."""
    import pyarrow as pa

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    buf = np.zeros((n, _POINT_SIZE), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = WKB_POINT
    buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    offsets = np.arange(n + 1, dtype=np.int32) * _POINT_SIZE
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(buf.tobytes())])


def wkb_to_points(wkb: np.ndarray):
    """Vectorized decode of N 21-byte point WKBs -> (x, y) float64 arrays."""
    joined = b"".join(wkb)
    n = len(wkb)
    if len(joined) != n * _POINT_SIZE:
        # Mixed/extended inputs: slow path
        xs = np.empty(n, dtype=np.float64)
        ys = np.empty(n, dtype=np.float64)
        for i, b in enumerate(wkb):
            xs[i], ys[i] = struct.unpack_from("<dd", b, 5)
        return xs, ys
    buf = np.frombuffer(joined, dtype=np.uint8).reshape(n, _POINT_SIZE)
    x = buf[:, 5:13].copy().view(np.float64).ravel()
    y = buf[:, 13:21].copy().view(np.float64).ravel()
    return x, y


def polygon_to_wkb(rings) -> bytes:
    """Encode one polygon: rings = list of (K,2) float64 arrays (closed)."""
    parts = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.ascontiguousarray(ring, dtype=np.float64)
        parts.append(struct.pack("<I", len(ring)))
        parts.append(ring.tobytes())
    return b"".join(parts)


def multipolygon_to_wkb(polygons) -> bytes:
    """polygons = list of list-of-rings."""
    parts = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polygons))]
    for rings in polygons:
        parts.append(polygon_to_wkb(rings))
    return b"".join(parts)


def linestring_to_wkb(coords) -> bytes:
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    return struct.pack("<BII", 1, WKB_LINESTRING, len(coords)) + coords.tobytes()


def point_z_to_wkb(x: float, y: float, z: float) -> bytes:
    """ISO wkbPointZ (type 1001)."""
    return struct.pack("<BIddd", 1, 1001, x, y, z)


def linestring_z_to_wkb(coords) -> bytes:
    """ISO wkbLineStringZ (type 1002); coords (K,3)."""
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    return struct.pack("<BII", 1, 1002, len(coords)) + coords.tobytes()


def multipoint_to_wkb(coords) -> bytes:
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    parts = [struct.pack("<BII", 1, WKB_MULTIPOINT, len(coords))]
    for x, y in coords:
        parts.append(struct.pack("<BIdd", 1, WKB_POINT, x, y))
    return b"".join(parts)


def multilinestring_to_wkb(lines) -> bytes:
    parts = [struct.pack("<BII", 1, 5, len(lines))]
    for c in lines:
        parts.append(linestring_to_wkb(c))
    return b"".join(parts)


def geometrycollection_to_wkb(members) -> bytes:
    """members: list of already-encoded WKB buffers."""
    return struct.pack("<BII", 1, 7, len(members)) + b"".join(members)


def box_to_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    """Axis-aligned box as a CCW closed polygon ring."""
    ring = np.asarray(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]],
        dtype=np.float64,
    )
    return polygon_to_wkb([ring])


WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_GEOMETRYCOLLECTION = 7

# EWKB dimension flags (PostGIS extension; GDAL reads both,
# `ogr/ogr_wkb.cpp` / `ogrgeometryfactory.cpp`)
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _type_dims(raw_type: int):
    """ISO (1000/2000/3000 offsets, `ogr/ogr_core.h:404-515`) or EWKB
    flag decoding -> (base_type, ndims, has_srid)."""
    has_srid = bool(raw_type & _EWKB_SRID)
    ndims = 2
    if raw_type & _EWKB_Z:
        ndims += 1
    if raw_type & _EWKB_M:
        ndims += 1
    base = raw_type & 0x0FFFFFFF
    if ndims == 2:  # ISO offsets
        iso = base // 1000
        ndims += (2 if iso == 3 else 1 if iso in (1, 2) else 0)
    base = base % 1000
    return base, ndims, has_srid


def _read_coords(buf, fmt, off, npts, ndims):
    """Read npts*ndims doubles; return (K,2) xy slice (Z/M dropped —
    2.5D handled as 2D, like OGR's flatten) and next offset.  Set
    module flag `_KEEP_DIMS` (via parse_wkb_z) to keep Z."""
    arr = np.frombuffer(buf, dtype=fmt + "f8", count=npts * ndims,
                        offset=off).reshape(npts, ndims)
    k = ndims if _KEEP_DIMS[0] else 2
    return np.ascontiguousarray(arr[:, :k]), off + npts * ndims * 8


_KEEP_DIMS = [False]


def _parse_geom(buf: bytes, off: int):
    byte_order = buf[off]
    if byte_order in (0x30, 0x31):  # DB2 v7.2 ASCII '0'/'1' variant
        byte_order -= 0x30
    fmt = "<" if byte_order == 1 else ">"
    (raw_type,) = struct.unpack_from(fmt + "I", buf, off + 1)
    gtype, ndims, has_srid = _type_dims(raw_type)
    off += 5
    if has_srid:
        off += 4  # skip EWKB SRID
    if gtype == WKB_POINT:
        coords, off = _read_coords(buf, fmt, off, 1, ndims)
        return ("point", coords, off)
    if gtype == WKB_LINESTRING:
        (npts,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        coords, off = _read_coords(buf, fmt, off, npts, ndims)
        return ("linestring", coords, off)
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            ring, off = _read_coords(buf, fmt, off, npts, ndims)
            rings.append(ring)
        return ("polygon", rings, off)
    if gtype == WKB_MULTIPOINT:
        (npts,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        pts = []
        for _ in range(npts):
            kind, c, off = _parse_geom(buf, off)
            assert kind == "point"
            pts.append(c)
        return ("multipoint", np.concatenate(pts) if pts
                else np.empty((0, 2)), off)
    if gtype == WKB_MULTILINESTRING:
        (nlines,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        lines = []
        for _ in range(nlines):
            kind, c, off = _parse_geom(buf, off)
            assert kind == "linestring"
            lines.append(c)
        return ("multilinestring", lines, off)
    if gtype == WKB_MULTIPOLYGON:
        (npolys,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        polys = []
        for _ in range(npolys):
            kind, rings, off = _parse_geom(buf, off)
            assert kind == "polygon"
            polys.append(rings)
        return ("multipolygon", polys, off)
    if gtype == 8:  # CircularString -> linearized linestring
        (npts,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        coords, off = _read_coords(buf, fmt, off, npts, ndims)
        return ("linestring", linearize_circularstring(coords), off)
    if gtype == 9:  # CompoundCurve -> concatenated linestring
        (ncurves,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        parts = []
        for ci in range(ncurves):
            kind, c, off = _parse_geom(buf, off)
            assert kind == "linestring"
            parts.append(c if ci == 0 else c[1:])
        return ("linestring", np.vstack(parts) if parts
                else np.empty((0, 2)), off)
    if gtype == 10:  # CurvePolygon -> polygon with linearized rings
        (nrings,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            kind, c, off = _parse_geom(buf, off)
            assert kind == "linestring"
            if not np.array_equal(c[0], c[-1]):
                c = np.vstack([c, c[:1]])
            rings.append(c)
        return ("polygon", rings, off)
    if gtype == 11:  # MultiCurve -> multilinestring
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        lines = []
        for _ in range(n):
            kind, c, off = _parse_geom(buf, off)
            assert kind == "linestring"
            lines.append(c)
        return ("multilinestring", lines, off)
    if gtype == 12:  # MultiSurface -> multipolygon
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        polys = []
        for _ in range(n):
            kind, rings, off = _parse_geom(buf, off)
            assert kind == "polygon"
            polys.append(rings)
        return ("multipolygon", polys, off)
    if gtype == WKB_GEOMETRYCOLLECTION:
        (ngeoms,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        members = []
        for _ in range(ngeoms):
            kind, payload, off = _parse_geom(buf, off)
            members.append((kind, payload))
        return ("geometrycollection", members, off)
    raise ValueError(f"unsupported WKB geometry type {raw_type}")


def wkb_point_z(buf: bytes):
    """Z of a point WKB (ISO 1001 / EWKB Z point) or nan — the
    BURN_VALUE_FROM=Z source (`alg/gdalrasterize.cpp:787`)."""
    fmt = "<" if buf[0] == 1 else ">"
    (raw_type,) = struct.unpack_from(fmt + "I", buf, 1)
    gtype, ndims, has_srid = _type_dims(raw_type)
    if gtype != WKB_POINT or ndims < 3:
        return float("nan")
    off = 5 + (4 if has_srid else 0)
    vals = struct.unpack_from(fmt + "d" * ndims, buf, off)
    return float(vals[2])


def collection_polygons(payload):
    """Polygon members of a parsed geometrycollection, as a
    multipolygon-style list of list-of-rings (mixed-type layer support:
    the joiners consume the areal members, matching OGR layer algebra's
    per-geometry type dispatch)."""
    out = []
    for kind, p in payload:
        if kind == "polygon":
            out.append(p)
        elif kind == "multipolygon":
            out.extend(p)
        elif kind == "geometrycollection":
            out.extend(collection_polygons(p))
    return out


def parse_wkb_z(buf: bytes):
    """parse_wkb keeping Z/M columns (coords come back (K,ndims))."""
    _KEEP_DIMS[0] = True
    try:
        return parse_wkb(buf)
    finally:
        _KEEP_DIMS[0] = False


def parse_wkb(buf: bytes):
    """-> (kind, payload). point: (1,2) coords; linestring: (K,2);
    polygon: list of rings; multipolygon: list of list-of-rings."""
    kind, payload, _ = _parse_geom(buf, 0)
    return kind, payload


def wkb_rings(buf: bytes):
    """All polygon rings of a polygon/multipolygon, flattened to
    (outer_ring, [holes...]) pairs list [(rings of poly0), (rings of poly1)...]."""
    kind, payload = parse_wkb(buf)
    if kind == "polygon":
        return [payload]
    if kind == "multipolygon":
        return payload
    raise ValueError(f"expected (multi)polygon, got {kind}")


def wkb_bbox(wkbs) -> np.ndarray:
    """(N,4) [xmin, ymin, xmax, ymax] per geometry (envelope, the stage-1
    filter of GDAL's 3-stage spatial filter funnel, ogrlayer.cpp:3700-3760)."""
    out = np.empty((len(wkbs), 4), dtype=np.float64)
    for i, b in enumerate(wkbs):
        kind, payload = parse_wkb(b)
        if kind in ("point", "linestring", "multipoint"):
            c = payload
        elif kind == "polygon":
            c = payload[0]
        elif kind == "multilinestring":
            c = np.concatenate(payload)
        elif kind == "multipolygon":
            c = np.concatenate([rings[0] for rings in payload])
        else:  # geometrycollection
            c = np.concatenate([_all_coords(k, p) for k, p in payload])
        out[i, 0] = c[:, 0].min()
        out[i, 1] = c[:, 1].min()
        out[i, 2] = c[:, 0].max()
        out[i, 3] = c[:, 1].max()
    return out


def _all_coords(kind, payload) -> np.ndarray:
    if kind in ("point", "linestring", "multipoint"):
        return payload
    if kind == "polygon":
        return payload[0]
    if kind == "multilinestring":
        return np.concatenate(payload)
    if kind == "multipolygon":
        return np.concatenate([rings[0] for rings in payload])
    return np.concatenate([_all_coords(k, p) for k, p in payload])


# ---------------------------------------------------------------------------
# Curved geometry types: parse + linearize (OGR curveToLine analog)
# ---------------------------------------------------------------------------

WKB_CIRCULARSTRING = 8
WKB_COMPOUNDCURVE = 9
WKB_CURVEPOLYGON = 10
WKB_MULTICURVE = 11
WKB_MULTISURFACE = 12

_ARC_STEP_DEG = 4.0  # OGR default OGR_ARC_STEPSIZE (ogr_geometry.h docs)


def _linearize_arc3(p0, p1, p2, step_deg: float) -> np.ndarray:
    """Linearize the circular arc through (p0, p1, p2) — p1 on the arc —
    at `step_deg` maximum angular step (OGRGeometryFactory::curveToLineString
    semantics, re-derived: circumcenter from perpendicular bisectors,
    sweep from p0 through p1 to p2). Collinear points degrade to the
    straight segments."""
    ax, ay = p0
    bx, by = p1
    cx, cy = p2
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-12:
        return np.asarray([p0, p1, p2], dtype=np.float64)
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    r = float(np.hypot(ax - ux, ay - uy))
    a0 = np.arctan2(ay - uy, ax - ux)
    a1 = np.arctan2(by - uy, bx - ux)
    a2 = np.arctan2(cy - uy, cx - ux)
    # choose sweep direction so the path passes through p1
    ccw_mid = (a1 - a0) % (2 * np.pi)
    ccw_end = (a2 - a0) % (2 * np.pi)
    if ccw_mid <= ccw_end:
        sweep = ccw_end  # counter-clockwise
        sign = 1.0
    else:
        sweep = (a0 - a2) % (2 * np.pi)
        sign = -1.0
    nseg = max(2, int(np.ceil(np.degrees(sweep) / step_deg)))
    t = np.linspace(0.0, sweep, nseg + 1)
    ang = a0 + sign * t
    return np.stack([ux + r * np.cos(ang), uy + r * np.sin(ang)], axis=1)


def linearize_circularstring(coords: np.ndarray,
                             step_deg: float = _ARC_STEP_DEG) -> np.ndarray:
    """(2k+1, 2) control points -> linearized linestring coords."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 3:
        return coords
    parts = []
    for i in range(0, len(coords) - 2, 2):
        seg = _linearize_arc3(coords[i], coords[i + 1], coords[i + 2], step_deg)
        parts.append(seg if i == 0 else seg[1:])
    return np.vstack(parts)


def wkb_geom_type(buf: bytes) -> int:
    """Flattened base type id of the root geometry (OGR
    wkbFlatten analog) — curve types are 8..12."""
    byte_order = buf[0]
    if byte_order in (0x30, 0x31):
        byte_order -= 0x30
    fmt = "<" if byte_order == 1 else ">"
    (raw_type,) = struct.unpack_from(fmt + "I", buf, 1)
    base, _nd, _srid = _type_dims(raw_type)
    return base


def parse_wkb_curved(buf: bytes, off: int = 0):
    """Curve-PRESERVING structured parse (no linearization): returns
    (kind, payload) where curve kinds are "circularstring" (coords),
    "compoundcurve" (list of (kind, coords) members), "curvepolygon"
    (list of (kind, payload) rings), "multicurve" / "multisurface"
    (lists of members). Non-curved kinds parse as in parse_wkb. Used
    by the WKT writer and format sinks that keep curves intact
    (reference curve classes `ogr/ogr_geometry.h`)."""
    kind, payload, _off = _parse_geom_curved(buf, off)
    return kind, payload


def _parse_geom_curved(buf: bytes, off: int):
    byte_order = buf[off]
    if byte_order in (0x30, 0x31):
        byte_order -= 0x30
    fmt = "<" if byte_order == 1 else ">"
    (raw_type,) = struct.unpack_from(fmt + "I", buf, off + 1)
    gtype, ndims, has_srid = _type_dims(raw_type)
    if gtype not in (8, 9, 10, 11, 12):
        return _parse_geom(buf, off)
    o = off + 5 + (4 if has_srid else 0)
    if gtype == WKB_CIRCULARSTRING:
        (npts,) = struct.unpack_from(fmt + "I", buf, o)
        o += 4
        coords, o = _read_coords(buf, fmt, o, npts, ndims)
        return ("circularstring", coords, o)
    (n,) = struct.unpack_from(fmt + "I", buf, o)
    o += 4
    members = []
    for _ in range(n):
        kind, payload, o = _parse_geom_curved(buf, o)
        members.append((kind, payload))
    name = {9: "compoundcurve", 10: "curvepolygon",
            11: "multicurve", 12: "multisurface"}[gtype]
    return (name, members, o)


def multicurve_to_wkb(members) -> bytes:
    """members: list of curve WKBs (linestring/circular/compound)."""
    return struct.pack("<BII", 1, WKB_MULTICURVE,
                       len(members)) + b"".join(members)


def multisurface_to_wkb(members) -> bytes:
    """members: list of surface WKBs (polygon/curvepolygon)."""
    return struct.pack("<BII", 1, WKB_MULTISURFACE,
                       len(members)) + b"".join(members)


def circularstring_to_wkb(coords) -> bytes:
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    return struct.pack("<BII", 1, WKB_CIRCULARSTRING, len(coords)) + coords.tobytes()


def curvepolygon_to_wkb(members) -> bytes:
    """members: list of already-encoded ring WKBs (linestring or
    circularstring)."""
    return struct.pack("<BII", 1, WKB_CURVEPOLYGON, len(members)) + b"".join(members)


def compoundcurve_to_wkb(members) -> bytes:
    return struct.pack("<BII", 1, WKB_COMPOUNDCURVE, len(members)) + b"".join(members)


def transform_wkb(buf: bytes, fn) -> bytes:
    """Apply a coordinate transform fn(x_array, y_array) -> (nx, ny) to
    every vertex of a 2-D WKB geometry, rebuilding the same type
    (OGRGeometry::transform analog for the SFA core types; Z/M are
    dropped by the rebuild — the engine carries 2-D geometry columns)."""
    kind, payload = parse_wkb(buf)

    def tx(coords: np.ndarray) -> np.ndarray:
        c = np.asarray(coords, dtype=np.float64)
        nx, ny = fn(c[:, 0].copy(), c[:, 1].copy())
        return np.stack([np.asarray(nx, dtype=np.float64),
                         np.asarray(ny, dtype=np.float64)], axis=1)

    if kind == "point":
        c = tx(payload)
        return points_to_wkb(c[:, 0], c[:, 1])[0]
    if kind == "linestring":
        return linestring_to_wkb(tx(payload))
    if kind == "polygon":
        return polygon_to_wkb([tx(r) for r in payload])
    if kind == "multipolygon":
        return multipolygon_to_wkb([[tx(r) for r in rings]
                                    for rings in payload])
    if kind == "multipoint":
        c = tx(payload)
        return multipoint_to_wkb(c)
    if kind == "multilinestring":
        return multilinestring_to_wkb([tx(c) for c in payload])
    raise ValueError(f"transform_wkb: unsupported kind {kind}")
