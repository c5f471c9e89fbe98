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


def box_to_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    """Axis-aligned box as a CCW closed polygon ring."""
    ring = np.asarray(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]],
        dtype=np.float64,
    )
    return polygon_to_wkb([ring])


def _parse_geom(buf: bytes, off: int):
    byte_order = buf[off]
    fmt = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(fmt + "I", buf, off + 1)
    gtype = gtype % 1000  # strip Z/M variants (2.5D handled as 2D here)
    off += 5
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(fmt + "dd", buf, off)
        return ("point", np.asarray([[x, y]]), off + 16)
    if gtype == WKB_LINESTRING:
        (npts,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        coords = np.frombuffer(buf, dtype=fmt + "f8", count=npts * 2, offset=off).reshape(npts, 2)
        return ("linestring", coords, off + npts * 16)
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            rings.append(np.frombuffer(buf, dtype=fmt + "f8", count=npts * 2, offset=off).reshape(npts, 2))
            off += npts * 16
        return ("polygon", rings, off)
    if gtype == WKB_MULTIPOLYGON:
        (npolys,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        polys = []
        for _ in range(npolys):
            kind, rings, off = _parse_geom(buf, off)
            assert kind == "polygon"
            polys.append(rings)
        return ("multipolygon", polys, off)
    raise ValueError(f"unsupported WKB geometry type {gtype}")


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
        if kind == "point":
            c = payload
        elif kind == "linestring":
            c = payload
        elif kind == "polygon":
            c = payload[0]
        else:  # multipolygon — outer rings only
            c = np.concatenate([rings[0] for rings in payload])
        out[i, 0] = c[:, 0].min()
        out[i, 1] = c[:, 1].min()
        out[i, 2] = c[:, 0].max()
        out[i, 3] = c[:, 1].max()
    return out
