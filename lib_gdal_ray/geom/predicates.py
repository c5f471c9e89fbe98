"""Binary spatial predicates for (multi)polygons / points.

Reference surface: the OGRGeometry predicate set (`ogr/ogrgeometry.cpp`
Intersects/Contains/Within/Touches/Overlaps/Disjoint, delegating to
GEOS). Re-derived on the existing exact kernels:

* area predicates use the exact convex-decomposition intersection /
  difference (geom/triangulate.py, geom/boolean.py);
* `touches` = zero shared area but shared boundary (any vertex of one
  on the boundary of the other, or crossing-free edge contact detected
  by segment intersection);
* point-in-polygon uses even-odd ray casting (geom/pip.py).

All operate on WKB pairs; the tolerance `eps` bounds the float noise of
the decomposition (areas below eps count as zero).
"""

from __future__ import annotations

import numpy as np

from . import wkb as wkb_mod
from .pip import points_in_multipolygon
from .triangulate import polygon_intersection_area
from ..stages.geom_ops import wkb_centroid_area

_EPS = 1e-9


def _area(buf: bytes) -> float:
    return wkb_centroid_area(buf)[2]


def _as_polys(buf: bytes):
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "polygon":
        return [payload]
    if kind == "multipolygon":
        return payload
    raise ValueError(f"polygon predicate on {kind}")


def _boundary_points(buf: bytes) -> np.ndarray:
    return np.vstack([np.asarray(r) for rings in _as_polys(buf) for r in rings])


def _any_vertex_on_boundary(buf_a: bytes, buf_b: bytes, tol: float) -> bool:
    """Any vertex of A lying on an edge of B (exact-ish segment test)."""
    pts = _boundary_points(buf_a)
    for rings in _as_polys(buf_b):
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            x1, y1 = r[:-1, 0], r[:-1, 1]
            x2, y2 = r[1:, 0], r[1:, 1]
            for px, py in pts:
                cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                dot = (px - x1) * (px - x2) + (py - y1) * (py - y2)
                if ((np.abs(cross) < tol) & (dot <= tol)).any():
                    return True
    return False


def intersects(buf_a: bytes, buf_b: bytes, eps: float = _EPS) -> bool:
    """Shared area OR boundary contact (OGRGeometry::Intersects)."""
    if polygon_intersection_area(buf_a, buf_b) > eps:
        return True
    return (_any_vertex_on_boundary(buf_a, buf_b, eps)
            or _any_vertex_on_boundary(buf_b, buf_a, eps))


def disjoint(buf_a: bytes, buf_b: bytes, eps: float = _EPS) -> bool:
    return not intersects(buf_a, buf_b, eps)


def contains(buf_a: bytes, buf_b: bytes, eps: float = _EPS) -> bool:
    """A contains B: area(B \\ A) == 0 and B has area (area semantics;
    boundary-touching containment counts, like GEOS covers)."""
    ab = _area(buf_b)
    if ab <= eps:
        return False
    inter = polygon_intersection_area(buf_a, buf_b)
    return abs(inter - ab) <= eps * max(1.0, ab)


def within(buf_a: bytes, buf_b: bytes, eps: float = _EPS) -> bool:
    return contains(buf_b, buf_a, eps)


def overlaps(buf_a: bytes, buf_b: bytes, eps: float = _EPS) -> bool:
    """Shared interior area, but neither contains the other."""
    inter = polygon_intersection_area(buf_a, buf_b)
    if inter <= eps:
        return False
    return not contains(buf_a, buf_b, eps) and not contains(buf_b, buf_a, eps)


def touches(buf_a: bytes, buf_b: bytes, eps: float = _EPS) -> bool:
    """Boundary contact with no shared interior area."""
    if polygon_intersection_area(buf_a, buf_b) > eps:
        return False
    return (_any_vertex_on_boundary(buf_a, buf_b, eps)
            or _any_vertex_on_boundary(buf_b, buf_a, eps))


def point_within(px: float, py: float, buf: bytes) -> bool:
    return bool(points_in_multipolygon(
        np.asarray([px]), np.asarray([py]), _as_polys(buf))[0])
