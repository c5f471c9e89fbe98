"""Ear-clipping triangulation and general polygon∩polygon intersection.

Reference semantics target: OGR layer-algebra Intersection for
arbitrary simple polygons (`ogrlayer.cpp:5384` delegates to GEOS).
Without GEOS, the exact-area equivalent is computed by convex
decomposition: triangulate both simple polygons (ear clipping, per
standard computational-geometry references — e.g. de Berg et al.), then
intersect every triangle pair with the convex Sutherland–Hodgman
clipper (`geom/clip.py`). Because the triangles partition each input,
the pairwise intersections partition A∩B exactly — the result is a
(fragmented but disjoint) multipolygon with the correct area and
point-set; a dissolve pass can merge fragments later.

Limitations (documented): simple polygons without holes (raise
otherwise); O(Ta·Tb) pairs — fine for feature-sized polygons.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import wkb as wkb_mod
from .clip import clip_ring_to_convex


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return float((x * y1 - x1 * y).sum() / 2.0)


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c) -> bool:
    d1 = _cross(p, a, b)
    d2 = _cross(p, b, c)
    d3 = _cross(p, c, a)
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def triangulate_ring(ring: np.ndarray) -> List[np.ndarray]:
    """Simple closed ring → list of (4,2) closed triangle rings
    (ear clipping; input may be CW or CCW)."""
    pts = [tuple(p) for p in (ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring)]
    if len(pts) < 3:
        return []
    if _signed_area(np.asarray(pts + [pts[0]])) < 0:
        pts = pts[::-1]  # normalize to CCW
    tris: List[np.ndarray] = []
    guard = 0
    while len(pts) > 3 and guard < 10000:
        guard += 1
        n = len(pts)
        clipped = False
        for i in range(n):
            a, b, c = pts[(i - 1) % n], pts[i], pts[(i + 1) % n]
            if _cross(a, b, c) <= 0:
                continue  # reflex or collinear — not an ear
            ear = True
            for j in range(n):
                if j in ((i - 1) % n, i, (i + 1) % n):
                    continue
                if _point_in_tri(pts[j], a, b, c):
                    ear = False
                    break
            if ear:
                tris.append(np.asarray([a, b, c, a], dtype=np.float64))
                pts.pop(i)
                clipped = True
                break
        if not clipped:
            # degenerate (collinear runs); drop a collinear vertex
            for i in range(n):
                a, b, c = pts[(i - 1) % n], pts[i], pts[(i + 1) % n]
                if _cross(a, b, c) == 0:
                    pts.pop(i)
                    clipped = True
                    break
            if not clipped:
                break
    if len(pts) == 3:
        tris.append(np.asarray(pts + [pts[0]], dtype=np.float64))
    return tris


def intersect_simple_polygons(buf_a: bytes, buf_b: bytes) -> Optional[bytes]:
    """General simple-polygon intersection (incl. holes, multipolygons)
    → multipolygon WKB of disjoint convex fragments, or None if empty."""
    from .boolean import _fragments_of  # deferred: boolean imports this module

    tris_a = _fragments_of(buf_a)
    tris_b = _fragments_of(buf_b)
    pieces: List[List[np.ndarray]] = []
    for ta in tris_a:
        for tb in tris_b:
            c = clip_ring_to_convex(ta, tb)
            if c is not None and abs(_signed_area(c)) > 1e-12:
                pieces.append([c])
    if not pieces:
        return None
    return wkb_mod.multipolygon_to_wkb(pieces)


def polygon_intersection_area(buf_a: bytes, buf_b: bytes) -> float:
    out = intersect_simple_polygons(buf_a, buf_b)
    if out is None:
        return 0.0
    from ..stages.geom_ops import wkb_centroid_area

    return wkb_centroid_area(out)[2]
