"""Polygon boolean operations (difference, union, symmetric difference)
for hole-free simple polygons — completes the layer-algebra geometry
set (Erase `ogrlayer.cpp:7665`, Union `:5622`, SymDifference `:6159`)
without GEOS.

Construction: both polygons triangulate (geom/triangulate.py); all
results are unions of convex fragments:

* convex \\ convex — classic decomposition: for each edge i of the
  clipper, fragment_i = piece ∩ outside(edge_i) ∩ inside(edges < i).
  Fragments are disjoint and exactly cover the difference.
* A \\ B — fold: start from A's triangles, subtract every triangle of
  B from every surviving fragment.
* A ∪ B = A + (B \\ A);  A Δ B = (A \\ B) + (B \\ A).

Results are fragmented (disjoint convex pieces as a multipolygon) with
exact area/point-set; a dissolve pass is future work, as in
`pipelines/triangulate` intersection.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import wkb as wkb_mod
from .clip import _clip_halfplane_general
from .triangulate import _signed_area, triangulate_ring

_EPS_AREA = 1e-12


def _dedupe_ring(ring: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate vertices (SH can emit an intersection
    point equal to an existing vertex; a zero-length edge would yield a
    degenerate all-space half-plane)."""
    if len(ring) < 2:
        return ring
    keep = [0]
    for i in range(1, len(ring)):
        if not np.array_equal(ring[i], ring[keep[-1]]):
            keep.append(i)
    return ring[keep]


def _edges_ccw(ring: np.ndarray):
    """Half-plane coefficients (a, b, c) with interior where ax+by+c>=0,
    for a closed convex ring of either orientation."""
    r = _dedupe_ring(ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring)
    if _signed_area(np.vstack([r, r[:1]])) < 0:
        r = r[::-1]
    n = len(r)
    out = []
    for i in range(n):
        x1, y1 = r[i]
        x2, y2 = r[(i + 1) % n]
        a, b = y1 - y2, x2 - x1
        if a == 0.0 and b == 0.0:
            continue  # degenerate edge
        out.append((a, b, x1 * y2 - x2 * y1))
    return out


def convex_difference(piece: np.ndarray, clipper: np.ndarray) -> List[np.ndarray]:
    """piece \\ clipper for convex closed rings → disjoint convex
    fragments (possibly [piece] when disjoint, [] when covered)."""
    frags: List[np.ndarray] = []
    open_piece = piece[:-1] if np.array_equal(piece[0], piece[-1]) else piece
    remaining = _dedupe_ring(open_piece.astype(np.float64))
    for (a, b, c) in _edges_ccw(clipper):
        # fragment outside this edge (and inside all previous edges,
        # which `remaining` already encodes)
        frag = _clip_halfplane_general(remaining, -a, -b, -c)
        if len(frag) >= 3:
            closed = np.vstack([frag, frag[:1]])
            if abs(_signed_area(closed)) > _EPS_AREA:
                frags.append(closed)
        # keep the part inside this edge for the next iteration
        remaining = _clip_halfplane_general(remaining, a, b, c)
        if len(remaining) < 3:
            break
    return frags


def _rings_to_fragments(rings: List[np.ndarray]) -> List[np.ndarray]:
    """Polygon (outer + holes) → disjoint convex fragments: triangulate
    the outer ring, then fold-subtract each hole's triangles."""
    frags = triangulate_ring(rings[0])
    for hole in rings[1:]:
        for th in triangulate_ring(hole):
            nxt: List[np.ndarray] = []
            for f in frags:
                nxt.extend(convex_difference(f, th))
            frags = nxt
            if not frags:
                return frags
    return frags


def _fragments_of(buf: bytes) -> List[np.ndarray]:
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "polygon":
        return _rings_to_fragments(payload)
    if kind == "multipolygon":
        out = []
        for rings in payload:
            out.extend(_rings_to_fragments(rings))
        return out
    raise ValueError(f"expected (multi)polygon, got {kind}")


def _wkb_from_fragments(frags: List[np.ndarray]) -> Optional[bytes]:
    frags = [f for f in frags if abs(_signed_area(f)) > _EPS_AREA]
    if not frags:
        return None
    return wkb_mod.multipolygon_to_wkb([[f] for f in frags])


def polygon_difference(buf_a: bytes, buf_b: bytes) -> Optional[bytes]:
    """A \\ B as a multipolygon of disjoint convex fragments."""
    frags = _fragments_of(buf_a)
    for tb in _fragments_of(buf_b):
        nxt: List[np.ndarray] = []
        for f in frags:
            nxt.extend(convex_difference(f, tb))
        frags = nxt
        if not frags:
            break
    return _wkb_from_fragments(frags)


def polygon_union(buf_a: bytes, buf_b: bytes) -> Optional[bytes]:
    """A ∪ B = A + (B \\ A)."""
    frags = _fragments_of(buf_a)
    b_minus_a = polygon_difference(buf_b, buf_a)
    if b_minus_a is not None:
        _kind, polys = wkb_mod.parse_wkb(b_minus_a)
        frags = frags + [rings[0] for rings in polys]
    return _wkb_from_fragments(frags)


def polygon_symmetric_difference(buf_a: bytes, buf_b: bytes) -> Optional[bytes]:
    """A Δ B = (A \\ B) + (B \\ A)."""
    frags: List[np.ndarray] = []
    for buf in (polygon_difference(buf_a, buf_b), polygon_difference(buf_b, buf_a)):
        if buf is not None:
            _k, polys = wkb_mod.parse_wkb(buf)
            frags.extend(rings[0] for rings in polys)
    return _wkb_from_fragments(frags)
