"""Geometry unary operators: convex hull, segmentize, simplify, buffer.

Reference surface: ``OGRGeometry::ConvexHull`` (`ogr/ogrgeometry.cpp:3896`),
``Simplify`` / ``SimplifyPreserveTopology`` (`:4160`), ``Buffer``
(`:3820`-ish) and ``segmentize`` (`ogr/ogrlinestring.cpp`), which the
reference delegates to GEOS. Re-derived here from the standard public
algorithms:

* convex hull  — Andrew's monotone chain (O(n log n)).
* segmentize   — insert evenly spaced vertices so no segment exceeds
  ``max_length`` (exact OGR semantics: split count = ceil(len/max)-ish
  via floor(len/max); we use ceil so the bound is strict).
* simplify     — Douglas–Peucker on each ring/linestring (GEOS
  Simplify's underlying algorithm). Ring endpoints are preserved; a
  collapsed ring (<4 points) drops, matching GEOS's empty result.
* buffer       — positive-distance round-join buffer as the union of
  per-edge rectangles and per-vertex discs (k-gon with
  ``8·quadsegs``-ish segments, mirroring GEOS's quadrant-segment
  discretization) folded through the exact convex-union machinery
  (geom/boolean.py) and dissolved to a clean multipolygon.

All operate on WKB and return WKB; vectorized stages live in
``stages/geom_ops.py``.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import wkb as wkb_mod
from .boolean import _fragments_of, convex_difference
from .dissolve import dissolve_fragments
from .triangulate import _signed_area


# ---------------------------------------------------------------------------
# convex hull
# ---------------------------------------------------------------------------

def convex_hull_points(pts: np.ndarray) -> np.ndarray:
    """(N,2) points -> closed CCW hull ring (Andrew monotone chain)."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(pts) == 1:
        p = pts[0]
        return np.asarray([p, p, p], dtype=np.float64)
    # lexicographic sort is what np.unique(axis=0) already returns
    def half(seq):
        out: List[np.ndarray] = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)
    return np.vstack([hull, hull[:1]])


def convex_hull_wkb(buf: bytes) -> bytes:
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "point":
        pts = payload
    elif kind == "linestring":
        pts = payload
    elif kind == "polygon":
        pts = np.concatenate(payload)
    else:  # multipolygon
        pts = np.concatenate([r for rings in payload for r in rings])
    hull = convex_hull_points(pts)
    return wkb_mod.polygon_to_wkb([hull])


# ---------------------------------------------------------------------------
# segmentize
# ---------------------------------------------------------------------------

def segmentize_coords(coords: np.ndarray, max_length: float) -> np.ndarray:
    """Insert vertices so every segment is <= max_length (OGR
    ``segmentize`` semantics; existing vertices preserved)."""
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) < 2:
        return coords
    out = [coords[:1]]
    for i in range(1, len(coords)):
        a, b = coords[i - 1], coords[i]
        seg = np.hypot(*(b - a))
        n = max(1, int(np.ceil(seg / max_length)))
        t = np.arange(1, n + 1, dtype=np.float64)[:, None] / n
        out.append(a[None, :] * (1 - t) + b[None, :] * t)
    return np.vstack(out)


def segmentize_wkb(buf: bytes, max_length: float) -> bytes:
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "linestring":
        return wkb_mod.linestring_to_wkb(segmentize_coords(payload, max_length))
    if kind == "polygon":
        return wkb_mod.polygon_to_wkb(
            [segmentize_coords(r, max_length) for r in payload])
    if kind == "multipolygon":
        return wkb_mod.multipolygon_to_wkb(
            [[segmentize_coords(r, max_length) for r in rings]
             for rings in payload])
    return buf  # points are unchanged


# ---------------------------------------------------------------------------
# simplify (Douglas–Peucker)
# ---------------------------------------------------------------------------

def dp_simplify(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker with perpendicular-distance tolerance."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n <= 2:
        return coords
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        a, b = coords[s], coords[e]
        ab = b - a
        seg_len2 = float(ab @ ab)
        sub = coords[s + 1:e]
        if seg_len2 == 0.0:
            d = np.hypot(*(sub - a).T)
        else:
            t = np.clip(((sub - a) @ ab) / seg_len2, 0.0, 1.0)
            proj = a[None, :] + t[:, None] * ab[None, :]
            d = np.hypot(*(sub - proj).T)
        imax = int(np.argmax(d))
        if d[imax] > tol:
            idx = s + 1 + imax
            keep[idx] = True
            stack.append((s, idx))
            stack.append((idx, e))
    return coords[keep]


def simplify_wkb(buf: bytes, tol: float) -> Optional[bytes]:
    """GEOS-Simplify-style DP per ring; rings that collapse drop
    (an all-rings-collapsed polygon returns None = empty)."""
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "linestring":
        return wkb_mod.linestring_to_wkb(dp_simplify(payload, tol))
    if kind == "polygon":
        rings = [dp_simplify(r, tol) for r in payload]
        rings = [r for r in rings if len(r) >= 4]
        if not rings or len(dp_simplify(payload[0], tol)) < 4:
            return None
        return wkb_mod.polygon_to_wkb(rings)
    if kind == "multipolygon":
        polys = []
        for prings in payload:
            rings = [dp_simplify(r, tol) for r in prings]
            if len(rings[0]) >= 4:
                polys.append([r for r in rings if len(r) >= 4])
        if not polys:
            return None
        return wkb_mod.multipolygon_to_wkb(polys)
    return buf


# ---------------------------------------------------------------------------
# buffer
# ---------------------------------------------------------------------------

def _disc(center: np.ndarray, dist: float, k: int) -> np.ndarray:
    ang = np.arange(k, dtype=np.float64) / k * 2.0 * np.pi
    ring = np.stack([center[0] + dist * np.cos(ang),
                     center[1] + dist * np.sin(ang)], axis=1)
    return np.vstack([ring, ring[:1]])


def _edge_rect(a: np.ndarray, b: np.ndarray, dist: float) -> Optional[np.ndarray]:
    d = b - a
    ln = float(np.hypot(*d))
    if ln == 0.0:
        return None
    nx, ny = -d[1] / ln * dist, d[0] / ln * dist
    ring = np.asarray([
        [a[0] + nx, a[1] + ny], [b[0] + nx, b[1] + ny],
        [b[0] - nx, b[1] - ny], [a[0] - nx, a[1] - ny],
    ])
    return np.vstack([ring, ring[:1]])


def _union_fold(pieces: List[np.ndarray]) -> List[np.ndarray]:
    """Union possibly-overlapping convex rings into disjoint fragments:
    piece_i contributes piece_i minus all EARLIER pieces. Subtracting
    the original convex pieces (not accumulated fragments, which can be
    numerically non-convex) keeps every clipper convex, so the
    Sutherland–Hodgman half-plane decomposition stays exact."""
    bboxes = [(p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max())
              for p in pieces]
    frags: List[np.ndarray] = []
    for i, piece in enumerate(pieces):
        add = [piece]
        for j in range(i):
            bj = bboxes[j]
            nxt: List[np.ndarray] = []
            for p in add:
                # bbox pretest: disjoint pieces subtract nothing
                if (p[:, 0].max() < bj[0] or p[:, 0].min() > bj[2]
                        or p[:, 1].max() < bj[1] or p[:, 1].min() > bj[3]):
                    nxt.append(p)
                else:
                    nxt.extend(convex_difference(p, pieces[j]))
            add = nxt
            if not add:
                break
        frags.extend(add)
    return frags


def buffer_wkb(buf: bytes, dist: float, quadsegs: int = 8) -> Optional[bytes]:
    """Positive round-join buffer -> clean multipolygon WKB (GEOS
    ``Buffer(dist, quadsegs)`` analog: vertex arcs discretized at
    4·quadsegs segments per full circle... per GEOS, quadsegs segments
    per quarter). Negative distances are not supported (use
    polygon_difference with an eroded frame instead)."""
    if dist <= 0:
        raise NotImplementedError("negative/zero buffer distance")
    k = max(8, 4 * quadsegs)
    kind, payload = wkb_mod.parse_wkb(buf)
    pieces: List[np.ndarray] = []
    if kind == "point":
        pieces.append(_disc(payload[0], dist, k))
    elif kind == "linestring":
        for p in payload:
            pieces.append(_disc(p, dist, k))
        for i in range(1, len(payload)):
            r = _edge_rect(payload[i - 1], payload[i], dist)
            if r is not None:
                pieces.append(r)
    elif kind in ("polygon", "multipolygon"):
        # interior + edge rectangles + vertex discs of the OUTER rings;
        # holes shrink: hole edges/discs are *subtracted* conceptually —
        # here holes smaller than 2·dist close up because their border
        # pieces flood them (correct round-join semantics for the
        # exterior; hole-side erosion uses the interior fragments minus
        # nothing, so hole boundaries also get buffered outward into the
        # hole, which matches GEOS's positive buffer shrinking holes).
        pieces.extend(_fragments_of(buf))
        polys = [payload] if kind == "polygon" else payload
        for rings in polys:
            for ring in rings:
                closed = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
                for p in closed[:-1]:
                    pieces.append(_disc(p, dist, k))
                for i in range(1, len(closed)):
                    r = _edge_rect(closed[i - 1], closed[i], dist)
                    if r is not None:
                        pieces.append(r)
    else:
        raise ValueError(f"buffer_wkb: unsupported kind {kind}")
    frags = _union_fold(pieces)
    frags = [f for f in frags if abs(_signed_area(f)) > 1e-12]
    if not frags:
        return None
    polys = dissolve_fragments(frags, snap=1e-9)
    if not polys:
        return None
    return wkb_mod.multipolygon_to_wkb(polys)
