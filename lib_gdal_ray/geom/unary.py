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


# ---------------------------------------------------------------------------
# Delaunay triangulation / concave hull / wrap-dateline
# ---------------------------------------------------------------------------

def _vertex_set(buf: bytes) -> np.ndarray:
    """All unique 2-D vertices of any geometry (hole rings included),
    lexicographically sorted — the point set OGR feeds GEOS for
    DelaunayTriangulation / ConcaveHull."""

    def coords(kind, payload):
        if kind in ("point", "linestring", "multipoint"):
            return [payload]
        if kind == "polygon":
            return list(payload)
        if kind == "multilinestring":
            return list(payload)
        if kind == "multipolygon":
            return [r for rings in payload for r in rings]
        return [c for k, p in payload for c in coords(k, p)]

    kind, payload = wkb_mod.parse_wkb(buf)
    pts = np.concatenate(coords(kind, payload)).astype(np.float64)[:, :2]
    return np.unique(pts, axis=0)


def delaunay_triangles(buf: bytes):
    """-> (pts (n,2), tris (m,3) int64) Delaunay triangulation of the
    geometry's vertex set (``OGRGeometry::DelaunayTriangulation``,
    `ogr/ogrgeometry.cpp:4374`, which delegates to GEOS; re-derived via
    the Bowyer-Watson build in geom/delaunay.py). Deterministic: rows
    sorted."""
    from .delaunay import delaunay as _bw

    pts = _vertex_set(buf)
    return pts, _bw(pts[:, 0], pts[:, 1])


def delaunay_triangulation_wkb(buf: bytes, only_edges: bool = False) -> bytes:
    """GEOS-style DelaunayTriangulation: GeometryCollection of CCW
    triangle polygons (or a MultiLineString of the unique edges when
    ``only_edges``)."""
    pts, tris = delaunay_triangles(buf)
    if only_edges:
        ek = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [0, 2]]])
        ek = np.unique(np.sort(ek, axis=1), axis=0)
        return wkb_mod.multilinestring_to_wkb(
            [pts[[a, b]] for a, b in ek])
    members = []
    for t in tris:
        ring = pts[t]
        if _signed_area(np.vstack([ring, ring[:1]])) < 0:
            ring = ring[::-1]
        members.append(("polygon", [np.vstack([ring, ring[:1]])]))
    return wkb_mod.geometrycollection_to_wkb(
        [wkb_mod.polygon_to_wkb(p) for _, p in members])


def concave_hull_wkb(buf: bytes, ratio: float = 0.5) -> bytes:
    """Concave hull by edge-length ratio (``OGR_G_ConcaveHull`` /
    GEOS ``concaveHullByLengthRatio``; chi-shape erosion, Duckham et
    al. 2008): Delaunay-triangulate the vertex set, then repeatedly
    remove the boundary triangle with the longest boundary edge while
    that edge exceeds ``minLen + ratio·(maxLen − minLen)`` (lengths over
    all triangulation edges) and removal keeps every input point on or
    inside the hull (only triangles with exactly ONE boundary edge whose
    opposite vertex is interior are removable). Returns polygon WKB;
    ratio=1 degenerates to the convex hull."""
    import heapq

    pts, tris = delaunay_triangles(buf)
    if len(tris) == 0:
        return convex_hull_wkb(buf)
    # edge -> list of adjacent live triangle ids
    edge_tris: dict = {}
    for ti, t in enumerate(tris):
        for e in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2])):
            edge_tris.setdefault((int(min(e)), int(max(e))), []).append(ti)
    lens = {e: float(np.hypot(*(pts[e[0]] - pts[e[1]]))) for e in edge_tris}
    lo, hi = min(lens.values()), max(lens.values())
    thresh = lo + float(ratio) * (hi - lo)
    live = np.ones(len(tris), dtype=bool)
    border = [(-l, e) for e, l in lens.items()
              if len(edge_tris[e]) == 1 and l > thresh]
    heapq.heapify(border)

    def boundary_edge_count(ti):
        t = tris[ti]
        return sum(1 for e in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2]))
                   if len(edge_tris[(int(min(e)), int(max(e)))]) == 1)

    def on_boundary(v):
        # vertex v lies on the current hull boundary
        return any(len(ts) == 1 and v in e
                   for e, ts in edge_tris.items() if v in e)

    while border:
        negl, e = heapq.heappop(border)
        ts = edge_tris.get(e, [])
        if len(ts) != 1 or not live[ts[0]]:
            continue  # stale heap entry
        ti = ts[0]
        if -negl <= thresh:
            continue
        if boundary_edge_count(ti) != 1:
            continue  # ear triangle: removal would orphan a point
        t = tris[ti]
        opp = int([v for v in t if v not in e][0])
        if on_boundary(opp):
            continue  # removal would pinch the hull at opp
        live[ti] = False
        edge_tris[e].remove(ti)
        if not edge_tris[e]:
            del edge_tris[e]
        for v in (e[0], e[1]):
            ne = (min(int(v), opp), max(int(v), opp))
            edge_tris[ne].remove(ti)
            if len(edge_tris[ne]) == 1 and lens[ne] > thresh:
                heapq.heappush(border, (-lens[ne], ne))

    # stitch remaining boundary edges into the hull ring
    nbr: dict = {}
    for e, ts in edge_tris.items():
        if len(ts) == 1:
            nbr.setdefault(e[0], []).append(e[1])
            nbr.setdefault(e[1], []).append(e[0])
    start = min(nbr)
    ring_idx = [start]
    prev, cur = -1, start
    while True:
        nxt = [v for v in nbr[cur] if v != prev]
        if not nxt:
            break
        prev, cur = cur, nxt[0]
        if cur == start:
            break
        ring_idx.append(cur)
    ring = pts[np.asarray(ring_idx, dtype=np.int64)]
    ring = np.vstack([ring, ring[:1]])
    if _signed_area(ring) < 0:
        ring = ring[::-1]
    return wkb_mod.polygon_to_wkb([ring])


def wrap_dateline_wkb(buf: bytes, offset: float = 10.0):
    """``OGRGeometryFactory::transformWithOptions(WRAPDATELINE=YES)``
    (`ogr/ogrgeometryfactory.cpp` splitGeometryCrossingDateline):
    geometries whose longitudes touch both the +180−offset and
    −180+offset margins are treated as dateline-crossing; negative
    longitudes are unwrapped by +360, the geometry is cut at lon=180,
    and the eastern piece is shifted back by −360. Non-crossing
    geometries pass through unchanged. Returns WKB (multi geometry when
    split)."""
    from .clip import clip_wkb_to_box

    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "point":
        x, y = payload[0]
        if x > 180.0:
            return _point_wkb(x - 360.0, y)
        if x < -180.0:
            return _point_wkb(x + 360.0, y)
        return buf
    coords = wkb_mod._all_coords(kind, payload)
    xs = coords[:, 0]
    crosses = (xs.max() > 180.0 - offset) and (xs.min() < -180.0 + offset)
    if not crosses:
        return buf

    def unwrap(arr: np.ndarray) -> np.ndarray:
        a = arr.astype(np.float64).copy()
        a[a[:, 0] < 0.0, 0] += 360.0
        return a

    BIG = 1e9
    if kind in ("linestring", "multilinestring"):
        parts = [payload] if kind == "linestring" else list(payload)
        out = []
        for p in parts:
            u = unwrap(p)
            west = clip_wkb_to_box(wkb_mod.linestring_to_wkb(u),
                                   -BIG, -BIG, 180.0, BIG)
            east = clip_wkb_to_box(wkb_mod.linestring_to_wkb(u),
                                   180.0, -BIG, BIG, BIG)
            if west is not None:
                out.append(wkb_mod.parse_wkb(west)[1])
            if east is not None:
                e = wkb_mod.parse_wkb(east)[1].copy()
                e[:, 0] -= 360.0
                out.append(e)
        return wkb_mod.multilinestring_to_wkb(out)
    if kind in ("polygon", "multipolygon"):
        polys = [payload] if kind == "polygon" else list(payload)
        out_polys = []
        for rings in polys:
            u = [unwrap(r) for r in rings]
            for xmin, xmax, shift in ((-BIG, 180.0, 0.0), (180.0, BIG, -360.0)):
                w = clip_wkb_to_box(wkb_mod.polygon_to_wkb(u),
                                    xmin, -BIG, xmax, BIG)
                if w is None:
                    continue
                k2, p2 = wkb_mod.parse_wkb(w)
                for rr in ([p2] if k2 == "polygon" else p2):
                    shifted = [r.copy() for r in rr]
                    for r in shifted:
                        r[:, 0] += shift
                    out_polys.append(shifted)
        return wkb_mod.multipolygon_to_wkb(out_polys)
    raise ValueError(f"wrap_dateline_wkb: unsupported kind {kind}")


def _point_wkb(x: float, y: float) -> bytes:
    import struct
    return struct.pack("<BIdd", 1, 1, x, y)


def _rebuild_wkb(kind: str, payload):
    """(kind, payload) from parse_wkb -> ISO WKB bytes."""
    from . import wkb as W

    if kind == "point":
        return W.points_to_wkb(np.asarray([payload[0, 0]]),
                               np.asarray([payload[0, 1]]))[0]
    if kind == "linestring":
        return W.linestring_to_wkb(np.asarray(payload, dtype=np.float64))
    if kind == "polygon":
        return W.polygon_to_wkb([np.asarray(r, dtype=np.float64)
                                 for r in payload])
    if kind == "multipoint":
        return W.multipoint_to_wkb(np.asarray(payload, dtype=np.float64))
    if kind == "multilinestring":
        return W.multilinestring_to_wkb(
            [np.asarray(p, dtype=np.float64) for p in payload])
    if kind == "multipolygon":
        return W.multipolygon_to_wkb(
            [[np.asarray(r, dtype=np.float64) for r in poly]
             for poly in payload])
    if kind == "geometrycollection":
        return W.geometrycollection_to_wkb(
            [_rebuild_wkb(k, p) for k, p in payload])
    raise ValueError(f"cannot rebuild {kind}")


def _swap_payload(kind: str, payload):
    if kind in ("point", "linestring", "multipoint"):
        return np.asarray(payload, dtype=np.float64)[:, ::-1]
    if kind in ("polygon", "multilinestring"):
        return [np.asarray(p, dtype=np.float64)[:, ::-1] for p in payload]
    if kind == "multipolygon":
        return [[np.asarray(r, dtype=np.float64)[:, ::-1] for r in poly]
                for poly in payload]
    if kind == "geometrycollection":
        return [(k, _swap_payload(k, p)) for k, p in payload]
    raise ValueError(f"cannot swap {kind}")


def swap_xy_wkb(buf: bytes) -> bytes:
    """gdal vector swap-xy (`apps/gdalalg_vector_swap_xy.cpp`): swap
    the coordinate order of every vertex."""
    from . import wkb as W

    kind, payload = W.parse_wkb(buf)
    return _rebuild_wkb(kind, _swap_payload(kind, payload))


def explode_collection_wkb(buf: bytes):
    """gdal vector explode-collections
    (`apps/gdalalg_vector_explode_collections.cpp`): multi-geometries
    and collections -> list of single-part WKBs (single parts pass
    through as [buf])."""
    from . import wkb as W

    kind, payload = W.parse_wkb(buf)
    if kind == "multipoint":
        pts = np.asarray(payload, dtype=np.float64)
        return [_rebuild_wkb("point", pts[i:i + 1]) for i in range(len(pts))]
    if kind == "multilinestring":
        return [_rebuild_wkb("linestring", p) for p in payload]
    if kind == "multipolygon":
        return [_rebuild_wkb("polygon", poly) for poly in payload]
    if kind == "geometrycollection":
        out = []
        for k, p in payload:
            out.extend(explode_collection_wkb(_rebuild_wkb(k, p)))
        return out
    return [buf]
