"""MakeValid: repair self-intersecting polygons (even-odd rule).

Reference surface: ``OGRGeometry::MakeValid`` (`ogr/ogrgeometry.cpp`,
delegating to GEOS MakeValid). Re-derived here with the standard planar
arrangement construction (de Berg et al., ch.2; the same structure
GEOS's ST_MakeValid 'linework' mode uses):

1. split every ring edge at all pairwise intersections (O(E^2) segment
   intersection, fine for feature-sized rings);
2. snap to a quantization grid;
3. enumerate faces of the planar subdivision by half-edge traversal
   (next = clockwise-most outgoing edge after the reverse edge);
4. classify each bounded face by the even-odd crossing number of an
   interior sample point against the ORIGINAL rings (ray casting works
   unchanged on self-intersecting rings);
5. keep odd-parity faces and dissolve them into clean polygons
   (geom/dissolve.py machinery: shared borders cancel, holes nest).

Caveats (documented): collinear overlapping edges are resolved by the
snap grid; zero-area slivers below the grid resolution drop.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from . import wkb as wkb_mod
from .dissolve import _chain_rings  # reuse hole nesting on kept faces
from .pip import points_in_ring
from .triangulate import _signed_area

_SNAP = 1e-9


def _seg_intersections(p1, p2, q1, q2) -> List[Tuple[float, float]]:
    """Intersection parameters t on segment (p1,p2) with (q1,q2)
    (proper crossings and endpoint touches; collinear overlap returns
    the projected endpoints)."""
    r = p2 - p1
    s = q2 - q1
    denom = r[0] * s[1] - r[1] * s[0]
    qp = q1 - p1
    if denom == 0.0:
        # parallel: collinear overlap -> project q endpoints onto p
        if qp[0] * r[1] - qp[1] * r[0] != 0.0:
            return []
        rr = float(r @ r)
        if rr == 0.0:
            return []
        out = []
        for q in (q1, q2):
            t = float((q - p1) @ r) / rr
            if 0.0 < t < 1.0:
                out.append(t)
        return out
    t = (qp[0] * s[1] - qp[1] * s[0]) / denom
    u = (qp[0] * r[1] - qp[1] * r[0]) / denom
    if 0.0 <= u <= 1.0 and 0.0 < t < 1.0:
        return [float(t)]
    return []


def _arrangement_halfedges(rings: List[np.ndarray], snap: float):
    """Split all ring edges at pairwise intersections; return the set of
    quantized undirected edges (as both directed half-edges)."""
    segs = []
    for ring in rings:
        r = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
        for i in range(len(r) - 1):
            if not np.array_equal(r[i], r[i + 1]):
                segs.append((r[i].astype(np.float64), r[i + 1].astype(np.float64)))
    cut_ts: List[List[float]] = [[] for _ in segs]
    for i in range(len(segs)):
        for j in range(len(segs)):
            if i == j:
                continue
            cut_ts[i].extend(_seg_intersections(segs[i][0], segs[i][1],
                                                segs[j][0], segs[j][1]))
    halfedges = set()
    for (a, b), ts in zip(segs, cut_ts):
        ts = sorted(set([0.0, 1.0] + [t for t in ts if 0.0 < t < 1.0]))
        pts = [a + t * (b - a) for t in ts]
        q = [(int(round(p[0] / snap)), int(round(p[1] / snap))) for p in pts]
        for u, v in zip(q[:-1], q[1:]):
            if u != v:
                halfedges.add((u, v))
                halfedges.add((v, u))
    return halfedges


def _enumerate_loops(halfedges, snap: float):
    """Half-edge loop traversal. Every half-edge belongs to exactly one
    loop; the loop bounds the face on its LEFT. Returns
    (loops, he_loop): loops = list of closed float rings, he_loop = map
    halfedge -> loop index."""
    out_map = {}
    for (u, v) in halfedges:
        out_map.setdefault(u, []).append(v)
    ordered = {}
    for u, vs in out_map.items():
        ang = [np.arctan2(v[1] - u[1], v[0] - u[0]) for v in vs]
        order = np.argsort(ang)
        ordered[u] = [vs[i] for i in order]
    he_loop = {}
    loops = []
    for he in halfedges:
        if he in he_loop:
            continue
        face = []
        cur = he
        while cur not in he_loop:
            he_loop[cur] = len(loops)
            face.append(cur[0])
            u, v = cur
            # next: the outgoing edge at v immediately CLOCKWISE of (v,u)
            outs = ordered[v]
            back_ang = np.arctan2(u[1] - v[1], u[0] - v[0])
            best, bestd = None, None
            for w in outs:
                a = np.arctan2(w[1] - v[1], w[0] - v[0])
                d = (back_ang - a) % (2 * np.pi)
                if d <= 1e-14:
                    d += 2 * np.pi
                if bestd is None or d < bestd:
                    bestd, best = d, w
            cur = (v, best)
        loops.append(np.asarray(face + [face[0]], dtype=np.float64) * snap)
    return loops, he_loop


def _left_sample(ring: np.ndarray) -> Tuple[float, float]:
    """A point just LEFT of the loop's travel direction (inside the
    face the loop bounds), at the midpoint of the longest edge."""
    closed = ring
    ex = np.diff(closed[:, 0])
    ey = np.diff(closed[:, 1])
    lens = np.hypot(ex, ey)
    i = int(np.argmax(lens))
    mx = (closed[i, 0] + closed[i + 1, 0]) / 2.0
    my = (closed[i, 1] + closed[i + 1, 1]) / 2.0
    nx, ny = -ey[i] / lens[i], ex[i] / lens[i]  # left normal
    span = max(closed[:, 0].ptp(), closed[:, 1].ptp(), 1e-9)
    eps = span * 1e-7
    return mx + nx * eps, my + ny * eps


def make_valid_wkb(buf: bytes, snap: float = _SNAP) -> Optional[bytes]:
    """Self-intersecting (multi)polygon WKB -> valid multipolygon WKB
    under the even-odd rule, or None if the result is empty. Valid
    inputs pass through structurally unchanged (their arrangement has
    exactly their own faces)."""
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "polygon":
        rings = list(payload)
    elif kind == "multipolygon":
        rings = [r for prings in payload for r in prings]
    else:
        raise ValueError(f"make_valid expects (multi)polygon, got {kind}")
    halfedges = _arrangement_halfedges(rings, snap)
    if not halfedges:
        return None
    loops, he_loop = _enumerate_loops(halfedges, snap)

    def ring_parity(sx: float, sy: float) -> int:
        parity = 0
        for ring in rings:
            closed = ring if np.array_equal(ring[0], ring[-1]) else \
                np.vstack([ring, ring[:1]])
            if points_in_ring(np.asarray([sx]), np.asarray([sy]), closed)[0]:
                parity ^= 1
        return parity

    # parity of the face each loop bounds (sample just left of the loop)
    loop_parity = [ring_parity(*_left_sample(lp)) for lp in loops]

    # region boundary = half-edges whose left face is odd and whose
    # twin's left face is even — traversal direction already has the
    # odd region on the left, so shells come out CCW and holes CW
    boundary = [he for he in halfedges
                if loop_parity[he_loop[he]] == 1
                and loop_parity[he_loop[(he[1], he[0])]] == 0]
    if not boundary:
        return None
    out_map = {}
    for (u, v) in boundary:
        out_map.setdefault(u, []).append(v)
    polys = _chain_rings(boundary, out_map, snap)
    if not polys:
        return None
    return wkb_mod.multipolygon_to_wkb(polys)
