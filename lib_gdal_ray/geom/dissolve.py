"""Dissolve disjoint convex fragments into clean (multi)polygons.

The boolean/overlay kernels (geom/boolean.py, geom/triangulate.py) emit
exact-area results as disjoint convex fragments. The reference returns
clean merged polygons (GEOS union inside `ogrlayer.cpp:5384-5448`,
PROMOTE_TO_MULTI). This module reconstructs that surface form:

1. snap vertices to a quantization grid (default 1e-9 of a unit);
2. repair T-junctions (split every edge at snapped vertices that lie on
   it) so shared borders cancel exactly;
3. cancel opposite directed edges (interior borders appear once in each
   direction across neighboring fragments);
4. chain the surviving boundary edges into rings, taking the sharpest
   counter-clockwise turn at shared vertices (standard planar-subdivision
   face walk);
5. orient: CCW rings are shells, CW rings are holes; each hole nests
   into the smallest enclosing shell.

Fragments must be disjoint up to shared borders (exactly what the
boolean kernels produce); the dissolved output has identical area and
point-set, just without interior seams.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from . import wkb as wkb_mod
from .pip import points_in_ring
from .triangulate import _signed_area

_SNAP = 1e-9


def _quant(pts: np.ndarray, snap: float) -> np.ndarray:
    return np.round(pts / snap).astype(np.int64)


def _ccw(ring: np.ndarray) -> np.ndarray:
    closed = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
    return closed if _signed_area(closed) >= 0 else closed[::-1]


def dissolve_fragments(frags: List[np.ndarray], snap: float = _SNAP
                       ) -> List[List[np.ndarray]]:
    """[closed convex rings] -> [[outer, hole, ...], ...] clean polygons
    (float coordinates recovered from the snap grid)."""
    # 1. quantized directed edges of CCW-normalized fragments
    edges: List[Tuple[Tuple[int, int], Tuple[int, int]]] = []
    for f in frags:
        q = _quant(_ccw(np.asarray(f, dtype=np.float64))[:-1], snap)
        # drop consecutive duplicates after snapping
        keep = np.ones(len(q), dtype=bool)
        keep[1:] = (np.diff(q, axis=0) != 0).any(axis=1)
        q = q[keep]
        if len(q) < 3:
            continue
        for i in range(len(q)):
            u = (int(q[i, 0]), int(q[i, 1]))
            v = (int(q[(i + 1) % len(q), 0]), int(q[(i + 1) % len(q), 1]))
            if u != v:
                edges.append((u, v))
    if not edges:
        return []

    # 2. T-junction repair: split edges at collinear interior vertices
    verts = sorted({p for e in edges for p in e})
    varr = np.asarray(verts, dtype=np.float64)
    split_edges: List[Tuple[Tuple[int, int], Tuple[int, int]]] = []
    for (u, v) in edges:
        ux, uy = u
        vx, vy = v
        dx, dy = vx - ux, vy - uy
        # candidate points inside the bbox of (u, v)
        lo_x, hi_x = min(ux, vx), max(ux, vx)
        lo_y, hi_y = min(uy, vy), max(uy, vy)
        m = ((varr[:, 0] >= lo_x) & (varr[:, 0] <= hi_x)
             & (varr[:, 1] >= lo_y) & (varr[:, 1] <= hi_y))
        on: List[Tuple[float, Tuple[int, int]]] = []
        for idx in np.flatnonzero(m):
            p = verts[idx]
            if p == u or p == v:
                continue
            px, py = p
            if dx * (py - uy) - dy * (px - ux) != 0:
                continue  # not collinear (exact integer test on the grid)
            t = ((px - ux) * dx + (py - uy) * dy) / float(dx * dx + dy * dy)
            if 0.0 < t < 1.0:
                on.append((t, p))
        chain = [u] + [p for _t, p in sorted(on)] + [v]
        for a, b in zip(chain[:-1], chain[1:]):
            split_edges.append((a, b))

    # 3. cancel opposite directed edges
    from collections import Counter

    cnt = Counter(split_edges)
    boundary: List[Tuple[Tuple[int, int], Tuple[int, int]]] = []
    for e, n in cnt.items():
        rev = (e[1], e[0])
        n_rev = cnt.get(rev, 0)
        survive = n - min(n, n_rev)
        boundary.extend([e] * survive)

    if not boundary:
        return []

    # 4.+5. chain into rings and nest holes
    out_map: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for (u, v) in boundary:
        out_map.setdefault(u, []).append(v)
    return _chain_rings(boundary, out_map, snap)


def _chain_rings(boundary, out_map, snap) -> List[List[np.ndarray]]:
    from collections import Counter

    remaining = Counter(boundary)
    rings: List[np.ndarray] = []
    for e0 in boundary:
        if remaining[e0] <= 0:
            continue
        ring = [e0[0]]
        remaining[e0] -= 1
        prev, cur = e0
        while cur != ring[0]:
            ring.append(cur)
            outs = [v for v in out_map.get(cur, []) if remaining[(cur, v)] > 0]
            if not outs:
                break  # open chain (degenerate input); drop
            if len(outs) == 1:
                nxt = outs[0]
            else:
                # sharpest CCW turn relative to incoming direction
                ix, iy = cur[0] - prev[0], cur[1] - prev[1]
                ang_in = np.arctan2(iy, ix)

                def turn(v):
                    ox, oy = v[0] - cur[0], v[1] - cur[1]
                    return -((np.arctan2(oy, ox) - ang_in + np.pi)
                             % (2 * np.pi))

                nxt = min(outs, key=turn)
            remaining[(cur, nxt)] -= 1
            prev, cur = cur, nxt
        else:
            rings.append(np.asarray(ring + [ring[0]], dtype=np.float64) * snap)

    # 5. orient and nest holes
    shells: List[Tuple[float, np.ndarray]] = []
    holes: List[np.ndarray] = []
    for r in rings:
        a = _signed_area(r)
        if abs(a) < 1e-18:
            continue
        if a > 0:
            shells.append((a, r))
        else:
            holes.append(r)
    if not shells:
        return []
    polys: List[List[np.ndarray]] = [[s] for _a, s in
                                     sorted(shells, key=lambda t: t[0])]
    areas = [a for a, _s in sorted(shells, key=lambda t: t[0])]
    for h in holes:
        px, py = h[0]
        placed = False
        for i, poly in enumerate(polys):  # smallest enclosing shell first
            if (points_in_ring(np.asarray([px]), np.asarray([py]), poly[0])[0]
                    or _on_ring(px, py, poly[0])):
                poly.append(h)
                placed = True
                break
        if not placed and polys:
            polys[-1].append(h)  # numeric edge case: attach to largest
    return polys


def _on_ring(px, py, ring, tol=1e-12) -> bool:
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    dot = (px - x1) * (px - x2) + (py - y1) * (py - y2)
    return bool(((np.abs(cross) < tol) & (dot <= tol)).any())


def dissolve_wkb(buf: Optional[bytes], snap: float = _SNAP) -> Optional[bytes]:
    """Fragmented multipolygon WKB -> dissolved clean multipolygon WKB
    (None stays None; area/point-set preserved)."""
    if buf is None:
        return None
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "polygon":
        return buf  # single polygon (with or without holes): already clean
    if kind != "multipolygon":
        raise ValueError(f"dissolve_wkb expects (multi)polygon, got {kind}")
    frags = [rings[0] for rings in payload]
    polys = dissolve_fragments(frags, snap)
    if not polys:
        return None
    return wkb_mod.multipolygon_to_wkb(polys)
