"""Pixel-region → polygon ring tracing.

Reference: `alg/polygonize_polygonizer.cpp` — GDAL's two-arm contour
follower builds ring polygons for each connected pixel region. This is
the same result derived edge-wise: every pixel contributes its 4 unit
edges; edges interior to the region cancel (appear twice); the
surviving boundary edges are chained into closed rings. The ring with
the largest |area| is the outer shell, the rest are holes — emitted as
a WKB polygon in pixel coordinates (callers transform to georeferenced
space via the tile geotransform).

Directed-edge convention keeps chaining deterministic: each pixel emits
its edges counter-clockwise in image space (top edge left→right along
y, …), so boundary edges chain head-to-tail without search; outer
rings come out CCW and holes CW in (x, y-down) pixel space.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from . import wkb as wkb_mod


def boundary_edges(gpx: np.ndarray, gpy: np.ndarray):
    """Directed boundary edges of the pixel set (vectorized cancel).

    Pixel (x, y) spans corners (x, y)..(x+1, y+1). Emits CCW-in-screen
    (clockwise on paper with y down) directed edges; an edge shared by
    two pixels appears once in each direction and cancels.
    -> dict {start_vertex: [end_vertex, ...]}
    """
    x = gpx.astype(np.int64)
    y = gpy.astype(np.int64)
    # edges per pixel: top (x,y)->(x+1,y), right (x+1,y)->(x+1,y+1),
    # bottom (x+1,y+1)->(x,y+1), left (x,y+1)->(x,y)
    starts = np.concatenate([
        np.stack([x, y], 1), np.stack([x + 1, y], 1),
        np.stack([x + 1, y + 1], 1), np.stack([x, y + 1], 1)])
    ends = np.concatenate([
        np.stack([x + 1, y], 1), np.stack([x + 1, y + 1], 1),
        np.stack([x, y + 1], 1), np.stack([x, y], 1)])
    # cancel opposite-direction duplicates: canonical undirected key
    BIG = np.int64(1) << np.int64(31)
    sk = starts[:, 0] * BIG + starts[:, 1]
    ek = ends[:, 0] * BIG + ends[:, 1]
    lo = np.minimum(sk, ek)
    hi = np.maximum(sk, ek)
    und = lo * BIG * 2 + hi  # may overflow for gpx>2^15; fine for tile-local coords
    order = np.argsort(und, kind="stable")
    und_s = und[order]
    # edges whose undirected key appears exactly once survive
    uniq, counts = np.unique(und_s, return_counts=True)
    keep_keys = set(uniq[counts == 1].tolist())
    out: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for i in range(len(starts)):
        if int(und[i]) in keep_keys:
            s = (int(starts[i, 0]), int(starts[i, 1]))
            e = (int(ends[i, 0]), int(ends[i, 1]))
            out.setdefault(s, []).append(e)
    return out


def _ring_area(ring: List[Tuple[int, int]]) -> float:
    a = 0.0
    for i in range(len(ring) - 1):
        a += ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
    return a / 2.0


def trace_rings(gpx: np.ndarray, gpy: np.ndarray) -> List[np.ndarray]:
    """-> rings (closed (K,2) arrays), outer first (largest |area|)."""
    edges = boundary_edges(gpx, gpy)
    rings: List[List[Tuple[int, int]]] = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            outs = edges.get(cur)
            if not outs:
                break
            if len(outs) == 1:
                nxt = outs.pop(0)
            else:
                # at a saddle vertex, prefer the sharpest left turn to keep
                # rings simple (GDAL's follower makes the same choice)
                def turn(cand):
                    dx1, dy1 = prev_dir if prev_dir else (0, 0)
                    dx2, dy2 = cand[0] - cur[0], cand[1] - cur[1]
                    return dx1 * dy2 - dy1 * dx2
                outs.sort(key=turn)
                nxt = outs.pop(0)
            if not outs:
                edges.pop(cur, None)
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            ring.append(nxt)
            cur = nxt
            if cur == start:
                break
        if len(ring) >= 4 and ring[0] == ring[-1]:
            rings.append(ring)
    rings.sort(key=lambda r: -abs(_ring_area(r)))
    return [np.asarray(r, dtype=np.float64) for r in rings]


def region_to_wkb(gpx: np.ndarray, gpy: np.ndarray) -> bytes:
    """Pixel set of one region → WKB polygon (outer ring + holes) in
    pixel coordinates."""
    rings = trace_rings(gpx, gpy)
    if not rings:
        return wkb_mod.polygon_to_wkb([])
    return wkb_mod.polygon_to_wkb(rings)
