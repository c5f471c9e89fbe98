"""Delaunay triangulation (Bowyer-Watson) of a 2-D site set.

Reference semantics: `alg/delaunay.c` (GDAL vendors a qhull-based
triangulator for `GDALGridLinear`, `alg/gdalgrid.cpp` linear). This is
an independent incremental Bowyer-Watson build — O(n · t) with the
in-circle test vectorized over all live triangles per insertion, which
is fine for broadcast-side site sets (the intended use: one build per
worker over the `ray.put` site table; the 100-TB path re-runs it
per-tile over halo-gathered sites).

Determinism: sites are inserted in (x, y, id) order, triangle vertex
indices are sorted ascending and the final face list is lexicographically
sorted — identical output across workers/retries.
"""

from __future__ import annotations

import numpy as np


def _incircle(ax, ay, bx, by, cx, cy, dx, dy):
    """> 0 iff d strictly inside the circumcircle of CCW triangle
    (a, b, c); vectorized over triangles."""
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    return (adx * (bdy * cd - bd * cdy)
            - ady * (bdx * cd - bd * cdx)
            + ad * (bdx * cdy - bdy * cdx))


def delaunay(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """-> (m, 3) int64 vertex-index triangles (each row sorted
    ascending, rows lexicographically sorted). Duplicate points must be
    removed by the caller; n < 3 returns an empty array."""
    n = len(px)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    order = np.lexsort((np.arange(n), py, px))

    # super-triangle comfortably containing everything
    cx = (px.min() + px.max()) / 2.0
    cy = (py.min() + py.max()) / 2.0
    # far-enough super vertices that no real circumcircle reaches them
    # (a too-small super triangle clips hull-adjacent faces; 1e6x is
    # still well within double precision for the incircle determinant)
    span = max(px.max() - px.min(), py.max() - py.min(), 1.0) * 1e6
    spx = np.concatenate([px, [cx - span, cx + span, cx]])
    spy = np.concatenate([py, [cy - span, cy - span, cy + span]])
    s0, s1, s2 = n, n + 1, n + 2

    # live triangle store (vertex index triples, CCW)
    tri = [(s0, s1, s2)]

    def ccw(t):
        a, b, c = t
        if ((spx[b] - spx[a]) * (spy[c] - spy[a])
                - (spy[b] - spy[a]) * (spx[c] - spx[a])) < 0:
            return (a, c, b)
        return (a, b, c)

    for p in order:
        ta = np.asarray(tri, dtype=np.int64)
        bad = _incircle(spx[ta[:, 0]], spy[ta[:, 0]],
                        spx[ta[:, 1]], spy[ta[:, 1]],
                        spx[ta[:, 2]], spy[ta[:, 2]],
                        spx[p], spy[p]) > 0.0
        if not bad.any():
            # numerically on/outside every circumcircle (degenerate
            # duplicates); find a containing triangle conservatively by
            # treating >= 0 as bad
            bad = _incircle(spx[ta[:, 0]], spy[ta[:, 0]],
                            spx[ta[:, 1]], spy[ta[:, 1]],
                            spx[ta[:, 2]], spy[ta[:, 2]],
                            spx[p], spy[p]) >= 0.0
            if not bad.any():
                continue
        # polygonal cavity boundary = edges of bad triangles seen once
        edges: dict = {}
        for t in ta[bad]:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                if k in edges:
                    del edges[k]
                else:
                    edges[k] = e
        tri = [t for t, b in zip(tri, bad) if not b]
        for e in edges.values():
            tri.append(ccw((e[0], e[1], int(p))))

    out = np.asarray([t for t in tri if t[0] < n and t[1] < n and t[2] < n],
                     dtype=np.int64).reshape(-1, 3)
    out = np.sort(out, axis=1)
    if len(out):
        out = out[np.lexsort((out[:, 2], out[:, 1], out[:, 0]))]
    return out
