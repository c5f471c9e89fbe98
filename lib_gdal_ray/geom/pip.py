"""Point-in-polygon by ray casting — semantics of GDAL's non-GEOS test.

Re-derivation of ``OGRLinearRing::isPointInRing``
(`ogr/ogrlinearring.cpp:443-524`): translate ring coords to the test
point, count crossings of the positive-x ray with each edge where the
edge straddles y=0 (strict `y1 > 0` vs `y2 <= 0` straddle test, cross
product / dy intersection `> 0`); odd crossings ⇒ inside. Holes via
odd-even XOR across rings, matching `OGRPolygon` containment.

Vectorized over points: one pass over polygon edges, numpy ops over the
whole point array per edge-batch.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boolean mask: point strictly inside ring (odd crossing count).

    ring: (K,2) closed coordinate array (first == last).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if len(ring) < 4:
        return np.zeros(len(px), dtype=bool)
    # Edge endpoints relative to each test point: broadcast (E, N)
    xs = ring[:, 0]
    ys = ring[:, 1]
    # x2,y2 = previous vertex; x1,y1 = current vertex (GDAL's iteration)
    x1 = xs[1:, None] - px[None, :]
    y1 = ys[1:, None] - py[None, :]
    x2 = xs[:-1, None] - px[None, :]
    y2 = ys[:-1, None] - py[None, :]
    straddle = ((y1 > 0) & (y2 <= 0)) | ((y2 > 0) & (y1 <= 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        intersection = (x1 * y2 - x2 * y1) / (y2 - y1)
    crossings = (straddle & (intersection > 0.0)).sum(axis=0)
    return (crossings % 2).astype(bool)


def points_in_ring_chunked(px, py, ring, chunk: int = 4096) -> np.ndarray:
    """Memory-bounded variant for large rings × many points."""
    if len(px) * len(ring) <= 8_000_000:
        return points_in_ring(px, py, ring)
    out = np.empty(len(px), dtype=bool)
    for s in range(0, len(px), chunk):
        out[s:s + chunk] = points_in_ring(px[s:s + chunk], py[s:s + chunk], ring)
    return out


def points_in_polygon(px, py, rings) -> np.ndarray:
    """Odd-even across all rings (outer minus holes)."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= points_in_ring_chunked(px, py, ring)
    return inside


def points_in_multipolygon(px, py, polys) -> np.ndarray:
    """polys: list of list-of-rings; inside any member polygon."""
    inside = np.zeros(len(px), dtype=bool)
    for rings in polys:
        inside |= points_in_polygon(px, py, rings)
    return inside


def points_in_box(px, py, xmin, ymin, xmax, ymax, closed: bool = False) -> np.ndarray:
    """Axis-aligned box containment; half-open [min, max) by default
    (exactly mirrorable in a SQL oracle), closed=True for GDAL-envelope
    style inclusive test."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if closed:
        return (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
    return (px >= xmin) & (px < xmax) & (py >= ymin) & (py < ymax)
