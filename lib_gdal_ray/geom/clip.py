"""Polygon clipping against an axis-aligned box (Sutherland–Hodgman).

Reference semantics: `ogr2ogr -clipsrc xmin ymin xmax ymax` clips every
feature geometry to the rectangle (`apps/ogr2ogr_lib.cpp` clip members
`:638-643`), and layer-algebra Clip intersects input geometries with
the method layer (`ogrlayer.cpp:7356`). GDAL delegates to GEOS; for the
convex-clipper (box) case the classic Sutherland–Hodgman algorithm
(public domain, 1974) is exact and vectorizes per half-plane.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import ray.data

from . import wkb as wkb_mod


def _clip_halfplane(ring: np.ndarray, axis: int, bound: float, keep_less: bool) -> np.ndarray:
    """Clip open ring (first!=last ok) against one half-plane."""
    if len(ring) == 0:
        return ring
    pts = ring
    n = len(pts)
    out: List[np.ndarray] = []
    prev = pts[-1]
    prev_in = (prev[axis] <= bound) if keep_less else (prev[axis] >= bound)
    for i in range(n):
        cur = pts[i]
        cur_in = (cur[axis] <= bound) if keep_less else (cur[axis] >= bound)
        if cur_in != prev_in:
            t = (bound - prev[axis]) / (cur[axis] - prev[axis])
            out.append(prev + t * (cur - prev))
        if cur_in:
            out.append(cur)
        prev, prev_in = cur, cur_in
    return np.asarray(out) if out else np.empty((0, 2))


def _clip_halfplane_general(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Clip open ring to the half-plane a*x + b*y + c >= 0."""
    if len(ring) == 0:
        return ring
    out: List[np.ndarray] = []
    prev = ring[-1]
    prev_v = a * prev[0] + b * prev[1] + c
    for cur in ring:
        cur_v = a * cur[0] + b * cur[1] + c
        if (cur_v >= 0) != (prev_v >= 0):
            t = prev_v / (prev_v - cur_v)
            out.append(prev + t * (cur - prev))
        if cur_v >= 0:
            out.append(cur)
        prev, prev_v = cur, cur_v
    return np.asarray(out) if out else np.empty((0, 2))


def is_convex_ring(ring: np.ndarray) -> bool:
    """Closed ring convexity (all cross products one sign, zeros ok)."""
    r = ring[:-1]
    n = len(r)
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        p0, p1, p2 = r[i], r[(i + 1) % n], r[(i + 2) % n]
        cr = (p1[0] - p0[0]) * (p2[1] - p1[1]) - (p1[1] - p0[1]) * (p2[0] - p1[0])
        if cr != 0:
            s = 1 if cr > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True


def clip_ring_to_convex(ring: np.ndarray, clipper: np.ndarray) -> Optional[np.ndarray]:
    """Clip a closed ring against a CONVEX closed clipper ring
    (Sutherland–Hodgman generalization: one half-plane per clipper
    edge). Raises for non-convex clippers (SH would be wrong)."""
    if not is_convex_ring(clipper):
        raise ValueError("clipper ring must be convex for Sutherland–Hodgman")
    cr = clipper[:-1]
    n = len(cr)
    # orientation: ensure interior is on the >=0 side of each edge
    area2 = 0.0
    for i in range(n):
        area2 += cr[i][0] * cr[(i + 1) % n][1] - cr[(i + 1) % n][0] * cr[i][1]
    ccw = area2 > 0
    open_ring = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    r = open_ring.astype(np.float64)
    for i in range(n):
        x1, y1 = cr[i]
        x2, y2 = cr[(i + 1) % n]
        # half-plane: left of edge for CCW clipper, right for CW
        a, b, c = (y1 - y2, x2 - x1, x1 * y2 - x2 * y1)
        if not ccw:
            a, b, c = -a, -b, -c
        r = _clip_halfplane_general(r, a, b, c)
        if len(r) < 3:
            return None
    return np.vstack([r, r[:1]])


def intersect_convex_wkb(buf_a: bytes, buf_b_ring: np.ndarray) -> Optional[bytes]:
    """Intersection geometry of WKB polygon A with convex ring B
    (polygon semantics; holes of A clipped too)."""
    kind, payload = wkb_mod.parse_wkb(buf_a)
    polys = [payload] if kind == "polygon" else payload
    out_polys = []
    for rings in polys:
        clipped = []
        for i, ring in enumerate(rings):
            c = clip_ring_to_convex(ring, buf_b_ring)
            if c is not None:
                clipped.append(c)
            elif i == 0:
                clipped = []
                break
        if clipped:
            out_polys.append(clipped)
    if not out_polys:
        return None
    if kind == "polygon":
        return wkb_mod.polygon_to_wkb(out_polys[0])
    return wkb_mod.multipolygon_to_wkb(out_polys)


def clip_ring_to_box(ring: np.ndarray, xmin: float, ymin: float,
                     xmax: float, ymax: float) -> Optional[np.ndarray]:
    """Closed ring → clipped closed ring (or None if fully outside)."""
    open_ring = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    r = open_ring.astype(np.float64)
    for axis, bound, keep_less in ((0, xmax, True), (0, xmin, False),
                                   (1, ymax, True), (1, ymin, False)):
        r = _clip_halfplane(r, axis, bound, keep_less)
        if len(r) < 3:
            return None
    return np.vstack([r, r[:1]])


def clip_wkb_to_box(buf: bytes, xmin: float, ymin: float,
                    xmax: float, ymax: float) -> Optional[bytes]:
    """Clip a WKB geometry to the box. Points: kept iff inside (closed
    box). Polygons/multipolygons: each ring clipped (box is convex, so
    SH is exact per ring); empty results drop."""
    kind, payload = wkb_mod.parse_wkb(buf)
    if kind == "point":
        x, y = payload[0]
        if xmin <= x <= xmax and ymin <= y <= ymax:
            return buf
        return None
    if kind == "linestring":
        # clip segments: keep the polyline part inside (SH on open lines
        # is lossy at corners; for v0, clip vertices via half-planes)
        r = payload.astype(np.float64)
        for axis, bound, keep_less in ((0, xmax, True), (0, xmin, False),
                                       (1, ymax, True), (1, ymin, False)):
            r = _clip_halfplane(r, axis, bound, keep_less)
            if len(r) < 2:
                return None
        return wkb_mod.linestring_to_wkb(r)
    polys = [payload] if kind == "polygon" else payload
    out_polys = []
    for rings in polys:
        clipped = []
        for i, ring in enumerate(rings):
            c = clip_ring_to_box(ring, xmin, ymin, xmax, ymax)
            if c is not None:
                clipped.append(c)
            elif i == 0:
                clipped = []
                break  # outer ring gone ⇒ polygon gone
        if clipped:
            out_polys.append(clipped)
    if not out_polys:
        return None
    if kind == "polygon":
        return wkb_mod.polygon_to_wkb(out_polys[0])
    return wkb_mod.multipolygon_to_wkb(out_polys)


def clip_to_box(ds: ray.data.Dataset, xmin: float, ymin: float,
                xmax: float, ymax: float,
                wkb_col: str = "geometry") -> ray.data.Dataset:
    """ogr2ogr -clipsrc as a stateless map_batches stage: geometries
    clipped to the box; rows whose geometry vanishes are dropped."""

    def fn(batch: pa.Table) -> pa.Table:
        bufs = batch[wkb_col].to_numpy(zero_copy_only=False)
        out = [clip_wkb_to_box(b, xmin, ymin, xmax, ymax) for b in bufs]
        keep = np.asarray([o is not None for o in out])
        batch = batch.filter(pa.array(keep))
        kept = [o for o in out if o is not None]
        idx = batch.column_names.index(wkb_col)
        return batch.set_column(idx, wkb_col, pa.array(kept, type=pa.binary()))

    return ds.map_batches(fn, batch_format="pyarrow")
