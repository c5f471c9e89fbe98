"""Scanline / Bresenham geometry rasterization kernels (pure numpy).

Semantics re-derived from the reference implementation:

* polygon fill  — ``alg/llrasterize.cpp`` ``GDALdllImageFilledPolygon``
  (:60-225): per scanline ``y`` the test height is ``y + 0.5``; an edge
  with ``dy1 <= y+0.5 < dy2`` (after orienting ``dy1 < dy2``) crosses at
  ``x = lerp``, crossing pixel ``floor(x + 0.5)``; sorted crossings pair
  into spans ``[c[i], c[i+1]-1]`` (even-odd rule across ALL rings, so
  holes work with no special casing). Bottom horizontal edges exactly at
  a scanline center are filled separately (``:155-180``).
* line burn     — ``GDALdllImageLine`` (:246-390): integer Bresenham
  from ``floor(x0),floor(y0)`` to ``floor(x1),floor(y1)``; intermediate
  segment endpoints are burned once (the end point of every segment but
  the part's last is skipped).
* all-touched   — ``GDALdllImageLineAllTouched`` (:407-770): every pixel
  the segment passes through; vertical/horizontal segments use the
  ``fabs < .01`` special cases with the ``EPSILON_INTERSECT_ONLY=1e-4``
  end nudge; sloped segments step boundary-to-boundary. Our sloped path
  uses the grid-crossing supercover (identical except for lines passing
  exactly through lattice corners, where the reference's float stepping
  burns an implementation-defined extra neighbor).
* dispatch      — ``alg/gdalrasterize.cpp`` ``gv_rasterize_one_shape``
  (:569-770): polygons = (ALL_TOUCHED ? boundary lines intersect-only
  : nothing) + filled polygon; MERGE_ALG=ADD dedups pixels per shape.

All kernels take parts = list of (K,2) float64 vertex arrays already in
PIXEL coordinates (the caller applies the geotransform / web-mercator
mapping, exactly as the reference transforms vertices before
rasterizing) and return unique (ix, iy) int64 pixel arrays clipped to
the raster window. An optional scanline window [y_lo, y_hi] restricts
output rows — the distributed split unit (each chunk of scanlines is
rasterized independently, so a huge polygon never materializes in one
task).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

_EPS_INTERSECT = 1e-4


def _ring_edges(parts: Sequence[np.ndarray], close: bool):
    """Concatenate per-part edge endpoint arrays ((x1,y1)->(x2,y2)).

    close=True adds the implicit last->first closure edge per part
    (polygon ring convention of the reference)."""
    x1l, y1l, x2l, y2l = [], [], [], []
    for p in parts:
        p = np.asarray(p, dtype=np.float64)
        if len(p) < 2:
            continue
        xs, ys = p[:, 0], p[:, 1]
        if close:
            x1l.append(xs)
            y1l.append(ys)
            x2l.append(np.roll(xs, -1))
            y2l.append(np.roll(ys, -1))
        else:
            x1l.append(xs[:-1])
            y1l.append(ys[:-1])
            x2l.append(xs[1:])
            y2l.append(ys[1:])
    if not x1l:
        e = np.empty(0, dtype=np.float64)
        return e, e, e, e
    return (np.concatenate(x1l), np.concatenate(y1l),
            np.concatenate(x2l), np.concatenate(y2l))


def _spans_to_pixels(ys: np.ndarray, xs: np.ndarray, xe: np.ndarray,
                     width: int) -> Tuple[np.ndarray, np.ndarray]:
    """Expand per-scanline spans [xs, xe] (inclusive) into pixel arrays,
    clipped to [0, width)."""
    xs = np.clip(xs, 0, width - 1)
    xe = np.clip(xe, 0, width - 1)
    n = xe - xs + 1
    keep = n > 0
    ys, xs, n = ys[keep], xs[keep], n[keep]
    total = int(n.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # vectorized ragged-arange
    starts = np.zeros(len(n), dtype=np.int64)
    np.cumsum(n[:-1], out=starts[1:])
    ix = np.arange(total, dtype=np.int64)
    ix += np.repeat(xs - starts, n)
    iy = np.repeat(ys, n)
    return ix, iy


def fill_polygon(parts: Sequence[np.ndarray], width: int, height: int,
                 y_lo: int = 0, y_hi: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Even-odd scanline fill; parity with GDALdllImageFilledPolygon.

    parts: all rings (outer + holes, and all polygons of a multipolygon)
    in pixel coordinates. Returns (ix, iy) of filled pixels with
    y in [max(0, y_lo), min(height-1, y_hi)].
    """
    x1, y1, x2, y2 = _ring_edges(parts, close=True)
    if len(x1) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    all_y = np.concatenate([y1, y2])
    # reference: miny = (int)max(0.0, dminy); maxy = (int)min(dmaxy, H-1)
    miny = int(max(0.0, float(all_y.min())))
    maxy = int(min(float(all_y.max()), height - 1))
    miny = max(miny, int(y_lo))
    if y_hi is not None:
        maxy = min(maxy, int(y_hi))
    if maxy < miny:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

    yy = np.arange(miny, maxy + 1, dtype=np.int64)
    dy = yy.astype(np.float64) + 0.5  # (S,)

    # orient edges so ey1 < ey2; horizontal edges handled separately
    swap = y1 > y2
    ey1 = np.where(swap, y2, y1)
    ey2 = np.where(swap, y1, y2)
    ex1 = np.where(swap, x2, x1)
    ex2 = np.where(swap, x1, x2)
    nonh = ey1 != ey2

    exn1, exn2, eyn1, eyn2 = ex1[nonh], ex2[nonh], ey1[nonh], ey2[nonh]
    # crossing matrix (S, E): dy >= ey1 and dy < ey2
    cross = (dy[:, None] >= eyn1[None, :]) & (dy[:, None] < eyn2[None, :])
    s_idx, e_idx = np.nonzero(cross)
    if len(s_idx):
        t = (dy[s_idx] - eyn1[e_idx]) / (eyn2[e_idx] - eyn1[e_idx])
        xcross = np.clip(t * (exn2[e_idx] - exn1[e_idx]) + exn1[e_idx],
                         np.iinfo(np.int32).min, np.iinfo(np.int32).max)
        cpix = np.floor(xcross + 0.5).astype(np.int64)
        order = np.lexsort((cpix, s_idx))
        s_sorted = s_idx[order]
        c_sorted = cpix[order]
        # rank within each scanline group
        grp_start = np.zeros(len(s_sorted), dtype=np.int64)
        newgrp = np.flatnonzero(np.diff(s_sorted)) + 1
        grp_start[newgrp] = newgrp
        np.maximum.accumulate(grp_start, out=grp_start)
        rank = np.arange(len(s_sorted), dtype=np.int64) - grp_start
        even = (rank & 1) == 0
        span_y = yy[s_sorted[even]]
        span_s = c_sorted[even]
        span_e = c_sorted[~even] - 1
        # reference guard: polyInts[i] <= maxx && polyInts[i+1] > minx
        keep = (span_s <= width - 1) & (span_e + 1 > 0)
        ix, iy = _spans_to_pixels(span_y[keep], span_s[keep], span_e[keep], width)
    else:
        ix = np.empty(0, dtype=np.int64)
        iy = np.empty(0, dtype=np.int64)

    # bottom horizontal segments lying exactly on a scanline center
    # (reference :155-180 — fill when traversal order is right-to-left)
    horiz = ~nonh
    if horiz.any():
        hx1o, hx2o, hy = x1[horiz], x2[horiz], y1[horiz]
        r2l = hx1o > hx2o  # original order right-to-left => bottom edge
        if r2l.any():
            hx1, hx2, hyv = hx2o[r2l], hx1o[r2l], hy[r2l]
            # which scanline center equals the edge height?
            on = (hyv >= miny + 0.5 - 1e-12) & (hyv <= maxy + 0.5 + 1e-12)
            frac_ok = np.abs((hyv - 0.5) - np.round(hyv - 0.5)) < 1e-12
            sel = on & frac_ok
            if sel.any():
                hys = np.round(hyv[sel] - 0.5).astype(np.int64)
                a = np.floor(hx1[sel] + 0.5)
                b = np.floor(hx2[sel] + 0.5)
                keep = (a <= width - 1) & (b > 0)
                a = np.maximum(a, 0.0)[keep].astype(np.int64)
                b = np.minimum(b, float(width))[keep].astype(np.int64) - 1
                hix, hiy = _spans_to_pixels(hys[keep], a, b, width)
                ix = np.concatenate([ix, hix])
                iy = np.concatenate([iy, hiy])
    return ix, iy


def _bresenham_segment(x0: float, y0: float, x1: float, y1: float,
                       last_segment: bool) -> Tuple[np.ndarray, np.ndarray]:
    """One GDALdllImageLine segment, vectorized closed form.

    Closed form of the integer error loop (verified against a literal
    port in tests): after t steps along the major axis the minor offset
    is ``(2*dmin*t + dmaj - 1) // (2*dmaj)``.
    """
    ix0, iy0 = int(np.floor(x0)), int(np.floor(y0))
    ix1, iy1 = int(np.floor(x1)), int(np.floor(y1))
    dx, dy = abs(ix1 - ix0), abs(iy1 - iy0)
    sx = -1 if ix0 > ix1 else 1
    sy = -1 if iy0 > iy1 else 1
    if dx >= dy:
        npts = dx + 1 if last_segment else max(dx, 1)
        t = np.arange(npts, dtype=np.int64)
        xs = ix0 + t * sx
        off = (2 * dy * t + dx - 1) // (2 * dx) if dx else np.zeros_like(t)
        ys = iy0 + off * sy
    else:
        npts = dy + 1 if last_segment else dy
        t = np.arange(npts, dtype=np.int64)
        ys = iy0 + t * sy
        off = (2 * dx * t + dy - 1) // (2 * dy)
        xs = ix0 + off * sx
    return xs, ys


def burn_lines(parts: Sequence[np.ndarray], width: int, height: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """GDALdllImageLine over polyline parts (pixel coords)."""
    outx, outy = [], []
    for p in parts:
        p = np.asarray(p, dtype=np.float64)
        for j in range(1, len(p)):
            xs, ys = _bresenham_segment(p[j - 1, 0], p[j - 1, 1],
                                        p[j, 0], p[j, 1],
                                        last_segment=(j == len(p) - 1))
            outx.append(xs)
            outy.append(ys)
    if not outx:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ix = np.concatenate(outx)
    iy = np.concatenate(outy)
    keep = (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
    return ix[keep], iy[keep]


def _all_touched_segment(x0: float, y0: float, x1: float, y1: float,
                         intersect_only: bool
                         ) -> Tuple[np.ndarray, np.ndarray]:
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if x0 > x1:
        x0, x1 = x1, x0
        y0, y1 = y1, y0
    # vertical special case (reference :477-549)
    if abs(x0 - x1) < 0.01:
        if intersect_only and (abs(x0 - round(x0)) < _EPS_INTERSECT
                               and abs(x1 - round(x1)) < _EPS_INTERSECT):
            return empty
        ylo, yhi = (y0, y1) if y0 <= y1 else (y1, y0)
        iX = int(np.floor(x1))
        iY = int(np.floor(ylo))
        iYEnd = int(np.floor(yhi - _EPS_INTERSECT))
        if iYEnd < iY:
            return empty
        ys = np.arange(iY, iYEnd + 1, dtype=np.int64)
        return np.full(len(ys), iX, dtype=np.int64), ys
    # horizontal special case (reference :556-628)
    if abs(y0 - y1) < 0.01:
        if intersect_only and (abs(y0 - round(y0)) < _EPS_INTERSECT
                               and abs(y1 - round(y1)) < _EPS_INTERSECT):
            return empty
        iY = int(np.floor(y0))
        iX = int(np.floor(x0))
        iXEnd = int(np.floor(x1 - _EPS_INTERSECT))
        if iXEnd < iX:
            return empty
        xs = np.arange(iX, iXEnd + 1, dtype=np.int64)
        return xs, np.full(len(xs), iY, dtype=np.int64)
    # general sloped case: supercover via sorted grid crossings
    ts = [0.0, 1.0]
    xa, xb = np.ceil(min(x0, x1)), np.floor(max(x0, x1))
    if xb >= xa:
        gx = np.arange(xa, xb + 1)
        ts.append(((gx - x0) / (x1 - x0)))
    ya, yb = np.ceil(min(y0, y1)), np.floor(max(y0, y1))
    if yb >= ya:
        gy = np.arange(ya, yb + 1)
        ts.append(((gy - y0) / (y1 - y0)))
    t = np.unique(np.clip(np.concatenate([np.atleast_1d(v) for v in ts]), 0.0, 1.0))
    mid = (t[:-1] + t[1:]) / 2.0
    mid = mid[t[1:] - t[:-1] > 1e-12]
    mx = x0 + mid * (x1 - x0)
    my = y0 + mid * (y1 - y0)
    return np.floor(mx).astype(np.int64), np.floor(my).astype(np.int64)


def burn_lines_all_touched(parts: Sequence[np.ndarray], width: int,
                           height: int, intersect_only: bool = False
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """GDALdllImageLineAllTouched over polyline parts (pixel coords)."""
    outx, outy = [], []
    for p in parts:
        p = np.asarray(p, dtype=np.float64)
        for j in range(1, len(p)):
            xs, ys = _all_touched_segment(p[j - 1, 0], p[j - 1, 1],
                                          p[j, 0], p[j, 1], intersect_only)
            outx.append(xs)
            outy.append(ys)
    if not outx:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ix = np.concatenate(outx)
    iy = np.concatenate(outy)
    keep = (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
    return ix[keep], iy[keep]


def rasterize_shape(kind: str, parts: List[np.ndarray], width: int,
                    height: int, all_touched: bool = False,
                    y_lo: int = 0, y_hi: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """One shape -> UNIQUE touched (ix, iy), gv_rasterize_one_shape
    dispatch (polygon: optional all-touched boundary + fill; line:
    Bresenham or all-touched). The unique set is the per-shape burn set
    (MERGE_ALG=ADD parity: each shape burns a pixel at most once)."""
    if kind == "polygon":
        fx, fy = fill_polygon(parts, width, height, y_lo=y_lo, y_hi=y_hi)
        if all_touched:
            bx, by = burn_lines_all_touched(
                [np.vstack([p, p[:1]]) for p in parts], width, height,
                intersect_only=True)
            m = (by >= y_lo) & (by <= (y_hi if y_hi is not None else height - 1))
            fx = np.concatenate([fx, bx[m]])
            fy = np.concatenate([fy, by[m]])
    elif kind == "line":
        if all_touched:
            fx, fy = burn_lines_all_touched(parts, width, height)
        else:
            fx, fy = burn_lines(parts, width, height)
        m = (fy >= y_lo) & (fy <= (y_hi if y_hi is not None else height - 1))
        fx, fy = fx[m], fy[m]
    elif kind == "point":
        pts = np.concatenate([np.asarray(p, dtype=np.float64) for p in parts])
        fx = np.floor(pts[:, 0]).astype(np.int64)
        fy = np.floor(pts[:, 1]).astype(np.int64)
        m = ((fx >= 0) & (fx < width) & (fy >= y_lo)
             & (fy <= (y_hi if y_hi is not None else height - 1)))
        fx, fy = fx[m], fy[m]
    else:
        raise ValueError(f"rasterize_shape: unsupported kind {kind}")
    if len(fx) == 0:
        return fx, fy
    key = fy * np.int64(width) + fx
    uniq = np.unique(key)
    return uniq % np.int64(width), uniq // np.int64(width)
