"""Approximating transformer: subdivide-until-linear scanline transform.

Reference: GDALApproxTransformer (`alg/gdaltransformer.cpp:58,2624`) —
the reference's main warp speed lever. A destination scanline is
transformed exactly only at segment endpoints + midpoint; when the
midpoint's linear prediction lands within the error threshold, the
interior points are filled by interpolation, else the segment splits
and recurses. Typical projected↔geographic pairs are near-linear along
scanlines, so evaluations drop from O(width) to O(log width) per row.

Error threshold semantics match gdalwarp's `-et` (default 0.125,
measured in destination-transform output units scaled by the caller —
the warp CLI passes 0.125 source pixels). `threshold=0` disables the
approximation (every point transformed exactly), mirroring `-et 0`.
"""

from __future__ import annotations

import numpy as np

_MIN_SEG = 16  # segments shorter than this transform exactly


class ApproxTransformer:
    """Wraps a transformer object exposing `.transform(x, y)` →
    `(tx, ty)` arrays. Counts base evaluations in `n_evals` (the
    parity test asserts the ≥2× reduction)."""

    def __init__(self, base, threshold: float = 0.0):
        self.base = base
        self.threshold = float(threshold)
        self.n_evals = 0

    def transform(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        self.n_evals += x.size
        return self.base.transform(x, y)

    def transform_scanline(self, xs: np.ndarray, y: float):
        """Transform a monotone 1-D sweep of x at constant y.
        -> (tx, ty) float64 arrays."""
        xs = np.asarray(xs, dtype=np.float64)
        n = len(xs)
        tx = np.empty(n)
        ty = np.empty(n)
        if n == 0:
            return tx, ty
        if self.threshold <= 0.0 or n < _MIN_SEG:
            ex, ey = self.transform(xs, np.full(n, y))
            return np.asarray(ex, dtype=np.float64), \
                np.asarray(ey, dtype=np.float64)
        ends_x, ends_y = self.transform(
            np.array([xs[0], xs[-1]]), np.array([y, y]))
        tx[0], tx[-1] = ends_x[0], ends_x[1]
        ty[0], ty[-1] = ends_y[0], ends_y[1]
        self._segment(xs, y, 0, n - 1, tx, ty)
        return tx, ty

    def _segment(self, xs, y, i0, i1, tx, ty):
        """Fill tx/ty for the open interval (i0, i1); endpoints are
        already exact."""
        if i1 - i0 < 2:
            return
        if i1 - i0 < _MIN_SEG:
            idx = np.arange(i0 + 1, i1)
            ex, ey = self.transform(xs[idx], np.full(len(idx), y))
            tx[idx] = ex
            ty[idx] = ey
            return
        im = (i0 + i1) // 2
        ex, ey = self.transform(np.array([xs[im]]), np.array([y]))
        ex, ey = float(np.asarray(ex)[0]), float(np.asarray(ey)[0])
        t = (xs[im] - xs[i0]) / (xs[i1] - xs[i0])
        px = tx[i0] + t * (tx[i1] - tx[i0])
        py = ty[i0] + t * (ty[i1] - ty[i0])
        tx[im], ty[im] = ex, ey
        if (abs(px - ex) <= self.threshold
                and abs(py - ey) <= self.threshold):
            idx = np.arange(i0 + 1, im)
            tt = (xs[idx] - xs[i0]) / (xs[im] - xs[i0])
            tx[idx] = tx[i0] + tt * (ex - tx[i0])
            ty[idx] = ty[i0] + tt * (ey - ty[i0])
            idx = np.arange(im + 1, i1)
            tt = (xs[idx] - xs[im]) / (xs[i1] - xs[im])
            tx[idx] = ex + tt * (tx[i1] - ex)
            ty[idx] = ey + tt * (ty[i1] - ey)
            return
        self._segment(xs, y, i0, im, tx, ty)
        self._segment(xs, y, im, i1, tx, ty)
