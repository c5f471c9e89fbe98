"""GCP polynomial, thin-plate-spline and RPC transformers.

Reference surface: the warp transformer chain —
``alg/gdal_crs.cpp`` (GCP polynomial orders 1-3, term layout
``CRS_georef`` :612-668), ``alg/gdal_tps.cpp`` (thin plate spline via
the classic r^2 log r^2 radial basis), ``alg/gdal_rpc.cpp`` (RPC03
20-term rational polynomials, term ordering :196-216, normalized
offsets/scales, iterative inverse :1130+). All re-derived from the
public formulations (the polynomial LSQ fit and TPS system are
textbook; the RPC term order is the public RPC00B/RPC03 spec). All
vectorized over numpy arrays; fit once (driver or actor ``__init__``),
evaluate per batch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# GCP polynomial (orders 1-3), CRS_georef term layout
# ---------------------------------------------------------------------------

_N_TERMS = {1: 3, 2: 6, 3: 10}
_MIN_GCPS = {1: 3, 2: 6, 3: 10}


def _poly_terms(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * x, x * y, y * y]
    if order >= 3:
        cols += [x ** 3, x * x * y, x * y * y, y ** 3]
    return np.stack(cols, axis=1)


class GCPPolynomialTransformer:
    """Least-squares GCP polynomial fit, both directions
    (pixel/line <-> geo), orders 1-3 with the reference's minimum-GCP
    requirements (`gdal_crs.cpp:342-343`). Means are subtracted before
    fitting for conditioning, as the reference does (`:451-457`)."""

    def __init__(self, px, py, gx, gy, order: int = 1):
        if order not in _N_TERMS:
            raise ValueError("order must be 1, 2 or 3")
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        gx = np.asarray(gx, dtype=np.float64)
        gy = np.asarray(gy, dtype=np.float64)
        if len(px) < _MIN_GCPS[order]:
            raise ValueError(f"order {order} needs >= {_MIN_GCPS[order]} GCPs")
        self.order = order
        self._p_mean = (px.mean(), py.mean())
        self._g_mean = (gx.mean(), gy.mean())
        A = _poly_terms(px - self._p_mean[0], py - self._p_mean[1], order)
        self._fwd_x, *_ = np.linalg.lstsq(A, gx, rcond=None)
        self._fwd_y, *_ = np.linalg.lstsq(A, gy, rcond=None)
        B = _poly_terms(gx - self._g_mean[0], gy - self._g_mean[1], order)
        self._inv_x, *_ = np.linalg.lstsq(B, px, rcond=None)
        self._inv_y, *_ = np.linalg.lstsq(B, py, rcond=None)
        # fit quality (RMS over the GCPs, like GDALGCPTransform's check)
        fx, fy = self.pixel_to_geo(px, py)
        self.rms = float(np.sqrt(((fx - gx) ** 2 + (fy - gy) ** 2).mean()))

    def pixel_to_geo(self, px, py):
        A = _poly_terms(np.asarray(px, dtype=np.float64) - self._p_mean[0],
                        np.asarray(py, dtype=np.float64) - self._p_mean[1],
                        self.order)
        return A @ self._fwd_x, A @ self._fwd_y

    def geo_to_pixel(self, gx, gy):
        B = _poly_terms(np.asarray(gx, dtype=np.float64) - self._g_mean[0],
                        np.asarray(gy, dtype=np.float64) - self._g_mean[1],
                        self.order)
        return B @ self._inv_x, B @ self._inv_y


# ---------------------------------------------------------------------------
# Thin plate spline
# ---------------------------------------------------------------------------

def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        out = r2 * np.log(r2)
    return np.where(r2 > 0, 0.5 * out, 0.0)  # r^2 log r = 0.5 r^2 log r^2


class TPSTransformer:
    """Thin plate spline interpolating transformer (exact at the GCPs),
    the `gdal_tps.cpp` analog (VizGeoref spline, public formulation):
    f(x,y) = a0 + a1 x + a2 y + sum_i w_i U(|p - p_i|), U = r^2 log r."""

    def __init__(self, px, py, gx, gy, _build_inverse: bool = True):
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        self._src = np.stack([px, py], axis=1)
        n = len(px)
        if n < 3:
            raise ValueError("TPS needs >= 3 control points")
        d2 = ((self._src[:, None, :] - self._src[None, :, :]) ** 2).sum(-1)
        K = _tps_kernel(d2)
        P = np.column_stack([np.ones(n), px, py])
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n, 0] = np.asarray(gx, dtype=np.float64)
        rhs[:n, 1] = np.asarray(gy, dtype=np.float64)
        sol = np.linalg.solve(A, rhs)
        self._w = sol[:n]
        self._a = sol[n:]
        # inverse spline (geo -> pixel), fitted symmetrically
        self._inv = None
        if _build_inverse:
            try:
                self._inv = TPSTransformer(gx, gy, px, py,
                                           _build_inverse=False)
            except np.linalg.LinAlgError:
                self._inv = None

    def pixel_to_geo(self, px, py):
        q = np.stack([np.asarray(px, dtype=np.float64),
                      np.asarray(py, dtype=np.float64)], axis=1)
        d2 = ((q[:, None, :] - self._src[None, :, :]) ** 2).sum(-1)
        U = _tps_kernel(d2)
        base = np.column_stack([np.ones(len(q)), q])
        out = U @ self._w + base @ self._a
        return out[:, 0], out[:, 1]

    def geo_to_pixel(self, gx, gy):
        if self._inv is None:
            raise ValueError("inverse TPS not available (singular system)")
        return self._inv.pixel_to_geo(gx, gy)


# ---------------------------------------------------------------------------
# RPC (20-term rational polynomials, RPC00B/RPC03 term order)
# ---------------------------------------------------------------------------

def _rpc_terms(L: np.ndarray, P: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Exact term ordering of `alg/gdal_rpc.cpp:196-216`."""
    return np.stack([
        np.ones_like(L), L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
        L * P * H, L ** 3, L * P * P, L * H * H, L * L * P, P ** 3,
        P * H * H, L * L * H, P * P * H, H ** 3,
    ], axis=1)


class RPCTransformer:
    """RPC ground->image transformer with iterative inverse
    (`alg/gdal_rpc.cpp` RPCTransformPoint / the inverse loop :1130+).

    coefs: dict with LINE_OFF/LINE_SCALE/SAMP_OFF/SAMP_SCALE/
    LAT_OFF/LAT_SCALE/LONG_OFF/LONG_SCALE/HEIGHT_OFF/HEIGHT_SCALE and
    the four 20-float lists LINE_NUM_COEFF/LINE_DEN_COEFF/
    SAMP_NUM_COEFF/SAMP_DEN_COEFF."""

    def __init__(self, coefs: dict):
        self.c = {k: (np.asarray(v, dtype=np.float64) if isinstance(v, (list, tuple))
                      else float(v)) for k, v in coefs.items()}
        for k in ("LINE_NUM_COEFF", "LINE_DEN_COEFF",
                  "SAMP_NUM_COEFF", "SAMP_DEN_COEFF"):
            if len(self.c[k]) != 20:
                raise ValueError(f"{k} must have 20 terms")

    def geo_to_pixel(self, lon, lat, height: Optional[np.ndarray] = None):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        h = (np.zeros_like(lon) if height is None
             else np.asarray(height, dtype=np.float64))
        c = self.c
        dl = lon - c["LONG_OFF"]
        dl = np.where(dl < -270, dl + 360, np.where(dl > 270, dl - 360, dl))
        L = dl / c["LONG_SCALE"]
        P = (lat - c["LAT_OFF"]) / c["LAT_SCALE"]
        H = (h - c["HEIGHT_OFF"]) / c["HEIGHT_SCALE"]
        T = _rpc_terms(L, P, H)
        samp = (T @ c["SAMP_NUM_COEFF"]) / (T @ c["SAMP_DEN_COEFF"])
        line = (T @ c["LINE_NUM_COEFF"]) / (T @ c["LINE_DEN_COEFF"])
        return (samp * c["SAMP_SCALE"] + c["SAMP_OFF"],
                line * c["LINE_SCALE"] + c["LINE_OFF"])

    def pixel_to_geo(self, px, py, height: Optional[np.ndarray] = None,
                     iterations: int = 10):
        """Iterative inverse with a numeric Jacobian, like the
        reference's RPCInverseTransformPoint loop."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        c = self.c
        lon = np.full_like(px, float(c["LONG_OFF"]))
        lat = np.full_like(py, float(c["LAT_OFF"]))
        eps_l = c["LONG_SCALE"] * 1e-6
        eps_p = c["LAT_SCALE"] * 1e-6
        for _ in range(iterations):
            sx, sy = self.geo_to_pixel(lon, lat, height)
            rx, ry = px - sx, py - sy
            sxl, syl = self.geo_to_pixel(lon + eps_l, lat, height)
            sxp, syp = self.geo_to_pixel(lon, lat + eps_p, height)
            j11 = (sxl - sx) / eps_l
            j12 = (sxp - sx) / eps_p
            j21 = (syl - sy) / eps_l
            j22 = (syp - sy) / eps_p
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-15, 1e-15, det)
            lon = lon + (j22 * rx - j12 * ry) / det
            lat = lat + (-j21 * rx + j11 * ry) / det
        return lon, lat


# uniform stage surface: every transformer exposes .transform(x, y) like
# geom.proj.Transformer, so stages/reproject.py accepts any of them
GCPPolynomialTransformer.transform = GCPPolynomialTransformer.pixel_to_geo
TPSTransformer.transform = TPSTransformer.pixel_to_geo
RPCTransformer.transform = RPCTransformer.geo_to_pixel


# ---------------------------------------------------------------------------
# Homography (projective transform)
# ---------------------------------------------------------------------------

class HomographyTransformer:
    """8-parameter projective transform fit from >= 4 GCPs
    (``alg/gdal_homography.cpp`` surface): the normalized DLT system
    solved by least squares; the inverse is the inverted 3x3 matrix.
    Exact for any perspective mapping (where polynomial order 1 bends
    and order 2+ overfits)."""

    def __init__(self, px, py, gx, gy):
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        gx = np.asarray(gx, dtype=np.float64)
        gy = np.asarray(gy, dtype=np.float64)
        if len(px) < 4:
            raise ValueError("homography needs >= 4 GCPs")
        self._H = self._dlt(px, py, gx, gy)
        self._Hinv = np.linalg.inv(self._H)
        fx, fy = self.pixel_to_geo(px, py)
        self.rms = float(np.sqrt(((fx - gx) ** 2
                                  + (fy - gy) ** 2).mean()))

    @staticmethod
    def _norm(x, y):
        """Hartley normalization: zero-mean, mean distance sqrt(2)."""
        mx, my = x.mean(), y.mean()
        d = np.hypot(x - mx, y - my).mean()
        s = np.sqrt(2.0) / d if d > 0 else 1.0
        T = np.array([[s, 0, -s * mx], [0, s, -s * my], [0, 0, 1.0]])
        return T

    @classmethod
    def _dlt(cls, px, py, gx, gy):
        Tp = cls._norm(px, py)
        Tg = cls._norm(gx, gy)
        pxn = Tp[0, 0] * px + Tp[0, 2]
        pyn = Tp[1, 1] * py + Tp[1, 2]
        gxn = Tg[0, 0] * gx + Tg[0, 2]
        gyn = Tg[1, 1] * gy + Tg[1, 2]
        n = len(px)
        A = np.zeros((2 * n, 9))
        A[0::2, 0] = pxn
        A[0::2, 1] = pyn
        A[0::2, 2] = 1.0
        A[0::2, 6] = -gxn * pxn
        A[0::2, 7] = -gxn * pyn
        A[0::2, 8] = -gxn
        A[1::2, 3] = pxn
        A[1::2, 4] = pyn
        A[1::2, 5] = 1.0
        A[1::2, 6] = -gyn * pxn
        A[1::2, 7] = -gyn * pyn
        A[1::2, 8] = -gyn
        _u, _s, vt = np.linalg.svd(A)
        Hn = vt[-1].reshape(3, 3)
        H = np.linalg.inv(Tg) @ Hn @ Tp
        return H / H[2, 2]

    @staticmethod
    def _apply(H, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
        ox = (H[0, 0] * x + H[0, 1] * y + H[0, 2]) / w
        oy = (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / w
        return ox, oy

    def pixel_to_geo(self, px, py):
        return self._apply(self._H, px, py)

    def geo_to_pixel(self, gx, gy):
        return self._apply(self._Hinv, gx, gy)


# ---------------------------------------------------------------------------
# Geolocation arrays
# ---------------------------------------------------------------------------

class GeolocTransformer:
    """Geolocation-array transformer (``alg/gdalgeoloc.cpp``): 2-D
    lon/lat arrays give the forward map by bilinear interpolation;
    the inverse seeds from a scatter-filled backmap grid (GDAL's
    GDALGeoLoc backmap) and refines with Gauss-Newton on the bilinear
    surface. Fit once per worker; evaluate vectorized per batch."""

    def __init__(self, lons: np.ndarray, lats: np.ndarray,
                 pixel_offset: float = 0.0, line_offset: float = 0.0,
                 pixel_step: float = 1.0, line_step: float = 1.0,
                 backmap_oversample: float = 1.3):
        self.lons = np.asarray(lons, dtype=np.float64)
        self.lats = np.asarray(lats, dtype=np.float64)
        if self.lons.shape != self.lats.shape or self.lons.ndim != 2:
            raise ValueError("lon/lat arrays must share a 2-D shape")
        self.po, self.lo = float(pixel_offset), float(line_offset)
        self.ps, self.ls = float(pixel_step), float(line_step)
        ny, nx = self.lons.shape
        # backmap: geo bbox gridded at ~oversample x the geoloc res,
        # scatter geoloc samples, then nearest-fill holes (bounded
        # dilation) — the seed only needs to land within one cell
        bw = max(4, int(nx * backmap_oversample))
        bh = max(4, int(ny * backmap_oversample))
        self._bx0 = self.lons.min()
        self._by0 = self.lats.min()
        self._bdx = (self.lons.max() - self._bx0) / bw or 1.0
        self._bdy = (self.lats.max() - self._by0) / bh or 1.0
        gj, gi = np.meshgrid(np.arange(nx), np.arange(ny))
        cx = np.clip(((self.lons - self._bx0) / self._bdx)
                     .astype(np.int64), 0, bw - 1)
        cy = np.clip(((self.lats - self._by0) / self._bdy)
                     .astype(np.int64), 0, bh - 1)
        sum_x = np.zeros((bh, bw))
        sum_y = np.zeros((bh, bw))
        cnt = np.zeros((bh, bw))
        np.add.at(sum_x, (cy, cx), gj)
        np.add.at(sum_y, (cy, cx), gi)
        np.add.at(cnt, (cy, cx), 1.0)
        with np.errstate(invalid="ignore"):
            bm_x = sum_x / cnt
            bm_y = sum_y / cnt
        # bounded nearest-fill of empty cells
        for _ in range(max(bw, bh)):
            hole = ~np.isfinite(bm_x)
            if not hole.any():
                break
            for sh in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                src_x = np.roll(bm_x, sh, axis=(0, 1))
                src_y = np.roll(bm_y, sh, axis=(0, 1))
                take = hole & np.isfinite(src_x)
                bm_x[take] = src_x[take]
                bm_y[take] = src_y[take]
                hole = ~np.isfinite(bm_x)
        self._bm_x, self._bm_y = bm_x, bm_y

    def _sample(self, fx, fy):
        """bilinear sample of the geoloc arrays at fractional indices."""
        ny, nx = self.lons.shape
        fx = np.clip(fx, 0.0, nx - 1.0)
        fy = np.clip(fy, 0.0, ny - 1.0)
        x0 = np.clip(np.floor(fx).astype(np.int64), 0, nx - 2)
        y0 = np.clip(np.floor(fy).astype(np.int64), 0, ny - 2)
        tx = fx - x0
        ty = fy - y0
        out = []
        for arr in (self.lons, self.lats):
            v = (arr[y0, x0] * (1 - tx) * (1 - ty)
                 + arr[y0, x0 + 1] * tx * (1 - ty)
                 + arr[y0 + 1, x0] * (1 - tx) * ty
                 + arr[y0 + 1, x0 + 1] * tx * ty)
            out.append(v)
        return out[0], out[1]

    def pixel_to_geo(self, px, py):
        fx = (np.asarray(px, dtype=np.float64) - self.po) / self.ps
        fy = (np.asarray(py, dtype=np.float64) - self.lo) / self.ls
        return self._sample(fx, fy)

    def geo_to_pixel(self, gx, gy, iterations: int = 8):
        gx = np.asarray(gx, dtype=np.float64)
        gy = np.asarray(gy, dtype=np.float64)
        bh, bw = self._bm_x.shape
        cx = np.clip(((gx - self._bx0) / self._bdx).astype(np.int64),
                     0, bw - 1)
        cy = np.clip(((gy - self._by0) / self._bdy).astype(np.int64),
                     0, bh - 1)
        fx = self._bm_x[cy, cx].copy()
        fy = self._bm_y[cy, cx].copy()
        eps = 1e-4
        for _ in range(iterations):
            sx, sy = self._sample(fx, fy)
            rx, ry = gx - sx, gy - sy
            if max(np.abs(rx).max(initial=0.0),
                   np.abs(ry).max(initial=0.0)) < 1e-12:
                break
            # finite-difference Jacobian of the bilinear surface
            sxp, syp = self._sample(fx + eps, fy)
            sxq, syq = self._sample(fx, fy + eps)
            j00 = (sxp - sx) / eps
            j10 = (syp - sy) / eps
            j01 = (sxq - sx) / eps
            j11 = (syq - sy) / eps
            det = j00 * j11 - j01 * j10
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            fx = fx + (rx * j11 - ry * j01) / det
            fy = fy + (ry * j00 - rx * j10) / det
            ny, nx = self.lons.shape
            fx = np.clip(fx, 0.0, nx - 1.0)
            fy = np.clip(fy, 0.0, ny - 1.0)
        return fx * self.ps + self.po, fy * self.ls + self.lo
