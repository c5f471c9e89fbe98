"""Coordinate reprojection kernels (stateless, numpy-vectorized).

v0 supports the pair the tiling/join engine needs: EPSG:4326 (lon/lat
degrees, WGS84) ↔ EPSG:3857 (spherical Web-Mercator meters), plus
affine geotransform apply/invert (reference:
``gcore/gdal_geotransform.h``; mercator math per the WebMercatorQuad
definition GDAL's tile matrix set uses, ``gcore/tilematrixset.cpp``).
The reference delegates general CRS→CRS to PROJ (``ogr/ogrct.cpp:665``)
— that generality is behind `Transformer.get`, so more pairs can be
registered without touching call sites.
"""

from __future__ import annotations

import numpy as np

R_MERC = 6378137.0
MAX_MERC_LAT = 85.05112878


def lonlat_to_mercator(lon, lat, clamp: bool = True):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if clamp:
        lat = np.clip(lat, -MAX_MERC_LAT, MAX_MERC_LAT)
    x = R_MERC * np.radians(lon)
    y = R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MERC)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# WGS84 ellipsoidal transverse Mercator (UTM) — Snyder (1987) series
# ---------------------------------------------------------------------------

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_E2 = WGS84_F * (2.0 - WGS84_F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996
# meridional-arc coefficients (Snyder eq. 3-21)
_M0 = 1.0 - _E2 / 4.0 - 3.0 * _E2 ** 2 / 64.0 - 5.0 * _E2 ** 3 / 256.0
_M2 = 3.0 * _E2 / 8.0 + 3.0 * _E2 ** 2 / 32.0 + 45.0 * _E2 ** 3 / 1024.0
_M4 = 15.0 * _E2 ** 2 / 256.0 + 45.0 * _E2 ** 3 / 1024.0
_M6 = 35.0 * _E2 ** 3 / 3072.0


def utm_central_meridian(zone: int) -> float:
    return float(zone) * 6.0 - 183.0


def utm_forward(lon, lat, zone: int, south: bool = False):
    """EPSG:4326 -> UTM easting/northing (m), WGS84 ellipsoid.

    Snyder, *Map Projections — A Working Manual* (USGS PP 1395),
    eq. 8-9..8-13 — the same series PROJ's tmerc uses at this accuracy
    (sub-mm inside the zone). Reference analog: `ogr/ogrct.cpp:665`
    (delegates to PROJ); the series is public-domain USGS math.
    """
    lon = np.asarray(lon, dtype=np.float64)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam0 = np.radians(utm_central_meridian(zone))
    s, c = np.sin(phi), np.cos(phi)
    n = WGS84_A / np.sqrt(1.0 - _E2 * s * s)
    t = (s / c) ** 2
    cc = _EP2 * c * c
    aa = (np.radians(lon) - lam0) * c
    m = WGS84_A * (_M0 * phi - _M2 * np.sin(2 * phi)
                   + _M4 * np.sin(4 * phi) - _M6 * np.sin(6 * phi))
    x = _K0 * n * (aa + (1 - t + cc) * aa ** 3 / 6.0
                   + (5 - 18 * t + t * t + 72 * cc - 58 * _EP2) * aa ** 5 / 120.0)
    y = _K0 * (m + n * (s / c) * (aa ** 2 / 2.0
               + (5 - t + 9 * cc + 4 * cc * cc) * aa ** 4 / 24.0
               + (61 - 58 * t + t * t + 600 * cc - 330 * _EP2) * aa ** 6 / 720.0))
    x = x + 500000.0
    if south:
        y = y + 10000000.0
    return x, y


def utm_inverse(x, y, zone: int, south: bool = False):
    """UTM -> EPSG:4326 (Snyder eq. 8-14..8-25)."""
    x = np.asarray(x, dtype=np.float64) - 500000.0
    y = np.asarray(y, dtype=np.float64)
    if south:
        y = y - 10000000.0
    lam0 = np.radians(utm_central_meridian(zone))
    m = y / _K0
    mu = m / (WGS84_A * _M0)
    e1 = (1.0 - np.sqrt(1.0 - _E2)) / (1.0 + np.sqrt(1.0 - _E2))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
    s1, c1 = np.sin(phi1), np.cos(phi1)
    t1 = (s1 / c1) ** 2
    cc1 = _EP2 * c1 * c1
    n1 = WGS84_A / np.sqrt(1.0 - _E2 * s1 * s1)
    r1 = WGS84_A * (1.0 - _E2) / (1.0 - _E2 * s1 * s1) ** 1.5
    d = x / (n1 * _K0)
    phi = phi1 - (n1 * (s1 / c1) / r1) * (
        d ** 2 / 2.0
        - (5 + 3 * t1 + 10 * cc1 - 4 * cc1 * cc1 - 9 * _EP2) * d ** 4 / 24.0
        + (61 + 90 * t1 + 298 * cc1 + 45 * t1 * t1 - 252 * _EP2
           - 3 * cc1 * cc1) * d ** 6 / 720.0)
    lam = lam0 + (d - (1 + 2 * t1 + cc1) * d ** 3 / 6.0
                  + (5 - 2 * cc1 + 28 * t1 - 3 * cc1 * cc1 + 8 * _EP2
                     + 24 * t1 * t1) * d ** 5 / 120.0) / c1
    return np.degrees(lam), np.degrees(phi)


def utm_epsg(zone: int, south: bool = False) -> int:
    return (32700 if south else 32600) + zone


def parse_utm_epsg(epsg: int):
    """EPSG 326xx/327xx -> (zone, south) or None."""
    if 32601 <= epsg <= 32660:
        return epsg - 32600, False
    if 32701 <= epsg <= 32760:
        return epsg - 32700, True
    return None


def utm_zone_for_lon(lon) -> np.ndarray:
    """Standard zone assignment floor((lon+180)/6)+1 (clipped 1..60)."""
    z = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 6.0).astype(np.int64) + 1
    return np.clip(z, 1, 60)


_IDENT = lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))  # noqa: E731

_TRANSFORMS = {
    (4326, 3857): lonlat_to_mercator,
    (3857, 4326): mercator_to_lonlat,
    (4326, 4326): _IDENT,
    (3857, 3857): _IDENT,
}


def _resolve(src_epsg: int, dst_epsg: int):
    """Registry lookup with dynamic UTM codes and composition through
    4326 (the hub CRS, exactly like PROJ's pipeline through a
    geographic hub)."""
    key = (src_epsg, dst_epsg)
    if key in _TRANSFORMS:
        return _TRANSFORMS[key]
    su, du = parse_utm_epsg(src_epsg), parse_utm_epsg(dst_epsg)
    if src_epsg == 4326 and du is not None:
        return lambda x, y: utm_forward(x, y, du[0], du[1])
    if su is not None and dst_epsg == 4326:
        return lambda x, y: utm_inverse(x, y, su[0], su[1])
    if su is not None and du is not None and src_epsg == dst_epsg:
        return _IDENT
    # compose through 4326 when both legs exist
    leg1 = None
    if su is not None:
        leg1 = lambda x, y: utm_inverse(x, y, su[0], su[1])  # noqa: E731
    elif (src_epsg, 4326) in _TRANSFORMS:
        leg1 = _TRANSFORMS[(src_epsg, 4326)]
    leg2 = None
    if du is not None:
        leg2 = lambda x, y: utm_forward(x, y, du[0], du[1])  # noqa: E731
    elif (4326, dst_epsg) in _TRANSFORMS:
        leg2 = _TRANSFORMS[(4326, dst_epsg)]
    if leg1 is not None and leg2 is not None:
        return lambda x, y: leg2(*leg1(x, y))
    return None


class Transformer:
    """Cached CRS→CRS transformer; mirrors GDAL's per-thread cached
    OGRCoordinateTransformation pattern (``ogr/ogr_proj_p.cpp``).
    Supports 4326, 3857 and all WGS84 UTM zones (EPSG 326xx/327xx),
    composing through 4326 for cross-CRS pairs."""

    def __init__(self, src_epsg: int, dst_epsg: int):
        fn = _resolve(src_epsg, dst_epsg)
        if fn is None:
            raise NotImplementedError(f"transform {src_epsg}->{dst_epsg} not registered")
        self._fn = fn
        self.src_epsg = src_epsg
        self.dst_epsg = dst_epsg

    @classmethod
    def get(cls, src_epsg: int, dst_epsg: int) -> "Transformer":
        return cls(src_epsg, dst_epsg)

    def transform(self, x, y):
        return self._fn(x, y)


class GeoTransform:
    """Affine pixel<->georeferenced mapping, GDAL convention
    (gt[0..5]: x = gt0 + col*gt1 + row*gt2; y = gt3 + col*gt4 + row*gt5)."""

    def __init__(self, gt):
        self.gt = tuple(float(v) for v in gt)
        g0, g1, g2, g3, g4, g5 = self.gt
        det = g1 * g5 - g2 * g4
        if det == 0.0:
            raise ValueError("non-invertible geotransform")
        self._inv = (g5 / det, -g2 / det, -g4 / det, g1 / det)

    def pixel_to_geo(self, col, row):
        g0, g1, g2, g3, g4, g5 = self.gt
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        return g0 + col * g1 + row * g2, g3 + col * g4 + row * g5

    def geo_to_pixel(self, x, y):
        g0, _, _, g3, _, _ = self.gt
        a, b, c, d = self._inv
        dx = np.asarray(x, dtype=np.float64) - g0
        dy = np.asarray(y, dtype=np.float64) - g3
        return a * dx + b * dy, c * dx + d * dy
