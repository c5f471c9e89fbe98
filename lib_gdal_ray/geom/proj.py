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


_TRANSFORMS = {
    (4326, 3857): lonlat_to_mercator,
    (3857, 4326): mercator_to_lonlat,
    (4326, 4326): lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)),
    (3857, 3857): lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)),
}


class Transformer:
    """Cached CRS→CRS transformer; mirrors GDAL's per-thread cached
    OGRCoordinateTransformation pattern (``ogr/ogr_proj_p.cpp``)."""

    def __init__(self, src_epsg: int, dst_epsg: int):
        key = (src_epsg, dst_epsg)
        if key not in _TRANSFORMS:
            raise NotImplementedError(f"transform {src_epsg}->{dst_epsg} not registered")
        self._fn = _TRANSFORMS[key]
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
