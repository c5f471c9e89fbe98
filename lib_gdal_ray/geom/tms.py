"""OGC TileMatrixSet registry — named tiling schemes beyond
WebMercatorQuad.

Parity target: `gcore/tilematrixset.cpp` (TileMatrixSet::parse) — the
well-known schemes GDAL's `gdal raster tile --tiling-scheme` accepts
(`apps/gdalalg_raster_tile.cpp`), plus TMS 2.0 JSON definitions. Each
scheme is (CRS, top-left origin, base resolution, base matrix shape,
tile size); zoom z divides the resolution by 2^z and doubles the
matrix.

Built-ins (constants match tilematrixset.cpp exactly):
* WebMercatorQuad / GoogleMapsCompatible — EPSG:3857, 1x1 at z0,
  res0 = 2*pi*a/256. Tile math DELEGATES to geom/cells.py so the
  floor parity with the SQL oracles is bit-identical.
* WorldCRS84Quad / InspireCRS84Quad / PseudoTMS_GlobalGeodetic —
  CRS84, 2x1 at z0, res0 = 180/256, origin (-180, 90).
* GoogleCRS84Quad — CRS84, 1x1 at z0 over a SQUARE (-180..180,
  -180..180) grid, res0 = 360/256 (WMTS 1.0 Annex E.3; rows above
  +90 / below -90 are simply never populated).
* WorldMercatorWGS84Quad — EPSG:3395 (ellipsoidal Mercator), same
  grid shape as WebMercatorQuad.

All tile/pixel assignment is vectorized numpy; ids pack with the same
(z, gx, gy) scheme as pipelines/rasterize.pack_pixel.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from . import cells

_A = 6378137.0
HALF_CIRCUMFERENCE = _A * math.pi
_E2_WGS84 = 0.00669437999014  # first eccentricity squared
_E_WGS84 = math.sqrt(_E2_WGS84)


@dataclass(frozen=True)
class TileMatrixSet:
    identifier: str
    crs: str                       # "EPSG:3857" | "CRS84" | "EPSG:3395" | ...
    top_left: Tuple[float, float]  # grid origin (x of col 0, y of row 0)
    res0: float                    # resolution (units/px) at zoom 0
    matrix_w0: int                 # matrix width at zoom 0
    matrix_h0: int
    tile_size: int = 256
    zmax: int = 30

    def res(self, z: int) -> float:
        return self.res0 / (1 << z)

    def matrix_width(self, z: int) -> int:
        return self.matrix_w0 << z

    def matrix_height(self, z: int) -> int:
        return self.matrix_h0 << z

    # -- projection: lon/lat -> grid CRS ---------------------------------

    def project(self, lon: np.ndarray, lat: np.ndarray):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        if self.crs == "EPSG:3857":
            lat = np.clip(lat, -cells.MAX_MERC_LAT, cells.MAX_MERC_LAT)
            x = lon / 180.0 * HALF_CIRCUMFERENCE
            rad = np.radians(lat)
            y = (np.log(np.tan(rad) + 1.0 / np.cos(rad)) / math.pi
                 * HALF_CIRCUMFERENCE)
            return x, y
        if self.crs == "EPSG:3395":
            lat = np.clip(lat, -89.99, 89.99)
            rad = np.radians(lat)
            es = _E_WGS84 * np.sin(rad)
            y = _A * np.log(np.tan(math.pi / 4 + rad / 2)
                            * ((1 - es) / (1 + es)) ** (_E_WGS84 / 2))
            return lon / 180.0 * HALF_CIRCUMFERENCE, y
        if self.crs in ("CRS84", "EPSG:4326"):
            return lon, lat
        raise ValueError(f"no lon/lat projector for CRS {self.crs}; "
                         "pass projected coordinates via xy_to_tile")

    # -- tile / pixel assignment -----------------------------------------

    def lonlat_to_tile(self, lon, lat, z: int):
        """(lon, lat) -> (tx, ty), clipped to the matrix. For
        WebMercatorQuad delegates to cells.lonlat_to_tile (bit parity
        with the SQL oracles)."""
        if self.identifier == "WebMercatorQuad":
            return cells.lonlat_to_tile(lon, lat, z)
        x, y = self.project(lon, lat)
        return self.xy_to_tile(x, y, z)

    def xy_to_tile(self, x, y, z: int):
        span = self.res(z) * self.tile_size
        tx = np.floor((np.asarray(x, np.float64) - self.top_left[0])
                      / span).astype(np.int64)
        ty = np.floor((self.top_left[1] - np.asarray(y, np.float64))
                      / span).astype(np.int64)
        np.clip(tx, 0, self.matrix_width(z) - 1, out=tx)
        np.clip(ty, 0, self.matrix_height(z) - 1, out=ty)
        return tx, ty

    def lonlat_to_pixel(self, lon, lat, z: int):
        """(lon, lat) -> global integer pixel (gx, gy) at zoom z,
        clipped to the matrix extent."""
        if self.identifier == "WebMercatorQuad":
            tx, ty, px, py = cells.tile_pixel(lon, lat, z, self.tile_size)
            return tx * self.tile_size + px, ty * self.tile_size + py
        x, y = self.project(lon, lat)
        r = self.res(z)
        gx = np.floor((np.asarray(x, np.float64) - self.top_left[0])
                      / r).astype(np.int64)
        gy = np.floor((self.top_left[1] - np.asarray(y, np.float64))
                      / r).astype(np.int64)
        np.clip(gx, 0, self.matrix_width(z) * self.tile_size - 1, out=gx)
        np.clip(gy, 0, self.matrix_height(z) * self.tile_size - 1, out=gy)
        return gx, gy

    def tile_bounds(self, z: int, tx: int, ty: int):
        """Grid-CRS (x0, y0, x1, y1) of tile (tx, ty) — y0 < y1."""
        span = self.res(z) * self.tile_size
        x0 = self.top_left[0] + tx * span
        y1 = self.top_left[1] - ty * span
        return (x0, y1 - span, x0 + span, y1)

    def tile_transform(self, z: int, tx: int, ty: int):
        """GDAL 6-value geotransform for tile (tx, ty)."""
        r = self.res(z)
        x0, _, _, y1 = self.tile_bounds(z, tx, ty)
        return (x0, r, 0.0, y1, 0.0, -r)

    def extent(self):
        """Full grid extent at z0 (x0, y0, x1, y1)."""
        w = self.res0 * self.tile_size * self.matrix_w0
        h = self.res0 * self.tile_size * self.matrix_h0
        return (self.top_left[0], self.top_left[1] - h,
                self.top_left[0] + w, self.top_left[1])


_REGISTRY: Dict[str, TileMatrixSet] = {}


def _register(tms: TileMatrixSet, *aliases: str):
    for k in (tms.identifier, *aliases):
        _REGISTRY[k.lower()] = tms


_register(TileMatrixSet(
    "WebMercatorQuad", "EPSG:3857",
    (-HALF_CIRCUMFERENCE, HALF_CIRCUMFERENCE),
    2 * HALF_CIRCUMFERENCE / 256, 1, 1),
    "GoogleMapsCompatible", "mercator",
    "http://www.opengis.net/def/tilematrixset/OGC/1.0/WebMercatorQuad")

_register(TileMatrixSet(
    "WorldCRS84Quad", "CRS84", (-180.0, 90.0), 180.0 / 256, 2, 1,
    zmax=29),
    "InspireCRS84Quad", "PseudoTMS_GlobalGeodetic", "geodetic",
    "http://www.opengis.net/def/tilematrixset/OGC/1.0/WorldCRS84Quad")

_register(TileMatrixSet(
    "GoogleCRS84Quad", "CRS84", (-180.0, 180.0), 360.0 / 256, 1, 1),
    "http://www.opengis.net/def/wkss/OGC/1.0/GoogleCRS84Quad")

_register(TileMatrixSet(
    "WorldMercatorWGS84Quad", "EPSG:3395",
    (-HALF_CIRCUMFERENCE, HALF_CIRCUMFERENCE),
    2 * HALF_CIRCUMFERENCE / 256, 1, 1),
    "http://www.opengis.net/def/tilematrixset/OGC/1.0/"
    "WorldMercatorWGS84Quad")


def parse_tms_json(text: str) -> TileMatrixSet:
    """TMS 2.0 ("crs" + "tileMatrices") or 1.0 ("identifier" +
    "tileMatrix") JSON -> TileMatrixSet. Requires the quad-tree
    property GDAL's tiling path also requires: each level halves the
    previous resolution (checked; non-quad-tree sets are rejected
    like gdal_raster_tile does)."""
    doc = json.loads(text)
    if "tileMatrices" in doc:       # TMS 2.0
        ident = doc.get("id") or doc.get("identifier") or "custom"
        crs = doc.get("crs", "")
        mats = doc["tileMatrices"]
        res_key, tl_key = "cellSize", "pointOfOrigin"
        w_key, h_key = "matrixWidth", "matrixHeight"
        tw_key = "tileWidth"
    elif "tileMatrix" in doc:       # TMS 1.0
        ident = doc.get("identifier", "custom")
        crs = doc.get("supportedCRS", doc.get("crs", ""))
        mats = doc["tileMatrix"]
        res_key, tl_key = None, "topLeftCorner"
        w_key, h_key = "matrixWidth", "matrixHeight"
        tw_key = "tileWidth"
    else:
        raise ValueError("not a TileMatrixSet JSON document")
    if isinstance(crs, dict):
        crs = crs.get("uri", "")
    if "3857" in crs:
        crs = "EPSG:3857"
    elif "3395" in crs:
        crs = "EPSG:3395"
    elif "4326" in crs or "CRS84" in crs:
        crs = "CRS84"
    mats = sorted(mats, key=lambda m: -_mat_res(m, res_key))
    res = [_mat_res(m, res_key) for m in mats]
    for i in range(1, len(res)):
        if abs(res[i - 1] / res[i] - 2.0) > 1e-9:
            raise ValueError(
                "tile matrix set is not a quad-tree (resolutions must "
                "halve per level)")
    m0 = mats[0]
    tl = m0[tl_key]
    return TileMatrixSet(ident, crs, (float(tl[0]), float(tl[1])),
                         res[0], int(m0[w_key]), int(m0[h_key]),
                         tile_size=int(m0[tw_key]),
                         zmax=len(mats) - 1)


def _mat_res(m: dict, res_key: Optional[str]) -> float:
    if res_key and res_key in m:
        return float(m[res_key])
    # 1.0: scaleDenominator * 0.28e-3 (OGC standard pixel size)
    return float(m["scaleDenominator"]) * 0.28e-3


def get_tms(name_or_def) -> TileMatrixSet:
    """Resolve a scheme: a TileMatrixSet instance (pass-through), a
    well-known name/alias/URI, a JSON definition string, or a path to
    a .json file — exactly the TileMatrixSet::parse contract."""
    if isinstance(name_or_def, TileMatrixSet):
        return name_or_def
    key = str(name_or_def)
    hit = _REGISTRY.get(key.lower())
    if hit is not None:
        return hit
    if key.lstrip().startswith("{"):
        return parse_tms_json(key)
    import os

    if os.path.exists(key):
        with open(key) as f:
            return parse_tms_json(f.read())
    raise ValueError(f"unknown tiling scheme {name_or_def!r}; "
                     f"known: {sorted(set(t.identifier for t in _REGISTRY.values()))}")
