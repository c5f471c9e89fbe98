"""STACTA (STAC tiled-assets item) raster reader.

A STAC item JSON with the `tiled-assets` extension:
`tiles:tile_matrix_links` bounds the available tiles per zoom,
`tiles:tile_matrix_sets` embeds the OGC TileMatrixSet definitions
(topLeftCorner, tileWidth/Height, matrixWidth/Height,
scaleDenominator — resolution = scaleDenominator · 0.28 mm /
111319.4907932736 m-per-degree for geographic CRS), and
`asset_templates` gives the tile href template
({TileMatrixSet}/{TileMatrix}/{TileRow}/{TileCol}).  The deepest
zoom level is the full-resolution mosaic; shallower levels are
overviews.

Reference: frmts/stacta/stactadataset.cpp; autotest stacta.py pins
size 2048×1024, gt (-180, 0.17578125, ...), 3 bands, nodata 0, and
pixel equality with a VRT of the level-2 tiles (mirrored in
tests/test_stacta.py). Re-derived; no code copied.  Remote (http)
tile hrefs out of scope in this sandbox (documented).

Ray shape: tiles decode independently — one task per tile in
`read_stacta_pixels` when the mosaic is large.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

_M_PER_DEG = 111319.4907932736


def identify_stacta(buf: bytes) -> bool:
    head = buf[:4096]
    return b"tiled-assets" in head or b"tiles:tile_matrix_links" in head


def decode_stacta(path: str, zoom: Optional[int] = None):
    """STACTA item path -> (mosaic array, meta with overview list)."""
    from .rasters import open_raster_path

    with open(path, "rb") as f:
        doc = json.loads(f.read())
    props = doc.get("properties") or {}
    links = props.get("tiles:tile_matrix_links") or {}
    tms_defs = props.get("tiles:tile_matrix_sets") or {}
    templates = doc.get("asset_templates") or {}
    if not links or not templates:
        raise ValueError("STACTA: missing tile matrix links/templates")
    tms_name, link = next(iter(links.items()))
    limits = {int(k): v for k, v in (link.get("limits") or {}).items()}
    if zoom is None:
        zoom = max(limits)
    lim = limits[zoom]
    tmpl = next(iter(templates.values()))["href"]

    # matrix definition for this zoom
    matrices = {}
    tms = tms_defs.get(tms_name) or {}
    for m in tms.get("tileMatrix", tms.get("tileMatrices", [])):
        matrices[int(m["identifier"])] = m
    m = matrices.get(zoom)
    if m is None:
        raise ValueError(f"STACTA: no tileMatrix for zoom {zoom}")
    tw, th = int(m["tileWidth"]), int(m["tileHeight"])
    tlx, tly = (float(v) for v in m["topLeftCorner"])
    res = float(m["scaleDenominator"]) * 0.28e-3 / _M_PER_DEG

    base = os.path.dirname(os.path.abspath(path))
    c0, c1 = lim["min_tile_col"], lim["max_tile_col"]
    r0, r1 = lim["min_tile_row"], lim["max_tile_row"]
    w = (c1 - c0 + 1) * tw
    h = (r1 - r0 + 1) * th
    out = None
    nodata = None
    for row in range(r0, r1 + 1):
        for col in range(c0, c1 + 1):
            rel = (tmpl.replace("{TileMatrixSet}", tms_name)
                   .replace("{TileMatrix}", str(zoom))
                   .replace("{TileRow}", str(row))
                   .replace("{TileCol}", str(col)))
            p = os.path.normpath(os.path.join(base, rel))
            if not os.path.exists(p):
                continue  # missing metatile → nodata fill
            _d, a, tm_meta = open_raster_path(p)
            if a.ndim == 2:
                a = a[:, :, None]
            if out is None:
                out = np.zeros((h, w, a.shape[2]), dtype=a.dtype)
                nodata = tm_meta.get("nodata")
            y0 = (row - r0) * th
            x0 = (col - c0) * tw
            out[y0:y0 + a.shape[0], x0:x0 + a.shape[1]] = a
    if out is None:
        raise ValueError("STACTA: no tiles found on disk")
    arr = out[:, :, 0] if out.shape[2] == 1 else out
    gt = (tlx + c0 * tw * res, res, 0.0,
          tly - r0 * th * res, 0.0, -res)
    meta = {"width": w, "height": h, "bands": out.shape[2],
            "transform": gt, "epsg": 4326,
            "nodata": 0.0 if nodata is None else nodata,
            "overview_zooms": sorted(z for z in limits if z != zoom),
            "tms": tms_name}
    return np.ascontiguousarray(arr), meta
