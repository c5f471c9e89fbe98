"""GTI (GDAL raster tile index) driver: a vector layer of tile
footprints + `location` paths exposed as one mosaic raster.

The index is any registered vector format (GeoPackage, FlatGeobuf,
(Geo)Parquet, shapefile...) whose features carry the tile path in
`location` (relative paths resolve against the index directory) and
the tile footprint as geometry; the mosaic grid derives from the
first tile's resolution and the union of footprints, later features
painting over earlier ones (the reference's default z-order).

Reference: frmts/gti/gdaltileindexdataset.cpp (location field,
footprint-union extent, first-tile-resolution default); autotest
gti.py + the tile-001.gti.gpkg fixture (2×256² uint16 RGB tiles →
512×256 mosaic) pinned in tests/test_gti.py. Re-derived; no code
copied.

Ray shape: `read_gti_pixels` fans out ONE decode task per tile (each
task opens only its own tile file and emits pixel rows in mosaic
coordinates) — the natural 100-TB path where the driver-side
`open_gti` mosaic is only for registry-compatible small opens.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa


def identify_gti(path: str) -> bool:
    low = os.path.basename(path).lower()
    return ".gti." in low or low.endswith(".gti")


def _index_rows(path: str):
    """index file -> list of (abs_location, (xmin, ymin, xmax, ymax))."""
    import ray

    from ..geom import wkb as wkb_mod
    from .vrt_vector import read_vector

    ds = read_vector(path)
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    tab = pa.concat_tables(tabs, promote_options="permissive")
    base = os.path.dirname(os.path.abspath(path))
    rows = []
    locs = tab.column("location").to_pylist()
    geoms = tab.column("geometry").to_pylist()
    boxes = wkb_mod.wkb_bbox(np.asarray(geoms, dtype=object))
    for loc, box in zip(locs, boxes):
        p = loc if os.path.isabs(loc) else os.path.join(base, loc)
        rows.append((p, tuple(float(v) for v in box)))
    return rows


def open_gti(path: str):
    """GTI index -> (mosaic array, meta). Later tiles paint over
    earlier ones."""
    from .rasters import open_raster_path

    rows = _index_rows(path)
    if not rows:
        raise ValueError("GTI: empty tile index")
    # first tile fixes resolution / dtype / band count
    _d, a0, m0 = open_raster_path(rows[0][0])
    gt0 = m0["transform"]
    resx, resy = gt0[1], -gt0[5]
    xmin = min(b[0] for _, b in rows)
    ymin = min(b[1] for _, b in rows)
    xmax = max(b[2] for _, b in rows)
    ymax = max(b[3] for _, b in rows)
    w = int(round((xmax - xmin) / resx))
    h = int(round((ymax - ymin) / resy))
    bands = a0.shape[2] if a0.ndim == 3 else 1
    out = np.zeros((h, w) if bands == 1 else (h, w, bands),
                   dtype=a0.dtype)
    for p, _box in rows:
        _dn, a, m = open_raster_path(p)
        gt = m["transform"]
        x0 = int(round((gt[0] - xmin) / resx))
        y0 = int(round((ymax - gt[3]) / resy))
        th = a.shape[0]
        tw = a.shape[1]
        ys, xs = max(0, y0), max(0, x0)
        ye, xe = min(h, y0 + th), min(w, x0 + tw)
        if ye <= ys or xe <= xs:
            continue
        out[ys:ye, xs:xe] = a[ys - y0:ye - y0, xs - x0:xe - x0]
    meta = {"width": w, "height": h, "bands": bands,
            "transform": (xmin, resx, 0.0, ymax, 0.0, -resy),
            "epsg": m0.get("epsg"), "nodata": m0.get("nodata"),
            "n_tiles": len(rows)}
    return out, meta


def read_gti_pixels(path: str, band: int = 0):
    """GTI index -> Ray Dataset of mosaic pixel rows (band, y, x,
    value): one decode task per tile, coordinates already in the
    mosaic frame (the streaming 100-TB path — no driver mosaic)."""
    import ray
    import ray.data

    from .rasters import open_raster_path

    rows = _index_rows(path)
    _d, a0, m0 = open_raster_path(rows[0][0])
    gt0 = m0["transform"]
    resx, resy = gt0[1], -gt0[5]
    xmin = min(b[0] for _, b in rows)
    ymax = max(b[3] for _, b in rows)

    def decode(batch: pa.Table) -> pa.Table:
        ys, xs, vs = [], [], []
        for p in batch["path"].to_pylist():
            _dn, a, m = open_raster_path(p)
            if a.ndim == 3:
                a = a[:, :, band]
            gt = m["transform"]
            x0 = int(round((gt[0] - xmin) / resx))
            y0 = int(round((ymax - gt[3]) / resy))
            yy, xx = np.mgrid[0:a.shape[0], 0:a.shape[1]]
            ys.append((yy + y0).ravel().astype(np.int64))
            xs.append((xx + x0).ravel().astype(np.int64))
            vs.append(a.ravel().astype(np.float64))
        cat = np.concatenate
        n = sum(len(v) for v in vs)
        return pa.table({
            "band": pa.array(np.full(n, band, dtype=np.int32)),
            "y": pa.array(cat(ys) if ys else np.array([], np.int64)),
            "x": pa.array(cat(xs) if xs else np.array([], np.int64)),
            "value": pa.array(cat(vs) if vs else np.array([]))})

    return ray.data.from_items(
        [{"path": p} for p, _ in rows],
        override_num_blocks=min(64, len(rows))
    ).map_batches(decode, batch_format="pyarrow")
