"""ASCII raster interchange formats: Arc/Info ASCII Grid + XYZ.

Parity targets: `frmts/aaigrid/aaigriddataset.cpp` (ncols/nrows/
xllcorner|xllcenter/cellsize|dx,dy/NODATA_value header, whitespace
token stream, south-west anchored georeferencing) and
`frmts/xyz/xyzdataset.cpp` (optional column-name header, one
"x y z" line per cell at pixel centers, grid inferred from the
coordinate stream, blank lines tolerated).

Both are text formats a user brings for interchange; both decode to
the same (array, meta) contract as the binary codecs so they plug
into the driver registry (`sources/rasters.py`) and every pixel
pipeline downstream. Parsing is numpy-vectorized (`np.fromstring`-
style token splits), not a Python loop per line.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_AAIGRID_KEYS = ("ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
                 "yllcenter", "cellsize", "dx", "dy", "nodata_value")


def decode_aaigrid(buf: bytes) -> Tuple[np.ndarray, dict]:
    """AAIGrid text -> ((nrows, ncols) float64 array, meta).

    meta: transform (GDAL north-up affine), nodata. Values equal to
    NODATA_value come back as NaN (AAIGridRasterBand::IReadBlock's
    nodata contract surfaced Arrow/numpy-style)."""
    text = buf.decode("ascii", errors="replace")
    toks = text.split()
    hdr = {}
    i = 0
    while i + 1 < len(toks):
        key = toks[i].lower()
        if key not in _AAIGRID_KEYS:
            break
        hdr[key] = toks[i + 1]
        i += 2
    if "ncols" not in hdr or "nrows" not in hdr:
        raise ValueError("not an AAIGrid (missing ncols/nrows header)")
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    dx = float(hdr.get("dx", hdr.get("cellsize", 1.0)))
    dy = float(hdr.get("dy", hdr.get("cellsize", 1.0)))
    if "xllcorner" in hdr:
        x0 = float(hdr["xllcorner"])
    else:
        x0 = float(hdr.get("xllcenter", 0.0)) - dx / 2.0
    if "yllcorner" in hdr:
        yll = float(hdr["yllcorner"])
    else:
        yll = float(hdr.get("yllcenter", 0.0)) - dy / 2.0
    vals = np.array(toks[i:i + w * h], dtype=np.float64)
    if vals.size != w * h:
        raise ValueError(f"AAIGrid data truncated: {vals.size} of {w * h}")
    arr = vals.reshape(h, w)
    nodata = None
    if "nodata_value" in hdr:
        nodata = float(hdr["nodata_value"])
        if not np.isnan(nodata):
            arr = np.where(arr == nodata, np.nan, arr)
    transform = (x0, dx, 0.0, yll + h * dy, 0.0, -dy)
    return arr, {"width": w, "height": h, "bands": 1,
                 "transform": transform, "nodata": nodata,
                 "dtype": "float64"}


def encode_aaigrid(arr: np.ndarray, transform: Optional[tuple] = None,
                   nodata: Optional[float] = None, **_kw) -> bytes:
    """(H, W) array -> AAIGrid text (AAIGCreateCopy layout). NaNs are
    written as the nodata value (default -9999)."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        if arr.shape[2] != 1:
            raise ValueError("AAIGrid is single-band")
        arr = arr[:, :, 0]
    h, w = arr.shape
    gt = transform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    if abs(gt[2]) > 0 or abs(gt[4]) > 0:
        raise ValueError("AAIGrid cannot encode rotated rasters")
    dx, dy = gt[1], -gt[5]
    if abs(dx - dy) > 1e-9 * max(abs(dx), abs(dy)):
        header_res = f"dx           {dx!r}\ndy           {dy!r}\n"
    else:
        header_res = f"cellsize     {dx!r}\n"
    yll = gt[3] - h * dy
    out = [f"ncols        {w}\n"
           f"nrows        {h}\n"
           f"xllcorner    {gt[0]!r}\n"
           f"yllcorner    {yll!r}\n"
           + header_res]
    a = arr.astype(np.float64)
    if np.isnan(a).any():
        nd = -9999.0 if nodata is None else float(nodata)
        out.append(f"NODATA_value {nd!r}\n")
        a = np.where(np.isnan(a), nd, a)
    elif nodata is not None:
        out.append(f"NODATA_value {float(nodata)!r}\n")
    ints = np.all(a == np.rint(a)) and np.all(np.abs(a) < 2**53)
    for row in a:
        if ints:
            out.append(" ".join(str(int(v)) for v in row) + "\n")
        else:
            out.append(" ".join(repr(float(v)) for v in row) + "\n")
    return "".join(out).encode("ascii")


def identify_aaigrid(buf: bytes) -> bool:
    head = buf[:256].lstrip().lower()
    return head.startswith(b"ncols")


def decode_xyz(buf: bytes) -> Tuple[np.ndarray, dict]:
    """XYZ text -> ((h, w) float64 array, meta).

    Column order comes from an optional header line (any of
    x/y/z | lon/lat | east/north names, XYZDataset::Identify's
    header probe); default X Y Z. The grid is inferred from the
    unique sorted coordinates; cells absent from the stream are NaN.
    Output is normalized north-up (rows sorted by descending Y)."""
    text = buf.decode("ascii", errors="replace")
    lines = text.splitlines()
    ix, iy, iz = 0, 1, 2
    start = 0
    for ln in lines:
        t = ln.strip()
        if not t:
            start += 1
            continue
        first = t.replace(",", " ").split()
        try:
            float(first[0])
        except ValueError:
            names = [c.strip('"').lower() for c in first]
            for j, nm in enumerate(names[:3]):
                if nm in ("x", "lon", "long", "longitude", "east", "easting"):
                    ix = j
                elif nm in ("y", "lat", "latitude", "north", "northing"):
                    iy = j
                elif nm in ("z", "alt", "height", "val", "value"):
                    iz = j
            start += 1
        break
    body = " ".join(ln.replace(",", " ") for ln in lines[start:])
    toks = np.array(body.split(), dtype=np.float64)
    if toks.size == 0 or toks.size % 3 != 0:
        raise ValueError("XYZ stream is not triplets")
    triples = toks.reshape(-1, 3)
    xs, ys, zs = triples[:, ix], triples[:, iy], triples[:, iz]
    ux = np.unique(xs)
    uy = np.unique(ys)
    w, h = len(ux), len(uy)
    dx = float(np.min(np.diff(ux))) if w > 1 else 1.0
    dy = float(np.min(np.diff(uy))) if h > 1 else 1.0
    arr = np.full((h, w), np.nan)
    ci = np.searchsorted(ux, xs)
    ri = np.searchsorted(uy, ys)
    arr[(h - 1) - ri, ci] = zs  # descending Y = north-up rows
    transform = (float(ux[0]) - dx / 2.0, dx, 0.0,
                 float(uy[-1]) + dy / 2.0, 0.0, -dy)
    return arr, {"width": w, "height": h, "bands": 1,
                 "transform": transform, "nodata": None,
                 "dtype": "float64"}


def encode_xyz(arr: np.ndarray, transform: Optional[tuple] = None,
               **_kw) -> bytes:
    """(H, W) array -> "X Y Z" lines at pixel centers, row-major from
    the top row (XYZCreateCopy layout). NaN cells are skipped."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        if arr.shape[2] != 1:
            raise ValueError("XYZ is single-band")
        arr = arr[:, :, 0]
    h, w = arr.shape
    gt = transform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    yy, xx = np.mgrid[0:h, 0:w]
    cx = gt[0] + (xx + 0.5) * gt[1]
    cy = gt[3] + (yy + 0.5) * gt[5]
    vv = arr.astype(np.float64)
    keep = ~np.isnan(vv.ravel())
    out = ["X Y Z\n"]
    for x, y, v in zip(cx.ravel()[keep], cy.ravel()[keep], vv.ravel()[keep]):
        vs = str(int(v)) if v == int(v) and abs(v) < 2**53 else repr(v)
        out.append(f"{x!r} {y!r} {vs}\n")
    return "".join(out).encode("ascii")


def identify_xyz(buf: bytes) -> bool:
    head = buf[:512].decode("ascii", errors="replace")
    lines = [ln for ln in head.splitlines() if ln.strip()][:2]
    if not lines:
        return False
    toks = lines[0].replace(",", " ").split()
    if len(toks) != 3:
        return False
    names = {t.strip('"').lower() for t in toks}
    if names & {"x", "y", "z", "lon", "lat"}:
        return len(names & {"x", "y", "z", "lon", "lat", "long", "latitude",
                            "longitude", "alt", "value", "val"}) >= 2
    try:
        [float(t) for t in toks]
        return True
    except ValueError:
        return False
