"""Golden Software Surfer grids: GSAG (ASCII), GSBG (Surfer 6
binary), GS7BG (Surfer 7 binary).

Reference: frmts/gsg/{gsagdataset,gsbgdataset,gs7bgdataset}.cpp.
All three are node-registered (pixel-center) grids stored BOTTOM-UP:
* GSAG: "DSAA", nx ny, xmin xmax, ymin ymax, zmin zmax, values;
* GSBG: "DSBB", i16 nx, i16 ny, 6×f64 extents, nx×ny f32 values
  (blank value 1.701410009187828e38);
* GS7BG: "DSRB" tagged sections — GRID {ny, nx, xLL, yLL, xSize,
  ySize, zMin, zMax, rotation, blankValue} then DATA of f64 values.

Whole-buffer decodes (one grid = one flat buffer), composing with
read_raster_pixels for multi-file parallelism.
"""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np

GSBG_BLANK = 1.701410009187828e38


def identify_surfer(buf: bytes) -> str:
    if buf[:4] == b"DSBB":
        return "GSBG"
    if buf[:4] == b"DSRB":
        return "GS7BG"
    if buf[:4] == b"DSAA":
        return "GSAG"
    return ""


def _center_gt(xmin, xmax, ymin, ymax, nx, ny):
    dx = (xmax - xmin) / (nx - 1) if nx > 1 else 1.0
    dy = (ymax - ymin) / (ny - 1) if ny > 1 else 1.0
    return (xmin - dx / 2, dx, 0.0, ymax + dy / 2, 0.0, -dy)


def decode_gsag(buf: bytes) -> Tuple[np.ndarray, Dict]:
    text = buf.decode("ascii", "replace").split()
    assert text[0] == "DSAA"
    nx, ny = int(text[1]), int(text[2])
    xmin, xmax, ymin, ymax = map(float, text[3:7])
    # text[7:9] = zmin zmax
    vals = np.array(text[9:9 + nx * ny], dtype=np.float64)
    arr = vals.reshape(ny, nx)[::-1].astype(np.float32)  # bottom-up
    return arr, {"transform": _center_gt(xmin, xmax, ymin, ymax, nx, ny)}


def decode_gsbg(buf: bytes) -> Tuple[np.ndarray, Dict]:
    assert buf[:4] == b"DSBB"
    nx, ny = struct.unpack_from("<hh", buf, 4)
    xmin, xmax, ymin, ymax, _zmin, _zmax = struct.unpack_from("<6d", buf, 8)
    vals = np.frombuffer(buf, "<f4", count=nx * ny, offset=56)
    arr = vals.reshape(ny, nx)[::-1].copy()
    return arr, {"transform": _center_gt(xmin, xmax, ymin, ymax, nx, ny),
                 "nodata": GSBG_BLANK}


def decode_gs7bg(buf: bytes) -> Tuple[np.ndarray, Dict]:
    assert buf[:4] == b"DSRB"
    pos = 0
    grid = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        body = pos + 8
        if tag == b"DSRB":
            pass  # header section: version
        elif tag == b"GRID":
            ny, nx = struct.unpack_from("<ii", buf, body)
            (xll, yll, xsz, ysz, zmin, zmax, _rot,
             blank) = struct.unpack_from("<8d", buf, body + 8)
            grid = (ny, nx, xll, yll, xsz, ysz, blank)
        elif tag == b"DATA":
            data = (body, size)
        pos = body + size
    if grid is None or data is None:
        raise ValueError("GS7BG: missing GRID/DATA section")
    ny, nx, xll, yll, xsz, ysz, blank = grid
    vals = np.frombuffer(buf, "<f8", count=nx * ny, offset=data[0])
    arr = vals.reshape(ny, nx)[::-1].copy()
    gt = (xll - xsz / 2, xsz, 0.0, yll + (ny - 1) * ysz + ysz / 2, 0.0,
          -ysz)
    return arr, {"transform": gt, "nodata": blank}


def encode_gsbg(arr: np.ndarray, transform=None, **_kw) -> bytes:
    """(h, w) array -> Surfer 6 binary grid (gsbgdataset.cpp write
    path: node-registered extents, bottom-up f32)."""
    if arr.ndim != 2:
        raise ValueError("GSBG holds a single band")
    h, w = arr.shape
    if transform is not None:
        x0, dx, _, y0, _, dy = transform
        xmin = x0 + dx / 2
        xmax = xmin + (w - 1) * dx
        ymax = y0 + dy / 2
        ymin = ymax + (h - 1) * dy
        if ymin > ymax:
            ymin, ymax = ymax, ymin
    else:
        xmin, xmax, ymin, ymax = 0.0, float(w - 1), 0.0, float(h - 1)
    f = arr.astype(np.float32)
    finite = f[np.isfinite(f)]
    zmin = float(finite.min()) if finite.size else 0.0
    zmax = float(finite.max()) if finite.size else 0.0
    return (b"DSBB" + struct.pack("<hh", w, h)
            + struct.pack("<6d", xmin, xmax, ymin, ymax, zmin, zmax)
            + f[::-1].astype("<f4").tobytes())
