"""NOAA/VDatum .gtx vertical datum shift grids.

Reference frmts/raw/gtxdataset.cpp: 40-byte big-endian header
(ylower f64, xlower f64, ydelta f64, xdelta f64, nrows i32,
ncols i32) followed by nrows×ncols big-endian f32 shift values
stored BOTTOM-UP, node-registered at the lower-left sample."""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np


def identify_gtx(buf: bytes, path: str = "") -> bool:
    if not path.lower().endswith(".gtx") or len(buf) < 40:
        return False
    yl, xl, dy, dx = struct.unpack_from(">4d", buf, 0)
    nr, nc = struct.unpack_from(">2i", buf, 32)
    return (0 < nr < 1 << 24 and 0 < nc < 1 << 24
            and len(buf) >= 40 + 4 * nr * nc and dy > 0 and dx > 0)


def decode_gtx(buf: bytes) -> Tuple[np.ndarray, Dict]:
    yl, xl, dy, dx = struct.unpack_from(">4d", buf, 0)
    nr, nc = struct.unpack_from(">2i", buf, 32)
    vals = np.frombuffer(buf, ">f4", count=nr * nc, offset=40)
    arr = vals.reshape(nr, nc)[::-1].copy()
    gt = (xl - dx / 2, dx, 0.0, yl + (nr - 1) * dy + dy / 2, 0.0, -dy)
    return arr, {"transform": gt, "nodata": -88.8888}


def encode_gtx(arr: np.ndarray, transform=None, **_kw) -> bytes:
    if arr.ndim != 2:
        raise ValueError("GTX holds a single band")
    h, w = arr.shape
    if transform is not None:
        x0, dx, _, y0, _, dyneg = transform
        dy = -dyneg
        xl = x0 + dx / 2
        yl = y0 - (h - 1) * dy - dy / 2
    else:
        xl = yl = 0.0
        dx = dy = 1.0
    return (struct.pack(">4d", yl, xl, dy, dx)
            + struct.pack(">2i", h, w)
            + arr[::-1].astype(">f4").tobytes())
