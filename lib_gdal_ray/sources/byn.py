"""Natural Resources Canada BYN geoid grids.

Reference frmts/raw/byndataset.{h,cpp}: 80-byte header
(south/north/west/east arcsec bounds as i32, DLat/DLon i16,
Factor double @24, SizeOf i16 @32, ByteOrder i16 @48 (0=BE, 1=LE),
Scale i16 @50 (1 => bounds×1000)); raster size
((east-west+1)/dlon)+1 × ((north-south+1)/dlat)+1, top-down rows,
Int16 (nodata 32767) or Int32 (nodata 9999×factor)."""

from __future__ import annotations

import struct
from typing import Dict, Tuple

import numpy as np


def identify_byn(buf: bytes, path: str = "") -> bool:
    if not path.lower().endswith((".byn", ".err")) or len(buf) < 80:
        return False
    sizeof = struct.unpack_from("<h", buf, 32)[0]
    byte_order = struct.unpack_from("<h", buf, 48)[0]
    return sizeof in (2, 4) and byte_order in (0, 1)


def decode_byn(buf: bytes) -> Tuple[np.ndarray, Dict]:
    south, north, west, east = struct.unpack_from("<4i", buf, 0)
    dlat, dlon = struct.unpack_from("<2h", buf, 16)
    factor = struct.unpack_from("<d", buf, 24)[0]
    sizeof = struct.unpack_from("<h", buf, 32)[0]
    byte_order = struct.unpack_from("<h", buf, 48)[0]
    scale = struct.unpack_from("<h", buf, 50)[0]
    s, n, w, e, dla, dlo = (float(v) for v in
                            (south, north, west, east, dlat, dlon))
    if scale == 1:
        s, n, w, e, dla, dlo = (v * 1000 for v in (s, n, w, e, dla, dlo))
    ns = int((e - w + 1.0) / dlo + 1.0)
    nl = int((n - s + 1.0) / dla + 1.0)
    order = "<" if byte_order == 1 else ">"
    dt = np.dtype(f"{order}i{sizeof}")
    vals = np.frombuffer(buf, dt, count=ns * nl, offset=80)
    arr = np.ascontiguousarray(
        vals.reshape(nl, ns).astype(dt.newbyteorder("=")))
    nodata = 32767.0 if sizeof == 2 else 9999.0 * factor
    gt = ((w - dlo / 2.0) / 3600.0, dlo / 3600.0, 0.0,
          (n + dla / 2.0) / 3600.0, 0.0, -dla / 3600.0)
    return arr, {"transform": gt, "nodata": nodata,
                 "scale": factor}
