"""SRTM .hgt tiles (frmts/srtmhgt/srtmhgtdataset.cpp).

Headerless big-endian elevation squares; the grid size comes from the
file size (1201² SRTM3 / 3601² SRTM1 / 7201² thirds, int16; 3601²
bytes = Byte; 3601²×4 = .hgts Float32) and the georeferencing from
the N44W072-style file name — south-west corner, point-registered:
gt = (lon - ½px, px, 0, lat + 1 + ½px, 0, -px) with px = 1/(n-1),
exactly the reference's math (srtmhgtdataset.cpp:482-487).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import numpy as np

NODATA = -32768.0

# file size -> (nx, ny, numpy dtype)
_SIZES = {
    1201 * 1201 * 2: (1201, 1201, ">i2"),
    1801 * 3601 * 2: (1801, 3601, ">i2"),
    3601 * 3601: (3601, 3601, "u1"),
    3601 * 3601 * 2: (3601, 3601, ">i2"),
    3601 * 3601 * 4: (3601, 3601, ">f4"),
    7201 * 7201 * 2: (7201, 7201, ">i2"),
}

_NAME_RE = re.compile(r"([NSns])(\d{1,2})([EWew])(\d{1,3})")


def parse_hgt_name(name: str) -> Tuple[int, int]:
    """'N44W072[.hgt]' -> (southwest lat, southwest lon)."""
    m = _NAME_RE.search(os.path.basename(name))
    if not m:
        raise ValueError(f"not an SRTM tile name: {name!r}")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon


def identify_srtmhgt(buf: bytes, name: Optional[str] = None) -> bool:
    if len(buf) not in _SIZES:
        return False
    return name is None or bool(_NAME_RE.search(os.path.basename(name)))


def decode_srtmhgt(buf: bytes,
                   name: Optional[str] = None) -> Tuple[np.ndarray, dict]:
    """-> ((n, n) array native-endian, meta w/ transform when the tile
    name is known). Rows run north→south like the file."""
    if len(buf) not in _SIZES:
        raise ValueError(f"not an SRTM .hgt payload ({len(buf)} bytes)")
    nx, ny, dt = _SIZES[len(buf)]
    arr = np.frombuffer(buf, dtype=np.dtype(dt)).reshape(ny, nx)
    arr = arr.astype(arr.dtype.newbyteorder("="))
    meta = {"width": nx, "height": ny, "bands": 1,
            "dtype": arr.dtype.name, "nodata": NODATA,
            "transform": None, "epsg": 4326}
    if name:
        lat, lon = parse_hgt_name(name)
        px_x = 1.0 / (nx - 1)
        px_y = 1.0 / (ny - 1)
        meta["transform"] = (lon - 0.5 * px_x, px_x, 0.0,
                             lat + 1 + 0.5 * px_y, 0.0, -px_y)
    return arr, meta


def encode_srtmhgt(arr: np.ndarray, **_kw) -> bytes:
    """(n, n) int16 array -> big-endian .hgt payload (SRTMHGTCreateCopy
    byte order). Shape must be one of the SRTM grid sizes."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    dt = ">i2" if arr.dtype != np.uint8 else "u1"
    buf = np.ascontiguousarray(arr.astype(dt)).tobytes()
    if len(buf) not in _SIZES:
        raise ValueError(f"shape {arr.shape} is not an SRTM grid size")
    return buf


# ---------------------------------------------------------------------------
# ACE2 (Altimeter Corrected Elevations 2) — frmts/raw/ace2dataset.cpp
# analog: georeferencing and grid size come entirely from the file
# NAME (e.g. 45N015E_5M.ACE2: south-west corner + resolution suffix
# _5M/_30S/_9S/_3S → 180/1800/6000/18000 cells of a 15° tile);
# float32 little-endian elevations (int16 for _CONF_/_QUALITY_/
# _SOURCE_ layers). autotest ace2.py pins the gt of a synthesized
# 45N015E_5M tile. Re-derived; no code copied.
# ---------------------------------------------------------------------------

_ACE2_SIZES = {"_5M": (180, 5.0 / 60), "_30S": (1800, 30.0 / 3600),
               "_9S": (6000, 9.0 / 3600), "_3S": (18000, 3.0 / 3600)}


def identify_ace2(path: str) -> bool:
    import re

    base = os.path.basename(path)
    return bool(re.match(r"^\d{2}[NSns]\d{3}[EWew]_.*\.ACE2$", base,
                         re.IGNORECASE))


def decode_ace2(path: str):
    base = os.path.basename(path)
    lat = int(base[0:2]) * (1 if base[2].upper() == "N" else -1)
    lon = int(base[3:6]) * (1 if base[6].upper() == "E" else -1)
    int16 = any(t in base.upper()
                for t in ("_CONF_", "_QUALITY_", "_SOURCE_"))
    dt = np.dtype("<i2" if int16 else "<f4")
    n = None
    px = None
    for suffix, (cells, size) in _ACE2_SIZES.items():
        if suffix in base.upper():
            n, px = cells, size
            break
    if n is None:
        sz = os.path.getsize(path)
        for cells, size in _ACE2_SIZES.values():
            if sz == cells * cells * dt.itemsize:
                n, px = cells, size
                break
    if n is None:
        raise ValueError("ACE2: cannot infer grid size")
    raw = np.fromfile(path, dtype=dt, count=n * n)
    if len(raw) < n * n:  # sparse/truncated tile → zero fill
        raw = np.concatenate([raw, np.zeros(n * n - len(raw), dt)])
    arr = np.ascontiguousarray(
        raw.reshape(n, n).astype(dt.newbyteorder("=")))
    gt = (float(lon), px, 0.0, lat + n * px, 0.0, -px)
    meta = {"width": n, "height": n, "bands": 1, "transform": gt,
            "epsg": 4326, "nodata": None}
    return arr, meta
