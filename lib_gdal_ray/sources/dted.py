"""DTED military elevation tiles (.dt0/.dt1/.dt2).

Parity target: `frmts/dted/dted_api.c` + `dteddataset.cpp` —
UHL(80)/DSI(648)/ACC(2700) header records, per-longitude-column data
records (8-byte header + signed-magnitude big-endian samples stored
south→north + 32-bit byte-sum checksum), DDDMMSSH corner fields in
tenth-arcsecond intervals, the half-pixel corner-anchored
georeferencing, and the MIL-D-89020 lat/lon-inverted corner quirk.

Like SRTMHGT the format is pre-sharded (one 1°-cell per file), so the
Ray read is one decode task per file through `read_raster_pixels`'
path dispatch; a whole-theater DTED set parallelizes by construction.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

_UHL, _DSI, _ACC = 80, 648, 2700
_DATA_OFFSET = _UHL + _DSI + _ACC


def _angle(field: bytes, hemi: int) -> float:
    deg = int(field[0:3])
    mn = int(field[3:5])
    sec = int(field[5:7])
    v = deg + mn / 60.0 + sec / 3600.0
    return -v if hemi in (ord("W"), ord("S")) else v


def identify_dted(buf: bytes) -> bool:
    return buf[:4] == b"UHL1"


def decode_dted(buf: bytes) -> Tuple[np.ndarray, dict]:
    """DTED bytes -> ((nY, nX) int16 north-up array, meta)."""
    if not identify_dted(buf):
        raise ValueError("not a DTED file (no UHL1 record)")
    uhl = buf[:_UHL]
    # MIL-D-89020 first-edition files inverted the corner lat/lon
    # (detected by hemisphere letters, dted_api.c:279)
    lon_hemi = uhl[11]
    swapped = lon_hemi in (ord("N"), ord("S"))
    lon = _angle(uhl[4:11], uhl[11])
    lat = _angle(uhl[12:19], uhl[19])
    if swapped:
        lon, lat = lat, lon
    psx = int(uhl[20:24]) / 36000.0       # tenth-arcsec intervals
    psy = int(uhl[24:28]) / 36000.0
    nx = int(uhl[47:51])
    ny = int(uhl[51:55])
    rec = 12 + ny * 2
    arr = np.full((ny, nx), -32767, dtype=np.int16)
    raw = np.frombuffer(buf, dtype=np.uint8)
    for c in range(nx):
        off = _DATA_OFFSET + c * rec
        if off + 8 + ny * 2 > len(raw):
            break                         # partial file: missing columns
        col = raw[off + 8: off + 8 + ny * 2].reshape(ny, 2).astype(np.int32)
        mag = ((col[:, 0] & 0x7F) << 8) | col[:, 1]
        val = np.where(col[:, 0] & 0x80, -mag, mag)
        arr[:, c] = val[::-1]             # records run south→north
    transform = (lon - 0.5 * psx, psx, 0.0,
                 lat - 0.5 * psy + ny * psy, 0.0, -psy)
    return arr, {"width": nx, "height": ny, "bands": 1,
                 "dtype": "int16", "transform": transform,
                 "nodata": -32767.0, "epsg": 4326}


def _fmt_angle(v: float, is_lon: bool) -> bytes:
    hemi = (b"W" if v < 0 else b"E") if is_lon else (b"S" if v < 0 else b"N")
    a = abs(v)
    deg = int(a + 1e-9)
    mn = int((a - deg) * 60 + 1e-9)
    sec = int(round((a - deg - mn / 60.0) * 3600))
    return f"{deg:03d}{mn:02d}{sec:02d}".encode() + hemi


def encode_dted(arr: np.ndarray, lon_sw: float, lat_sw: float,
                level: int = 0) -> bytes:
    """North-up int16 array (1°-cell grid) -> DTED bytes
    (dted_create.c + DTEDWriteProfile layout, checksums included)."""
    arr = np.asarray(arr, dtype=np.int16)
    ny, nx = arr.shape
    psx = round(3600.0 / (nx - 1) * 10) if nx > 1 else 36000
    psy = round(3600.0 / (ny - 1) * 10) if ny > 1 else 36000
    if psx > 9999 or psy > 9999:
        raise ValueError(
            f"grid {ny}x{nx} needs a >999.9-arcsec interval — not "
            "representable in DTED's 4-digit fields (use >=37 samples "
            "per degree, e.g. the standard 121/1201/3601)")
    uhl = bytearray(b" " * _UHL)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = _fmt_angle(lon_sw, True)
    uhl[12:20] = _fmt_angle(lat_sw, False)
    uhl[20:24] = f"{int(psx):04d}".encode()
    uhl[24:28] = f"{int(psy):04d}".encode()
    uhl[28:32] = b"0010"                  # vertical accuracy
    uhl[32:35] = b"U  "
    uhl[47:51] = f"{nx:04d}".encode()
    uhl[51:55] = f"{ny:04d}".encode()
    uhl[55] = ord("0")
    dsi = bytearray(b" " * _DSI)
    dsi[0:4] = b"DSIU"
    acc = bytearray(b" " * _ACC)
    acc[0:3] = b"ACC"
    out = bytearray(bytes(uhl) + bytes(dsi) + bytes(acc))
    for c in range(nx):
        rec = bytearray(12 + ny * 2)
        rec[0] = 0xAA
        rec[2] = (c >> 8) & 0xFF
        rec[3] = c & 0xFF
        rec[4] = (c >> 8) & 0xFF
        rec[5] = c & 0xFF
        col = arr[::-1, c].astype(np.int32)   # south→north on disk
        mag = np.abs(col)
        hi = ((mag >> 8) & 0x7F) | np.where(col < 0, 0x80, 0)
        body = np.empty(ny * 2, dtype=np.uint8)
        body[0::2] = hi.astype(np.uint8)
        body[1::2] = (mag & 0xFF).astype(np.uint8)
        rec[8:8 + ny * 2] = body.tobytes()
        csum = int(np.sum(np.frombuffer(bytes(rec[:8 + ny * 2]),
                                        dtype=np.uint8), dtype=np.int64))
        rec[8 + ny * 2: 12 + ny * 2] = csum.to_bytes(4, "big")
        out += rec
    return bytes(out)
