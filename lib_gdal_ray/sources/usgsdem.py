"""USGS ASCII DEM (.dem) reader.

Parity target: `frmts/usgsdem/usgsdemdataset.cpp` — A-record header
variants (data start 864 old-format / 893 undocumented / 918 latest /
1024 standard / 1025 newline-padded records), Fortran D-exponent
doubles, greedy whitespace-skipping integer scan that *succeeds at
EOF with 0* (how truncated quads decode), per-profile B records
(row/col ids, point count, y-start, elevation offset, elevations as
free-format ints scaled by the header's vertical resolution), the
1024-byte record-boundary realignment that skips junk trailing
values, nodata -32767 prefill, int16 vs float32 election
(feet units or fractional vertical resolution -> float32), and the
UTM-vs-geographic geotransform derivations (arc-seconds / 3600).

Quads are one file each (<= a few MB); the Ray read is one decode
task per file through `read_raster_pixels`' path dispatch, so a
multi-quad mosaic parallelizes by construction.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np

NODATA = -32767
_INT_RE = re.compile(rb"[ \t\r\n]*([+-]?[0-9]+)")


def _read_int(buf: bytes, pos: int) -> Tuple[int, int]:
    """Greedy int scan; at EOF returns (0, pos) and still 'succeeds'
    (usgsdemdataset.cpp USGSDEMReadIntFromBuffer EOF semantics)."""
    m = _INT_RE.match(buf, pos)
    if m is None:
        # skip whitespace-only tail
        return 0, len(buf)
    return int(m.group(1)), m.end()


def _read_double(buf: bytes, pos: int, n: int) -> Tuple[Optional[float],
                                                        int]:
    raw = buf[pos:pos + n]
    if len(raw) < n:
        return None, len(buf)  # EOF: doubles FAIL (unlike ints)
    s = raw.replace(b"D", b"E").strip()
    try:
        return (float(s) if s else 0.0), pos + n
    except ValueError:
        return 0.0, pos + n


def _dconv(buf: bytes, pos: int, n: int) -> float:
    s = buf[pos:pos + n].replace(b"D", b"E").strip()
    try:
        return float(s) if s else 0.0
    except ValueError:
        return 0.0


def identify_usgsdem(buf: bytes, path: str = "") -> bool:
    if len(buf) < 880:
        return False
    r, p = _read_int(buf, 864)
    c, _ = _read_int(buf, p)
    if r == 1 and c == 1 and p <= 1024:
        return True
    for off in (1024, 893, 918):
        r, p = _read_int(buf, off)
        c, _ = _read_int(buf, p)
        if r == 1 and c in (0, 1):
            return True
    return False


def _data_start(buf: bytes) -> int:
    r, p = _read_int(buf, 864)
    c, p = _read_int(buf, p)
    if p < 1024 and r == 1 and c == 1:
        return 864  # old format: header ends at byte 864
    r, p = _read_int(buf, 1024)
    c, _ = _read_int(buf, p)
    if r == 1 and c in (0, 1):
        # some files use 1025-byte records ending with a newline
        if (len(buf) > 2049 and buf[1024:1025] == b"\n"
                and buf[2049:2050] == b"\n"):
            return 1025
        return 1024
    r, p = _read_int(buf, 893)
    c, _ = _read_int(buf, p)
    if r == 1 and c == 1:
        return 893
    r, p = _read_int(buf, 918)
    c, _ = _read_int(buf, p)
    if r == 1 and c == 1:
        return 918
    raise ValueError("does not appear to be a USGS DEM file")


_DATUMS = {1: "NAD27", 2: "WGS72", 3: "WGS84", 4: "NAD83"}


def decode_usgsdem(buf: bytes) -> Tuple[np.ndarray, dict]:
    """USGS DEM bytes -> ((nY, nX) north-up array, meta)."""
    start = _data_start(buf)

    ncoord, p = _read_int(buf, 156)
    utm_zone, _ = _read_int(buf, p)
    gunit, p = _read_int(buf, 528)
    vunit, _ = _read_int(buf, p)
    units = "ft" if vunit == 1 else "m"

    dx = _dconv(buf, 816, 12)
    dy = _dconv(buf, 828, 12)
    vres = _dconv(buf, 840, 12)
    if dy == 0:
        raise ValueError("USGS DEM: zero y resolution")
    dtype = np.float32 if (vunit == 1 or vres < 1.0) else np.int16

    # corners SW, NW, NE, SE at byte 546 (4 x 2 x 24-char D doubles)
    corners = [(_dconv(buf, 546 + i * 48, 24),
                _dconv(buf, 546 + i * 48 + 24, 24)) for i in range(4)]
    xmin = min(corners[0][0], corners[1][0])
    xmax = max(corners[2][0], corners[3][0])
    ymin = min(corners[0][1], corners[3][1])
    ymax = max(corners[1][1], corners[2][1])

    nprofiles, _ = _read_int(buf, 858)

    datum = "NAD27"
    if start != 864:
        d, _ = _read_int(buf, 890)
        datum = _DATUMS.get(d, "NAD27")

    geographic = ncoord not in (1, 2, -9999)
    if not geographic:
        ymin = np.floor(ymin / dy) * dy
        ymax = np.ceil(ymax / dy) * dy
        # x anchor comes from the first profile's x-start
        p = start
        for _ in range(4):
            _, p = _read_int(buf, p)
        dx_start, _ = _read_double(buf, p, 24)
        gt0 = (dx_start or 0.0) - dx / 2.0
        gt = (gt0, dx, 0.0, ymax + dy / 2.0, 0.0, -dy)
    else:
        gt = ((xmin - dx / 2.0) / 3600.0, dx / 3600.0, 0.0,
              (ymax + dy / 2.0) / 3600.0, 0.0, -dy / 3600.0)

    ny = int((ymax - ymin) / dy + 1.5)
    nx = nprofiles
    if nx <= 0 or ny <= 0 or nx * ny > 1 << 30:
        raise ValueError("USGS DEM: bad raster dimensions")

    arr = np.full((ny, nx), NODATA, dtype=dtype)
    yminc = gt[3] + (ny - 0.5) * gt[5]  # center-of-bottom-row y

    p = start
    n = len(buf)
    for i in range(nx):
        _, p = _read_int(buf, p)            # row number (1)
        _, p = _read_int(buf, p)            # column number (i+1)
        npts, p = _read_int(buf, p)
        _, p = _read_int(buf, p)            # number of columns (1)
        _, p = _read_double(buf, p, 24)     # x-start
        dy_start, p = _read_double(buf, p, 24)
        elev_off, p = _read_double(buf, p, 24)
        _, p = _read_double(buf, p, 24)     # min z
        mz, p = _read_double(buf, p, 24)    # max z
        if mz is None:                      # doubles fail at EOF
            break
        dy_start = dy_start or 0.0
        elev_off = elev_off or 0.0
        if geographic:
            dy_start /= 3600.0
        lygap = int((yminc - dy_start) / gt[5] + 0.5)
        if npts > 0:
            for j in range(lygap, npts + lygap):
                iy = ny - j - 1
                elev, p = _read_int(buf, p)
                if 0 <= iy < ny and elev != NODATA:
                    v = elev * vres + elev_off
                    if dtype == np.int16:
                        v = min(max(v, -32768), 32767)
                    arr[iy, i] = v
        if start == 1024 and p < n:
            # realign to the next 1024-byte record boundary: some
            # files carry junk values after the declared profile
            p = (p + 1023) // 1024 * 1024

    meta = {
        "transform": gt,
        "nodata": float(NODATA),
        "units": units,
        "datum": datum,
        "coord_system": ("UTM" if ncoord == 1 else
                         "StatePlane" if ncoord == 2 else "Geographic"),
        "utm_zone": utm_zone if ncoord in (1, 2) else None,
        "ground_units": "ft" if gunit == 1 else "m",
    }
    return arr, meta
