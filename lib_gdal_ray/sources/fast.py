"""EOSAT FAST Format (Landsat / IRS Euromap) reader.

Parity target: frmts/raw/fastdataset.cpp — 1536..4608-byte ASCII
administrative header ("KEY =VALUE" at fixed widths: PIXELS PER
LINE(5), LINES PER BAND(5), OUTPUT BITS PER PIXEL(2), BANDS
PRESENT(32), ACQUISITION DATE(8), SATELLITE(10), SENSOR(10),
FILENAME(29) x7), gains/biases record, geometric record with
"UL/UR/LR/LL = <lonDMS> <latDMS> <easting 13> <northing 13>" corner
fields (skip 28 chars past the tag+'='), zone-number megameter strip,
and the geotransform = least-squares fit of the four corner GCPs
anchored at pixel centers (0.5, 0.5)..(nx-0.5, ny-0.5) — exactly
GDALGCPsToGeoTransform over the TL/TR/BR/BL order.  Band files
resolve through the FILENAME fields, the Landsat "<stem>.b0N"
pattern, and the Euromap IRS PAN/LISS3/WIFS last-letter conventions
(em_names.pdf); missing/short band files read as zeros like the
reference's placeholder bands.

One scene = one header + band files; Ray read = one decode task per
scene through open_raster_path.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np


def identify_fast(buf: bytes) -> bool:
    head = buf[:1536]
    return (b"ACQUISITION DATE =" in head and b"SATELLITE =" in head
            and (b"PIXELS PER LINE" in head or b"FILENAME" in head))


def _value(header: str, name: str, size: int) -> Optional[str]:
    i = header.find(name)
    if i < 0:
        return None
    i += len(name)
    while i < len(header) and header[i] == " ":
        i += 1
    while i < len(header) and header[i] == "=":
        i += 1
    return header[i:i + size].strip()


def _scan_double(s: str) -> Optional[float]:
    """CPLScanDouble analog: first numeric token of the fixed slice."""
    tok = s.strip().split()
    try:
        return float(tok[0]) if tok else None
    except ValueError:
        return None


def _corner(geom: str, tag: str) -> Optional[Tuple[float, float]]:
    i = geom.find(tag)
    if i < 0:
        return None
    i += len(tag) + 28
    x = _scan_double(geom[i:i + 13])
    y = _scan_double(geom[i + 14:i + 27])
    if x is None or y is None:
        return None
    return x, y


def _open_existing(candidates: List[str]) -> List[str]:
    return [c for c in candidates if os.path.exists(c)]


_LISS_GROUPS = ["02345", "6789a", "bcdef", "ghijk", "lmnop", "qrstu",
                "vwxyz"]


def _euromap_bands(path: str, sensor: str) -> List[str]:
    """Band files by the Euromap IRS 1C/1D last-letter convention."""
    last = path[-1]
    out: List[str] = []
    if sensor == "PAN":
        c = last.lower()
        if "a" <= c <= "j":
            out = [path[:-1] + chr(ord(c) - ord("a") + ord("0"))]
        elif "k" <= c <= "m":
            cand = path[:-1] + chr(ord(c) - ord("k") + ord("n"))
            out = _open_existing([cand, cand[:-1] + cand[-1].upper()])[:1]
    elif sensor == "LISS3":
        for grp in _LISS_GROUPS:
            if last.lower() == grp[0]:
                for ch in grp[1:]:
                    cand = path[:-1] + ch
                    got = _open_existing([cand, path[:-1] + ch.upper()])
                    if got:
                        out.append(got[0])
                break
    elif sensor == "WIFS":
        if last == "0":
            for ch in "12":
                cand = path[:-1] + ch
                if os.path.exists(cand):
                    out.append(cand)
    return [p for p in out if os.path.exists(p)]


def decode_fast(path: str) -> Tuple[np.ndarray, dict]:
    with open(path, "rb") as fh:
        raw = fh.read(5000)
    header = raw.decode("latin-1", "replace")
    nx = int(_value(header, "PIXELS PER LINE", 5) or 0)
    lines = _value(header, "LINES PER BAND", 5) or \
        _value(header, "LINES PER IMAGE", 5) or "0"
    ny = int(lines.split("/")[0])
    if nx < 1 or ny < 1:
        raise ValueError("FAST: missing dimensions")
    bits = int(_value(header, "OUTPUT BITS PER PIXEL", 2) or 8)
    dt = np.dtype(np.uint8) if bits == 8 else \
        np.dtype(np.uint16).newbyteorder(">")

    d = os.path.dirname(os.path.abspath(path))
    satellite = _value(header, "SATELLITE", 10) or ""
    sensor = _value(header, "SENSOR", 10) or ""

    band_files: List[str] = []
    if "FILENAME" not in header and "EUROMAP" in header:
        band_files = _euromap_bands(path, sensor)
    if not band_files:
        for m in re.finditer(r"FILENAME\s*=+", header):
            fn = header[m.end():m.end() + 29].strip()
            if fn:
                cand = os.path.join(d, fn)
                got = _open_existing([cand, os.path.join(d, fn.lower()),
                                      os.path.join(d, fn.upper())])
                if got:
                    band_files.append(got[0])
        if not band_files:
            stem = os.path.splitext(os.path.basename(path))[0]
            suffix = os.path.splitext(path)[1]
            for n in range(1, 8):  # fastdataset.cpp generic guesses
                for cand in (f"{stem}.b{n:02d}", f"BAND{n}{suffix}",
                             f"band{n}{suffix}", f"BAND{n}.DAT",
                             f"band{n}.dat", f"IMAGERY{n}{suffix}",
                             f"IMAGERY{n}.DAT", f"imagery{n}.dat"):
                    p = os.path.join(d, cand)
                    if os.path.exists(p):
                        band_files.append(p)
                        break
    if not band_files:
        raise ValueError("FAST: no band data files found")

    bands = []
    npx = nx * ny
    for bf in band_files:
        with open(bf, "rb") as fh:
            data = fh.read(npx * dt.itemsize)
        flat = np.zeros(npx, dt.newbyteorder("="))
        got = np.frombuffer(data, dt, len(data) // dt.itemsize)
        flat[:len(got)] = got
        bands.append(flat.reshape(ny, nx))
    arr = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)

    meta: Dict[str, object] = {
        "transform": None,
        "ACQUISITION_DATE": _value(header, "ACQUISITION DATE", 8),
        "SATELLITE": satellite, "SENSOR": sensor,
        "band_files": [os.path.basename(b) for b in band_files],
    }
    m = re.search(r"BIASES AND GAINS|GAINS AND BIASES", header)
    if m:
        nums = re.findall(r"-?\d+\.\d+", header[m.end():m.end() + 2000])
        for i in range(0, min(len(nums), 2 * len(band_files)), 2):
            meta[f"GAIN{i // 2 + 1}"] = float(nums[i])
            meta[f"BIAS{i // 2 + 1}"] = float(nums[i + 1])

    zone = int(_value(header, "USGS MAP ZONE", 6) or 0)
    # corner tags live in the geometric record (fastdataset.cpp scans
    # pszGeomRecord only — "FULL SCENE" in the admin record would
    # otherwise match "LL ")
    gi = header.find("GEOMETRIC DATA")
    geom = header[gi if gi >= 0 else 0:]
    corners = {t: _corner(geom, t + " ") for t in ("UL", "UR", "LR",
                                                   "LL")}
    if all(corners.values()):
        pts = {}
        for t, (x, y) in corners.items():
            if x >= 1000000.0:  # megameter zone prefix strip
                x -= zone * 1000000.0
            pts[t] = (x, y)
        # GDALGCPsToGeoTransform over TL/TR/BR/BL at pixel centers
        px = np.array([0.5, nx - 0.5, nx - 0.5, 0.5])
        py = np.array([0.5, 0.5, ny - 0.5, ny - 0.5])
        gx = np.array([pts["UL"][0], pts["UR"][0], pts["LR"][0],
                       pts["LL"][0]])
        gy = np.array([pts["UL"][1], pts["UR"][1], pts["LR"][1],
                       pts["LL"][1]])
        A = np.column_stack([np.ones(4), px, py])
        cx, *_ = np.linalg.lstsq(A, gx, rcond=None)
        cy, *_ = np.linalg.lstsq(A, gy, rcond=None)
        meta["transform"] = (cx[0], cx[1], cx[2], cy[0], cy[1], cy[2])
        meta["zone"] = zone
        meta["projection"] = _value(header, "MAP PROJECTION", 4)
        meta["datum"] = _value(header, "DATUM", 6)
    return arr, meta
