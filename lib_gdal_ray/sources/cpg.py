"""CPG (Convair PolGASP SAR) reader — the SIRC.hdr/SIRC.img
compressed-scattering-matrix fileset.

Layout: a text .hdr (number_lines / number_samples keywords) beside a
.img of 10 signed bytes per pixel: byte 0 = power-of-two exponent,
byte 1 = mantissa, bytes 2-9 = Re/Im pairs of SHH, SHV, SVH, SVV.
Per-pixel scale = sqrt((b1/254 + 1.5) · 2^b0) / 127; the four complex
bands are the scaled Re/Im pairs (CFloat32, complex64 here).

Reference: frmts/raw/cpgdataset.cpp (:304 SIRC fileset detection,
:1235-1330 the byte decode comment + scale rule); autotest cpg.py
pins checksum 0 on the 1×1 fake fixture. Re-derived; no code copied.
The 4-file type-1 fileset and Stokes-matrix flavor are out of scope
(no fixtures; documented).
"""

from __future__ import annotations

import os

import numpy as np

POLARIZATIONS = ("hh", "hv", "vv", "vh")


def identify_cpg_path(path: str) -> bool:
    low = path.lower()
    if not low.endswith(("sirc.hdr", "sirc.img")):
        return False
    base = path[:-4]
    return os.path.exists(base + ".img") and os.path.exists(
        base + ".hdr")


def decode_cpg_sirc(path: str):
    """SIRC .hdr/.img pair -> ((H, W, 4) complex64, meta)."""
    base = path[:-4]
    kv = {}
    with open(base + ".hdr", "r", encoding="latin-1") as f:
        for ln in f:
            parts = ln.split()
            if len(parts) >= 2:
                kv[parts[0].lower()] = parts[1]
    h = int(kv["number_lines"])
    w = int(kv["number_samples"])
    raw = np.fromfile(base + ".img", dtype=np.int8,
                      count=h * w * 10).reshape(h, w, 10)
    b0 = raw[:, :, 0].astype(np.float64)
    b1 = raw[:, :, 1].astype(np.float64)
    scale = (np.sqrt((b1 / 254.0 + 1.5) * np.power(2.0, b0))
             / 127.0).astype(np.float32)
    out = np.empty((h, w, 4), dtype=np.complex64)
    for band in range(4):
        re = raw[:, :, 2 + 2 * band].astype(np.float32) * scale
        im = raw[:, :, 3 + 2 * band].astype(np.float32) * scale
        out[:, :, band] = re + 1j * im
    meta = {"width": w, "height": h, "bands": 4, "transform": None,
            "epsg": None, "nodata": None,
            "polarizations": list(POLARIZATIONS),
            "matrix_representation": "SCATTERING"}
    return out, meta
