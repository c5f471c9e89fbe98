"""ISIS2 (.cub QUBE) planetary reader.

Reference frmts/pds/isis2dataset.cpp: SFDU/PDS-style label (shared
PVL parser) with a QUBE object — AXES/AXIS_NAME ordering,
CORE_ITEMS (samples, lines, bands), CORE_ITEM_BYTES ×
CORE_ITEM_TYPE (SUN_=MSB, PC_=LSB, default VAX→unsupported here
except SUN/PC), ^QUBE record pointer against RECORD_BYTES,
SUFFIX_ITEMS sideplane/backplane byte padding per axis."""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from .isis3 import parse_pvl


def identify_isis2(buf: bytes) -> bool:
    head = buf[:512]
    return head.startswith(b"CCSD3ZF") and b"QUBE" in buf[:2048]


def _tuple(v: str):
    return [t.strip() for t in v.strip("()").split(",") if t.strip()]


def decode_isis2(buf: bytes) -> Tuple[np.ndarray, Dict]:
    head = buf[:65536].decode("latin-1", "replace")
    lbl = parse_pvl(head)
    record_bytes = int(lbl.get("RECORD_BYTES", "512"))
    qube = lbl.get("QUBE")
    if qube is None:
        raise ValueError("ISIS2: no QUBE object")
    items = [int(x) for x in _tuple(qube["CORE_ITEMS"])]
    axes = [a.upper() for a in _tuple(qube.get(
        "AXIS_NAME", "(SAMPLE,LINE,BAND)"))]
    dims = dict(zip(axes, items))
    ns, nl, nb = dims.get("SAMPLE", 1), dims.get("LINE", 1), \
        dims.get("BAND", 1)
    ib = int(qube.get("CORE_ITEM_BYTES", "1"))
    ctype = qube.get("CORE_ITEM_TYPE", "PC_INTEGER").upper()
    order = ">" if ctype.startswith(("SUN", "MSB")) else "<"
    if "REAL" in ctype:
        dt = np.dtype(f"{order}f{ib}")
    elif "UNSIGNED" in ctype:
        dt = np.dtype(f"{order}u{ib}") if ib > 1 else np.dtype("u1")
    else:
        dt = np.dtype(f"{order}i{ib}") if ib > 1 else np.dtype("u1")

    ptr = lbl.get("^QUBE", "1").split()[0]
    offset = (int(ptr) - 1) * record_bytes

    suffix = [int(x) for x in _tuple(qube.get("SUFFIX_ITEMS", "(0,0,0)"))]
    sb = int(qube.get("SUFFIX_BYTES", "4"))
    # suffix planes pad the fastest axis per line and lines per band
    s_samp = suffix[0] if len(suffix) > 0 else 0
    s_line = suffix[1] if len(suffix) > 1 else 0
    row_bytes = ns * ib + s_samp * sb
    band_rows = nl + s_line

    out = np.empty((nl, ns, nb), dt.newbyteorder("="))
    pos = offset
    for b in range(nb):
        raw = np.frombuffer(buf, np.uint8, count=band_rows * row_bytes,
                            offset=pos).reshape(band_rows, row_bytes)
        plane = np.frombuffer(
            raw[:nl, :ns * ib].tobytes(), dt).reshape(nl, ns)
        out[:, :, b] = plane
        pos += band_rows * row_bytes
    if nb == 1:
        out2 = out[:, :, 0]
    else:
        out2 = out

    meta: Dict = {"label": lbl,
                  "offset": float(qube.get("CORE_BASE", "0")),
                  "scale": float(qube.get("CORE_MULTIPLIER", "1"))}
    return out2, meta
