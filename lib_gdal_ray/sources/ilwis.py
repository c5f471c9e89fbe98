"""ILWIS raster map reader (.mpr + .mp# raw data).

Reference frmts/ilwis/ilwisdataset.cpp: INI-style object files —
[Map] Size, [MapStore] Data/Type/StartOffset/SwapBytes, dtype map
Byte→u8, Int→i16, Long→i32, Float→f4, Real→f8; georeference from
the [GeoRefCorners] block of the sibling .grf (edge-registered
MinX/MaxY when CornersOfCorners)."""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import numpy as np

_TYPES = {"byte": "u1", "int": "i2", "long": "i4",
          "float": "f4", "real": "f8"}


def _ini(text: str) -> Dict[str, Dict[str, str]]:
    out: Dict[str, Dict[str, str]] = {}
    cur = None
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"^\[(.+)\]$", line)
        if m:
            cur = m.group(1)
            out[cur] = {}
        elif "=" in line and cur is not None:
            k, v = line.split("=", 1)
            out[cur][k.strip()] = v.strip()
    return out


def identify_ilwis(buf: bytes, path: str = "") -> bool:
    return path.lower().endswith(".mpr") and b"[Ilwis]" in buf[:4096]


def decode_ilwis(path: str) -> Tuple[np.ndarray, Dict]:
    with open(path) as fh:
        ini = _ini(fh.read())
    base = os.path.dirname(path)
    size = ini.get("Map", {}).get("Size", "0 0").split()
    nl, ns = int(size[0]), int(size[1])
    store = ini.get("MapStore", {})
    data_file = store.get("Data")
    dt_name = store.get("Type", "Byte").lower()
    offset = int(store.get("StartOffset", "0"))
    swap = store.get("SwapBytes", "No").lower() == "yes"
    order = ">" if swap else "<"
    dt = np.dtype(order + _TYPES[dt_name])
    with open(os.path.join(base, data_file), "rb") as fh:
        raw = fh.read()
    vals = np.frombuffer(raw, dt, count=nl * ns, offset=offset)
    arr = np.ascontiguousarray(
        vals.reshape(nl, ns).astype(dt.newbyteorder("=")))

    meta: Dict = {}
    grf = ini.get("BaseMap", {}).get("GeoRef") or \
        ini.get("Map", {}).get("GeoRef")
    if grf and grf.lower() != "none.grf":
        grf_path = os.path.join(base, grf)
        if os.path.exists(grf_path):
            with open(grf_path) as fh:
                gini = _ini(fh.read())
            gc = gini.get("GeoRefCorners")
            if gc:
                minx = float(gc["MinX"])
                miny = float(gc["MinY"])
                maxx = float(gc["MaxX"])
                maxy = float(gc["MaxY"])
                cols = int(gini.get("GeoRef", {}).get("Columns", ns))
                lines_n = int(gini.get("GeoRef", {}).get("Lines", nl))
                if gc.get("CornersOfCorners", "Yes").lower() == "yes":
                    dx = (maxx - minx) / cols
                    dy = (maxy - miny) / lines_n
                    meta["transform"] = (minx, dx, 0.0, maxy, 0.0, -dy)
                else:  # corners are pixel centers
                    dx = (maxx - minx) / (cols - 1)
                    dy = (maxy - miny) / (lines_n - 1)
                    meta["transform"] = (minx - dx / 2, dx, 0.0,
                                         maxy + dy / 2, 0.0, -dy)
    return arr, meta
