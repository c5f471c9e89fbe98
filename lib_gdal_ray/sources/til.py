"""TIL (DigitalGlobe/Vexcel tile set) reader.

A `.til` text file lists tiles (`TILE_n.filename` + UL/LR row/col
offsets) that mosaic into one raster; an `.imd` sidecar (or `.xml`)
carries the IMAGERY-domain metadata (satelliteID, cloudCover,
firstLineTime → SATELLITEID/CLOUDCOVER/ACQUISITIONDATETIME).

Reference: frmts/til/tildataset.cpp; autotest til.py pins checksum
4672 + the IMD metadata keys. Re-derived; no code copied.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np


def identify_til(buf: bytes) -> bool:
    head = buf[:512].lstrip().lower()
    return head.startswith(b"numtiles") or b"tile_1.filename" in head


def _parse_til(text: str):
    kv = {}
    for ln in text.splitlines():
        ln = ln.strip().rstrip(";")
        if "=" in ln:
            k, v = ln.split("=", 1)
            kv[k.strip().lower()] = v.strip().strip('"')
    n = int(kv.get("numtiles", "0"))
    tiles = []
    for i in range(1, n + 1):
        p = f"tile_{i}."
        tiles.append({
            "filename": kv.get(p + "filename"),
            "ulcol": int(kv.get(p + "ulcoloffset", "0")),
            "ulrow": int(kv.get(p + "ulrowoffset", "0")),
            "lrcol": int(kv.get(p + "lrcoloffset", "0")),
            "lrrow": int(kv.get(p + "lrrowoffset", "0")),
        })
    return tiles


def _parse_imd(path: str) -> dict:
    """DigitalGlobe .IMD keyword file -> IMAGERY metadata keys."""
    md = {}
    try:
        with open(path, "r", encoding="latin-1") as f:
            text = f.read()
    except OSError:
        return md
    kv = {}
    for ln in text.splitlines():
        ln = ln.strip().rstrip(";")
        if "=" in ln:
            k, v = ln.split("=", 1)
            kv[k.strip().lower()] = v.strip().strip('"')
    if "satid" in kv:
        md["SATELLITEID"] = kv["satid"]
    if "cloudcover" in kv:
        md["CLOUDCOVER"] = kv["cloudcover"]
    if "firstlinetime" in kv:
        m = re.match(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2})",
                     kv["firstlinetime"])
        if m:
            md["ACQUISITIONDATETIME"] = "{} {}:{}".format(
                "-".join(m.groups()[:3]), m.group(4), m.group(5))
        else:
            md["ACQUISITIONDATETIME"] = kv["firstlinetime"]
    return md


def decode_til(path: str):
    """.til path -> (mosaic array, meta with IMAGERY metadata)."""
    from .rasters import open_raster_path

    with open(path, "r", encoding="latin-1") as f:
        tiles = _parse_til(f.read())
    if not tiles:
        raise ValueError("TIL: no tiles")
    base = os.path.dirname(os.path.abspath(path))
    w = max(t["lrcol"] for t in tiles)
    h = max(t["lrrow"] for t in tiles)
    out = None
    meta0: Optional[dict] = None
    files = [path]
    for t in tiles:
        p = os.path.join(base, t["filename"])
        files.append(p)
        _d, a, m = open_raster_path(p)
        if a.ndim == 2:
            a = a[:, :, None]
        if out is None:
            out = np.zeros((h, w, a.shape[2]), dtype=a.dtype)
            meta0 = m
        y0, x0 = t["ulrow"], t["ulcol"]
        out[y0:t["lrrow"], x0:t["lrcol"]] = \
            a[:t["lrrow"] - y0, :t["lrcol"] - x0]
    arr = out[:, :, 0] if out.shape[2] == 1 else out
    stem = os.path.splitext(path)[0]
    imagery = {}
    for cand in (stem + ".imd", stem + ".IMD"):
        if os.path.exists(cand):
            imagery = _parse_imd(cand)
            files.append(cand)
            break
    else:
        for cand in (stem + ".xml", stem + ".XML"):
            if os.path.exists(cand):
                files.append(cand)
                break
    meta = {"width": w, "height": h,
            "bands": out.shape[2],
            "transform": (meta0 or {}).get("transform"),
            "epsg": (meta0 or {}).get("epsg"), "nodata": None,
            "imagery": imagery, "file_list": files}
    return np.ascontiguousarray(arr), meta
