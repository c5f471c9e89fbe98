"""USGS ISIS3 planetary cube (.cub) reader.

Reference frmts/pds/isis3dataset.cpp: a PVL text label
(Object/Group blocks, `key = value` with optional `<unit>`
annotations) describing a Core of either BandSequential raw data or
a tile store (TileSamples×TileLines tiles, row-major tile order,
band-sequential) at StartByte (1-based), with Pixels
Type/ByteOrder/Base/Multiplier.  GDAL exposes the RAW DNs (the
Base/Multiplier linear scale is reported as offset/scale metadata,
not applied) — checksums here are over raw DNs to match.

The PVL parser doubles for the other planetary label formats.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

_TYPE = {"unsignedbyte": "u1", "signedword": "i2", "unsignedword": "u2",
         "real": "f4", "double": "f8"}


def parse_pvl(text: str) -> Dict:
    """PVL label -> nested dict; Object/Group names key sub-dicts
    (duplicates get _2, _3 suffixes); values keep their raw string
    with any <unit> stripped."""
    root: Dict = {}
    stack = [root]
    pending_key = None
    for raw_line in text.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("#") or line.startswith("/*"):
            continue
        if line in ("End", "END"):
            break
        m = re.match(r"^(End_Object|End_Group|EndObject|EndGroup)\b",
                     line, re.I)
        if m:
            if len(stack) > 1:
                stack.pop()
            pending_key = None
            continue
        m = re.match(r"^(Object|Group)\s*=\s*(\S+)", line, re.I)
        if m:
            name = m.group(2)
            d: Dict = {}
            parent = stack[-1]
            key = name
            i = 2
            while key in parent:
                key = f"{name}_{i}"
                i += 1
            parent[key] = d
            stack.append(d)
            pending_key = None
            continue
        if "=" in line:
            k, v = line.split("=", 1)
            k = k.strip()
            v = v.strip()
            if k.startswith("^"):
                # data pointers keep their raw form (<BYTES> markers)
                stack[-1][k] = v
                pending_key = k
                continue
            um = re.search(r"<([^>]*)>", v)
            if um:
                stack[-1].setdefault("_units", {})[k] = um.group(1)
            v = re.sub(r"<[^>]*>", "", v).strip().strip('"').strip("'")
            stack[-1][k] = v
            pending_key = k
        elif pending_key is not None:
            # continuation of a wrapped value
            v = re.sub(r"<[^>]*>", "", line).strip()
            stack[-1][pending_key] += " " + v
    return root


def identify_isis3(buf: bytes) -> bool:
    return buf[:len(b"Object = IsisCube")].startswith(b"Object") \
        and b"IsisCube" in buf[:256]


def decode_isis3(buf: bytes, path: str = "") -> Tuple[np.ndarray, Dict]:
    head = buf[:65536].decode("latin-1", "replace")
    lbl = parse_pvl(head)
    cube = lbl.get("IsisCube", {})
    core = cube.get("Core", {})
    dims = core.get("Dimensions", {})
    pix = core.get("Pixels", {})
    ns = int(dims["Samples"])
    nl = int(dims["Lines"])
    nb = int(dims.get("Bands", "1"))
    start = int(core.get("StartByte", "1")) - 1
    order = "<" if pix.get("ByteOrder", "Lsb").lower().startswith("l") \
        else ">"
    dt = np.dtype(order + _TYPE[pix.get("Type", "Real").lower()])
    fmt = core.get("Format", "BandSequential").lower()

    data_src = buf
    fn = core.get("^Core") or cube.get("^Core")
    if fn and path:  # detached core file
        import os

        with open(os.path.join(os.path.dirname(path), fn), "rb") as fh:
            data_src = fh.read()
        start = int(core.get("StartByte", "1")) - 1

    if fmt == "tile":
        ts = int(core["TileSamples"])
        tl = int(core["TileLines"])
        tiles_x = (ns + ts - 1) // ts
        tiles_y = (nl + tl - 1) // tl
        tile_px = ts * tl
        out = np.zeros((nl, ns, nb), dt.newbyteorder("="))
        pos = start
        for b in range(nb):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    tile = np.frombuffer(data_src, dt, count=tile_px,
                                         offset=pos).reshape(tl, ts)
                    pos += tile_px * dt.itemsize
                    y0, x0 = ty * tl, tx * ts
                    ny = min(tl, nl - y0)
                    nx = min(ts, ns - x0)
                    out[y0:y0 + ny, x0:x0 + nx, b] = tile[:ny, :nx]
    else:  # BandSequential
        vals = np.frombuffer(data_src, dt, count=ns * nl * nb,
                             offset=start)
        out = vals.reshape(nb, nl, ns).transpose(1, 2, 0).astype(
            dt.newbyteorder("="))
    if nb == 1:
        out = out[:, :, 0]

    meta: Dict = {"label": lbl}
    if "Base" in pix or "Multiplier" in pix:
        meta["offset"] = float(pix.get("Base", "0"))
        meta["scale"] = float(pix.get("Multiplier", "1"))
    mapping = cube.get("Mapping", {})
    if "UpperLeftCornerX" in mapping and "PixelResolution" in mapping:
        res = float(mapping["PixelResolution"])
        meta["transform"] = (float(mapping["UpperLeftCornerX"]), res, 0.0,
                             float(mapping["UpperLeftCornerY"]), 0.0,
                             -res)
        meta["target"] = mapping.get("TargetName")
        meta["projection"] = mapping.get("ProjectionName")
    return out, meta
