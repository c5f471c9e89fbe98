"""ADRG (ARC Digitized Raster Graphics, NATO STANAG) reader over the
shared ISO 8211 parser.

A dataset is a .GEN general-information file (ISO 8211: the GIN
record's GEN field carries ZNA zone / ARV-BRV arc resolutions /
LSO-PSO origin as ±dddmmss.ss strings; SPR carries NFL×NFC 128² tile
layout, the BAD image file name and the TIF tile-index flag; TIM is
the 5-char-int tile index) plus a .IMG whose ISO 8211 header is
skipped to the raw RGB tile stream (tile = 3 × 128² band-sequential
bytes).  A .THF transmittal header resolves to its sibling pair.
Geotransform: (LSO, 360/ARV, 0, PSO, 0, -360/BRV) for standard
zones; ZNA 9/18 use the reference's polar az-eq formulas.

Reference: frmts/adrg/adrgdataset.cpp (:453-811 open, :150-196 tile
addressing, :762-806 zone geotransforms); autotest adrg.py pins
checksum 62833 on SMALL_ADRG (GEN, THF and subdataset routes) and
the ZNA 9/18 geotransforms. Re-derived; no code copied.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np

from ..codecs.iso8211 import decode_field, read_module

_TILE = 128
_EARTH = 40075016.68558
_M_PER_DEG = 111319.4907933


def _angle(s: bytes, deg_digits: int) -> float:
    t = s.decode("ascii")
    sign = -1.0 if t[0] == "-" else 1.0
    t = t[1:]
    d = float(t[:deg_digits])
    m = float(t[deg_digits:deg_digits + 2])
    sec = float(t[deg_digits + 2:])
    return sign * (d + m / 60.0 + sec / 3600.0)


def identify_adrg(path: str) -> bool:
    low = path.lower()
    return low.endswith((".gen", ".thf"))


def _resolve_gen(path: str) -> str:
    if path.lower().endswith(".gen"):
        return path
    # .THF transmittal: open the sibling .GEN
    d = os.path.dirname(os.path.abspath(path))
    gens = [f for f in os.listdir(d) if f.lower().endswith(".gen")]
    if not gens:
        raise ValueError("ADRG: no .GEN beside the THF")
    return os.path.join(d, sorted(gens)[0])


def decode_adrg(path: str):
    """.GEN / .THF path -> ((H, W, 3) uint8 RGB, meta)."""
    gen_path = _resolve_gen(path)
    with open(gen_path, "rb") as f:
        buf = f.read()
    defs, recs = read_module(buf)
    gin = next(r for r in recs
               if r.raw("001") and r.raw("001").startswith(b"GIN"))
    gen = decode_field(defs["GEN"], gin.raw("GEN"))[0]
    spr = decode_field(defs["SPR"], gin.raw("SPR"))[0]
    zna = int(gen["ZNA"])
    arv, brv = int(gen["ARV"]), int(gen["BRV"])
    lso = _angle(gen["LSO"], 3)
    pso = _angle(gen["PSO"], 2)
    nfl, nfc = int(spr["NFL"]), int(spr["NFC"])
    bad = spr["BAD"].decode("ascii").strip()
    tif = spr["TIF"] == b"Y"

    tile_index = None
    if tif and gin.raw("TIM") is not None:
        tile_index = [int(e["TSI"]) for e in
                      decode_field(defs["TIM"], gin.raw("TIM"))]

    img_path = os.path.join(os.path.dirname(os.path.abspath(gen_path)),
                            bad)
    if not os.path.exists(img_path):
        cands = {f.lower(): f for f in
                 os.listdir(os.path.dirname(img_path))}
        img_path = os.path.join(os.path.dirname(img_path),
                                cands[bad.lower()])
    with open(img_path, "rb") as f:
        img = f.read()
    # skip the IMG file's ISO 8211 header: find unit terminator + the
    # "IMG" field tag, then pad spaces, then the pixel stream starts
    off = img.find(b"\x1eIMG")
    if off < 0:
        raise ValueError("ADRG: no IMG field in image file")
    off += 4 + 3  # \x1e + "IMG" + 3 header bytes
    while off < len(img) and img[off] == 0x20:
        off += 1
    off += 1

    h, w = nfl * _TILE, nfc * _TILE
    out = np.zeros((h, w, 3), dtype=np.uint8)
    tile_bytes = _TILE * _TILE
    for ty in range(nfl):
        for tx in range(nfc):
            blk = ty * nfc + tx
            if tile_index is not None:
                ti = tile_index[blk]
                if ti <= 0:
                    continue
                base = off + (ti - 1) * tile_bytes * 3
            else:
                base = off + blk * tile_bytes * 3
            for b in range(3):
                plane = np.frombuffer(
                    img, dtype=np.uint8, count=tile_bytes,
                    offset=base + b * tile_bytes).reshape(_TILE, _TILE)
                out[ty * _TILE:(ty + 1) * _TILE,
                    tx * _TILE:(tx + 1) * _TILE, b] = plane

    if zna == 9:  # north polar azimuthal-equidistant pseudo-grid
        gt = (_M_PER_DEG * (90.0 - pso) * math.sin(math.radians(lso)),
              _EARTH / arv, 0.0,
              -_M_PER_DEG * (90.0 - pso) * math.cos(math.radians(lso)),
              0.0, -_EARTH / arv)
        epsg = None
    elif zna == 18:  # south polar
        gt = (_M_PER_DEG * (90.0 + pso) * math.sin(math.radians(lso)),
              _EARTH / arv, 0.0,
              _M_PER_DEG * (90.0 + pso) * math.cos(math.radians(lso)),
              0.0, -_EARTH / arv)
        epsg = None
    else:
        gt = (lso, 360.0 / arv, 0.0, pso, 0.0, -360.0 / brv)
        epsg = 4326
    meta = {"width": w, "height": h, "bands": 3, "transform": gt,
            "epsg": epsg, "nodata": 0.0, "zna": zna,
            "scale": int(gen["SCA"])}
    return out, meta


# ---------------------------------------------------------------------------
# SRP (USRP/ASRP — UTM/ARC Standard Raster Product), same ISO 8211
# family (frmts/adrg/srpdataset.cpp): GEN's GIN record carries the
# product grid (USRP gt = (LSO, LOD, 0, PSO, 0, -LAD), UTM zone ZNA →
# EPSG 32600+ZNA; ASRP in arc-seconds like ADRG), SPR adds PCB run-
# length compression (0 raw, 4 nibble-count, 8 byte-count) over 128²
# single-band palette-index tiles; the .QAL sibling carries the COL
# color table and QUV edition/date/classification metadata.
# autotest srp.py pins checksum 24576 + gt + palette on all three PCB
# variants. Re-derived; no code copied.
# ---------------------------------------------------------------------------


def _srp_decompress(data: bytes, pcb: int) -> np.ndarray:
    out = np.zeros(_TILE * _TILE, dtype=np.uint8)
    i_src = 0
    i_pix = 0
    half_used = False
    n = len(data)
    while i_pix < _TILE * _TILE and i_src + 2 <= n:
        if pcb == 8:
            count = data[i_src]
            value = data[i_src + 1]
            i_src += 2
        else:  # pcb == 4: nibble count, byte value, nibble-packed
            if (i_pix % _TILE) == 0 and half_used:
                i_src += 1
                half_used = False
                continue
            if half_used:
                count = data[i_src] & 0xF
                value = data[i_src + 1]
                i_src += 2
                half_used = False
            else:
                count = data[i_src] >> 4
                value = ((data[i_src] & 0xF) << 4) | (data[i_src + 1] >> 4)
                i_src += 1
                half_used = True
        out[i_pix:i_pix + count] = value
        i_pix += count
    return out.reshape(_TILE, _TILE)


def decode_srp(path: str):
    """USRP/ASRP .GEN / .IMG / .THF path -> (index array, meta with
    color_table + SRP_* metadata)."""
    if path.lower().endswith(".img"):
        cands = [p for p in os.listdir(os.path.dirname(
            os.path.abspath(path)) or ".")
            if p.lower() == os.path.basename(path).lower()[:-4] + ".gen"]
        gen_path = os.path.join(os.path.dirname(os.path.abspath(path)),
                                cands[0]) if cands else \
            os.path.splitext(path)[0] + ".GEN"
    else:
        gen_path = _resolve_gen(path)
    with open(gen_path, "rb") as f:
        buf = f.read()
    defs, recs = read_module(buf)
    gin = next(r for r in recs
               if r.raw("001") and r.raw("001").startswith(b"GIN"))
    gen = decode_field(defs["GEN"], gin.raw("GEN"))[0]
    spr = decode_field(defs["SPR"], gin.raw("SPR"))[0]
    dsi = decode_field(defs["DSI"], gin.raw("DSI"))[0] if \
        gin.raw("DSI") else {}
    product = (dsi.get("PRT") or b"USRP")[:4].decode("ascii", "replace")
    nam = (dsi.get("NAM") or b"").decode("ascii", "replace").strip()

    zna = int(gen["ZNA"])
    arv, brv = int(gen.get("ARV", 0) or 0), int(gen.get("BRV", 0) or 0)
    lso, pso = float(gen["LSO"]), float(gen["PSO"])
    lod = float(gen.get("LOD", 0) or 0)
    lad = float(gen.get("LAD", 0) or 0)
    nfl, nfc = int(spr["NFL"]), int(spr["NFC"])
    pcb = int(spr.get("PCB", 0) or 0)
    bad = spr["BAD"].decode("ascii").strip()
    tif = spr["TIF"] == b"Y"
    tile_index = None
    if tif and gin.raw("TIM") is not None:
        tile_index = [int(e["TSI"]) for e in
                      decode_field(defs["TIM"], gin.raw("TIM"))]

    img_dir = os.path.dirname(os.path.abspath(gen_path))
    img_path = os.path.join(img_dir, bad)
    if not os.path.exists(img_path):
        cands = {f.lower(): f for f in os.listdir(img_dir)}
        img_path = os.path.join(img_dir, cands[bad.lower()])
    with open(img_path, "rb") as f:
        img = f.read()
    off = img.find(b"\x1eIMG")
    if off < 0:
        raise ValueError("SRP: no IMG field in image file")
    off += 4 + 3
    while off < len(img) and img[off] == 0x20:
        off += 1
    off += 1

    h, w = nfl * _TILE, nfc * _TILE
    out = np.zeros((h, w), dtype=np.uint8)
    tb = _TILE * _TILE
    for ty in range(nfl):
        for tx in range(nfc):
            blk = ty * nfc + tx
            if tile_index is not None:
                ti = tile_index[blk]
                if ti <= 0:
                    continue
                base = off + (ti - 1) * (tb if pcb == 0 else 1)
            else:
                base = off + blk * tb
            if pcb == 0:
                tile = np.frombuffer(img, np.uint8, tb,
                                     base).reshape(_TILE, _TILE)
            else:
                tile = _srp_decompress(img[base:base + tb * 2], pcb)
            out[ty * _TILE:(ty + 1) * _TILE,
                tx * _TILE:(tx + 1) * _TILE] = tile

    # color table + QUV metadata from the .QAL sibling
    color_table = None
    md = {"SRP_NAM": nam, "SRP_PRODUCT": product,
          "SRP_SCA": str(int(gen["SCA"])), "SRP_ZNA": str(zna),
          "SRP_PSP": f"{float(gen['PSP']):.1f}"}
    qal = os.path.splitext(img_path)[0] + ".QAL"
    if not os.path.exists(qal):
        cands = {f.lower(): f for f in os.listdir(img_dir)}
        qal = os.path.join(
            img_dir, cands.get(os.path.basename(qal).lower(), ""))
    if qal and os.path.exists(qal):
        with open(qal, "rb") as f:
            qdefs, qrecs = read_module(f.read())
        for r in qrecs:
            if r.raw("COL") is not None:
                entries = decode_field(qdefs["COL"], r.raw("COL"))
                color_table = {}
                for e in entries[:256]:
                    color_table[int(e["CCD"])] = (
                        int(e["NSR"]), int(e["NSG"]), int(e["NSB"]),
                        255)
            if r.raw("QUV") is not None and "QUV" in qdefs:
                quv = decode_field(qdefs["QUV"], r.raw("QUV"))[0]

                def qs(key):
                    v = quv.get(key)
                    return v.decode("ascii", "replace").strip() if \
                        isinstance(v, bytes) else (str(v) if v is not
                                                   None else None)
                edn = qs("EDN")
                if edn:
                    md["SRP_EDN"] = str(int(float(edn)))
                elif edn == "":
                    md["SRP_EDN"] = "0"
                for mk, qk in (("SRP_CREATIONDATE", "CDV07"),
                               ("SRP_REVISIONDATE", "CDV24"),
                               ("SRP_CLASSIFICATION", "QSS")):
                    v = qs(qk)
                    if v:
                        md[mk] = v

    if product == "USRP":
        gt = (lso, lod, 0.0, pso, 0.0, -lad)
        epsg = (32600 + zna) if 0 < zna <= 60 else None
    else:  # ASRP: arc-second grid (ADRG-style)
        gt = (lso / 3600.0, 360.0 / arv, 0.0, pso / 3600.0, 0.0,
              -360.0 / brv)
        epsg = 4326
    meta = {"width": w, "height": h, "bands": 1, "transform": gt,
            "epsg": epsg, "nodata": None, "color_table": color_table,
            "metadata": md, "pcb": pcb}
    return out, meta
