"""ESRIC (Esri Compact Cache V2) reader — conf.xml + L{level}/
R{row}C{col}.bundle tile stores, optionally inside a .tar (the
reference opens /vsitar paths) .

conf.xml: TileCacheInfo (TileOrigin, TileCols/Rows, LODInfos with
per-level Resolution), TileImageInfo (PNG/JPEG/MIXED tiles),
CacheStorageInfo PacketSize (=128).  Bundle: 64-byte header + 128²
little-endian u64 index entries (lower 40 bits = tile offset, upper
24 = size; 0 = no tile), tile payload probed per tile (MIXED = PNG
or JPEG).  Raster size at level L = world-extent / LOD resolution;
missing levels/tiles read as zeros.

Reference: frmts/esric/esric_dataset.cpp (the public Compact Cache
V2 spec); autotest esric.py pins 2048² × 4 bands, EPSG 3857 georef,
cs 0 at the empty full-res level, cs 46857 on level-1 band 2 —
mirrored in tests/test_esric.py. Re-derived; no code copied.
"""

from __future__ import annotations

import io
import os
import struct
import tarfile
import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np

_PACKET = 128


class _Store:
    """conf.xml + bundle access over a directory or a .tar archive."""

    def __init__(self, path: str):
        self.tar = None
        if path.lower().endswith(".tar"):
            self.tar = tarfile.open(path)
            names = self.tar.getnames()
            conf = next(n for n in names if n.endswith("conf.xml"))
            self.root = conf[:-len("conf.xml")].rstrip("/")
        elif path.lower().endswith("conf.xml"):
            self.root = os.path.dirname(path)
        else:
            self.root = path
        self.base = self.root

    def read(self, rel: str) -> Optional[bytes]:
        if self.tar is not None:
            name = f"{self.base}/{rel}" if self.base else rel
            try:
                f = self.tar.extractfile(name)
            except KeyError:
                return None
            return f.read() if f else None
        p = os.path.join(self.base, rel)
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return f.read()


def identify_esric(path: str) -> bool:
    low = path.lower()
    if low.endswith("conf.xml"):
        return True
    if low.endswith(".tar"):
        try:
            with tarfile.open(path) as t:
                return any(n.endswith("conf.xml")
                           for n in t.getnames()[:16])
        except (tarfile.TarError, OSError):
            return False
    return False


def _decode_tile(data: bytes) -> np.ndarray:
    """PNG/JPEG payload -> (H, W, 4) RGBA uint8."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from ..codecs.png import decode_png

        a = decode_png(data)
    else:
        from ..codecs.jpeg import decode_jpeg

        a = decode_jpeg(data)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.shape[2] == 2:  # gray + alpha
        a = np.concatenate([np.repeat(a[:, :, :1], 3, axis=2),
                            a[:, :, 1:]], axis=2)
    if a.shape[2] == 3:
        a = np.concatenate(
            [a, np.full(a.shape[:2] + (1,), 255, np.uint8)], axis=2)
    return a


def decode_esric(path: str, level: Optional[int] = None):
    """conf.xml / .tar path -> (RGBA mosaic, meta). level defaults to
    the deepest LOD (missing levels read as zeros, like the
    reference)."""
    store = _Store(path)
    conf = store.read("conf.xml")
    if conf is None:
        raise ValueError("ESRIC: conf.xml not found")
    root = ET.fromstring(conf)

    def loc(tag):
        return [e for e in root.iter() if e.tag.endswith(tag)]

    origin = loc("TileOrigin")[0]
    ox = float(next(e.text for e in origin if e.tag.endswith("X")))
    oy = float(next(e.text for e in origin if e.tag.endswith("Y")))
    end = loc("TileEnd")[0]
    ex = float(next(e.text for e in end if e.tag.endswith("X")))
    ey = float(next(e.text for e in end if e.tag.endswith("Y")))
    tile_cols = int(loc("TileCols")[0].text)
    tile_rows = int(loc("TileRows")[0].text)
    lods = {}
    for li in loc("LODInfo"):
        lid = int(next(e.text for e in li
                       if e.tag.endswith("LevelID")))
        res = float(next(e.text for e in li
                         if e.tag.endswith("Resolution")))
        lods[lid] = res
    if level is None:
        level = max(lods)
    res = lods[level]
    w = int(round((ex - ox) / res))
    h = int(round((oy - ey) / res))
    tiles_x = (w + tile_cols - 1) // tile_cols
    tiles_y = (h + tile_rows - 1) // tile_rows

    wkid = None
    wk = loc("WKID")
    if wk:
        wkid = int(wk[0].text)

    out = np.zeros((h, w, 4), dtype=np.uint8)
    for brow in range(0, tiles_y, _PACKET):
        for bcol in range(0, tiles_x, _PACKET):
            rel = (f"_alllayers/L{level:02d}/"
                   f"R{brow:04x}C{bcol:04x}.bundle")
            bundle = store.read(rel)
            if bundle is None:
                continue
            for ty in range(min(_PACKET, tiles_y - brow)):
                for tx in range(min(_PACKET, tiles_x - bcol)):
                    # V2 index: entry at (row-in-bundle * 128 + col),
                    # u64 LE = offset | size<<40
                    (e,) = struct.unpack_from(
                        "<Q", bundle, 64 + 8 * (ty * _PACKET + tx))
                    off = e & ((1 << 40) - 1)
                    size = e >> 40
                    if size == 0:
                        continue
                    tile = _decode_tile(bundle[off:off + size])
                    y0 = (brow + ty) * tile_rows
                    x0 = (bcol + tx) * tile_cols
                    th = min(tile_rows, h - y0)
                    tw = min(tile_cols, w - x0)
                    out[y0:y0 + th, x0:x0 + tw] = tile[:th, :tw]
    meta = {"width": w, "height": h, "bands": 4,
            "transform": (ox, res, 0.0, oy, 0.0, -res),
            "epsg": wkid, "nodata": None, "level": level,
            "levels": sorted(lods)}
    return out, meta


def decode_tpkx(path: str, level: Optional[int] = None):
    """.tpkx (zipped compact cache with root.json) -> (RGBA mosaic,
    meta). Same bundle format, JSON metadata, world extent from the
    tiling scheme (the reference's EXTENT_SOURCE=TILING_SCHEME)."""
    import json
    import zipfile

    z = zipfile.ZipFile(path)
    root = json.loads(z.read("root.json"))
    info = root["tileInfo"]
    tile_cols, tile_rows = info["cols"], info["rows"]
    ox = float(info["origin"]["x"])
    oy = float(info["origin"]["y"])
    lods = {int(l["level"]): float(l["resolution"])
            for l in info["lods"]}
    max_lod = int(root.get("maxLOD", max(lods)))
    if level is None:
        level = max_lod
    res = lods[level]
    # square web-mercator world from the tiling scheme
    w = h = int(round(2 * abs(ox) / res))
    tiles_x = (w + tile_cols - 1) // tile_cols
    tiles_y = (h + tile_rows - 1) // tile_rows
    bundles_path = root.get("tileBundlesPath", "./tile").lstrip("./")

    out = np.zeros((h, w, 4), dtype=np.uint8)
    names = set(z.namelist())
    for brow in range(0, tiles_y, _PACKET):
        for bcol in range(0, tiles_x, _PACKET):
            rel = (f"{bundles_path}/L{level:02d}/"
                   f"R{brow:04x}C{bcol:04x}.bundle")
            if rel not in names:
                continue
            bundle = z.read(rel)
            for ty in range(min(_PACKET, tiles_y - brow)):
                for tx in range(min(_PACKET, tiles_x - bcol)):
                    (e,) = struct.unpack_from(
                        "<Q", bundle, 64 + 8 * (ty * _PACKET + tx))
                    off = e & ((1 << 40) - 1)
                    size = e >> 40
                    if size == 0:
                        continue
                    tile = _decode_tile(bundle[off:off + size])
                    y0 = (brow + ty) * tile_rows
                    x0 = (bcol + tx) * tile_cols
                    th = min(tile_rows, h - y0)
                    tw = min(tile_cols, w - x0)
                    out[y0:y0 + th, x0:x0 + tw] = tile[:th, :tw]
    sr = root.get("spatialReference", {})
    meta = {"width": w, "height": h, "bands": 4,
            "transform": (ox, res, 0.0, oy, 0.0, -res),
            "epsg": int(sr.get("latestWkid", sr.get("wkid", 0)))
            or None,
            "nodata": None, "level": level, "levels": sorted(lods)}
    return out, meta
