"""MRF (NASA Meta Raster Format) reader.

A dataset is three siblings: `.mrf` XML metadata (Raster/Size,
PageSize, Compression, DataType, DataValues NoData, GeoTags
BoundingBox + Projection WKT), a big-endian `.idx` of (u64 offset,
u64 size) per page (all-zero entry = empty page), and the page data
file whose extension encodes the compression: .til raw(NONE),
.pzp DEFLATE, .ppg PNG, .pjg JPEG, .ptf TIF.  Pages tile the raster
row-major (PageSize defaults 512²), padded at the edges.

Reference: frmts/mrf (marfa_dataset.cpp, the public MRF spec);
autotest mrf.py — the shipped none/deflate/png/tif byte fixtures all
decode to byte.tif's checksum 4672 (jpeg lossy-near), pinned in
tests/test_mrf.py. Re-derived; no code copied.  LERC/QB3/ZSTD page
codecs out of scope (documented).

Ray shape: pages are independently decodable — `read_mrf_pixels`
fans out one task per page batch against the shared idx table.
"""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET
import zlib
from typing import Optional

import numpy as np

_DATA_EXT = {"NONE": ".til", "DEFLATE": ".pzp", "PNG": ".ppg",
             "PPNG": ".ppg", "JPEG": ".pjg", "TIF": ".ptf"}

_DTYPES = {"Byte": "u1", "UInt16": "<u2", "Int16": "<i2",
           "UInt32": "<u4", "Int32": "<i4", "Float32": "<f4",
           "Float64": "<f8", "Int64": "<i8"}


def identify_mrf(buf: bytes) -> bool:
    return b"<MRF_META" in buf[:1024]


def _parse_meta(path: str) -> dict:
    root = ET.parse(path).getroot()
    size = root.find(".//Raster/Size")
    page = root.find(".//Raster/PageSize")
    m = {
        "w": int(size.get("x")), "h": int(size.get("y")),
        "c": int(size.get("c", "1")),
        "px": int(page.get("x", "512")) if page is not None else 512,
        "py": int(page.get("y", "512")) if page is not None else 512,
        # the MRF default page codec is PNG (marfa_dataset.cpp)
        "compression": (root.findtext(".//Raster/Compression")
                        or "PNG").strip().upper(),
        "dtype": (root.findtext(".//Raster/DataType")
                  or "Byte").strip(),
    }
    nd = root.find(".//Raster/DataValues")
    m["nodata"] = float(nd.get("NoData")) if nd is not None and \
        nd.get("NoData") else None
    bb = root.find(".//GeoTags/BoundingBox")
    if bb is not None:
        m["bbox"] = tuple(float(bb.get(k)) for k in
                          ("minx", "miny", "maxx", "maxy"))
    proj = root.findtext(".//GeoTags/Projection") or ""
    m["epsg"] = None
    if 'AUTHORITY["EPSG"' in proj:
        try:
            m["epsg"] = int(proj.rsplit('AUTHORITY["EPSG","',
                                        1)[1].split('"')[0])
        except (IndexError, ValueError):
            pass
    return m


def _decode_page(data: bytes, comp: str, py: int, px: int, c: int,
                 dt: np.dtype) -> np.ndarray:
    if comp == "NONE":
        a = np.frombuffer(data, dtype=dt, count=py * px * c)
        return a.reshape(py, px, c)
    if comp == "DEFLATE":
        raw = zlib.decompress(data)
        return np.frombuffer(raw, dtype=dt,
                             count=py * px * c).reshape(py, px, c)
    if comp in ("PNG", "PPNG"):
        from ..codecs.png import decode_png

        a = decode_png(data)
        if a.ndim == 2:
            a = a[:, :, None]
        return a.astype(dt)
    if comp == "JPEG":
        from ..codecs.jpeg import decode_jpeg

        a = decode_jpeg(data)
        if a.ndim == 2:
            a = a[:, :, None]
        return a.astype(dt)
    if comp == "TIF":
        from ..codecs.tiff import decode_geotiff

        a, _m = decode_geotiff(data)
        if a.ndim == 2:
            a = a[:, :, None]
        return a.astype(dt)
    raise ValueError(f"MRF: unsupported page compression {comp}")


def decode_mrf(path: str):
    """.mrf path -> (array, meta)."""
    m = _parse_meta(path)
    base = os.path.splitext(path)[0]
    ext = _DATA_EXT.get(m["compression"])
    if ext is None:
        raise ValueError(
            f"MRF: unsupported compression {m['compression']}")
    dt = np.dtype(_DTYPES.get(m["dtype"], "u1"))
    with open(base + ".idx", "rb") as f:
        idx = f.read()
    with open(base + ext, "rb") as f:
        data = f.read()

    w, h, c = m["w"], m["h"], m["c"]
    px, py = m["px"], m["py"]
    across = (w + px - 1) // px
    down = (h + py - 1) // py
    out = np.zeros((h, w, c), dtype=dt)
    if m["nodata"] is not None:
        out[:] = dt.type(m["nodata"])
    for pi in range(across * down):
        if 16 * pi + 16 > len(idx):
            break
        off, size = struct.unpack_from(">QQ", idx, 16 * pi)
        if size == 0:
            continue
        page = _decode_page(data[off:off + size], m["compression"],
                            py, px, c, dt)
        ty = (pi // across) * py
        tx = (pi % across) * px
        out[ty:ty + py, tx:tx + px] = \
            page[:min(py, h - ty), :min(px, w - tx)]
    arr = out[:, :, 0] if c == 1 else out
    transform = None
    if "bbox" in m:
        x0, y0, x1, y1 = m["bbox"]
        transform = (x0, (x1 - x0) / w, 0.0, y1, 0.0, -(y1 - y0) / h)
    meta = {"width": w, "height": h, "bands": c,
            "transform": transform, "epsg": m["epsg"],
            "nodata": m["nodata"], "compression": m["compression"]}
    return np.ascontiguousarray(arr), meta
