"""Racurs PHOTOMOD PRF / x-dem driver.

Parity target: the reference PRF driver (`frmts/prf/phprfdataset.cpp`)
on the `autotest/gdrivers/data/PRF` fixtures (`prf.py:test_prf_1..5`):
ph.prf mosaic checksum 43190, geotransform (1,2,3,-7,5,6) via the
GeoRef shift rule gt3 = B_0 - (B_1 + B_2), dem.x-dem 4330x4663
float32 metres with gt from the XR/YR ranges (half-pixel anchored),
the .prj WKT EPSG, and the Pyramid overview descriptor.

A PRF product is an XML tile index: <x n="name_r_c"> parts carry
Width/Height/DispX/DispY; pixel tiles live in a sibling directory
named after the product, as TIFFs (``parts_ext``; x-dem uses
``.demtif``). Ray shape: parts decode one task each
(`read_prf_pixels`); the whole-mosaic `open_prf` is the registry-style
driver-side read for small products.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

PH_GEOREF_SHIFT_Y = 1.0


def _decode_part(fp: str) -> np.ndarray:
    """One tile part: a TIFF, or (PHOTOMOD also allows it) a VRT
    carried under the parts extension."""
    with open(fp, "rb") as f:
        head = f.read(16)
    if head.lstrip().startswith(b"<VRT"):
        from .vrt import open_vrt

        arr, _m = open_vrt(fp)
        return arr
    from ..codecs.tiff import decode_geotiff

    arr, _m = decode_geotiff(open(fp, "rb").read())
    return arr


def _attrs(el) -> Dict[str, str]:
    """phini stores values as <i/s/d/x n="name" v="value"> nodes."""
    return {ch.get("n"): ch.get("v") for ch in el
            if ch.get("n") is not None}


def parse_prf(path: str) -> Dict:
    root = ET.parse(path).getroot()
    if root.tag != "phini":
        raise ValueError(f"{path}: not a PHOTOMOD phini document")
    top = _attrs(root)
    info: Dict = {
        "width": int(top.get("Width", 0)),
        "height": int(top.get("Height", 0)),
        "qchans": int(top.get("QChans", 1)),
        "parts_ext": ".x-dem" in path and ".demtif" or ".tif",
        "is_dem": path.lower().endswith(".x-dem"),
    }
    if not info["width"] or not info["height"]:
        raise ValueError(f"{path}: missing dimensions")
    dtype = np.uint8
    parts = []
    gt = None
    dem_keys = {}
    dem_shift = None
    pyramid = None
    for el in root:
        name = el.get("n", "")
        if name == "ChannelsInfo":
            a = _attrs(el)
            kind = a.get("type", "U")
            size = int(a.get("bytes_ps", 1))
            if kind == "F":
                dtype = np.float32 if size == 4 else np.float64
            else:
                dtype = {1: np.uint8, 2: np.uint16,
                         4: np.uint32}.get(size, np.uint8)
        elif name == "parts_ext" and el.get("v"):
            info["parts_ext"] = "." + el.get("v")
        elif name == "GeoRef":
            a = _attrs(el)
            try:
                g = [float(a[k]) for k in ("A_0", "A_1", "A_2",
                                           "B_0", "B_1", "B_2")]
                # PH_GEOREF_SHIFT_Y row anchor (phprfdataset.cpp:258)
                g[3] -= PH_GEOREF_SHIFT_Y * g[4]
                g[3] -= PH_GEOREF_SHIFT_Y * g[5]
                gt = tuple(g)
            except KeyError:
                pass
        elif name == "DemShift":
            a = _attrs(el)
            try:
                dem_shift = (float(a["x"]), float(a["y"]),
                             float(a["z"]))
            except KeyError:
                pass
        elif name == "Pyramid":
            a = _attrs(el)
            pyramid = {"width": int(a.get("Width", 0)),
                       "height": int(a.get("Height", 0)),
                       "scale": int(a.get("Scale", 2))}
        elif el.tag == "x" and name:
            a = _attrs(el)
            if {"Width", "Height", "DispX", "DispY"} <= set(a):
                parts.append({"name": name,
                              "width": int(a["Width"]),
                              "height": int(a["Height"]),
                              "xoff": int(a["DispX"]),
                              "yoff": int(a["DispY"])})
        if el.get("n") in ("XR_0", "XR_1", "YR_0", "YR_1", "ZR_0",
                           "ZR_1", "BadZ"):
            dem_keys[el.get("n")] = float(el.get("v"))
    if info["is_dem"] and {"XR_0", "XR_1", "YR_0", "YR_1"} <= \
            set(dem_keys) and info["width"] > 1 and info["height"] > 1:
        g1 = (dem_keys["XR_1"] - dem_keys["XR_0"]) / (info["width"] - 1)
        g5 = (dem_keys["YR_0"] - dem_keys["YR_1"]) / (info["height"] - 1)
        g0 = dem_keys["XR_0"] - 0.5 * g1
        g3 = dem_keys["YR_1"] - 0.5 * g5
        if dem_shift:
            g0 += dem_shift[0]
            g3 += dem_shift[1]
        gt = (g0, g1, 0.0, g3, 0.0, g5)
    info.update({
        "dtype": dtype, "parts": parts, "transform": gt,
        "nodata": dem_keys.get("BadZ"),
        "stats": (dem_keys.get("ZR_0"), dem_keys.get("ZR_1")),
        "dem_shift": dem_shift, "pyramid": pyramid,
    })
    # tiles live in the sibling dir named after the product
    base = os.path.basename(path)
    base = base[:base.index(".")]
    info["parts_dir"] = os.path.join(os.path.dirname(path), base)
    # EPSG from the .prj WKT sibling
    prj = os.path.splitext(path)[0] + ".prj"
    if os.path.exists(prj):
        wkt = open(prj).read()
        codes = re.findall(r'AUTHORITY\["EPSG","(\d+)"\]', wkt)
        if codes:
            info["epsg"] = int(codes[-1])
    return info


def open_prf(path: str) -> Tuple[np.ndarray, Dict]:
    """Full-mosaic read (registry contract): (array, meta)."""
    info = parse_prf(path)
    shape = (info["height"], info["width"]) if info["qchans"] == 1 \
        else (info["height"], info["width"], info["qchans"])
    out = np.zeros(shape, dtype=info["dtype"])
    for p in info["parts"]:
        fp = os.path.join(info["parts_dir"],
                          p["name"] + info["parts_ext"])
        if not os.path.exists(fp):
            continue
        arr = _decode_part(fp)
        h = min(p["height"], arr.shape[0])
        w = min(p["width"], arr.shape[1])
        out[p["yoff"]:p["yoff"] + h,
            p["xoff"]:p["xoff"] + w] = arr[:h, :w]
    meta: Dict = {"driver": "PRF"}
    for k in ("transform", "epsg", "nodata", "pyramid", "dem_shift"):
        if info.get(k) is not None:
            meta[k] = info[k]
    if info["is_dem"]:
        meta["units"] = "m"
        if info["stats"][0] is not None:
            meta["stats_min"], meta["stats_max"] = info["stats"]
        meta["overviews"] = 1 if info["pyramid"] else 0
    return out, meta


def read_prf_pixels(path: str):
    """PRF -> Ray Dataset of pixel rows (y, x, value): one decode
    task per tile part."""
    import pyarrow as pa
    import ray.data

    info = parse_prf(path)
    parts = [p for p in info["parts"]
             if os.path.exists(os.path.join(
                 info["parts_dir"], p["name"] + info["parts_ext"]))]

    def decode(batch: pa.Table) -> pa.Table:
        ys, xs, vs = [], [], []
        for i in batch["i"].to_pylist():
            p = parts[i]
            fp = os.path.join(info["parts_dir"],
                              p["name"] + info["parts_ext"])
            arr = _decode_part(fp)
            if arr.ndim == 3:
                arr = arr[:, :, 0]
            yy, xx = np.mgrid[0:arr.shape[0], 0:arr.shape[1]]
            ys.append((yy.ravel() + p["yoff"]).astype(np.int32))
            xs.append((xx.ravel() + p["xoff"]).astype(np.int32))
            vs.append(arr.ravel().astype(np.float64))
        cat = np.concatenate
        return pa.table({
            "y": pa.array(cat(ys) if ys else np.empty(0, np.int32)),
            "x": pa.array(cat(xs) if xs else np.empty(0, np.int32)),
            "value": pa.array(cat(vs) if vs else
                              np.empty(0, np.float64))})

    return ray.data.from_items(
        [{"i": i} for i in range(len(parts))],
        override_num_blocks=max(1, len(parts))).map_batches(
            decode, batch_format="pyarrow", batch_size=1)
