"""MiraMon raster (.img + I.rel) driver.

Parity target: the reference MiraMonRaster driver
(`frmts/miramon/miramon_band.cpp` / `miramon_rel.cpp`) on the
`autotest/gdrivers/data/miramon` fixtures
(`miramon_read.py:test_miramon_test_basic_raster`): all six sample
types raw and RLE (checksum 15 over [0..5]), the bit-packed chess
board (checksum 32), the EXTENT-derived geotransform
(516792, 2, 0, 4638260, 0, -2) and the rows-anchored default, and the
NODATA key.

Format: `<name>I.rel` is an INI-style metadata file
([ATTRIBUTE_DATA] TipusCompressio = bit | byte | integer | uinteger |
long | real | double, optionally -RLE; [EXTENT] MinX/MaxX/MinY/MaxY;
[OVERVIEW:ASPECTES_TECNICS] columns/rows). `<name>.img` holds
row-major samples; RLE rows are (count, value) pairs where count 0
escapes a literal run (count, values...); an optional "IMG 1.0"
per-row seek index trails the data (ignored — rows decode
sequentially). Bit rasters pack LSB-first per row, rows padded to
whole bytes.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

_DTYPES = {
    "byte": np.uint8, "integer": np.int16, "uinteger": np.uint16,
    "long": np.int32, "real": np.float32, "double": np.float64,
}


def _parse_rel(path: str) -> Dict:
    sec = None
    out: Dict[str, Dict[str, str]] = {}
    for line in open(path, encoding="latin-1"):
        line = line.strip()
        if not line:
            continue
        if line.startswith("[") and line.endswith("]"):
            sec = line[1:-1]
            out.setdefault(sec, {})
        elif "=" in line and sec is not None:
            k, v = line.split("=", 1)
            out[sec][k.strip()] = v.strip()
    return out


def _rel_for(path: str) -> Tuple[str, str]:
    """(rel_path, img_path) for either a .img or an I.rel input."""
    if path.endswith("I.rel"):
        rel = path
        img = path[:-len("I.rel")] + ".img"
    elif path.endswith(".rel"):
        rel = path
        img = path[:-len(".rel")] + ".img"
    else:
        base = os.path.splitext(path)[0]
        rel = base + "I.rel"
        img = path
    if not os.path.exists(rel):
        raise ValueError(f"missing REL metadata for {path}")
    return rel, img


def open_miramon(path: str) -> Tuple[np.ndarray, Dict]:
    """MiraMon raster -> (array, meta) (registry contract)."""
    rel_path, img_path = _rel_for(path)
    rel = _parse_rel(rel_path)
    tech = rel.get("OVERVIEW:ASPECTES_TECNICS", {})
    cols = int(tech.get("columns", 0))
    rows = int(tech.get("rows", 0))
    if not cols or not rows:
        raise ValueError(f"{rel_path}: missing dimensions")
    attr = rel.get("ATTRIBUTE_DATA", {})
    comp = attr.get("TipusCompressio", "byte")
    rle = comp.endswith("-RLE")
    base = comp[:-4] if rle else comp
    raw = open(img_path, "rb").read()
    if base == "bit":
        stride = (cols + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(raw[:rows * stride], dtype=np.uint8)
            .reshape(rows, stride), axis=1, bitorder="little")
        arr = bits[:, :cols].astype(np.uint8)
    else:
        dt = np.dtype(_DTYPES.get(base, np.uint8)).newbyteorder("<")
        if not rle:
            arr = np.frombuffer(raw[:rows * cols * dt.itemsize],
                                dtype=dt).reshape(rows, cols)
        else:
            arr = _decode_rle(raw, rows, cols, dt)
    meta: Dict = {"driver": "MiraMonRaster"}
    ext = rel.get("EXTENT", {})
    if {"MinX", "MaxX", "MinY", "MaxY"} <= set(ext):
        minx, maxx = float(ext["MinX"]), float(ext["MaxX"])
        miny, maxy = float(ext["MinY"]), float(ext["MaxY"])
        meta["transform"] = (minx, (maxx - minx) / cols, 0.0,
                             maxy, 0.0, -(maxy - miny) / rows)
    else:
        meta["transform"] = (0.0, 1.0, 0.0, float(rows), 0.0, -1.0)
    nd = attr.get("NODATA")
    if nd is not None:
        meta["nodata"] = float(nd)
    srs = rel.get("SPATIAL_REFERENCE_SYSTEM:HORIZONTAL", {})
    ident = srs.get("HorizontalSystemIdentifier", "")
    m = re.match(r"UTM-(\d+)([NS])-ETRS89", ident)
    if m:
        meta["epsg"] = (25800 if m.group(2) == "N" else 0) + \
            int(m.group(1))
    return arr, meta


def _decode_rle(raw: bytes, rows: int, cols: int,
                dt: np.dtype) -> np.ndarray:
    """MiraMon RLE (miramon_band.cpp UncompressRow): per row, counter
    byte = run length of ONE value; counter 0 escapes a literal run
    (next byte = number of standard-format values following)."""
    isz = dt.itemsize
    out = np.empty((rows, cols), dtype=dt)
    pos = 0
    for r in range(rows):
        filled = 0
        while filled < cols:
            c = raw[pos]
            pos += 1
            if c == 0:
                n = raw[pos]
                pos += 1
                vals = np.frombuffer(raw[pos:pos + n * isz], dtype=dt)
                pos += n * isz
                out[r, filled:filled + n] = vals[:cols - filled]
                filled += n
            else:
                v = np.frombuffer(raw[pos:pos + isz], dtype=dt)[0]
                pos += isz
                out[r, filled:filled + c] = v
                filled += c
    return out


def read_miramon_pixels(path: str, rows_per_task: int = 512):
    """MiraMon raster -> Ray Dataset of pixel rows (y, x, value).
    Uncompressed rasters split by row ranges (each task reads only
    its own byte range); RLE/bit decode whole-file in one task (the
    fixtures and typical MiraMon layers are single-file artifacts —
    parallelize per file at the archive level)."""
    import pyarrow as pa
    import ray.data

    rel_path, img_path = _rel_for(path)
    rel = _parse_rel(rel_path)
    tech = rel.get("OVERVIEW:ASPECTES_TECNICS", {})
    cols = int(tech.get("columns", 0))
    rows = int(tech.get("rows", 0))
    attr = rel.get("ATTRIBUTE_DATA", {})
    comp = attr.get("TipusCompressio", "byte")
    if comp.endswith("-RLE") or comp == "bit":
        arr, _m = open_miramon(path)
        yy, xx = np.mgrid[0:rows, 0:cols]
        return ray.data.from_arrow(pa.table({
            "y": pa.array(yy.ravel().astype(np.int32)),
            "x": pa.array(xx.ravel().astype(np.int32)),
            "value": pa.array(arr.ravel().astype(np.float64))}))
    dt = np.dtype(_DTYPES.get(comp, np.uint8)).newbyteorder("<")
    n_tasks = max(1, (rows + rows_per_task - 1) // rows_per_task)

    def decode(batch: pa.Table) -> pa.Table:
        ys, xs, vs = [], [], []
        with open(img_path, "rb") as f:
            for i in batch["i"].to_pylist():
                r0 = i * rows_per_task
                r1 = min(r0 + rows_per_task, rows)
                f.seek(r0 * cols * dt.itemsize)
                plane = np.frombuffer(
                    f.read((r1 - r0) * cols * dt.itemsize),
                    dtype=dt).reshape(r1 - r0, cols)
                yy, xx = np.mgrid[r0:r1, 0:cols]
                ys.append(yy.ravel().astype(np.int32))
                xs.append(xx.ravel().astype(np.int32))
                vs.append(plane.ravel().astype(np.float64))
        cat = np.concatenate
        return pa.table({"y": pa.array(cat(ys)), "x": pa.array(cat(xs)),
                         "value": pa.array(cat(vs))})

    return ray.data.from_items(
        [{"i": i} for i in range(n_tasks)],
        override_num_blocks=min(32, n_tasks)).map_batches(
            decode, batch_format="pyarrow")
