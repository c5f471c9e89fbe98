"""ENVI raw-binary rasters (.hdr text header + flat .img/.dat body).

Parity target: `frmts/raw/envidataset.cpp` — "ENVI" header keyword
list (samples/lines/bands/data type/interleave/byte order/header
offset), BSQ/BIL/BIP interleaves, `map info = {Geographic Lat/Lon,
refx, refy, x, y, px, py, datum}` georeferencing (pixel-corner
anchored at the 1-based reference pixel), ENVI data-type codes.

The body is a bare memory-mappable array — the cheapest format there
is to scatter across Ray tasks: `read_envi_rows` splits on line
ranges and each task seeks to exactly its own bytes (one task never
touches another's rows for BSQ/BIL; BIP rows are contiguous too).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

# ENVI data type code -> numpy dtype (envidataset.cpp GetEnviType)
_DTYPES = {1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8",
           6: "c8", 9: "c16", 12: "u2", 13: "u4", 14: "i8", 15: "u8"}
_CODES = {np.dtype(v).name: k for k, v in _DTYPES.items()}


def parse_envi_header(text: str) -> Dict:
    """ENVI .hdr -> dict (multi-line {...} values joined)."""
    if not text.lstrip().startswith("ENVI"):
        raise ValueError("not an ENVI header (missing ENVI keyword)")
    body = text.lstrip()[4:]
    # join {...} blocks onto one line
    body = re.sub(r"\{[^}]*\}",
                  lambda m: m.group(0).replace("\n", " "), body)
    hdr: Dict = {}
    for line in body.splitlines():
        if "=" not in line:
            continue
        k, v = line.split("=", 1)
        k = k.strip().lower()
        v = v.strip()
        if v.startswith("{") and v.endswith("}"):
            v = v[1:-1].strip()
        hdr[k] = v
    return hdr


def _hdr_geotransform(hdr: Dict) -> Optional[tuple]:
    mi = hdr.get("map info")
    if not mi:
        return None
    parts = [p.strip() for p in mi.split(",")]
    # {proj, refx, refy, x, y, px, py, ...} — ref pixel is 1-based,
    # anchored at the pixel's upper-left corner (envidataset.cpp)
    refx, refy = float(parts[1]), float(parts[2])
    x, y = float(parts[3]), float(parts[4])
    px, py = float(parts[5]), float(parts[6])
    x0 = x - (refx - 1.0) * px
    y0 = y + (refy - 1.0) * py
    return (x0, px, 0.0, y0, 0.0, -py)


def read_envi_header(hdr_path: str) -> Dict:
    with open(hdr_path) as f:
        hdr = parse_envi_header(f.read())
    w = int(hdr["samples"])
    h = int(hdr["lines"])
    bands = int(hdr.get("bands", 1))
    code = int(hdr["data type"])
    if code not in _DTYPES:
        raise ValueError(f"ENVI data type {code} unsupported")
    order = ">" if hdr.get("byte order", "0").strip() == "1" else "<"
    return {"width": w, "height": h, "bands": bands,
            "dtype": np.dtype(order + _DTYPES[code]),
            "interleave": hdr.get("interleave", "bsq").lower(),
            "offset": int(hdr.get("header offset", 0)),
            "transform": _hdr_geotransform(hdr),
            "raw": hdr}


def _data_path(hdr_path: str) -> str:
    stem = os.path.splitext(hdr_path)[0]
    for ext in ("", ".img", ".dat", ".bin", ".raw", ".bsq", ".bil", ".bip"):
        p = stem + ext
        if os.path.exists(p) and p != hdr_path:
            return p
    raise FileNotFoundError(f"no data file next to {hdr_path}")


def decode_envi(hdr_path: str) -> Tuple[np.ndarray, Dict]:
    """(.hdr path) -> ((H, W) or (H, W, B) native-endian array, meta)."""
    meta = read_envi_header(hdr_path)
    w, h, b = meta["width"], meta["height"], meta["bands"]
    dt = meta["dtype"]
    with open(_data_path(hdr_path), "rb") as f:
        f.seek(meta["offset"])
        raw = f.read(w * h * b * dt.itemsize)
    flat = np.frombuffer(raw, dtype=dt)
    il = meta["interleave"]
    if il == "bsq":
        arr = flat.reshape(b, h, w).transpose(1, 2, 0)
    elif il == "bil":
        arr = flat.reshape(h, b, w).transpose(0, 2, 1)
    else:                                  # bip
        arr = flat.reshape(h, w, b)
    arr = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    if b == 1:
        arr = arr[:, :, 0]
    return arr, meta


def encode_envi(arr: np.ndarray, hdr_path: str,
                transform: Optional[tuple] = None,
                interleave: str = "bsq") -> None:
    """Array -> .hdr + .img pair (ENVIDataset::FlushCache layout)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, b = arr.shape
    dt = arr.dtype.newbyteorder("<")
    code = _CODES.get(np.dtype(dt).name)
    if code is None:
        raise ValueError(f"ENVI cannot encode dtype {arr.dtype}")
    il = interleave.lower()
    a = arr.astype(dt)
    if il == "bsq":
        body = np.ascontiguousarray(a.transpose(2, 0, 1)).tobytes()
    elif il == "bil":
        body = np.ascontiguousarray(a.transpose(0, 2, 1)).tobytes()
    elif il == "bip":
        body = np.ascontiguousarray(a).tobytes()
    else:
        raise ValueError("interleave must be bsq|bil|bip")
    lines = ["ENVI",
             "description = {lib_gdal_ray}",
             f"samples = {w}", f"lines   = {h}", f"bands   = {b}",
             "header offset = 0", "file type = ENVI Standard",
             f"data type = {code}", f"interleave = {il}",
             "byte order = 0"]
    if transform is not None:
        gt = transform
        if abs(gt[2]) > 0 or abs(gt[4]) > 0:
            raise ValueError("ENVI map info cannot encode rotation")
        lines.append(
            "map info = {Geographic Lat/Lon, 1, 1, "
            f"{gt[0]!r}, {gt[3]!r}, {gt[1]!r}, {-gt[5]!r}, WGS-84}}")
    img_path = os.path.splitext(hdr_path)[0] + ".img"
    with open(hdr_path + ".tmp", "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(img_path + ".tmp", "wb") as f:
        f.write(body)
    os.replace(img_path + ".tmp", img_path)
    os.replace(hdr_path + ".tmp", hdr_path)


def read_envi_rows(hdr_path: str, band: int = 0,
                   rows_per_chunk: int = 512):
    """ENVI raster -> Ray Dataset of pixel rows (band, y, x, value),
    split on line ranges — each task reads only its own byte ranges
    (the BSQ/BIL/BIP stride math per slab)."""
    import pyarrow as pa
    import ray.data

    meta = read_envi_header(hdr_path)
    w, h, b = meta["width"], meta["height"], meta["bands"]
    dt = meta["dtype"]
    il = meta["interleave"]
    off = meta["offset"]
    data_path = _data_path(hdr_path)
    isz = dt.itemsize
    n_chunks = (h + rows_per_chunk - 1) // rows_per_chunk
    items = [{"c": i} for i in range(n_chunks)]

    def decode(batch: pa.Table) -> pa.Table:
        ys, xs, vs, bands_out = [], [], [], []
        with open(data_path, "rb") as f:
            for ci in batch["c"].to_pylist():
                r0 = ci * rows_per_chunk
                r1 = min(r0 + rows_per_chunk, h)
                nr = r1 - r0
                if il == "bsq":
                    f.seek(off + (band * h + r0) * w * isz)
                    plane = np.frombuffer(f.read(nr * w * isz), dt) \
                        .reshape(nr, w)
                elif il == "bil":
                    f.seek(off + r0 * b * w * isz)
                    slab = np.frombuffer(f.read(nr * b * w * isz), dt) \
                        .reshape(nr, b, w)
                    plane = slab[:, band, :]
                else:
                    f.seek(off + r0 * w * b * isz)
                    slab = np.frombuffer(f.read(nr * w * b * isz), dt) \
                        .reshape(nr, w, b)
                    plane = slab[:, :, band]
                yy, xx = np.mgrid[r0:r1, 0:w]
                ys.append(yy.ravel().astype(np.int32))
                xs.append(xx.ravel().astype(np.int32))
                vs.append(plane.ravel().astype(np.float64))
                bands_out.append(np.full(nr * w, band, dtype=np.int32))
        cat = np.concatenate
        return pa.table({"band": pa.array(cat(bands_out)),
                         "y": pa.array(cat(ys)),
                         "x": pa.array(cat(xs)),
                         "value": pa.array(cat(vs))})

    return ray.data.from_items(
        items, override_num_blocks=min(64, n_chunks)
    ).map_batches(decode, batch_format="pyarrow")
