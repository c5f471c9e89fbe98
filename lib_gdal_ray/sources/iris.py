"""IRIS (Vaisala Sigmet weather radar product) reader.

Layout: 640-byte header — structure ids 27 (product header) + 26
(product configuration) at offsets 0 and 12, product code @24,
data type code @142, raster dims i32 @112/116, band count @120; band
planes follow bottom-up (the y axis stores in inverse direction).
Per-type value transforms (the public IRIS Programmer's Manual
tables): dBZ/dBT 1-byte (v-64)/2 (95.5 → nodata), dBZ2/dBT2 2-byte
(v-32768)/100, Fliquid2 4-bit-exponent/12-bit-mantissa,
HEIGHT2 2-byte (v-1)/1000, VEL 1-byte (v-1)/10 with 0 → -1; nodata
-9999.  Output Float32, matching the reference band contract.

Reference: frmts/iris/irisdataset.cpp (:740-840 identify/open,
:222-360 per-type decode); autotest iris.py pins checksums 65532 /
52872. Re-derived; no code copied.  Projection/geotransform (radar
Mercator anchor) out of scope — metadata only.
"""

from __future__ import annotations

import struct

import numpy as np


def identify_iris(buf: bytes) -> bool:
    if len(buf) < 640:
        return False
    id1 = struct.unpack_from("<h", buf, 0)[0]
    id2 = struct.unpack_from("<h", buf, 12)[0]
    code = struct.unpack_from("<H", buf, 24)[0]
    year = struct.unpack_from("<h", buf, 38)[0]
    month = struct.unpack_from("<h", buf, 40)[0]
    day = struct.unpack_from("<h", buf, 42)[0]
    return (id1 == 27 and id2 == 26 and 0 < code < 41
            and 1900 <= year < 2100 and 1 <= month <= 12
            and 1 <= day <= 31)


def _transform_values(raw: np.ndarray, code: int) -> np.ndarray:
    v = raw.astype(np.float32)
    if code in (1, 2):          # dBT / dBZ, 1 byte
        out = (v - 64.0) / 2.0
        out[out == 95.5] = -9999.0
        return out
    if code in (8, 9):          # dBT2 / dBZ2, 2 bytes
        out = (v - 32768.0) / 100.0
        out[out == np.float32(327.67)] = -9999.0
        return out
    if code == 37:              # Fliquid2
        n = raw.astype(np.uint32)
        exp = n >> 12
        mant = n & 0xFFF
        out = np.where(exp == 0, mant / 1000.0,
                       ((mant + 4096) << np.maximum(
                           exp.astype(np.int64) - 1, 0)) / 1000.0
                       ).astype(np.float32)
        out[n == 65535] = -9999.0
        return out
    if code == 33:              # HEIGHT2
        out = (v - 1.0) / 1000.0
        out[v == 65535.0] = -9999.0
        out[v == 0.0] = -1.0
        return out
    if code == 32:              # VIL2 (1 byte)
        out = (v - 1.0) / 10.0
        out[v == 255.0] = -9999.0
        out[v == 0.0] = -1.0
        return out
    return v  # raw passthrough for the undocumented codes


def decode_iris(buf: bytes):
    """IRIS product bytes -> ((H, W) or (H, W, B) float32, meta)."""
    if not identify_iris(buf):
        raise ValueError("not an IRIS product file")
    w = struct.unpack_from("<i", buf, 112)[0]
    h = struct.unpack_from("<i", buf, 116)[0]
    nb = max(1, struct.unpack_from("<i", buf, 120)[0])
    product = struct.unpack_from("<H", buf, 24)[0]
    dtype_code = struct.unpack_from("<H", buf, 142)[0]
    nlen = 2 if dtype_code in (8, 9, 37, 33) else 1
    dt = "<u2" if nlen == 2 else "u1"
    bands = []
    for b in range(nb):
        off = 640 + nlen * w * h * b
        raw = np.frombuffer(buf, dtype=dt, count=w * h,
                            offset=off).reshape(h, w)
        # IRIS rows store bottom-up
        bands.append(_transform_values(raw[::-1], dtype_code))
    arr = bands[0] if nb == 1 else np.stack(bands, axis=-1)
    meta = {"width": w, "height": h, "bands": nb, "transform": None,
            "epsg": None, "nodata": -9999.0,
            "product_code": int(product),
            "data_type_code": int(dtype_code)}
    return np.ascontiguousarray(arr), meta
