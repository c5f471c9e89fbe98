"""PCRaster CSF 2.0 raster driver (read + write).

Layout: 32-byte "RUU CROSS SYSTEM MAP FORMAT" signature, main header
(u16 version @32, u32 gisFileId @34, u16 projection @38, u32
attrTable @40, u16 mapType @44, u32 byteOrder @46), raster header at
64 (u16 valueScale, u16 cellRepr, 8-byte min/max slots, f64 xUL/yUL,
u32 nrRows/nrCols, f64 cellSize ×2, f64 angle), cell data at 256.
Cell representations: CR_UINT1 0x00, CR_INT4 0x26, CR_REAL4 0x5A,
CR_REAL8 0xDB; value scales VS_BOOLEAN/NOMINAL/ORDINAL/SCALAR/
DIRECTION/LDD.  Missing values: 255 / INT32_MIN / NaN per type.

Reference: frmts/pcraster (libcsf/csf.h struct layout,
csftypes.h enums); autotest pcraster.py pins checksum 4528, gt
(182140, 10, 0, 327880, 0, -10), nodata 255 on ldd.map. Re-derived;
no code copied.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

_SIG = b"RUU CROSS SYSTEM MAP FORMAT"

_CR = {0x00: ("u1", 255.0), 0x26: ("<i4", float(-2**31)),
       0x5A: ("<f4", None), 0xDB: ("<f8", None)}
_CR_BACK = {"u1": 0x00, "i4": 0x26, "f4": 0x5A, "f8": 0xDB}

VS_BOOLEAN, VS_NOMINAL, VS_ORDINAL = 0xE0, 0xE2, 0xF2
VS_SCALAR, VS_DIRECTION, VS_LDD = 0xEB, 0xFB, 0xF0


def identify_pcraster(buf: bytes) -> bool:
    return buf[:len(_SIG)] == _SIG


def decode_pcraster(buf: bytes):
    """CSF bytes -> (array, meta)."""
    if not identify_pcraster(buf):
        raise ValueError("not a PCRaster CSF file")
    value_scale, cell_repr = struct.unpack_from("<HH", buf, 64)
    xul, yul = struct.unpack_from("<dd", buf, 84)
    nrows, ncols = struct.unpack_from("<II", buf, 100)
    cell_size, _dup = struct.unpack_from("<dd", buf, 108)
    angle = struct.unpack_from("<d", buf, 124)[0]
    spec = _CR.get(cell_repr)
    if spec is None:
        raise ValueError(f"PCRaster: unknown cellRepr {cell_repr:#x}")
    dt, nodata = spec
    arr = np.frombuffer(buf, dtype=dt, count=nrows * ncols,
                        offset=256).reshape(nrows, ncols)
    arr = np.ascontiguousarray(arr.astype(np.dtype(dt).newbyteorder("=")))
    meta = {"width": int(ncols), "height": int(nrows), "bands": 1,
            "transform": (xul, cell_size, 0.0, yul, 0.0, -cell_size),
            "epsg": None, "nodata": nodata, "angle": angle,
            "value_scale": int(value_scale)}
    return arr, meta


def encode_pcraster(arr: np.ndarray,
                    transform: Optional[Tuple[float, ...]] = None,
                    value_scale: Optional[int] = None) -> bytes:
    """Array -> CSF 2.0 bytes (UINT1/INT4/REAL4/REAL8)."""
    a = np.ascontiguousarray(arr)
    key = np.dtype(a.dtype).str[1:]
    if key not in _CR_BACK:
        # promote to the nearest CSF representation
        if np.issubdtype(a.dtype, np.integer):
            a = a.astype(np.int32)
            key = "i4"
        else:
            a = a.astype(np.float32)
            key = "f4"
    cr = _CR_BACK[key]
    if value_scale is None:
        value_scale = VS_SCALAR if key in ("f4", "f8") else VS_NOMINAL
    h, w = a.shape
    if transform is None:
        transform = (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    x0, pxw, _r0, y0, _r1, _neg = transform
    head = bytearray(256)
    head[:len(_SIG)] = _SIG
    struct.pack_into("<H", head, 32, 2)          # version
    struct.pack_into("<H", head, 38, 1)          # projection (y up)
    struct.pack_into("<H", head, 44, 1)          # T_RASTER
    struct.pack_into("<I", head, 46, 1)          # byteOrder LSB
    struct.pack_into("<HH", head, 64, value_scale, cr)
    vmin, vmax = float(a.min()), float(a.max())
    struct.pack_into("<dd", head, 68, vmin, vmax)
    struct.pack_into("<dd", head, 84, x0, y0)
    struct.pack_into("<II", head, 100, h, w)
    struct.pack_into("<dd", head, 108, pxw, pxw)
    payload = a.astype(np.dtype(key).newbyteorder("<")).tobytes()
    return bytes(head) + payload
