"""Small raw-grid raster drivers: BT, KRO, LAN, PNM, Idrisi RST,
SAGA, NTv2.

Parity targets (all in `frmts/raw/`): btdataset.cpp (VTP .bt 1.3 —
256-byte LE header, column-major data stored south->north, dtype from
(datasize, is-float) pair, vscale at +62), krodataset.cpp (KRO\\x01 +
big-endian xsize/ysize/depth/ncomp, pixel-interleaved, depth 8/16/32
-> Byte/UInt16/Float32), landataset.cpp (Erdas 7.x HEAD74/HEADER 128-
byte header, 0=8bit/1=4bit/2=16bit pixel types, BIL layout, 4-bit
expansion, float-vs-int dims by magic, center-anchored corner fields
at +112), pnmdataset.cpp (raw P5/P6, maxval>255 -> UInt16 MSB),
idrisidataset.cpp (.rst + .rdc "key : value" metadata, byte/integer/
real types, min/max X/Y cell-edge bounds), sagadataset.cpp (.sgrd
key = value header + .sdat raw, TOPTOBOTTOM flag, cell-center
POSITION_XMIN/YMIN, .sg-grd-z zip container), ntv2dataset.cpp (11x16B
overview + subgrid records, positive-west longitudes negated, 4x
float32 records stored bottom-to-top and east-to-west, extents /3600
arc-seconds -> degrees).

Each format is one small file -> one Ray decode task via the
`open_raster_path` dispatch in sources/rasters.py.
"""

from __future__ import annotations

import os
import re
import struct
from typing import Optional, Tuple

import numpy as np

# ------------------------------------------------------------------ BT

_BT_MAGIC = b"binterr1.3"


def identify_bt(buf: bytes) -> bool:
    return buf[:7] == b"binterr"


def decode_bt(buf: bytes) -> Tuple[np.ndarray, dict]:
    if not identify_bt(buf):
        raise ValueError("not a BT file")
    nx = struct.unpack_from("<i", buf, 10)[0]
    ny = struct.unpack_from("<i", buf, 14)[0]
    dsize = struct.unpack_from("<h", buf, 18)[0]
    isfloat = buf[20]
    hunits = struct.unpack_from("<h", buf, 22)[0]
    utm = struct.unpack_from("<h", buf, 24)[0]
    datum = struct.unpack_from("<h", buf, 26)[0]
    left, right, bottom, top = struct.unpack_from("<4d", buf, 28)
    vscale = struct.unpack_from("<f", buf, 62)[0] or 1.0
    if isfloat and dsize == 4:
        dt = np.float32
    elif not isfloat and dsize == 4:
        dt = np.int32
    elif not isfloat and dsize == 2:
        dt = np.int16
    else:
        raise ValueError(f"BT: unknown data type (datasize={dsize})")
    data = np.frombuffer(buf, dtype=np.dtype(dt).newbyteorder("<"),
                         count=nx * ny, offset=256)
    # stored column-major, each column south->north => transpose + flip
    arr = data.reshape(nx, ny).T[::-1].astype(dt)
    gt = (left, (right - left) / nx, 0.0, top, 0.0, -(top - bottom) / ny)
    return arr, {"transform": gt, "vscale": vscale, "utm_zone": utm,
                 "datum_code": datum, "horiz_units": hunits}


def encode_bt(arr: np.ndarray, transform=None) -> bytes:
    a = np.asarray(arr)
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    if a.dtype not in (np.dtype(np.float32), np.dtype(np.int32),
                       np.dtype(np.int16)):
        a = a.astype(np.float32)
    ny, nx = a.shape
    gt = transform or (0.0, 1.0, 0.0, float(ny), 0.0, -1.0)
    hdr = bytearray(256)
    hdr[0:10] = _BT_MAGIC
    struct.pack_into("<i", hdr, 10, nx)
    struct.pack_into("<i", hdr, 14, ny)
    struct.pack_into("<h", hdr, 18, a.dtype.itemsize)
    hdr[20] = 1 if a.dtype == np.float32 else 0
    struct.pack_into("<h", hdr, 22, 1)  # horizontal units: meters
    left = gt[0]
    right = gt[0] + gt[1] * nx
    top = gt[3]
    bottom = gt[3] + gt[5] * ny
    struct.pack_into("<4d", hdr, 28, left, right, bottom, top)
    struct.pack_into("<f", hdr, 62, 1.0)
    body = np.ascontiguousarray(a[::-1].T, dtype=a.dtype.newbyteorder("<"))
    return bytes(hdr) + body.tobytes()


# ----------------------------------------------------------------- KRO

def identify_kro(buf: bytes) -> bool:
    return buf[:4] == b"KRO\x01"


def decode_kro(buf: bytes) -> Tuple[np.ndarray, dict]:
    if not identify_kro(buf):
        raise ValueError("not a KRO file")
    nx, ny, depth, ncomp = struct.unpack_from(">4I", buf, 4)
    dt = {8: np.uint8, 16: np.uint16, 32: np.float32}.get(depth)
    if dt is None or ncomp < 1:
        raise ValueError(f"KRO: unsupported depth {depth}")
    data = np.frombuffer(buf, dtype=np.dtype(dt).newbyteorder(">"),
                         count=nx * ny * ncomp, offset=20)
    arr = data.reshape(ny, nx, ncomp).astype(dt)
    if ncomp == 1:
        arr = arr[:, :, 0]
    return arr, {"transform": None}


def encode_kro(arr: np.ndarray) -> bytes:
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    depth = {np.dtype(np.uint8): 8, np.dtype(np.uint16): 16,
             np.dtype(np.float32): 32}.get(a.dtype)
    if depth is None:
        a = a.astype(np.float32)
        depth = 32
    ny, nx, nc = a.shape
    hdr = b"KRO\x01" + struct.pack(">4I", nx, ny, depth, nc)
    return hdr + np.ascontiguousarray(
        a, dtype=a.dtype.newbyteorder(">")).tobytes()


# ----------------------------------------------------------------- LAN

def identify_lan(buf: bytes) -> bool:
    return buf[:6] in (b"HEAD74", b"HEADER") and buf[16:24] != b"S LAT   "


def decode_lan(buf: bytes) -> Tuple[np.ndarray, dict]:
    if not identify_lan(buf):
        raise ValueError("not an Erdas LAN/GIS file")
    old = buf[:6] == b"HEADER"
    # endianness guessed from the band-count field (landataset.cpp)
    bo = "<"
    nbands = struct.unpack_from("<h", buf, 8)[0]
    if not 0 < nbands < 256:
        bo = ">"
        nbands = struct.unpack_from(">h", buf, 8)[0]
    ptype = struct.unpack_from(bo + "h", buf, 6)[0]
    if old:
        nx = int(struct.unpack_from(bo + "f", buf, 16)[0])
        ny = int(struct.unpack_from(bo + "f", buf, 20)[0])
    else:
        nx, ny = struct.unpack_from(bo + "2i", buf, 16)
    ulx, uly = struct.unpack_from(bo + "2f", buf, 112)
    pw, ph = struct.unpack_from(bo + "2f", buf, 120)
    gt = (ulx - pw / 2.0, pw, 0.0, uly + ph / 2.0, 0.0, -ph)
    if ptype == 0:      # 8-bit BIL
        data = np.frombuffer(buf, np.uint8, nx * ny * nbands, 128)
        arr = data.reshape(ny, nbands, nx).transpose(0, 2, 1)
    elif ptype == 1:    # 4-bit, expanded to 8-bit
        npl = (nx * nbands + 1) // 2
        rows = []
        for j in range(ny):
            raw = np.frombuffer(buf, np.uint8, npl, 128 + j * npl)
            hi = (raw >> 4) & 0xF
            lo = raw & 0xF
            row = np.empty(npl * 2, np.uint8)
            row[0::2] = lo   # low nibble first (landataset.cpp 4bit)
            row[1::2] = hi
            rows.append(row[:nx * nbands])
        arr = np.stack(rows).reshape(ny, nbands, nx).transpose(0, 2, 1)
    elif ptype == 2:    # 16-bit
        data = np.frombuffer(buf, np.dtype(np.int16).newbyteorder(bo),
                             nx * ny * nbands, 128)
        arr = data.reshape(ny, nbands, nx).transpose(0, 2, 1) \
            .astype(np.int16)
    else:
        raise ValueError(f"LAN: unsupported pixel type {ptype}")
    if nbands == 1:
        arr = arr[:, :, 0]
    return np.ascontiguousarray(arr), {"transform": gt}


# ----------------------------------------------------------------- PNM

def identify_pnm(buf: bytes) -> bool:
    return buf[:2] in (b"P5", b"P6") and len(buf) > 2 and \
        buf[2:3] in b" \t\n\r"


def decode_pnm(buf: bytes) -> Tuple[np.ndarray, dict]:
    if not identify_pnm(buf):
        raise ValueError("not a raw PNM file")
    toks = []
    pos = 2
    while len(toks) < 3:
        m = re.match(rb"(?:\s+|#[^\n]*\n)*(\d+)", buf[pos:pos + 256])
        if m is None:
            raise ValueError("PNM: bad header")
        toks.append(int(m.group(1)))
        pos += m.end()
    nx, ny, maxval = toks
    pos += 1  # single whitespace after maxval
    nc = 3 if buf[:2] == b"P6" else 1
    dt = (np.dtype(np.uint16).newbyteorder(">") if maxval > 255
          else np.dtype(np.uint8))
    data = np.frombuffer(buf, dt, nx * ny * nc, pos)
    arr = data.reshape(ny, nx, nc).astype(dt.newbyteorder("="))
    if nc == 1:
        arr = arr[:, :, 0]
    return arr, {"transform": None, "maxval": maxval}


def encode_pnm(arr: np.ndarray) -> bytes:
    a = np.asarray(arr)
    nc = 1 if a.ndim == 2 else a.shape[2]
    if nc not in (1, 3):
        raise ValueError("PNM supports 1 or 3 bands")
    if a.dtype not in (np.dtype(np.uint8), np.dtype(np.uint16)):
        a = np.clip(a, 0, 255).astype(np.uint8)
    maxval = 255 if a.dtype == np.uint8 else 65535
    ny, nx = a.shape[:2]
    hdr = (b"P5" if nc == 1 else b"P6") + \
        f"\n{nx} {ny}\n{maxval}\n".encode()
    body = a if a.dtype == np.uint8 else a.astype(">u2")
    return hdr + np.ascontiguousarray(body).tobytes()


# ---------------------------------------------------------- Idrisi RST

_RST_TYPES = {"byte": np.uint8, "integer": np.int16, "real": np.float32}


def _parse_rdc(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            out[k.strip().lower()] = v.strip()
    return out


def decode_rst(path: str) -> Tuple[np.ndarray, dict]:
    rdc = os.path.splitext(path)[0] + ".rdc"
    if not os.path.exists(rdc):
        rdc = os.path.splitext(path)[0] + ".RDC"
    with open(rdc, encoding="latin-1") as fh:
        meta = _parse_rdc(fh.read())
    dt = _RST_TYPES.get(meta.get("data type", ""), None)
    if dt is None:
        raise ValueError(f"RST: unsupported data type "
                         f"{meta.get('data type')!r}")
    nx = int(meta["columns"])
    ny = int(meta["rows"])
    with open(path, "rb") as fh:
        data = np.frombuffer(fh.read(), np.dtype(dt).newbyteorder("<"),
                             nx * ny)
    arr = data.reshape(ny, nx).astype(dt)
    xmin, xmax = float(meta["min. x"]), float(meta["max. x"])
    ymin, ymax = float(meta["min. y"]), float(meta["max. y"])
    gt = (xmin, (xmax - xmin) / nx, 0.0, ymax, 0.0, -(ymax - ymin) / ny)
    return arr, {"transform": gt, "units": meta.get("ref. units")}


def encode_rst(arr: np.ndarray, transform=None) -> Tuple[bytes, str]:
    """-> (raster bytes, .rdc text)."""
    a = np.asarray(arr)
    if a.dtype == np.uint8:
        tname = "byte"
    elif a.dtype == np.int16:
        tname = "integer"
    else:
        a = a.astype(np.float32)
        tname = "real"
    ny, nx = a.shape
    gt = transform or (0.0, 1.0, 0.0, float(ny), 0.0, -1.0)
    xmin, ymax = gt[0], gt[3]
    xmax = xmin + gt[1] * nx
    ymin = ymax + gt[5] * ny
    rdc = (f"file format : IDRISI Raster A.1\nfile title  : \n"
           f"data type   : {tname}\nfile type   : binary\n"
           f"columns     : {nx}\nrows        : {ny}\n"
           f"ref. system : plane\nref. units  : m\n"
           f"unit dist.  : 1.0000000\n"
           f"min. X      : {xmin:.7f}\nmax. X      : {xmax:.7f}\n"
           f"min. Y      : {ymin:.7f}\nmax. Y      : {ymax:.7f}\n"
           f"pos`n error : unknown\nresolution  : {abs(gt[1]):.7f}\n"
           f"min. value  : {float(np.nanmin(a)):g}\n"
           f"max. value  : {float(np.nanmax(a)):g}\n"
           f"display min : {float(np.nanmin(a)):g}\n"
           f"display max : {float(np.nanmax(a)):g}\n"
           f"value units : unspecified\nvalue error : unknown\n"
           f"flag value  : none\nflag def`n  : none\nlegend cats : 0\n")
    return np.ascontiguousarray(
        a, dtype=a.dtype.newbyteorder("<")).tobytes(), rdc


# ---------------------------------------------------------------- SAGA

_SAGA_TYPES = {
    "BIT": np.uint8, "BYTE_UNSIGNED": np.uint8, "BYTE": np.int8,
    "SHORTINT_UNSIGNED": np.uint16, "SHORTINT": np.int16,
    "INTEGER_UNSIGNED": np.uint32, "INTEGER": np.int32,
    "FLOAT": np.float32, "DOUBLE": np.float64,
}


def _parse_sgrd(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            out[k.strip().upper()] = v.strip()
    return out


def decode_saga(path: str) -> Tuple[np.ndarray, dict]:
    """Accepts .sdat/.sgrd path, or a .sg-grd-z zip container."""
    if path.lower().endswith((".sg-grd-z", ".sg-grd")):
        import io
        import zipfile
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
            sgrd = next(n for n in names if n.lower().endswith(".sgrd"))
            sdat = next(n for n in names if n.lower().endswith(".sdat"))
            hdr = _parse_sgrd(z.read(sgrd).decode("latin-1"))
            raw = z.read(sdat)
        return _decode_saga_parts(hdr, raw)
    base = os.path.splitext(path)[0]
    with open(base + ".sgrd", encoding="latin-1") as fh:
        hdr = _parse_sgrd(fh.read())
    with open(base + ".sdat", "rb") as fh:
        raw = fh.read()
    return _decode_saga_parts(hdr, raw)


def _decode_saga_parts(hdr: dict, raw: bytes) -> Tuple[np.ndarray, dict]:
    dt = _SAGA_TYPES.get(hdr.get("DATAFORMAT", "FLOAT").upper())
    if dt is None:
        raise ValueError(f"SAGA: dataformat {hdr.get('DATAFORMAT')}")
    bo = ">" if hdr.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE" else "<"
    nx = int(hdr["CELLCOUNT_X"])
    ny = int(hdr["CELLCOUNT_Y"])
    cell = float(hdr["CELLSIZE"])
    xmin = float(hdr["POSITION_XMIN"])  # cell centers
    ymin = float(hdr["POSITION_YMIN"])
    off = int(hdr.get("DATAFILE_OFFSET", "0") or 0)
    data = np.frombuffer(raw, np.dtype(dt).newbyteorder(bo), nx * ny, off)
    arr = data.reshape(ny, nx).astype(dt)
    if hdr.get("TOPTOBOTTOM", "FALSE").upper() != "TRUE":
        arr = arr[::-1]
    gt = (xmin - cell / 2.0, cell, 0.0,
          ymin + cell * (ny - 1) + cell / 2.0, 0.0, -cell)
    meta = {"transform": gt}
    if "NODATA_VALUE" in hdr:
        meta["nodata"] = float(hdr["NODATA_VALUE"])
    if "Z_FACTOR" in hdr:
        meta["z_factor"] = float(hdr["Z_FACTOR"])
    return np.ascontiguousarray(arr), meta


def encode_saga(arr: np.ndarray, transform=None,
                nodata: float = -99999.0) -> Tuple[str, bytes]:
    """-> (.sgrd text, .sdat bytes)."""
    a = np.asarray(arr)
    fmt = next((k for k, v in _SAGA_TYPES.items()
                if k != "BIT" and np.dtype(v) == a.dtype), None)
    if fmt is None:
        a = a.astype(np.float32)
        fmt = "FLOAT"
    ny, nx = a.shape
    gt = transform or (0.0, 1.0, 0.0, float(ny), 0.0, -1.0)
    cell = gt[1]
    xmin = gt[0] + cell / 2.0
    ymin = gt[3] + gt[5] * (ny - 0.5)  # bottom cell center
    sgrd = (f"NAME\t= grid\nDESCRIPTION\t= \nUNIT\t= \n"
            f"DATAFILE_OFFSET\t= 0\nDATAFORMAT\t= {fmt}\n"
            f"BYTEORDER_BIG\t= FALSE\n"
            f"POSITION_XMIN\t= {xmin:.10f}\nPOSITION_YMIN\t= {ymin:.10f}\n"
            f"CELLCOUNT_X\t= {nx}\nCELLCOUNT_Y\t= {ny}\n"
            f"CELLSIZE\t= {cell:.10f}\nZ_FACTOR\t= 1.000000\n"
            f"NODATA_VALUE\t= {nodata:f}\nTOPTOBOTTOM\t= FALSE\n")
    body = np.ascontiguousarray(a[::-1], dtype=a.dtype.newbyteorder("<"))
    return sgrd, body.tobytes()


# ---------------------------------------------------------------- NTv2

def identify_ntv2(buf: bytes) -> bool:
    return buf[:8] == b"NUM_OREC"


def decode_ntv2(buf: bytes, grid: int = 0) -> Tuple[np.ndarray, dict]:
    """-> ((ny, nx, 4) float32 north-up west-to-east array, meta).
    Bands: lat shift, lon shift (positive west), lat err, lon err."""
    if not identify_ntv2(buf):
        raise ValueError("not an NTv2 .gsb file")
    rec = 16
    le = struct.unpack_from("<i", buf, 8)[0] == 11
    bo = "<" if le else ">"
    n_sub = struct.unpack_from(bo + "i", buf, 2 * rec + 8)[0]
    off = 11 * rec
    for g in range(max(1, n_sub)):
        s_lat, = struct.unpack_from(bo + "d", buf, off + 4 * rec + 8)
        n_lat, = struct.unpack_from(bo + "d", buf, off + 5 * rec + 8)
        e_long, = struct.unpack_from(bo + "d", buf, off + 6 * rec + 8)
        w_long, = struct.unpack_from(bo + "d", buf, off + 7 * rec + 8)
        lat_inc, = struct.unpack_from(bo + "d", buf, off + 8 * rec + 8)
        long_inc, = struct.unpack_from(bo + "d", buf, off + 9 * rec + 8)
        count, = struct.unpack_from(bo + "i", buf, off + 10 * rec + 8)
        if g == grid:
            e_long, w_long = -e_long, -w_long  # positive west -> east
            nx = int((e_long - w_long) / long_inc + 1.5)
            ny = int((n_lat - s_lat) / lat_inc + 1.5)
            data = np.frombuffer(
                buf, np.dtype(np.float32).newbyteorder(bo),
                nx * ny * 4, off + 11 * rec)
            arr = data.reshape(ny, nx, 4)
            # stored bottom-to-top and east-to-west: flip both axes
            arr = np.ascontiguousarray(arr[::-1, ::-1]).astype(np.float32)
            gt = ((w_long - long_inc * 0.5) / 3600.0, long_inc / 3600.0,
                  0.0, (n_lat + lat_inc * 0.5) / 3600.0, 0.0,
                  -lat_inc / 3600.0)
            return arr, {"transform": gt, "datum": "WGS84",
                         "n_subgrids": max(1, n_sub)}
        off += (11 + count) * rec
    raise ValueError(f"NTv2: subgrid {grid} out of range")
