"""Small heightfield/grid formats: ZMap, JDEM, HF2.

Parity targets:
- frmts/zmap/zmapdataset.cpp — ZMap Plus ASCII grid: '!' comments,
  '@<name>, GRID, <values per line>' header, line 2 = field width /
  nodata / blank / decimals / 1, line 3 = rows, cols, xmin, xmax,
  ymin, ymax, a lone '@', then values in COLUMN-major order (each
  column written top to bottom). Writer mirrors CreateCopy
  (zmapdataset.cpp:542): width 20, 7 decimals, 4 values per line,
  EOL at the end of every column.
- frmts/jdem/jdemdataset.cpp — Japanese DEM: 1011-byte ASCII header,
  xsize@23(3) ysize@26(3), corners as DDDMMSS angles @29/36/43/50,
  one record per row of header(9) + 5-char fields scaled 0.1,
  record size = 5*xsize+9+2, Float32.
- frmts/hf2/hf2dataset.cpp — HF2/HFZ: "HF2\\0" magic + LE header
  (width@6, height@10, tile size@14, vert precision@16, horiz
  scale@20, extended header len@24), 'bin' extended blocks incl.
  georef-extents, bottom-up tiles of per-line [scale f32][offset
  f32] then rows of [word size u8][first i32][deltas i8/i16/i32];
  value = running_sum * scale + offset. Writer mirrors the Int16 and
  Float32 CreateCopy paths (hf2dataset.cpp:964). .hf2.gz handled
  via gzip (the /vsigzip/ automagic).
"""

from __future__ import annotations

import gzip
import math
import struct
from typing import List, Optional, Tuple

import numpy as np

# ------------------------------------------------------------------ ZMap


def identify_zmap(buf: bytes) -> bool:
    head = buf[:1024].lstrip()
    for line in head.splitlines():
        s = line.strip()
        if not s or s.startswith(b"!"):
            continue
        return s.startswith(b"@") and b"GRID" in s.upper()
    return False


def decode_zmap(buf: bytes) -> Tuple[np.ndarray, dict]:
    text = buf.decode("latin-1")
    lines = [ln for ln in text.splitlines()]
    it = iter(lines)
    hdr: List[str] = []
    data_lines: List[str] = []
    in_data = False
    for ln in it:
        s = ln.strip()
        if not in_data:
            if not s or s.startswith("!"):
                continue
            if s == "@":
                in_data = True
                continue
            hdr.append(s)
        else:
            if s.startswith("+"):  # vertical grid separator lines
                continue
            data_lines.append(ln)
    if not hdr or not hdr[0].startswith("@"):
        raise ValueError("not a ZMap grid")
    values_per_line = int(hdr[0].split(",")[2])  # noqa: F841 (doc)
    l2 = hdr[1].split(",")
    nodata = float(l2[1]) if l2[1].strip() else 1e30
    l3 = hdr[2].split(",")
    ny, nx = int(l3[0]), int(l3[1])
    xmin, xmax, ymin, ymax = (float(v) for v in l3[2:6])
    vals = np.fromstring(" ".join(data_lines), sep=" ") \
        if False else np.array(" ".join(data_lines).split(), np.float64)
    if len(vals) < nx * ny:
        raise ValueError("ZMap: not enough data values")
    arr = vals[:nx * ny].reshape(nx, ny).T  # column-major storage
    gt = (xmin, (xmax - xmin) / nx, 0.0, ymax, 0.0, -(ymax - ymin) / ny)
    return arr, {"transform": gt, "nodata": nodata}


def encode_zmap(arr: np.ndarray, transform=None, nodata=1e30) -> bytes:
    h, w = arr.shape
    gt = transform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    out = ["!", "! Created by GDAL.", "!", "@GRID FILE, GRID, 4"]

    def rj(v, width, dec=None):
        s = f"{v:.{dec}f}" if dec is not None else str(v)
        return s.rjust(width) if len(s) <= width else s

    out.append(",".join([rj(20, 10), rj(nodata, 20, 7), rj("", 10),
                         rj(7, 10), rj(1, 10)]))
    out.append(",".join([rj(h, 10), rj(w, 10),
                         rj(gt[0], 14, 7), rj(gt[0] + gt[1] * w, 14, 7),
                         rj(gt[3] + gt[5] * h, 14, 7), rj(gt[3], 14, 7)]))
    out.append("0.0, 0.0, 0.0")
    out.append("@")
    body: List[str] = []
    vals = np.asarray(arr, np.float64)
    for i in range(w):
        col = vals[:, i]
        line: List[str] = []
        for j in range(h):
            line.append(rj(col[j], 20, 7))
            if len(line) == 4:
                body.append("".join(line))
                line = []
        if line:
            body.append("".join(line))
    return ("\n".join(out + body) + "\n").encode("latin-1")


# ------------------------------------------------------------------ JDEM


def _jdem_field(buf: bytes, off: int, width: int) -> int:
    return int(buf[off:off + width].decode("latin-1", "replace")
               .replace("\x00", " ").strip() or 0)


def _jdem_angle(buf: bytes, off: int) -> float:
    n = _jdem_field(buf, off, 7)
    deg, mn, sec = n // 10000, (n // 100) % 100, n % 100
    return deg + mn / 60.0 + sec / 3600.0


def identify_jdem(buf: bytes) -> bool:
    if len(buf) < 1011:
        return False
    # the reference checks dates in the 12-16 and 17-21 ranges
    try:
        for off in (11, 16):
            for b in buf[off:off + 5]:
                if not (0x30 <= b <= 0x39 or b == 0x20):
                    return False
    except IndexError:
        return False
    return _jdem_field(buf, 23, 3) > 0 and _jdem_field(buf, 26, 3) > 0


def decode_jdem(buf: bytes) -> Tuple[np.ndarray, dict]:
    nx = _jdem_field(buf, 23, 3)
    ny = _jdem_field(buf, 26, 3)
    lllat = _jdem_angle(buf, 29)
    lllon = _jdem_angle(buf, 36)
    urlat = _jdem_angle(buf, 43)
    urlon = _jdem_angle(buf, 50)
    rec = nx * 5 + 9 + 2
    arr = np.zeros((ny, nx), np.float32)
    for y in range(ny):
        row = buf[1011 + rec * y:1011 + rec * y + rec]
        txt = row[9:9 + 5 * nx].decode("latin-1", "replace")
        vals = [int(txt[5 * i:5 * i + 5].strip() or 0) for i in range(nx)]
        arr[y] = np.array(vals, np.float32) * np.float32(0.1)
    gt = (lllon, (urlon - lllon) / nx, 0.0,
          urlat, 0.0, -(urlat - lllat) / ny)
    return arr, {"transform": gt}


# ------------------------------------------------------------------ HF2

HF2_MAGIC = b"HF2\x00\x00\x00"


def identify_hf2(buf: bytes) -> bool:
    return buf[:6] == HF2_MAGIC or (
        buf[:2] == b"\x1f\x8b")  # gz candidate, caller re-probes


def decode_hf2(buf: bytes) -> Tuple[np.ndarray, dict]:
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    if buf[:6] != HF2_MAGIC:
        raise ValueError("not an HF2 file")
    w, h = struct.unpack_from("<ii", buf, 6)
    tile, = struct.unpack_from("<H", buf, 14)
    vert_pres, horiz_scale = struct.unpack_from("<ff", buf, 16)
    ext_len, = struct.unpack_from("<I", buf, 24)
    pos = 28
    gt = None
    ext_off = 0
    while ext_off < ext_len:
        name = buf[pos + 4:pos + 20].split(b"\x00")[0].decode("latin-1")
        bsize, = struct.unpack_from("<I", buf, pos + 20)
        body = buf[pos + 24:pos + 24 + bsize]
        if name == "georef-extents" and bsize == 34:
            xmin, xmax, ymin, ymax = struct.unpack_from("<dddd", body, 2)
            gt = (xmin, (xmax - xmin) / w, 0.0, ymax, 0.0,
                  -(ymax - ymin) / h)
        pos += 24 + bsize
        ext_off += 24 + bsize
    nxb = (w + tile - 1) // tile
    nyb = (h + tile - 1) // tile
    out = np.zeros((h, w), np.float32)
    for jb in range(nyb):
        rows = min(tile, h - jb * tile)
        for ib in range(nxb):
            cols = min(tile, w - ib * tile)
            scale, off = struct.unpack_from("<ff", buf, pos)
            pos += 8
            for k in range(rows):
                ws = buf[pos]
                first, = struct.unpack_from("<i", buf, pos + 1)
                pos += 5
                n = cols - 1
                if ws == 1:
                    diffs = np.frombuffer(buf, np.int8, n, pos)
                elif ws == 2:
                    diffs = np.frombuffer(buf, "<i2", n, pos)
                elif ws == 4:
                    diffs = np.frombuffer(buf, "<i4", n, pos)
                else:
                    raise ValueError(f"HF2: bad word size {ws}")
                pos += ws * n
                vals = np.empty(cols, np.int64)
                vals[0] = first
                if n:
                    vals[1:] = first + np.cumsum(diffs.astype(np.int64))
                # bottom-up: tile row k is raster line (from bottom)
                y = h - 1 - (jb * tile + k)
                out[y, ib * tile:ib * tile + cols] = \
                    vals.astype(np.float64) * scale + off
    meta = {"tile": tile, "vert_pres": vert_pres,
            "horiz_scale": horiz_scale}
    if gt:
        meta["transform"] = gt
    return out, meta


def encode_hf2(arr: np.ndarray, transform=None, tile: int = 256,
               vert_pres: float = 0.01, compress: bool = False) -> bytes:
    """Mirror of HF2Dataset::CreateCopy int16/float32 paths."""
    h, w = arr.shape
    gt = transform
    is_int = np.issubdtype(arr.dtype, np.integer)
    ext = bytearray()
    if gt is not None:
        ext += b"bin\x00" + b"georef-extents".ljust(16, b"\x00")
        ext += struct.pack("<Ih", 34, 1)
        ext += struct.pack("<dddd", gt[0], gt[0] + w * gt[1],
                           gt[3] + h * gt[5], gt[3])
    out = bytearray(HF2_MAGIC[:4])
    out += struct.pack("<H", 0)
    out += struct.pack("<ii", w, h)
    out += struct.pack("<H", tile)
    hs = (abs(gt[1]) + abs(gt[5])) / 2 if gt else 1.0
    out += struct.pack("<ff", 1.0 if is_int else vert_pres, hs)
    out += struct.pack("<I", len(ext))
    out += ext
    nxb = (w + tile - 1) // tile
    nyb = (h + tile - 1) // tile
    data = np.asarray(arr, np.int64 if is_int else np.float32)
    for jb in range(nyb):
        rows = min(tile, h - jb * tile)
        for ib in range(nxb):
            cols = min(tile, w - ib * tile)
            # source window, flipped to bottom-up line order
            blk = data[max(0, h - (jb + 1) * tile):h - jb * tile,
                       ib * tile:ib * tile + cols]
            if is_int:
                scale, offset = 1.0, 0.0
                q = blk[::-1].astype(np.int64)  # bottom-up rows
            else:
                fmin = float(blk.min())
                fmax = float(blk.max())
                int_range = (fmax - fmin) / vert_pres
                scale = 1.0 if fmin == fmax else (fmax - fmin) / int_range
                offset = fmin
                q = np.floor((blk[::-1] - offset) / scale + 0.5).astype(
                    np.int64)
            out += struct.pack("<ff", np.float32(scale), np.float32(offset))
            for k in range(rows):
                line = q[k]
                diffs = np.diff(line)
                if len(diffs) and (diffs.max() > 32767
                                   or diffs.min() < -32768):
                    ws, dt = 4, "<i4"
                elif len(diffs) and (diffs.max() > 127 or diffs.min() < -128):
                    ws, dt = 2, "<i2"
                else:
                    ws, dt = 1, "i1"
                out.append(ws)
                out += struct.pack("<i", int(line[0]))
                out += diffs.astype(dt).tobytes()
    raw = bytes(out)
    return gzip.compress(raw) if compress else raw
