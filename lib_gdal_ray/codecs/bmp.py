"""BMP codec (BITMAPINFOHEADER, BI_RGB uncompressed) in pure numpy.

Real subset: 24-bit BGR and 8-bit grayscale-palette bitmaps, bottom-up
row order, 4-byte row padding — the same windows-bitmap contract GDAL's
BMP driver exposes (reference `frmts/bmp/bmpdataset.cpp`). Fully
vectorized both directions (one reshape + flip; no per-pixel Python).
"""

from __future__ import annotations

import struct

import numpy as np

_FILEHDR = "<2sIHHI"     # magic, file size, res1, res2, pixel offset
_INFOHDR = "<IiiHHIIiiII"  # size,w,h,planes,bpp,compr,imgsize,xppm,yppm,used,important


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W) uint8 -> 8-bit palette BMP; (H, W, 3) uint8 RGB -> 24-bit."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        rowbytes, palette_n = w, 256
        rows = arr
    else:
        if arr.shape[2] != 3:
            raise ValueError("BMP supports (H,W) gray or (H,W,3) RGB")
        rowbytes, palette_n = w * 3, 0
        rows = arr[:, :, ::-1].reshape(h, rowbytes)  # RGB -> BGR
    pad = (-rowbytes) % 4
    padded = np.zeros((h, rowbytes + pad), dtype=np.uint8)
    padded[:, :rowbytes] = rows.reshape(h, rowbytes)
    pixels = padded[::-1].tobytes()  # bottom-up

    palette = b""
    if gray:
        pal = np.zeros((256, 4), dtype=np.uint8)
        pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
        palette = pal.tobytes()
    offset = 14 + 40 + len(palette)
    info = struct.pack(_INFOHDR, 40, w, h, 1, 8 if gray else 24, 0,
                       len(pixels), 2835, 2835, palette_n, 0)
    filehdr = struct.pack(_FILEHDR, b"BM", offset + len(pixels), 0, 0, offset)
    return filehdr + info + palette + pixels


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes -> (H, W) uint8 (8-bit) or (H, W, 3) uint8 RGB (24-bit)."""
    magic, _fsize, _r1, _r2, offset = struct.unpack_from(_FILEHDR, buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP")
    (hsize, w, h, _planes, bpp, compr, *_rest) = struct.unpack_from(_INFOHDR, buf, 14)
    if hsize < 40 or compr != 0:
        raise ValueError(f"unsupported BMP (header {hsize}, compression {compr})")
    topdown = h < 0
    h = abs(h)
    if bpp == 24:
        rowbytes = w * 3
    elif bpp == 8:
        rowbytes = w
    else:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    stride = rowbytes + ((-rowbytes) % 4)
    data = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=offset)
    rows = data.reshape(h, stride)[:, :rowbytes]
    if not topdown:
        rows = rows[::-1]
    if bpp == 8:
        pal_off = 14 + hsize
        n_used = struct.unpack_from("<I", buf, 14 + 32)[0] or 256
        pal = np.frombuffer(buf, dtype=np.uint8, count=n_used * 4,
                            offset=pal_off).reshape(n_used, 4)
        idx = np.ascontiguousarray(rows)
        if np.all(pal[:, 0] == pal[:, 1]) and np.all(pal[:, 1] == pal[:, 2]) \
                and np.array_equal(pal[:len(pal), 0], np.arange(len(pal), dtype=np.uint8)[:len(pal)]):
            return idx.copy()  # identity grayscale palette
        return pal[idx.astype(np.int64), :3][:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(rows.reshape(h, w, 3)[:, :, ::-1])
