"""DDS (DirectDraw Surface) reader — uncompressed RGB(A) masks plus
DXT1/DXT3/DXT5 block compression.

Layout: "DDS " magic + 124-byte header (u32 height/width/pitch,
DDSPixelFormat: fourCC or RGB bit masks).  Uncompressed rows are
mask-extracted to RGBA; DXT tiles are 4×4 blocks (DXT1: two RGB565
endpoints + 2-bit selectors; DXT5 adds two alpha endpoints + 3-bit
selectors; DXT3 explicit 4-bit alpha), decoded vectorized per block
column.

Reference: frmts/dds/ddsdataset.cpp (+ the public DDS/S3TC specs);
autotest dds.py pins the uncompressed RGBA fixture against
stefan_full_rgba.png. Re-derived; no code copied.
"""

from __future__ import annotations

import struct

import numpy as np


def identify_dds(buf: bytes) -> bool:
    return buf[:4] == b"DDS "


def _expand_mask(vals: np.ndarray, mask: int) -> np.ndarray:
    if mask == 0:
        return np.zeros(len(vals), np.uint8)
    shift = (mask & -mask).bit_length() - 1
    width = bin(mask >> shift).count("1")
    v = (vals & mask) >> shift
    if width >= 8:
        return (v >> (width - 8)).astype(np.uint8)
    return ((v * 255) // ((1 << width) - 1)).astype(np.uint8)


def _rgb565(c: np.ndarray) -> np.ndarray:
    r = ((c >> 11) & 0x1F).astype(np.uint16)
    g = ((c >> 5) & 0x3F).astype(np.uint16)
    b = (c & 0x1F).astype(np.uint16)
    return np.stack([(r * 255) // 31, (g * 255) // 63,
                     (b * 255) // 31], axis=-1).astype(np.uint8)


def _decode_dxt_color(blocks: np.ndarray, dxt1: bool):
    """(N, 8) uint8 color blocks -> (N, 4, 4, 4) RGBA."""
    n = len(blocks)
    c0 = blocks[:, 0].astype(np.uint16) | \
        (blocks[:, 1].astype(np.uint16) << 8)
    c1 = blocks[:, 2].astype(np.uint16) | \
        (blocks[:, 3].astype(np.uint16) << 8)
    p0 = _rgb565(c0).astype(np.int32)
    p1 = _rgb565(c1).astype(np.int32)
    pal = np.zeros((n, 4, 4), np.int32)
    pal[:, 0, :3] = p0
    pal[:, 1, :3] = p1
    pal[:, :, 3] = 255
    opaque = c0 > c1
    # 4-color mode
    pal[:, 2, :3] = np.where(opaque[:, None],
                             (2 * p0 + p1) // 3, (p0 + p1) // 2)
    pal[:, 3, :3] = np.where(opaque[:, None], (p0 + 2 * p1) // 3, 0)
    if dxt1:
        pal[:, 3, 3] = np.where(opaque, 255, 0)
    sel = np.frombuffer(blocks[:, 4:8].tobytes(), np.uint32)
    idx = np.stack([(sel >> (2 * i)) & 3 for i in range(16)],
                   axis=1)  # (N, 16)
    out = pal[np.arange(n)[:, None], idx]  # (N, 16, 4)
    return out.reshape(n, 4, 4, 4).astype(np.uint8)


def _decode_dxt5_alpha(blocks: np.ndarray) -> np.ndarray:
    """(N, 8) alpha blocks -> (N, 4, 4) alpha."""
    n = len(blocks)
    a0 = blocks[:, 0].astype(np.int32)
    a1 = blocks[:, 1].astype(np.int32)
    pal = np.zeros((n, 8), np.int32)
    pal[:, 0] = a0
    pal[:, 1] = a1
    big = a0 > a1
    # 8-alpha mode: 6 interpolants; 6-alpha mode: 4 interpolants + 0/255
    for i in range(1, 7):
        pal[:, 1 + i] = np.where(big, ((7 - i) * a0 + i * a1) // 7, 0)
    for i in range(1, 5):
        pal[:, 1 + i] = np.where(big, pal[:, 1 + i],
                                 ((5 - i) * a0 + i * a1) // 5)
    pal[:, 6] = np.where(big, pal[:, 6], 0)
    pal[:, 7] = np.where(big, pal[:, 7], 255)
    bits = np.zeros(n, np.uint64)
    for b in range(6):
        bits |= blocks[:, 2 + b].astype(np.uint64) << np.uint64(8 * b)
    idx = np.stack([(bits >> np.uint64(3 * i)).astype(np.int64) & 7
                    for i in range(16)], axis=1)
    return pal[np.arange(n)[:, None], idx].reshape(
        n, 4, 4).astype(np.uint8)


def decode_dds(buf: bytes):
    """DDS bytes -> ((H, W, 4) RGBA uint8, meta)."""
    if not identify_dds(buf):
        raise ValueError("not a DDS file")
    (h, w) = struct.unpack_from("<II", buf, 12)
    (pf_flags, fourcc) = struct.unpack_from("<I4s", buf, 80)
    rgb_bits, rmask, gmask, bmask, amask = struct.unpack_from(
        "<IIIII", buf, 88)
    data = buf[128:]
    if fourcc in (b"DXT1", b"DXT3", b"DXT5"):
        bw = (w + 3) // 4
        bh = (h + 3) // 4
        bsz = 8 if fourcc == b"DXT1" else 16
        blocks = np.frombuffer(data, np.uint8,
                               bw * bh * bsz).reshape(bw * bh, bsz)
        if fourcc == b"DXT1":
            rgba = _decode_dxt_color(blocks, dxt1=True)
        elif fourcc == b"DXT5":
            rgba = _decode_dxt_color(blocks[:, 8:], dxt1=False)
            rgba[:, :, :, 3] = _decode_dxt5_alpha(blocks[:, :8])
        else:  # DXT3: explicit 4-bit alpha
            rgba = _decode_dxt_color(blocks[:, 8:], dxt1=False)
            abits = np.zeros(len(blocks), np.uint64)
            for b in range(8):
                abits |= blocks[:, b].astype(np.uint64) << \
                    np.uint64(8 * b)
            a4 = np.stack(
                [((abits >> np.uint64(4 * i)).astype(np.int64) & 0xF)
                 * 17 for i in range(16)], axis=1)
            rgba[:, :, :, 3] = a4.reshape(-1, 4, 4).astype(np.uint8)
        out = np.zeros((bh * 4, bw * 4, 4), np.uint8)
        out.reshape(bh, 4, bw, 4, 4)[:] = \
            rgba.reshape(bh, bw, 4, 4, 4).transpose(0, 2, 1, 3, 4)
        out = out[:h, :w]
        comp = fourcc.decode()
    else:
        bpp = rgb_bits // 8
        dt = {1: np.uint8, 2: "<u2", 3: None, 4: "<u4"}[bpp]
        if bpp == 3:
            rows = np.frombuffer(data, np.uint8,
                                 h * w * 3).reshape(h, w, 3)
            vals = (rows[:, :, 0].astype(np.uint32)
                    | (rows[:, :, 1].astype(np.uint32) << 8)
                    | (rows[:, :, 2].astype(np.uint32) << 16))
        else:
            vals = np.frombuffer(data, dt, h * w).reshape(
                h, w).astype(np.uint32)
        flat = vals.ravel()
        out = np.stack([
            _expand_mask(flat, rmask), _expand_mask(flat, gmask),
            _expand_mask(flat, bmask),
            _expand_mask(flat, amask) if amask else
            np.full(h * w, 255, np.uint8)], axis=-1).reshape(h, w, 4)
        comp = "NONE"
    meta = {"width": w, "height": h, "bands": 4, "transform": None,
            "epsg": None, "nodata": None, "compression": comp}
    return np.ascontiguousarray(out), meta
