"""Maptech/NOAA BSB nautical chart reader (.kap).

Reference frmts/bsb/bsb_read.c: CRLF text header (BSB/RA=w,h size,
RGB/i,r,g,b palette entries) terminated by 0x1A 0x00 + a depth byte
(nColorSize, ASCII-shifted in some files); then per-scanline data —
a 0x80-continued varint line marker, runs of
[value:(nColorSize bits) | count:(7-nColorSize bits)] with
0x80-continued count extension bytes, each emitting count+1 pixels,
a 0x00 terminator per scanline, and the one-pixel-short padding and
continue-until-filled quirks (bsb_read.c:760-900)."""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def identify_bsb(buf: bytes) -> bool:
    head = buf[:1024]
    return (b"BSB/" in head or b"NOS/" in head) and b"RA=" in head


def decode_bsb(buf: bytes) -> Tuple[np.ndarray, Dict]:
    end = buf.index(b"\x1a")
    header = buf[:end].decode("latin-1", "replace")
    # header lines continue with leading whitespace; normalize
    m = re.search(r"(?:BSB|NOS)/.*?RA=(\d+)\s*,\s*(\d+)", header, re.S)
    if not m:
        raise ValueError("BSB: no RA= size")
    w, h = int(m.group(1)), int(m.group(2))
    pal = np.zeros((256, 3), np.uint8)
    max_idx = 0
    for pm in re.finditer(r"RGB/(\d+),(\d+),(\d+),(\d+)", header):
        i = int(pm.group(1))
        if i < 256:
            pal[i] = [int(pm.group(2)), int(pm.group(3)),
                      int(pm.group(4))]
            max_idx = max(max_idx, i)

    pos = end + 1
    if pos < len(buf) and buf[pos] == 0x00:
        pos += 1
    color_size = buf[pos]
    pos += 1
    if 0x31 <= color_size <= 0x38:
        color_size -= 0x30
    if not 0 < color_size <= 7:
        raise ValueError(f"BSB: bad depth byte {color_size}")

    shift = 7 - color_size
    value_mask = ((1 << color_size) - 1) << shift
    count_mask = (1 << (7 - color_size)) - 1

    # optional index table (#2782): last 4 BE bytes point at a table
    # of per-line absolute offsets (bsb_read.c:470-560)
    line_offsets = None
    import struct as _st

    file_len = len(buf)
    (idx_off,) = _st.unpack_from(">i", buf, file_len - 4)
    if idx_off > pos and idx_off + 4 * h <= file_len - 4 + 4 * h:
        if idx_off + 4 * h == file_len - 4 or \
                idx_off + 4 * (h - 1) == file_len - 4:
            rows = (file_len - 4 - idx_off) // 4
            offs = [_st.unpack_from(">i", buf, idx_off + 4 * i)[0]
                    for i in range(min(rows, h))]
            if all(pos <= o < idx_off for o in offs) and \
                    all(a <= b for a, b in zip(offs, offs[1:])):
                line_offsets = offs

    data = np.frombuffer(buf, np.uint8, offset=pos)
    out = np.zeros((h, w), np.uint8)
    di = 0
    n = len(data)
    for y in range(h):
        if line_offsets is not None:
            if y >= len(line_offsets):
                break
            di = line_offsets[y] - pos
        # line marker varint (skip stray zero bytes, bsb_read hack)
        marker = 0
        while di < n:
            b = int(data[di])
            di += 1
            if y != 0 and marker == 0 and b == 0:
                continue
            marker = marker * 128 + (b & 0x7F)
            if not b & 0x80:
                break
        x = 0
        while x < w and di < n:
            b = int(data[di])
            di += 1
            if b == 0:
                if x >= w - 1:
                    break
                # line not filled: keep consuming runs (quirk path)
                continue
            val = (b & value_mask) >> shift
            count = b & count_mask
            while b & 0x80 and di < n:
                b = int(data[di])
                di += 1
                count = count * 128 + (b & 0x7F)
            count = min(count, w - x - 1)
            out[y, x:x + count + 1] = val
            x += count + 1
        # consume the scanline terminator if still pending
        while di < n and data[di] != 0 and x >= w:
            # over-long line: skip to terminator
            b = int(data[di])
            di += 1
            while b & 0x80 and di < n:
                b = int(data[di])
                di += 1
        if di < n and data[di] == 0:
            di += 1

    # the reference shifts the 1-based palette indices down by one
    # (bsbdataset.cpp:135-136) and drops palette entry 0
    out = np.where(out > 0, out - 1, out).astype(np.uint8)
    return out, {"palette": pal[1:max_idx + 1]}
