"""TGA (Truevision TARGA) reader.

Parity target: frmts/tga/tgadataset.cpp — 18-byte header, color-map
types expand to a palette-index band (GDAL keeps the indices and a
color table; 15/16-bit map entries expand (v>>shift & 31)<<3), 16-bit
truecolor expands to RGB via ((v >> 5*(3-band)) & 31) << 3
(tgadataset.cpp:375), 24/32-bit pixels are stored BGR(A), RLE packets
may cross scanlines, rows are bottom-up unless the descriptor's
bit 5 is set, and the v2 footer's extension area carries
AUTHOR_NAME (offset 2)/COMMENTS (43, four 81-byte lines).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np


def identify_tga(buf: bytes, path: str = "") -> bool:
    if len(buf) < 18:
        return False
    if buf[-18:] == b"TRUEVISION-XFILE." + b"\x00":
        return True
    if not path.lower().endswith(".tga"):
        return False
    cmap_type, img_type = buf[1], buf[2]
    return cmap_type in (0, 1) and img_type in (1, 2, 3, 9, 10, 11)


def decode_tga(buf: bytes) -> Tuple[np.ndarray, dict]:
    (idlen, cmap_type, img_type, cmap_first, cmap_len, cmap_bits,
     _xo, _yo, w, h, depth, desc) = struct.unpack_from("<BBBHHBHHHHBB",
                                                       buf, 0)
    pos = 18
    image_id = buf[pos:pos + idlen].decode("latin-1", "replace")
    pos += idlen
    palette = None
    transparent = None
    if cmap_type == 1:
        nbytes = cmap_len * ((cmap_bits + 7) // 8)
        raw = np.frombuffer(buf, np.uint8, nbytes, pos)
        pos += nbytes
        pal = np.zeros((cmap_first + cmap_len, 4), np.uint8)
        pal[:, 3] = 255
        if cmap_bits in (15, 16):
            v = raw.reshape(-1, 2).astype(np.uint16)
            val = v[:, 0] | (v[:, 1] << 8)
            pal[cmap_first:, 0] = ((val >> 10) & 31) << 3
            pal[cmap_first:, 1] = ((val >> 5) & 31) << 3
            pal[cmap_first:, 2] = (val & 31) << 3
        elif cmap_bits == 24:
            bgr = raw.reshape(-1, 3)
            pal[cmap_first:, 0] = bgr[:, 2]
            pal[cmap_first:, 1] = bgr[:, 1]
            pal[cmap_first:, 2] = bgr[:, 0]
        elif cmap_bits == 32:
            bgra = raw.reshape(-1, 4)
            pal[cmap_first:, 0] = bgra[:, 2]
            pal[cmap_first:, 1] = bgra[:, 1]
            pal[cmap_first:, 2] = bgra[:, 0]
            pal[cmap_first:, 3] = bgra[:, 3]
            # single alpha-0 entry -> nodata (tgadataset.cpp:246)
            zeros = np.nonzero(bgra[:, 3] == 0)[0]
            if len(zeros) == 1:
                transparent = cmap_first + int(zeros[0])
        palette = pal
    bpp = (depth + 7) // 8
    npix = w * h
    if img_type >= 9:  # RLE
        raw = np.empty(npix * bpp, np.uint8)
        got = 0
        while got < npix * bpp:
            pkt = buf[pos]
            pos += 1
            count = (pkt & 0x7F) + 1
            if pkt & 0x80:  # run
                px = buf[pos:pos + bpp]
                pos += bpp
                chunk = np.tile(np.frombuffer(px, np.uint8), count)
            else:
                n = count * bpp
                chunk = np.frombuffer(buf, np.uint8, n, pos)
                pos += n
            raw[got:got + len(chunk)] = chunk[:npix * bpp - got]
            got += len(chunk)
    else:
        raw = np.frombuffer(buf, np.uint8, npix * bpp, pos)
    if bpp == 1:
        img = raw.reshape(h, w)
    elif bpp == 2 and img_type in (2, 10):  # 15/16-bit truecolor
        v = raw.reshape(h, w, 2).astype(np.uint16)
        val = v[:, :, 0] | (v[:, :, 1] << 8)
        img = np.stack([(((val >> (5 * (3 - b))) & 31) << 3).astype(np.uint8)
                        for b in (1, 2, 3)], axis=2)
    elif bpp == 2:  # 16-bit grayscale
        img = raw.reshape(h, w, 2)[:, :, 0]
    elif bpp == 3:  # BGR -> RGB
        img = raw.reshape(h, w, 3)[:, :, ::-1]
    else:  # BGRA -> RGBA
        bgra = raw.reshape(h, w, 4)
        img = np.stack([bgra[:, :, 2], bgra[:, :, 1],
                        bgra[:, :, 0], bgra[:, :, 3]], axis=2)
    if not (desc & 0x20):  # bottom-up storage
        img = img[::-1]
    meta: dict = {"image_id": image_id, "palette": palette,
                  "transparent": transparent}
    if buf[-18:] == b"TRUEVISION-XFILE." + b"\x00":
        ext_off, = struct.unpack_from("<I", buf, len(buf) - 26)
        if ext_off and ext_off + 495 <= len(buf):
            ext = buf[ext_off:ext_off + 495]
            author = ext[2:43].split(b"\x00")[0].decode("latin-1").rstrip()
            lines = [ext[43 + 81 * i:43 + 81 * (i + 1)].split(b"\x00")[0]
                     .decode("latin-1").rstrip() for i in range(4)]
            comments = "\n".join(ln for ln in lines if ln)
            if author:
                meta["AUTHOR_NAME"] = author
            if comments:
                meta["COMMENTS"] = comments
            if image_id:
                meta["IMAGE_ID"] = image_id
    return np.ascontiguousarray(img), meta
