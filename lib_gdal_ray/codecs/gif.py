"""GIF87a/89a codec in pure numpy+python.

Parity target: frmts/gif (GDAL wraps giflib; this is a re-derivation
from the public GIF89a specification). The raster band is the palette
index plane, like GDAL's GIF driver; the color table and the GIF89a
graphic-control transparency index ride in meta. XMP data packets
(the "XMP DataXMP" application extension, including its magic 258-byte
terminator trailer) surface as meta["xmp"] — gdal exposes the same
bytes as the xml:XMP metadata domain.

Interlaced images follow the 8/8/4/2 four-pass row order on both
decode and encode (INTERLACING=YES creation option analog).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def identify_gif(buf: bytes) -> bool:
    return buf[:6] in GIF_MAGICS


def _interlace_rows(h: int) -> np.ndarray:
    """GIF 4-pass interlace row order."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """GIF-variant LZW -> uint8 index stream of exactly npix values."""
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader over the whole sub-block-joined stream, LSB first
    bits = np.unpackbits(np.frombuffer(data, np.uint8),
                         bitorder="little")
    out = np.empty(npix + 4096, np.uint8)
    nout = 0
    pos = 0
    nbits = len(bits)

    def reset_table():
        table: List[bytes] = [bytes([i]) for i in range(clear)]
        table += [b"", b""]
        return table

    table = reset_table()
    code_size = min_code_size + 1
    prev: Optional[bytes] = None
    while pos + code_size <= nbits and nout < npix:
        code = int(np.packbits(bits[pos:pos + code_size],
                               bitorder="little").view(np.uint16)[0]
                   if code_size > 8 else
                   np.packbits(bits[pos:pos + code_size],
                               bitorder="little")[0])
        pos += code_size
        if code == clear:
            table = reset_table()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        n = len(entry)
        out[nout:nout + n] = np.frombuffer(entry, np.uint8)
        nout += n
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out[:npix]


def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW encode of a uint8 index stream."""
    clear = 1 << min_code_size
    end = clear + 1
    codes: List[Tuple[int, int]] = [(clear, min_code_size + 1)]
    table: Dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    data = idx.tobytes()
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        codes.append((table[w], code_size))
        table[wc] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            codes.append((clear, code_size))
            table = {bytes([j]): j for j in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = c
    if w:
        codes.append((table[w], code_size))
    codes.append((end, code_size))
    # bit pack LSB-first
    total_bits = sum(cs for _, cs in codes)
    bits = np.zeros(total_bits, np.uint8)
    pos = 0
    for code, cs in codes:
        for b in range(cs):
            bits[pos + b] = (code >> b) & 1
        pos += cs
    return np.packbits(bits, bitorder="little").tobytes()


def decode_gif(buf: bytes) -> Tuple[np.ndarray, dict]:
    """First image of a GIF -> ((H, W) uint8 palette indices, meta)."""
    if not identify_gif(buf):
        raise ValueError("not a GIF file")
    W, H = struct.unpack_from("<HH", buf, 6)
    flags = buf[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    meta: dict = {"background": buf[11]}
    transparent = None
    xmp = None
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = buf[pos + 1]
            pos += 2
            blocks = []
            start = pos
            while pos < len(buf) and buf[pos] != 0:
                size = buf[pos]
                blocks.append(buf[pos + 1:pos + 1 + size])
                pos += 1 + size
            pos += 1
            payload = b"".join(blocks)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                if payload[0] & 1:
                    transparent = payload[3]
            elif label == 0xFF and payload[:11] == b"XMP DataXMP":
                # raw packet: bytes between the app id and the
                # 258-byte magic trailer, stored unchunked
                raw = buf[start + 12:pos - 1]
                t = raw.find(b"\x01\xff\xfe")
                xmp = raw[:t if t >= 0 else None]
            continue
        if b0 == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack_from("<HHHH", buf, pos + 1)
            iflags = buf[pos + 9]
            pos += 10
            lct = None
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                lct = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            min_code = buf[pos]
            pos += 1
            blocks = []
            while pos < len(buf) and buf[pos] != 0:
                size = buf[pos]
                blocks.append(buf[pos + 1:pos + 1 + size])
                pos += 1 + size
            pos += 1
            idx = _lzw_decode(b"".join(blocks), min_code, iw * ih)
            img = idx.reshape(ih, iw)
            if iflags & 0x40:  # interlaced
                out = np.empty_like(img)
                out[_interlace_rows(ih)] = img
                img = out
            pal = lct if lct is not None else gct
            meta.update({"palette": pal, "transparent": transparent,
                         "xmp": xmp, "origin": (ix, iy),
                         "screen": (W, H)})
            return img, meta
        raise ValueError(f"GIF: unknown block 0x{b0:02x} at {pos}")
    raise ValueError("GIF: no image data")


def encode_gif(arr: np.ndarray, palette: Optional[np.ndarray] = None,
               interlace: bool = False,
               transparent: Optional[int] = None) -> bytes:
    """(H, W) uint8 palette indices -> GIF89a bytes. Default palette
    is identity grayscale (matching the BMP/PNG writers here)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w = arr.shape
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    n = len(palette)
    depth = max(1, int(np.ceil(np.log2(max(2, n)))))
    full = 1 << depth
    pal = np.zeros((full, 3), np.uint8)
    pal[:n] = palette[:, :3]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7) << 4
                       | (depth - 1), 0, 0)
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = 0x40 if interlace else 0
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, iflags)
    rows = arr[_interlace_rows(h)] if interlace else arr
    min_code = max(2, depth)
    out.append(min_code)
    stream = _lzw_encode(rows.reshape(-1), min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
