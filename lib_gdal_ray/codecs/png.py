"""PNG codec in pure numpy + stdlib zlib (W3C PNG spec / RFC 2083).

Real, spec-conformant subset: 8-bit samples, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA); paletted color type 3 (PLTE +
optional tRNS) and sub-8-bit depths 1/2/4 for types 0 and 3 (bit
unpack per scanline, as GDAL's PNG driver exposes them); all five
scanline filters on both encode and decode; CRC-32 verified per
chunk; progressive Adam7 interlace on both encode and decode (each
of the 7 passes is its own filtered sub-image in the shared zlib
stream, scattered back by stride slicing). This is the engine-facing
contract GDAL's PNG driver provides (reference
`frmts/png/pngdataset.cpp` — band decode + RasterIO + GetColorTable),
re-derived from the public spec with no libpng.  Paletted images
decode to explicit RGB(A) by default (the engine carries palettes as
explicit color, not indexed bands); `decode_png_indexed` returns the
raw index band + the color table for pct2rgb/attachpct-style tools.

Performance notes (100-TB framing): filters 0/2 unfilter fully
vectorized (row add), filter 1 (Sub) via per-lane `np.add.accumulate`
(wrapping uint8 prefix sum), filters 3/4 need the spec's sequential
left-neighbor recurrence — a per-pixel loop across the row, kept off
the hot path by encoding with filters 0-2 by default. The adaptive
encoder (minimum sum of absolute differences heuristic, as in libpng)
is available via filter_type='adaptive'.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> color type


def _chunk(tag: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(tag + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)


def _filter_rows(raw: np.ndarray, bpp: int, filter_type) -> bytes:
    """raw: (H, W*bpp) uint8. Returns filter-byte-prefixed scanlines.

    On encode the filter references ORIGINAL bytes of the current and
    prior scanline (identical to reconstructed bytes), so every filter
    vectorizes across the whole image.
    """
    h, stride = raw.shape
    prev = np.zeros((h, stride), dtype=np.uint8)
    prev[1:] = raw[:-1]
    left = np.zeros((h, stride), dtype=np.uint8)
    left[:, bpp:] = raw[:, :-bpp]
    upleft = np.zeros((h, stride), dtype=np.uint8)
    upleft[1:, bpp:] = raw[:-1, :-bpp]

    def paeth_pred():
        a = left.astype(np.int16)
        b = prev.astype(np.int16)
        c = upleft.astype(np.int16)
        p = a + b - c
        pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
        return pred.astype(np.uint8)

    candidates = {
        0: lambda: raw,
        1: lambda: raw - left,
        2: lambda: raw - prev,
        3: lambda: raw - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8),
        4: lambda: raw - paeth_pred(),
    }
    if filter_type == "adaptive":
        # libpng MSAD heuristic: per row, pick the filter minimizing the
        # sum of bytes interpreted as signed magnitudes
        filt_all = np.stack([candidates[f]() for f in range(5)])  # (5,H,stride)
        mag = filt_all.astype(np.int16)
        mag = np.where(mag > 127, 256 - mag, mag)
        scores = mag.sum(axis=2)            # (5, H)
        pick = np.argmin(scores, axis=0)    # (H,)
        filtered = filt_all[pick, np.arange(h)]
        fbytes = pick.astype(np.uint8)
    else:
        filtered = candidates[int(filter_type)]()
        fbytes = np.full(h, int(filter_type), dtype=np.uint8)
    out = np.empty((h, stride + 1), dtype=np.uint8)
    out[:, 0] = fbytes
    out[:, 1:] = filtered
    return out.tobytes()


# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def encode_png(arr: np.ndarray, filter_type=0, compress_level: int = 6,
               interlace: bool = False) -> bytes:
    """Encode (H, W) or (H, W, C∈{1,2,3,4}) uint8 -> PNG bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.append(_filter_rows(
                np.ascontiguousarray(sub).reshape(sub.shape[0], -1),
                c, filter_type))
        payload = b"".join(parts)
    else:
        payload = _filter_rows(arr.reshape(h, w * c), c, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0,
                       1 if interlace else 0)
    idat = zlib.compress(payload, compress_level)
    return b"".join([_SIG, _chunk(b"IHDR", ihdr), _chunk(b"IDAT", idat),
                     _chunk(b"IEND", b"")])


def _unfilter(scan: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """scan: (H, 1+stride) filter-byte-prefixed rows -> (H, stride) recon."""
    recon = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(scan[y, 0])
        row = scan[y, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: per-lane wrapping prefix sum
            lanes = row.reshape(-1, bpp)
            np.add.accumulate(lanes, axis=0, dtype=np.uint8, out=lanes)
        elif f == 2:  # Up
            row += prev
        elif f == 3:  # Average — sequential left dependence
            n = stride // bpp
            r = row.reshape(n, bpp).astype(np.int16)
            p = prev.reshape(n, bpp).astype(np.int16)
            acc = np.zeros(bpp, dtype=np.int16)
            for x in range(n):
                acc = (r[x] + ((acc + p[x]) >> 1)) & 0xFF
                r[x] = acc
            row = r.astype(np.uint8).reshape(stride)
        elif f == 4:  # Paeth — sequential left dependence
            n = stride // bpp
            r = row.reshape(n, bpp).astype(np.int16)
            p = prev.reshape(n, bpp).astype(np.int16)
            a = np.zeros(bpp, dtype=np.int16)   # left recon
            c = np.zeros(bpp, dtype=np.int16)   # upleft recon
            for x in range(n):
                b = p[x]
                pp = a + b - c
                pa_, pb, pc_ = np.abs(pp - a), np.abs(pp - b), np.abs(pp - c)
                pred = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                                np.where(pb <= pc_, b, c))
                a = (r[x] + pred) & 0xFF
                r[x] = a
                c = b
            row = r.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"bad PNG filter {f} on row {y}")
        recon[y] = row
        prev = recon[y]
    return recon


def _unpack_samples(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(H, stride_bytes) recon rows -> (H, w) raw sample values for
    bit depths 1/2/4/8 (left-to-right, MSB first per the spec)."""
    if depth == 8:
        return rows[:, :w]
    if depth == 4:
        out = np.empty((rows.shape[0], rows.shape[1] * 2), np.uint8)
        out[:, 0::2] = rows >> 4
        out[:, 1::2] = rows & 0x0F
        return out[:, :w]
    if depth == 2:
        out = np.empty((rows.shape[0], rows.shape[1] * 4), np.uint8)
        for i, sh in enumerate((6, 4, 2, 0)):
            out[:, i::4] = (rows >> sh) & 0x03
        return out[:, :w]
    if depth == 1:
        return np.unpackbits(rows, axis=1)[:, :w]
    raise ValueError(f"unsupported PNG bit depth {depth}")


def _decode_core(buf: bytes):
    """-> (samples (H, W, C) uint8, ctype, palette|None, trns|None)."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    channels = dict(_CHANNELS)
    channels[3] = 1
    if ctype not in channels:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if depth != 8 and (ctype not in (0, 3) or depth not in (1, 2, 4)):
        raise ValueError(f"unsupported PNG bit depth {depth} "
                         f"for color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace {interlace}")
    c = channels[ctype]
    bpp = max(1, depth * c // 8)
    raw = zlib.decompress(b"".join(idat))

    def row_bytes(width: int) -> int:
        return (width * depth * c + 7) // 8

    if interlace == 1:  # Adam7: 7 independently-filtered sub-images
        arr = np.zeros((h, w, c), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            ph = (h - y0 + dy - 1) // dy
            pw = (w - x0 + dx - 1) // dx
            if ph <= 0 or pw <= 0:
                continue
            stride = row_bytes(pw)
            nbytes = ph * (stride + 1)
            scan = np.frombuffer(raw, dtype=np.uint8, count=nbytes,
                                 offset=pos).reshape(ph, stride + 1)
            pos += nbytes
            recon = _unfilter(scan, ph, stride, bpp)
            if depth == 8:
                arr[y0::dy, x0::dx] = recon.reshape(ph, pw, c)
            else:
                arr[y0::dy, x0::dx] = _unpack_samples(
                    recon, pw, depth)[:, :, None]
        if pos != len(raw):
            raise ValueError("PNG Adam7 stream size mismatch")
        return arr, ctype, plte, trns
    stride = row_bytes(w)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    recon = _unfilter(scan, h, stride, bpp)
    if depth == 8:
        arr = recon.reshape(h, w, c)
    else:
        arr = _unpack_samples(recon, w, depth)[:, :, None]
    return arr, ctype, plte, trns


def decode_png(buf: bytes) -> np.ndarray:
    """Decode PNG bytes -> (H, W) or (H, W, C) uint8. CRC-checked.
    Paletted images expand to RGB (RGBA when tRNS is present)."""
    arr, ctype, plte, trns = _decode_core(buf)
    if ctype == 3:
        idx = arr[:, :, 0]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[:len(trns)] = trns
            lut = np.concatenate([plte, alpha[:, None]], axis=1)
        else:
            lut = plte
        return lut[idx]
    return arr[:, :, 0] if arr.shape[2] == 1 else arr


def decode_png_indexed(buf: bytes):
    """Paletted PNG -> (index band (H, W) uint8, palette (N, 3) uint8,
    trns (K,) uint8 | None) — the GetColorTable-preserving decode used
    by pct2rgb/attachpct-style tools."""
    arr, ctype, plte, trns = _decode_core(buf)
    if ctype != 3:
        raise ValueError("not a paletted PNG (color type != 3)")
    return arr[:, :, 0], plte, trns


def encode_png_palette(idx: np.ndarray, palette: np.ndarray,
                       trns: "np.ndarray | None" = None,
                       compress_level: int = 6) -> bytes:
    """Encode (H, W) uint8 index band + (N<=256, 3) palette -> color
    type 3 PNG (depth 8), optional tRNS alpha per palette entry."""
    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (N<=256, 3) uint8")
    h, w = idx.shape
    payload = _filter_rows(idx.reshape(h, w), 1, 0)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    chunks = [_SIG, _chunk(b"IHDR", ihdr),
              _chunk(b"PLTE", palette.tobytes())]
    if trns is not None:
        chunks.append(_chunk(
            b"tRNS", np.ascontiguousarray(trns, dtype=np.uint8).tobytes()))
    chunks.append(_chunk(b"IDAT", zlib.compress(payload, compress_level)))
    chunks.append(_chunk(b"IEND", b""))
    return b"".join(chunks)
