"""Raster Matrix Format (RMF / Panorama "Integratsia" .rsw/.mtw) reader
and uncompressed writer.

Re-derivation of the NextGIS reference driver frmts/rmf/:
  - header layout per rmfdataset.cpp:1356-1412 (RMF_READ_* offsets),
    signatures "RSW\\0" / "\\0WSR" (big-endian) / "MTW\\0"
    (rmfdataset.cpp:30-32), HUGE version offsets ×256
    (rmfdataset.h RMF_HUGE_OFFSET_FACTOR, GetFileOffset:2436).
  - tile table of u32 (offset,size) pairs, row-major, one tile holds
    ALL bands pixel-interleaved; band b reads byte offset
    (nBands - b) — i.e. 24-bit RSW stores BGR (IReadBlock:273-288).
  - RSW bit depths: 24/32 → 3×Byte; 16 → 5-5-5 packed
    ((v&0x7c00)>>7 / (v&0x3e0)>>2 / (v&0x1F)<<3, IReadBlock:300-327);
    8/4/1 → 1 band + RGBX color table; MTW: 8/16/32/64 →
    Byte/Int16/Int32/Float64 (rmfdataset.cpp:1662-1780).
  - null tiles (offset==0) fill with header nodata (ReadTile:3183).
  - LZW codec: 12-bit codes, mid-square-hash string table — the code
    VALUES depend on the hash insertion order, replicated exactly from
    rmflzw.cpp (LZWUpdateTab/LZWReadStream).
  - RMF_DEM codec: per-record delta stream (rmfdem.cpp:20-58), Int32.
  - JPEG tiles (24 bpp only) route through codecs/jpeg.py.
  - overviews: header nOvrOffset chains a child RMF header
    (OpenOverview rmfdataset.cpp:2469).
  - geotransform (LLX, ps, 0, LLY + H*ps, 0, -ps)
    (rmfdataset.cpp:1853-1858).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

RMF_HEADER_SIZE = 320
_SIG_RSW = b"RSW\x00"
_SIG_RSW_BE = b"\x00WSR"
_SIG_MTW = b"MTW\x00"

_COMP_NONE, _COMP_LZW, _COMP_JPEG, _COMP_DEM = 0, 1, 2, 32


def identify_rmf(buf: bytes) -> bool:
    return buf[:4] in (_SIG_RSW, _SIG_RSW_BE, _SIG_MTW)


# ---------------------------------------------------------------------------
# LZW (rmflzw.cpp) — hash-table string table, 12-bit codes
# ---------------------------------------------------------------------------

_TABSIZE = 4096
_NO_PRED = 0xFFFF


def _lzw_update_tab(used, nxt, pred, foll, iPred: int, bFollow: int) -> None:
    # mid-square hash over (pred + signed(follow)) | 0x800, 32-bit wrap
    iF = bFollow - 256 if bFollow >= 128 else bFollow
    nLocal = ((iPred + iF) & 0xFFFFFFFF) | 0x0800
    nLocal = ((nLocal * nLocal) & 0xFFFFFFFF) >> 6 & 0x0FFF
    nNext = nLocal
    if used[nLocal]:
        while True:
            nNext = nxt[nLocal]
            if nNext == 0:
                break
            nLocal = nNext
        nNext = (nLocal + 101) & 0x0FFF
        while used[nNext]:
            nNext += 1
            if nNext >= _TABSIZE:
                nNext = 0
        nxt[nLocal] = nNext
    used[nNext] = True
    nxt[nNext] = 0
    pred[nNext] = iPred
    foll[nNext] = bFollow


def _lzw_create_tab():
    used = [False] * _TABSIZE
    nxt = [0] * _TABSIZE
    pred = [0] * _TABSIZE
    foll = [0] * _TABSIZE
    for code in range(256):
        _lzw_update_tab(used, nxt, pred, foll, _NO_PRED, code)
    return used, nxt, pred, foll


def rmf_lzw_decompress(data: bytes, out_size: int) -> bytes:
    """LZWReadStream parity (rmflzw.cpp:195-299)."""
    if len(data) < 2:
        return b""
    used, nxt, pred, foll = _lzw_create_tab()
    out = bytearray()
    pos = 0
    n_in = len(data)

    iCode = (data[pos] << 4) & 0xFF0
    pos += 1
    n_in -= 1
    iCode += (data[pos] >> 4) & 0x00F
    iOldCode = iCode
    bitsleft = True
    iFinChar = foll[iCode]
    out.append(iFinChar)
    nCount = _TABSIZE - 256

    while n_in > 0:
        if bitsleft:
            iCode = ((data[pos] & 0x0F) << 8) & 0xF00
            pos += 1
            n_in -= 1
            if n_in == 0:
                break
            iCode += data[pos]
            pos += 1
            n_in -= 1
            bitsleft = False
        else:
            iCode = (data[pos] << 4) & 0xFF0
            pos += 1
            n_in -= 1
            if n_in == 0:
                break
            iCode += (data[pos] >> 4) & 0x00F
            bitsleft = True

        iInCode = iCode
        bLastChar = 0
        bNewCode = False
        if not used[iCode]:
            iCode = iOldCode
            bLastChar = iFinChar
            bNewCode = True

        stack: List[int] = []
        while pred[iCode] != _NO_PRED:
            if len(stack) >= _TABSIZE:
                return bytes(out[:0])
            stack.append(foll[iCode])
            iCode = pred[iCode]

        iFinChar = foll[iCode]
        out.append(iFinChar)
        out.extend(reversed(stack))
        if bNewCode:
            iFinChar = bLastChar
            out.append(iFinChar)
        if nCount > 0:
            nCount -= 1
            _lzw_update_tab(used, nxt, pred, foll, iOldCode, iFinChar)
        iOldCode = iInCode
        if len(out) >= out_size:
            break
    return bytes(out[:out_size])


# ---------------------------------------------------------------------------
# RMF_DEM codec (rmfdem.cpp) — delta-coded Int32 stream
# ---------------------------------------------------------------------------

_OUT_INT32 = -0x80000000


def rmf_dem_decompress(data: bytes, out_size: int) -> bytes:
    """DEMDecompress parity (rmfdem.cpp:99-305)."""
    n_vals = out_size // 4
    out = np.zeros(n_vals, dtype="<i4")
    n_out = 0
    prev = 0  # int32 running value
    pos, n_in = 0, len(data)

    def add(code: int) -> int:
        nonlocal prev
        prev = (prev + code + 0x80000000) % 0x100000000 - 0x80000000
        return prev

    while n_in > 0 and n_out < n_vals:
        hdr = data[pos]
        count = hdr & 0x1F
        typ = hdr & 0xE0
        pos += 1
        n_in -= 1
        if count == 0:
            if n_in == 0:
                break
            count = 32 + data[pos]
            pos += 1
            n_in -= 1
        if typ == 0x20:  # TYPE_ZERO
            if n_vals - n_out < count:
                break
            out[n_out:n_out + count] = prev
            n_out += count
        elif typ == 0x00:  # TYPE_OUT
            if n_vals - n_out < count:
                break
            out[n_out:n_out + count] = _OUT_INT32
            n_out += count
        elif typ == 0x40:  # TYPE_INT4
            if n_in < (count + 1) // 2 or n_vals - n_out < count:
                break
            n_in -= count // 2
            while count > 0:
                count -= 1
                code = data[pos] & 0x0F
                if code > 7:
                    code -= 16
                out[n_out] = _OUT_INT32 if code == -8 else add(code)
                n_out += 1
                if count == 0:
                    if n_in:  # odd tail consumes the byte
                        pos += 1
                        n_in -= 1
                    break
                count -= 1
                code = (data[pos] >> 4) & 0x0F
                pos += 1
                if code > 7:
                    code -= 16
                out[n_out] = _OUT_INT32 if code == -8 else add(code)
                n_out += 1
        elif typ == 0x60:  # TYPE_INT8
            if n_in < count or n_vals - n_out < count:
                break
            n_in -= count
            for _ in range(count):
                code = data[pos]
                pos += 1
                if code >= 128:
                    code -= 256
                out[n_out] = _OUT_INT32 if code == -128 else add(code)
                n_out += 1
        elif typ == 0x80:  # TYPE_INT12 — 3 bytes per 2 codes
            if n_in < (3 * count + 1) // 2 or n_vals - n_out < count:
                break
            n_in -= 3 * count // 2
            while count > 0:
                count -= 1
                v = struct.unpack_from("<h", data, pos)[0]
                code = v & 0x0FFF
                pos += 1
                if code > 0x7FF:
                    code -= 0x1000
                out[n_out] = _OUT_INT32 if code == -0x800 else add(code)
                n_out += 1
                if count == 0:
                    if n_in:
                        pos += 1
                        n_in -= 1
                    break
                count -= 1
                v = struct.unpack_from("<h", data, pos)[0]
                code = (v >> 4) & 0x0FFF
                pos += 2
                if code > 0x7FF:
                    code -= 0x1000
                out[n_out] = _OUT_INT32 if code == -0x800 else add(code)
                n_out += 1
        elif typ == 0xA0:  # TYPE_INT16
            if n_in < 2 * count or n_vals - n_out < count:
                break
            n_in -= 2 * count
            for _ in range(count):
                code = struct.unpack_from("<h", data, pos)[0]
                pos += 2
                out[n_out] = _OUT_INT32 if code == -0x8000 else add(code)
                n_out += 1
        elif typ == 0xC0:  # TYPE_INT24
            if n_in < 3 * count or n_vals - n_out < count:
                break
            n_in -= 3 * count
            for _ in range(count):
                code = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
                pos += 3
                if code > 0x7FFFFF:
                    code -= 0x1000000
                out[n_out] = _OUT_INT32 if code == -0x800000 else add(code)
                n_out += 1
        elif typ == 0xE0:  # TYPE_INT32
            if n_in < 4 * count or n_vals - n_out < count:
                break
            n_in -= 4 * count
            for _ in range(count):
                code = struct.unpack_from("<i", data, pos)[0]
                pos += 4
                out[n_out] = _OUT_INT32 if code == _OUT_INT32 else add(code)
                n_out += 1
    return out[:n_out].tobytes()


# ---------------------------------------------------------------------------
# Header / dataset
# ---------------------------------------------------------------------------

def _parse_header(buf: bytes, off: int, big: bool) -> Dict:
    e = ">" if big else "<"

    def u32(o):
        return struct.unpack_from(e + "I", buf, off + o)[0]

    def i32(o):
        return struct.unpack_from(e + "i", buf, off + o)[0]

    def f64(o):
        return struct.unpack_from(e + "d", buf, off + o)[0]

    h = {
        "sig": buf[off:off + 4],
        "version": u32(4), "size": u32(8), "ovr_offset": u32(12),
        "user_id": u32(16), "name": buf[off + 20:off + 52],
        "bit_depth": u32(52), "height": u32(56), "width": u32(60),
        "x_tiles": u32(64), "y_tiles": u32(68),
        "tile_h": u32(72), "tile_w": u32(76),
        "last_tile_h": u32(80), "last_tile_w": u32(84),
        "roi_offset": u32(88), "roi_size": u32(92),
        "clr_offset": u32(96), "clr_size": u32(100),
        "tile_tbl_offset": u32(104), "tile_tbl_size": u32(108),
        "map_type": i32(124), "projection": i32(128), "epsg": i32(132),
        "scale": f64(136), "resolution": f64(144), "pixel_size": f64(152),
        "lly": f64(160), "llx": f64(168),
        "stdp1": f64(176), "stdp2": f64(184),
        "center_long": f64(192), "center_lat": f64(200),
        "compression": buf[off + 208], "mask_type": buf[off + 209],
        "mask_step": buf[off + 210], "frame_flag": buf[off + 211],
        "flags_tbl_offset": u32(212), "flags_tbl_size": u32(216),
        "file_size0": u32(220), "file_size1": u32(224),
        "georef_flag": buf[off + 244], "inverse": buf[off + 245],
        "jpeg_quality": buf[off + 246],
        "elev_min": f64(280), "elev_max": f64(288), "nodata": f64(296),
        "elev_unit": u32(304), "elev_type": buf[off + 308],
        "ext_hdr_offset": u32(312), "ext_hdr_size": u32(316),
    }
    return h


def _file_offset(h: Dict, rmf_off: int) -> int:
    if h["version"] >= 0x0201:  # RMF_VERSION_HUGE
        return rmf_off * 256
    return rmf_off


def _decode_level(buf: bytes, hdr_off: int) -> Tuple[np.ndarray, Dict]:
    sig = buf[hdr_off:hdr_off + 4]
    big = sig == _SIG_RSW_BE
    is_mtw = sig == _SIG_MTW
    h = _parse_header(buf, hdr_off, big)
    e = ">" if big else "<"

    bd = h["bit_depth"]
    if is_mtw:
        n_bands = 1
        dtype = {8: "u1", 16: "i2", 32: "i4", 64: "f8"}.get(bd)
        if dtype is None:
            raise ValueError(f"invalid MTW bit depth {bd}")
        dtype = "<" + dtype  # tiles are LE on disk (or swapped post-codec)
    else:
        if bd in (32, 24, 16):
            n_bands = 3
        elif bd in (8, 4, 1):
            n_bands = 1
        else:
            raise ValueError(f"invalid RSW bit depth {bd}")
        dtype = "u1"

    W, H = h["width"], h["height"]
    tw, th = h["tile_w"], h["tile_h"]
    n_xt = (W + tw - 1) // tw
    n_yt = (H + th - 1) // th
    last_w = W % tw
    last_h = H % th

    tbl_off = _file_offset(h, h["tile_tbl_offset"])
    n_pairs = h["tile_tbl_size"] // 8
    tiles = np.frombuffer(buf, dtype=e + "u4", count=2 * n_pairs,
                          offset=tbl_off).reshape(-1, 2)

    # color table (RSW 1/4/8 bit)
    color_table = None
    if not is_mtw and bd in (8, 4, 1) and h["clr_size"]:
        n_colors = 1 << bd
        co = _file_offset(h, h["clr_offset"])
        ct = np.frombuffer(buf, dtype=np.uint8, count=n_colors * 4,
                           offset=co).reshape(-1, 4)
        color_table = ct[:, :3].copy()  # R,G,B (alpha fixed 255)

    comp = h["compression"]
    itemsize = np.dtype(dtype).itemsize
    out = np.zeros((n_bands, H, W), dtype=dtype)
    nodata = h["nodata"]

    for ty in range(n_yt):
        for tx in range(n_xt):
            ti = ty * n_xt + tx
            if ti >= n_pairs:
                continue
            t_off = _file_offset(h, int(tiles[ti, 0]))
            t_size = int(tiles[ti, 1])
            raw_w = last_w if (last_w and tx == n_xt - 1) else tw
            raw_h = last_h if (last_h and ty == n_yt - 1) else th
            raw_bytes = raw_w * raw_h * bd // 8
            y0, x0 = ty * th, tx * tw

            if t_off == 0:
                out[:, y0:y0 + raw_h, x0:x0 + raw_w] = np.array(
                    nodata).astype(dtype)
                continue

            raw = buf[t_off:t_off + t_size]
            if comp == _COMP_LZW and t_size != raw_bytes:
                raw = rmf_lzw_decompress(raw, raw_bytes)
            elif comp == _COMP_DEM and t_size != raw_bytes:
                raw = rmf_dem_decompress(raw, raw_bytes)
            elif comp == _COMP_JPEG and t_size != raw_bytes:
                from lib_gdal_ray.codecs.jpeg import decode_jpeg

                px = decode_jpeg(raw)  # (h, w, 3) RGB
                px = px[:raw_h, :raw_w]
                # RMF JPEG tiles store RGB already in band order
                for b in range(3):
                    out[b, y0:y0 + raw_h, x0:x0 + raw_w] = px[:, :, b]
                continue
            if len(raw) < raw_bytes:
                raw = raw + b"\x00" * (raw_bytes - len(raw))

            if bd in (24, 32) and not is_mtw:
                psz = bd // 8
                a = np.frombuffer(raw, np.uint8,
                                  count=raw_h * raw_w * psz).reshape(
                                      raw_h, raw_w, psz)
                # band b (1-based) = byte offset (nBands - b): BGR order
                for b in range(n_bands):
                    out[b, y0:y0 + raw_h, x0:x0 + raw_w] = a[:, :, n_bands - 1 - b]
            elif bd == 16 and not is_mtw:
                a = np.frombuffer(raw, "<u2",
                                  count=raw_h * raw_w).reshape(raw_h, raw_w)
                out[0, y0:y0 + raw_h, x0:x0 + raw_w] = ((a & 0x7C00) >> 7
                                                        ).astype(np.uint8)
                out[1, y0:y0 + raw_h, x0:x0 + raw_w] = ((a & 0x03E0) >> 2
                                                        ).astype(np.uint8)
                out[2, y0:y0 + raw_h, x0:x0 + raw_w] = ((a & 0x001F) << 3
                                                        ).astype(np.uint8)
            elif bd == 8 or is_mtw:
                a = np.frombuffer(raw, dtype,
                                  count=raw_h * raw_w).reshape(raw_h, raw_w)
                out[0, y0:y0 + raw_h, x0:x0 + raw_w] = a
            elif bd == 4:
                line_sz = 4 * raw_w // 8  # floor, per IReadBlock:342
                a = np.frombuffer(raw, np.uint8)
                for li in range(raw_h):
                    ln = a[li * line_sz:li * line_sz + (raw_w + 1) // 2]
                    px = np.empty(raw_w, np.uint8)
                    px[0::2] = ln[:(raw_w + 1) // 2] & 0x0F
                    px[1::2] = (ln[:raw_w // 2] & 0xF0) >> 4
                    out[0, y0 + li, x0:x0 + raw_w] = px
            elif bd == 1:
                line_sz = raw_w // 8
                a = np.frombuffer(raw, np.uint8)
                for li in range(raw_h):
                    ln = a[li * line_sz:li * line_sz + (raw_w + 7) // 8]
                    bits = np.unpackbits(ln)[:raw_w]
                    out[0, y0 + li, x0:x0 + raw_w] = bits
            else:
                raise ValueError(f"unsupported layout bd={bd}")

    ps = h["pixel_size"]
    gt = (h["llx"], ps, 0.0, h["lly"] + H * ps, 0.0, -ps) if ps else None
    meta = {
        "width": W, "height": H, "bands": n_bands,
        "dtype": str(np.dtype(dtype)), "geotransform": gt,
        "epsg": h["epsg"], "nodata": nodata if is_mtw else None,
        "color_table": color_table, "compression": comp,
        "is_mtw": is_mtw, "big_endian": big, "version": h["version"],
        "ovr_offset": _file_offset(h, h["ovr_offset"]),
        "scale": h["scale"], "map_type": h["map_type"],
    }
    arr = out[0] if n_bands == 1 else out
    return arr, meta


def decode_rmf(buf: bytes, overview: Optional[int] = None
               ) -> Tuple[np.ndarray, Dict]:
    """Decode an RMF file. overview=None → full resolution; overview=k →
    k-th reduced level from the nOvrOffset chain (rmfdataset.cpp:2469)."""
    if not identify_rmf(buf):
        raise ValueError("not an RMF file")
    off = 0
    seen = {0}
    level = -1
    while True:
        arr, meta = _decode_level(buf, off)
        if overview is None or level == overview:
            if overview is not None:
                meta["overview"] = level
            return arr, meta
        nxt = meta["ovr_offset"]
        if not nxt or nxt in seen or nxt + RMF_HEADER_SIZE > len(buf):
            raise ValueError(f"overview {overview} not present")
        seen.add(nxt)
        off = nxt
        level += 1


def rmf_overview_count(buf: bytes) -> int:
    n = 0
    off = 0
    seen = {0}
    while True:
        h = _parse_header(buf, off, buf[off:off + 4] == _SIG_RSW_BE)
        nxt = _file_offset(h, h["ovr_offset"])
        if not nxt or nxt in seen or nxt + RMF_HEADER_SIZE > len(buf):
            return n
        seen.add(nxt)
        off = nxt
        n += 1


# ---------------------------------------------------------------------------
# Writer (uncompressed, little-endian, classic version)
# ---------------------------------------------------------------------------

def encode_rmf(arr: np.ndarray, geotransform=None, epsg: int = 0,
               nodata: float = 0.0, mtw: Optional[bool] = None,
               tile_size: int = 256) -> bytes:
    """Write an uncompressed RMF. 3-band uint8 → 24-bit RSW (BGR
    interleave); 2-D arrays → MTW (Byte/Int16/Int32/Float64) unless
    mtw=False with uint8 (→ 8-bit RSW needs a color table; we emit a
    grayscale one). Mirrors RMFDataset::Create + WriteHeader."""
    if arr.ndim == 3:
        n_bands, H, W = arr.shape
        if n_bands != 3 or arr.dtype != np.uint8:
            raise ValueError("3-band RSW write supports uint8 only")
        is_mtw = False
        bd = 24
        dtype = np.dtype("u1")
    else:
        H, W = arr.shape
        n_bands = 1
        if mtw is None:
            is_mtw = arr.dtype != np.uint8
        else:
            is_mtw = mtw
        if is_mtw:
            dmap = {"uint8": (8, "u1"), "int16": (16, "<i2"),
                    "int32": (32, "<i4"), "float64": (64, "<f8")}
            key = str(arr.dtype)
            if key not in dmap:
                raise ValueError(f"MTW cannot store {arr.dtype}")
            bd, dt = dmap[key]
            dtype = np.dtype(dt)
        else:
            if arr.dtype != np.uint8:
                raise ValueError("RSW single band must be uint8")
            bd, dtype = 8, np.dtype("u1")

    tw = th = min(tile_size, max(16, tile_size))
    n_xt = (W + tw - 1) // tw
    n_yt = (H + th - 1) // th
    last_w = W % tw
    last_h = H % th

    clr = b""
    if not is_mtw and bd == 8:
        ct = np.zeros((256, 4), np.uint8)
        ct[:, 0] = ct[:, 1] = ct[:, 2] = np.arange(256)
        clr = ct.tobytes()

    tile_tbl_off = RMF_HEADER_SIZE + 320  # header + ext header gap
    clr_off = tile_tbl_off + 8 * n_xt * n_yt
    data_off = clr_off + len(clr)

    tiles = []
    blobs = []
    pos = data_off
    for ty in range(n_yt):
        for tx in range(n_xt):
            raw_w = last_w if (last_w and tx == n_xt - 1) else tw
            raw_h = last_h if (last_h and ty == n_yt - 1) else th
            y0, x0 = ty * th, tx * tw
            if arr.ndim == 3:
                t = np.zeros((raw_h, raw_w, 3), np.uint8)
                for b in range(3):  # BGR on disk
                    t[:, :, 2 - b] = arr[b, y0:y0 + raw_h, x0:x0 + raw_w]
                blob = t.tobytes()
            else:
                blob = np.ascontiguousarray(
                    arr[y0:y0 + raw_h, x0:x0 + raw_w]).astype(
                        dtype).tobytes()
            tiles.append((pos, len(blob)))
            blobs.append(blob)
            pos += len(blob)

    file_size = pos
    hdr = bytearray(RMF_HEADER_SIZE)
    hdr[0:4] = _SIG_MTW if is_mtw else _SIG_RSW
    struct.pack_into("<I", hdr, 4, 0x0200)
    struct.pack_into("<I", hdr, 8, file_size)
    struct.pack_into("<I", hdr, 12, 0)  # no overviews
    struct.pack_into("<I", hdr, 52, bd)
    struct.pack_into("<I", hdr, 56, H)
    struct.pack_into("<I", hdr, 60, W)
    struct.pack_into("<I", hdr, 64, n_xt)
    struct.pack_into("<I", hdr, 68, n_yt)
    struct.pack_into("<I", hdr, 72, th)
    struct.pack_into("<I", hdr, 76, tw)
    struct.pack_into("<I", hdr, 80, last_h if last_h else th)
    struct.pack_into("<I", hdr, 84, last_w if last_w else tw)
    if clr:
        struct.pack_into("<I", hdr, 96, clr_off)
        struct.pack_into("<I", hdr, 100, len(clr))
    struct.pack_into("<I", hdr, 104, tile_tbl_off)
    struct.pack_into("<I", hdr, 108, 8 * n_xt * n_yt)
    struct.pack_into("<i", hdr, 132, epsg)
    struct.pack_into("<d", hdr, 136, 10000.0)  # dfScale default
    if geotransform is not None:
        ps = float(geotransform[1])
        struct.pack_into("<d", hdr, 152, ps)
        struct.pack_into("<d", hdr, 160, geotransform[3] - H * ps)  # LLY
        struct.pack_into("<d", hdr, 168, geotransform[0])           # LLX
        hdr[244] = 1  # georef flag
    hdr[208] = _COMP_NONE
    struct.pack_into("<I", hdr, 220, file_size)
    struct.pack_into("<d", hdr, 296, nodata)

    tbl = bytearray()
    for off, sz in tiles:
        tbl += struct.pack("<II", off, sz)

    out = bytearray(data_off)
    out[0:RMF_HEADER_SIZE] = hdr
    out[tile_tbl_off:tile_tbl_off + len(tbl)] = tbl
    if clr:
        out[clr_off:clr_off + len(clr)] = clr
    for blob in blobs:
        out += blob
    return bytes(out)
