"""Arc/Info Binary Grid (AIG) coverage reader.

Parity targets: frmts/aigrid/gridlib.c + aigopen.c + aigdataset.cpp —
hdr.adf (cell type @16, compressed flag @20, blocks-per-row @288,
block size @296/@304, cell size @256/@264, all big-endian),
dblbnd.adf (LLX/LLY/URX/URY doubles), sta.adf (min/max/mean[/stddev]),
w001001x.adf index (length@24×2, 8-byte entries of offset×2/size×2
from byte 100) and every w001001.adf block magic: 0x00 const, 0x01
1-bit, 0x04 4-bit, 0x08 8-bit, 0x10 16-bit, 0x20 32-bit raw, 0xCF/
0xD7/0xDF/0xE0/0xF0/0xF8/0xFC run-length families, with the size-
prefixed min value (sign-extended, gridlib.c:700) and unsigned
rollover adds. Float grids are raw big-endian float32. The 0xFF
CCITT RLE block type is not implemented (rejected explicitly).

Band typing mirrors aigdataset.cpp:106: Byte when 0<=min,max<=254
(nodata 255), Int16 within ±32767 (nodata -32768), else Int32
(nodata -2147483647); float grids read Float32 with nodata < -1e307
mapped to nan. The <cover>.clr / sibling .clr color table parses to
an (n,4) palette.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

GRID_NO_DATA = -2147483647


def _find(cover: str, name: str) -> Optional[str]:
    for cand in (os.path.join(cover, name),
                 os.path.join(cover, name.upper())):
        if os.path.exists(cand):
            return cand
    return None


def _rollover_add(a, b):
    return ((np.int64(a) + np.int64(b)) & 0xFFFFFFFF).astype(np.int64) \
        if isinstance(a, np.ndarray) else ((int(a) + int(b)) & 0xFFFFFFFF)


def _signed32(v):
    v = np.asarray(v, np.int64) & 0xFFFFFFFF
    return np.where(v >= 2 ** 31, v - 2 ** 32, v)


def _decode_block(data: bytes, bw: int, bh: int,
                  cell_float: bool, compressed: bool) -> np.ndarray:
    """One tile block (without the leading size word) -> (bh, bw)."""
    n = bw * bh
    if cell_float:
        return np.frombuffer(data, ">f4", n).reshape(bh, bw).astype(
            np.float64)
    if not compressed:
        vals = np.frombuffer(data, ">i4", n)
        return _signed32(vals).reshape(bh, bw).astype(np.float64)
    magic = data[0]
    min_size = data[1]
    pos = 2
    nmin = 0
    if min_size == 4:
        nmin = struct.unpack_from(">i", data, pos)[0]
    else:
        for i in range(min_size):
            nmin = nmin * 256 + data[pos + i]
        if min_size != 0 and data[2] > 127:  # sign extension
            nmin -= {1: 256, 2: 65536, 3: 16777216}.get(min_size, 0)
    pos += min_size
    body = data[pos:]
    out = np.full(n, GRID_NO_DATA, np.int64)
    if magic == 0x00:
        out[:] = nmin
    elif magic == 0x08:
        v = np.frombuffer(body, np.uint8, n)
        out[:] = _signed32(v.astype(np.int64) + nmin)
    elif magic == 0x04:
        raw = np.frombuffer(body, np.uint8, (n + 1) // 2)
        nib = np.empty(len(raw) * 2, np.int64)
        nib[0::2] = (raw & 0xF0) >> 4
        nib[1::2] = raw & 0x0F
        out[:] = _signed32(nib[:n] + nmin)
    elif magic == 0x01:
        bits = np.unpackbits(np.frombuffer(body, np.uint8,
                                           (n + 7) // 8))[:n]
        out[:] = _signed32(bits.astype(np.int64) + nmin)
    elif magic == 0x10:
        v = np.frombuffer(body, ">u2", n)
        out[:] = _signed32(v.astype(np.int64) + nmin)
    elif magic == 0x20:
        v = _signed32(np.frombuffer(body, ">u4", n).astype(np.int64))
        out[:] = _signed32(v + nmin)
    elif magic == 0xFF:
        raise NotImplementedError("AIG: CCITT RLE (0xFF) blocks "
                                  "not supported")
    else:
        # run-length families (gridlib.c AIGProcessBlock)
        pos2 = 0
        npix = 0
        while npix < n and pos2 < len(body):
            marker = body[pos2]
            pos2 += 1
            if magic == 0xE0:
                val, = struct.unpack_from(">i", body, pos2)
                pos2 += 4
                out[npix:npix + marker] = _signed32(val + nmin)
                npix += marker
            elif magic == 0xF0:
                val = body[pos2] * 256 + body[pos2 + 1]
                pos2 += 2
                out[npix:npix + marker] = _signed32(val + nmin)
                npix += marker
            elif magic in (0xFC, 0xF8):
                val = body[pos2]
                pos2 += 1
                out[npix:npix + marker] = _signed32(val + nmin)
                npix += marker
            elif magic == 0xDF and marker < 128:
                out[npix:npix + marker] = nmin
                npix += marker
            elif magic == 0xD7 and marker < 128:
                v = np.frombuffer(body, np.uint8, marker, pos2)
                out[npix:npix + marker] = _signed32(
                    v.astype(np.int64) + nmin)
                pos2 += marker
                npix += marker
            elif magic == 0xCF and marker < 128:
                v = np.frombuffer(body, ">u2", marker, pos2)
                out[npix:npix + marker] = _signed32(
                    v.astype(np.int64) + nmin)
                pos2 += 2 * marker
                npix += marker
            elif marker > 128:
                cnt = 256 - marker
                out[npix:npix + cnt] = GRID_NO_DATA
                npix += cnt
            else:
                raise ValueError(f"AIG: bad run marker in 0x{magic:02x}")
        if npix < n:
            raise ValueError("AIG: ran out of data in block")
    return out.reshape(bh, bw).astype(np.float64)


def read_clr(cover: str) -> Optional[np.ndarray]:
    """<cover>/<name>.clr or sibling <cover>.clr -> (256, 4) palette."""
    cands: List[str] = []
    base = os.path.basename(os.path.normpath(cover))
    for d in (cover, os.path.dirname(os.path.normpath(cover))):
        for ext in (".clr", ".CLR"):
            cands.append(os.path.join(d, base + ext))
    pal = None
    for cand in cands:
        if not os.path.exists(cand):
            continue
        pal = np.zeros((256, 4), np.uint8)
        pal[:, 3] = 255
        for line in open(cand, encoding="latin-1"):
            toks = line.split()
            if len(toks) >= 4 and not line.startswith("#"):
                try:
                    idx = int(toks[0])
                    pal[idx, :3] = [int(float(t)) for t in toks[1:4]]
                except (ValueError, IndexError):
                    continue
        break
    return pal


def decode_aig(cover: str) -> Tuple[np.ndarray, dict]:
    """Arc/Info Binary Grid coverage directory -> (array, meta)."""
    if os.path.isfile(cover):  # e.g. opened via <cover>/hdr.adf
        cover = os.path.dirname(cover)
    hdr_path = _find(cover, "hdr.adf")
    if hdr_path is None:
        raise ValueError(f"{cover}: no hdr.adf")
    hdr = open(hdr_path, "rb").read()
    cell_type, = struct.unpack_from(">i", hdr, 16)
    not_compressed, = struct.unpack_from(">i", hdr, 20)
    compressed = not not_compressed
    blocks_per_row, = struct.unpack_from(">i", hdr, 288)
    blocks_per_col, = struct.unpack_from(">i", hdr, 292)
    bw, = struct.unpack_from(">i", hdr, 296)
    bh, = struct.unpack_from(">i", hdr, 304)
    cellx, celly = struct.unpack_from(">dd", hdr, 256)
    cell_float = cell_type == 2

    bnd = open(_find(cover, "dblbnd.adf"), "rb").read()
    llx, lly, urx, ury = struct.unpack_from(">dddd", bnd, 0)
    w = int((urx - llx + 0.5 * cellx) / cellx)
    h = int((ury - lly + 0.5 * celly) / celly)

    meta: dict = {"transform": (llx, cellx, 0.0, ury, 0.0, -celly)}
    sta_path = _find(cover, "sta.adf")
    if sta_path:
        sta = open(sta_path, "rb").read()
        if len(sta) >= 32:
            meta["min"], meta["max"], meta["mean"], meta["stddev"] = \
                struct.unpack_from(">dddd", sta, 0)
        elif len(sta) == 24:
            # ticket #6633 variant: min/max/mean only, LSB ordering
            meta["min"], meta["max"], meta["mean"] = struct.unpack_from(
                "<ddd", sta, 0)

    idx_buf = open(_find(cover, "w001001x.adf"), "rb").read()
    nlen = struct.unpack_from(">i", idx_buf, 24)[0] * 2
    nblocks = (nlen - 100) // 8
    entries = np.frombuffer(idx_buf, ">u4", nblocks * 2, 100)
    offsets = entries[0::2].astype(np.int64) * 2
    sizes = entries[1::2].astype(np.int64) * 2
    tile_buf = open(_find(cover, "w001001.adf"), "rb").read()

    grid = np.full((blocks_per_col * bh, blocks_per_row * bw),
                   np.nan if cell_float else GRID_NO_DATA, np.float64)
    for bi in range(min(nblocks, blocks_per_row * blocks_per_col)):
        by, bx = divmod(bi, blocks_per_row)
        if sizes[bi] == 0:
            continue
        off = int(offsets[bi])
        stored = struct.unpack_from(">H", tile_buf, off)[0] * 2
        if stored != sizes[bi]:
            raise ValueError(f"AIG: block {bi} size mismatch")
        data = tile_buf[off + 2:off + 2 + stored]
        blk = _decode_block(data, bw, bh, cell_float, compressed)
        grid[by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = blk
    grid = grid[:h, :w]

    if cell_float:
        arr = grid.astype(np.float32)
        arr[grid < -1e307] = np.nan
        meta["nodata"] = float("nan")
    else:
        mn = meta.get("min", grid[grid != GRID_NO_DATA].min()
                      if (grid != GRID_NO_DATA).any() else 0)
        mx = meta.get("max", grid[grid != GRID_NO_DATA].max()
                      if (grid != GRID_NO_DATA).any() else 0)
        if 0 <= mn and mx <= 254:  # aigdataset.cpp:106
            arr = np.where(grid == GRID_NO_DATA, 255, grid).astype(np.uint8)
            meta["nodata"] = 255
        elif -32767 <= mn and mx <= 32767:
            arr = np.where(grid == GRID_NO_DATA, -32768,
                           grid).astype(np.int16)
            meta["nodata"] = -32768
        else:
            arr = grid.astype(np.int32)
            meta["nodata"] = GRID_NO_DATA
    pal = read_clr(cover)
    if pal is not None:
        meta["palette"] = pal
    return arr, meta


def identify_aig_path(path: str) -> bool:
    p = path.rstrip("/")
    if os.path.isfile(p) and os.path.basename(p).lower() in (
            "hdr.adf", "prj.adf", "sta.adf", "dblbnd.adf",
            "w001001.adf", "w001001x.adf", "vat.adf"):
        p = os.path.dirname(p)
    return os.path.isdir(p) and _find(p, "hdr.adf") is not None \
        and _find(p, "dblbnd.adf") is not None
