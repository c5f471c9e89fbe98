"""PCIDSK (.pix) raster reader in pure numpy.

Parity targets: frmts/pcidsk/sdk —
- core/cpcidskfile.cpp:517-690: 512-byte ASCII file header (width@384,
  height@392, channels@376, image start block@304, image-header start
  block@336, interleaving@360, segment pointers@440/456, per-type
  channel counts@464), BAND/PIXEL interleaved layout and the 1024-byte
  per-channel image headers (filename@64, pixel type@160, byte order
  flag@201 — 'S' is little-endian).
- segment/cpcidsksegment.cpp:98: segment pointer entries are 32 bytes
  (flag, 3-char type, 8-char name, start@12(11) in 1-based 512-blocks,
  size@23(9)); segment data begins after its own 1024-byte header.
- blockdir/asciitiledir.cpp (tile dir v1, segment "SysBMDir"):
  512-byte dir header (version@7(3), layer count@10(8), block
  count@18(8) in ASCII), block map of 28-char entries
  (segment 4 / start block 8 / layer 8 / next block 8) chained by
  next-block, 24-char layer entries (type 4 / start block 8 /
  size 12), then packed binary TileLayerInfo (xsize, ysize, tile x/y,
  4-char data type, 8-char compression, u16 nodata flag, f64 nodata);
  SYS_BLOCK_SIZE is 8192. Tile layers (asciitilelayer.cpp:162) hold a
  128-byte header, 12-char ASCII tile offsets, 8-char tile sizes.
- blockdir/binarytiledir.cpp (tile dir v2, segment "TileDir"):
  binary BlockDirInfo (layer count u32, block size u32 @10), packed
  BlockLayerInfo (u16 type, u32 start block, u32 block count, u64
  size), the same TileLayerInfo, one free-block layer entry, then the
  BlockInfo pool (u16 segment, u32 start block); tile lists are packed
  (u64 offset, u32 size) pairs at layer offset 0.
- channel/ctiledchannel.cpp:479: the RLE tile codec (high-bit run,
  literal run, pixel-size strides).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

_DTYPES = {"8U": np.uint8, "16S": np.int16, "16U": np.uint16,
           "32S": np.int32, "32U": np.uint32, "32R": np.float32,
           "64S": np.int64, "64U": np.uint64, "64R": np.float64}


def identify_pcidsk(buf: bytes) -> bool:
    return buf[:8] == b"PCIDSK  "


def _ascii_int(b: bytes) -> int:
    s = b.decode("latin-1").strip().strip("\x00")
    return int(s) if s else 0


class _SegPtr:
    def __init__(self, raw: bytes):
        self.flag = chr(raw[0])
        self.type = raw[1:4].decode("latin-1")
        self.name = raw[4:12].decode("latin-1").strip()
        self.start = _ascii_int(raw[12:23])  # 1-based 512-byte blocks
        self.nblocks = _ascii_int(raw[23:32])

    @property
    def data_offset(self) -> int:
        return (self.start - 1) * 512


class _TileDir:
    """Tile directory (v1 ASCII "SysBMDir" or v2 binary "TileDir")."""

    def __init__(self, buf: bytes, segs: List[Optional[_SegPtr]],
                 seg_num: int, binary: bool):
        self.buf = buf
        self.segs = segs
        base = segs[seg_num - 1].data_offset + 1024
        self.base = base
        hdr = buf[base:base + 512]
        self.binary = binary
        self.layers: List[dict] = []
        if binary:
            nlayers, self.block_size = struct.unpack_from("<II", hdr, 10)
            swap = hdr[509:510] == b"B"
            e = ">" if swap else "<"
            pos = base + 512
            for _ in range(nlayers):
                lt, sb, bc, ls = struct.unpack_from(f"{e}HIIQ", buf, pos)
                self.layers.append({"type": lt, "start_block": sb,
                                    "block_count": bc, "size": ls})
                pos += 18
            for lyr in self.layers:
                (xs, ys, tx, ty) = struct.unpack_from(f"{e}IIII", buf, pos)
                dt = buf[pos + 16:pos + 20].decode("latin-1").strip()
                comp = buf[pos + 20:pos + 28].decode("latin-1").strip()
                lyr.update({"xsize": xs, "ysize": ys, "tilex": tx,
                            "tiley": ty, "dtype": dt, "compress": comp})
                pos += 38
            pos += 18  # free block layer entry
            self.block_pool = pos
            self.endian = e
        else:
            self.block_size = 8192
            nlayers = _ascii_int(hdr[10:18])
            nblocks = _ascii_int(hdr[18:26])
            swap = hdr[509:510] == b"B"
            e = ">" if swap else "<"
            pos = base + 512
            blockmap = []
            for _ in range(nblocks):
                raw = buf[pos:pos + 28]
                blockmap.append((_ascii_int(raw[0:4]),
                                 _ascii_int(raw[4:12]),
                                 _ascii_int(raw[20:28])))
                pos += 28
            for _ in range(nlayers):
                raw = buf[pos:pos + 24]
                self.layers.append({
                    "type": _ascii_int(raw[0:4]),
                    "start_block": _ascii_int(raw[4:12]),
                    "size": _ascii_int(raw[12:24])})
                pos += 24
            for lyr in self.layers:
                (xs, ys, tx, ty) = struct.unpack_from(f"{e}IIII", buf, pos)
                dt = buf[pos + 16:pos + 20].decode("latin-1").strip()
                comp = buf[pos + 20:pos + 28].decode("latin-1").strip()
                lyr.update({"xsize": xs, "ysize": ys, "tilex": tx,
                            "tiley": ty, "dtype": dt, "compress": comp})
                pos += 38
            self.blockmap = blockmap

    def _layer_blocks(self, lyr: dict) -> List[Tuple[int, int]]:
        """[(segment, start_block), ...] forming the virtual file."""
        out = []
        if self.binary:
            pos = self.block_pool + lyr["start_block"] * 6
            for _ in range(lyr["block_count"]):
                seg, sb = struct.unpack_from(f"{self.endian}HI",
                                             self.buf, pos)
                out.append((seg, sb))
                pos += 6
        else:
            i = lyr["start_block"]
            seen = set()
            while 0 <= i < len(self.blockmap) and i not in seen:
                seen.add(i)
                seg, sb, nxt = self.blockmap[i]
                out.append((seg, sb))
                i = nxt
        return out

    def read_layer(self, lyr: dict, offset: int, size: int) -> bytes:
        blocks = lyr.setdefault("_blocks", self._layer_blocks(lyr))
        bs = self.block_size
        out = bytearray()
        while size > 0:
            bi, within = divmod(offset, bs)
            seg, sb = blocks[bi]
            src = self.segs[seg - 1].data_offset + 1024 + sb * bs + within
            n = min(size, bs - within)
            out += self.buf[src:src + n]
            offset += n
            size -= n
        return bytes(out)


def _rle_decode(data: bytes, out_size: int, pixel_size: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos + 1 + pixel_size <= len(data) and len(out) < out_size:
        c = data[pos]
        pos += 1
        if c > 127:
            out += data[pos:pos + pixel_size] * (c - 128)
            pos += pixel_size
        else:
            n = c * pixel_size
            out += data[pos:pos + n]
            pos += n
    return bytes(out)


def _read_tiled_layer(tdir: _TileDir, lyr: dict) -> np.ndarray:
    w, h = lyr["xsize"], lyr["ysize"]
    tx, ty = lyr["tilex"], lyr["tiley"]
    dt = np.dtype(_DTYPES[lyr["dtype"]])
    ntx = (w + tx - 1) // tx
    nty = (h + ty - 1) // ty
    ntiles = ntx * nty
    if tdir.binary:
        raw = tdir.read_layer(lyr, 0, ntiles * 12)
        offs = [struct.unpack_from(f"{tdir.endian}QI", raw, i * 12)
                for i in range(ntiles)]
        tiles = [(o, s) for o, s in offs]
    else:
        raw = tdir.read_layer(lyr, 128, ntiles * 20)
        tiles = []
        for i in range(ntiles):
            off = _ascii_int(raw[i * 12:(i + 1) * 12])
            size = _ascii_int(raw[ntiles * 12 + i * 8:
                                  ntiles * 12 + (i + 1) * 8])
            tiles.append((off, size))
    full = np.zeros((nty * ty, ntx * tx), dt)
    tile_bytes = tx * ty * dt.itemsize
    comp = lyr["compress"].upper()
    for i, (off, size) in enumerate(tiles):
        if off in (0xFFFFFFFFFFFFFFFF,) or size == 0:
            continue
        data = tdir.read_layer(lyr, off, size)
        if comp in ("", "NONE"):
            payload = data[:tile_bytes]
        elif comp == "RLE":
            payload = _rle_decode(data, tile_bytes, dt.itemsize)
        else:
            raise NotImplementedError(f"PCIDSK tile compression {comp}")
        tr, tc = divmod(i, ntx)
        tile = np.frombuffer(payload, dt, tx * ty).reshape(ty, tx)
        full[tr * ty:(tr + 1) * ty, tc * tx:(tc + 1) * tx] = tile
    return full[:h, :w]


def decode_pcidsk(buf: bytes) -> Tuple[np.ndarray, dict]:
    if not identify_pcidsk(buf):
        raise ValueError("not a PCIDSK file")
    fh = buf[:512]
    width = _ascii_int(fh[384:392])
    height = _ascii_int(fh[392:400])
    nchan = _ascii_int(fh[376:384])
    ih_start = _ascii_int(fh[336:352])
    image_start = _ascii_int(fh[304:320])
    interleave = fh[360:368].decode("latin-1").strip()
    segptr_start = _ascii_int(fh[440:456])
    segptr_blocks = _ascii_int(fh[456:464])

    segs: List[Optional[_SegPtr]] = []
    spo = (segptr_start - 1) * 512
    for i in range(segptr_blocks * 16):
        raw = buf[spo + i * 32:spo + (i + 1) * 32]
        segs.append(_SegPtr(raw) if raw[:1] not in (b" ", b"\x00", b"")
                    else None)

    # per-type channel counts -> default types when blank in ih
    def cnt(off, size=4):
        s = fh[off:off + size]
        if size == 2:
            v = struct.unpack("<h", s)[0]
            return 0 if v == 0x2020 else v
        return _ascii_int(s)

    count_8u, count_16s, count_16u, count_32r = (
        cnt(464), cnt(468), cnt(472), cnt(476))

    image_offset = (image_start - 1) * 512
    planes: List[np.ndarray] = []
    meta: dict = {"interleave": interleave}
    tdir: Optional[_TileDir] = None
    pixel_group = None
    if interleave == "PIXEL":
        sizes = []
        for ci in range(nchan):
            ih = buf[(ih_start - 1) * 512 + ci * 1024:]
            t = ih[160:168].decode("latin-1").strip()
            if not t:
                t = ("8U" if ci < count_8u else
                     "16S" if ci < count_8u + count_16s else
                     "16U" if ci < count_8u + count_16s + count_16u
                     else "32R")
            sizes.append(np.dtype(_DTYPES[t]).itemsize)
        pixel_group = sum(sizes)
        line_bytes = pixel_group * width
        if line_bytes % 512:
            line_bytes += 512 - line_bytes % 512
    chan_offset = image_offset
    for ci in range(nchan):
        ih = buf[(ih_start - 1) * 512 + ci * 1024:
                 (ih_start - 1) * 512 + (ci + 1) * 1024]
        type_str = ih[160:168].decode("latin-1").strip()
        if not type_str:
            type_str = ("8U" if ci < count_8u else
                        "16S" if ci < count_8u + count_16s else
                        "16U" if ci < count_8u + count_16s + count_16u
                        else "32R")
        dt = np.dtype(_DTYPES[type_str])
        byte_order = chr(ih[201]) if ih[201:202].strip() else "N"
        edt = dt.newbyteorder("<" if byte_order == "S" else ">")
        filename = ih[64:128].decode("latin-1").strip()
        if filename.startswith("/SIS="):
            layer_idx = int(filename[5:].split()[0])
            if tdir is None:
                for num, sp in enumerate(segs, 1):
                    if sp and sp.name in ("SysBMDir", "TileDir"):
                        tdir = _TileDir(buf, segs, num,
                                        binary=sp.name == "TileDir")
                        break
                if tdir is None:
                    raise ValueError("PCIDSK: tiled channel but no "
                                     "SysBMDir/TileDir segment")
            planes.append(_read_tiled_layer(tdir, tdir.layers[layer_idx])
                          .astype(dt))
            continue
        if interleave == "BAND":
            n = width * height
            plane = np.frombuffer(buf, edt, n, chan_offset)
            planes.append(plane.reshape(height, width).astype(dt))
            chan_offset += n * dt.itemsize
        elif interleave == "PIXEL":
            group_off = 0
            for cj in range(ci):
                ihj = buf[(ih_start - 1) * 512 + cj * 1024:]
                tj = ihj[160:168].decode("latin-1").strip() or "8U"
                group_off += np.dtype(_DTYPES[tj]).itemsize
            line_bytes = pixel_group * width
            if line_bytes % 512:
                line_bytes += 512 - line_bytes % 512
            rows = []
            for y in range(height):
                base = image_offset + y * line_bytes + group_off
                row = np.frombuffer(
                    buf[base:base + pixel_group * width], np.uint8)
                row = row.reshape(width, pixel_group)[
                    :, :dt.itemsize].copy()
                rows.append(row.view(edt).ravel())
            planes.append(np.stack(rows).astype(dt))
        elif interleave == "FILE":
            start_byte = _ascii_int(ih[168:184])
            pix_off = _ascii_int(ih[184:192])
            line_off = _ascii_int(ih[192:200])
            rows = []
            for y in range(height):
                base = start_byte + y * line_off
                row = np.frombuffer(buf[base:base + pix_off * width],
                                    np.uint8)
                row = row.reshape(width, pix_off)[:, :dt.itemsize].copy()
                rows.append(row.view(edt).ravel())
            planes.append(np.stack(rows).astype(dt))
        else:
            raise NotImplementedError(
                f"PCIDSK interleaving {interleave!r}")
    arr = planes[0] if len(planes) == 1 else np.stack(planes, axis=-1)
    return arr, meta
