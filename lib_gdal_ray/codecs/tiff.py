"""GeoTIFF codec in pure numpy + stdlib zlib (TIFF 6.0 + GeoTIFF 1.1).

GDAL's flagship format, re-derived from the public specs (Adobe TIFF
6.0; OGC GeoTIFF 1.1) — the engine-facing subset of the reference's
GTiff driver (`frmts/gtiff/geotiff.cpp`): little-endian classic TIFF,
stripped OR tiled layout, None/Deflate(8) compression, sample types
uint8/uint16/int16/int32/uint32/float32/float64, contiguous multi-band
(PlanarConfig=1), georeferencing via ModelPixelScale + ModelTiepoint +
GeoKeyDirectory (geographic EPSG:4326 or projected CS codes, e.g.
EPSG:3857). Decode additionally accepts the common externally-produced
variants: LZW(5) and PackBits(32773) compression and the horizontal-
differencing Predictor(2) — the GDAL-default "COMPRESS=LZW
PREDICTOR=2" combination reads correctly. BigTIFF (version 43, 8-byte
offsets) encodes and decodes, with BIGTIFF=IF_NEEDED auto-switching.
`encode_cog` writes Cloud-Optimized GeoTIFF (tiled + embedded 2x
average overview IFD chain, smallest-overview-first data layout);
`decode_geotiff(ifd=N)` reads any level. JPEG-in-TIFF (new-style
compression 7, uint8 gray/RGB) encodes and decodes through the
pure-numpy baseline JPEG codec (`codecs/jpeg.py`), one standalone
stream per strip/tile. Decode also accepts PlanarConfig=2
(band-major strips) and legacy Deflate (32946). Out of scope
(documented): old-style JPEG(6), shared JPEGTables. The engine's distributed
pyramid lives in the tile table (`pipelines/tiles.py`); COG overviews
serve the interchange path.

Encode/decode are lossless (except JPEG, inherently lossy), so pixel
parity is bit-exact — the `geotiff_roundtrip` catalog query pins the
full write→read path against a closed-form SQL oracle.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import numpy as np

def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first codes, 9→12 bit
    widths with the spec's early-change increment, ClearCode=256,
    EOI=257. Streams written WITHOUT early change (old-style writers
    — e.g. PHOTOMOD PRF tiles) are retried with the late-change
    table rule, the same compat fallback libtiff applies."""
    try:
        return _lzw_decode_variant(data, early=True)
    except ValueError:
        return _lzw_decode_variant(data, early=False)


def _lzw_decode_variant(data: bytes, early: bool) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list = [bytes([i]) for i in range(256)] + [b"", b""]
    width, bitpos, total = 9, 0, len(data) * 8
    old: Optional[bytes] = None
    bump = -2 if early else -1  # early change: one slot sooner

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > total:
            return EOI
        b0 = bitpos >> 3
        chunk = int.from_bytes(data[b0:b0 + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        return code

    while True:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            del table[258:]
            width, old = 9, None
            continue
        if old is None:
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = old + old[:1]
            else:
                raise ValueError(f"corrupt LZW stream (code {code})")
            table.append(old + entry[:1])
            if len(table) == (1 << width) + bump and width < 12:
                width += 1
        out += entry
        old = entry
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (symmetric early-change convention)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9)."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i:i + 1] * (257 - n)
            i += 1
        # 128: noop
    return bytes(out)


def _undo_predictor2(raw: np.ndarray, rows: int, w: int, bands: int) -> np.ndarray:
    """Horizontal differencing (Predictor=2): per-row per-band
    wrapping prefix sum (vectorized np.add.accumulate per lane)."""
    kind = raw.dtype
    u = raw.view(np.dtype(f"u{kind.itemsize}")).reshape(rows, w, bands)
    np.add.accumulate(u, axis=1, dtype=u.dtype, out=u)
    return u.reshape(-1).view(kind)


def _apply_predictor2(arr: np.ndarray) -> np.ndarray:
    """arr (rows, w, bands) -> horizontally-differenced copy."""
    u = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
    d = u.copy()
    d[:, 1:, :] = u[:, 1:, :] - u[:, :-1, :]
    return d.view(arr.dtype)


# TIFF tag ids
_IMAGEWIDTH, _IMAGELENGTH = 256, 257
_BITSPERSAMPLE, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIPOFFSETS, _SAMPLESPERPIXEL, _ROWSPERSTRIP, _STRIPBYTECOUNTS = 273, 277, 278, 279
_PLANARCONFIG, _SAMPLEFORMAT = 284, 339
_PREDICTOR = 317
_TILEWIDTH, _TILELENGTH, _TILEOFFSETS, _TILEBYTECOUNTS = 322, 323, 324, 325
_MODELPIXELSCALE, _MODELTIEPOINT, _GEOKEYDIRECTORY = 33550, 33922, 34735
_GDAL_NODATA = 42113  # ASCII nodata value (frmts/gtiff GDAL_NODATA tag)

# TIFF field types
_T_SHORT, _T_LONG, _T_DOUBLE = 3, 4, 12
_T_LONG8 = 16  # BigTIFF 64-bit unsigned
_TYPE_SIZE = {2: 1, _T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8, _T_LONG8: 8}

# numpy dtype -> (bits, sample_format)  (1=uint, 2=int, 3=float)
_DTYPES = {
    np.dtype(np.uint8): (8, 1), np.dtype(np.uint16): (16, 1),
    np.dtype(np.int16): (16, 2), np.dtype(np.uint32): (32, 1),
    np.dtype(np.int32): (32, 2), np.dtype(np.float32): (32, 3),
    np.dtype(np.float64): (64, 3),
}
_BACK = {(bits, sf): dt for dt, (bits, sf) in _DTYPES.items()}


def _geokeys(epsg: Optional[int]):
    if epsg is None:
        return None
    if epsg == 4326:
        keys = [(1024, 0, 1, 2), (1025, 0, 1, 1), (2048, 0, 1, 4326)]
    else:  # projected CS code
        keys = [(1024, 0, 1, 1), (1025, 0, 1, 1), (3072, 0, 1, epsg)]
    head = [1, 1, 0, len(keys)]
    flat = head + [v for k in keys for v in k]
    return np.asarray(flat, dtype=np.uint16)


def encode_geotiff(arr: np.ndarray,
                   transform: Optional[Tuple[float, ...]] = None,
                   epsg: Optional[int] = None,
                   compression: str = "deflate",
                   tile_size: Optional[int] = None,
                   compress_level: int = 6,
                   predictor: int = 1,
                   bigtiff=None,
                   nodata=None) -> bytes:
    """(H, W) or (H, W, B) array -> GeoTIFF bytes.

    transform: GDAL-style (x0, px_w, rot, y0, rot, -px_h) affine; only
    north-up (zero rotation) encodes, as ModelPixelScale + tiepoint.
    tile_size: None -> stripped (one strip per 64 rows); else square
    TIFF tiles (must be a multiple of 16 per spec).
    bigtiff: True -> BigTIFF (version 43, 8-byte offsets — the
    `frmts/gtiff/` -co BIGTIFF=YES layout); None -> auto (classic
    unless the payload would overflow 32-bit offsets, GDAL's
    BIGTIFF=IF_NEEDED).
    """
    arr = np.ascontiguousarray(arr)
    if arr.dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    bits, sf = _DTYPES[arr.dtype]
    comp_code = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773,
                 "jpeg": 7}[compression]
    if comp_code == 7:
        # JPEG-in-TIFF (new-style, compression 7): standalone baseline
        # JPEG stream per strip/tile (no shared JPEGTables tag)
        if arr.dtype != np.uint8 or arr.shape[2] not in (1, 3):
            raise ValueError("JPEG-in-TIFF needs uint8, 1 or 3 bands")
        if predictor == 2:
            raise ValueError("Predictor does not apply to JPEG")
    if predictor == 2 and sf == 3:
        raise ValueError("Predictor=2 is integer-only (TIFF 6.0 §14)")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")

    def compress(block: np.ndarray) -> bytes:
        if comp_code == 7:
            from .jpeg import encode_jpeg

            img = block[:, :, 0] if bands == 1 else block
            return encode_jpeg(np.ascontiguousarray(img), quality=90)
        if predictor == 2:
            block = _apply_predictor2(block.reshape(block.shape[0], -1, bands))
        raw = block.tobytes()
        if comp_code == 8:
            return zlib.compress(raw, compress_level)
        if comp_code == 5:
            return _lzw_encode(raw)
        if comp_code == 32773:
            # literal-chunk PackBits (valid, run-collapsing left to
            # readers; decode handles both forms)
            out = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i:i + 128]
                out.append(len(chunk) - 1)
                out += chunk
            return bytes(out)
        return raw

    blocks = []
    if tile_size:
        if tile_size % 16:
            raise ValueError("TIFF tile size must be a multiple of 16")
        tw = th = tile_size
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                tile = np.zeros((th, tw, bands), dtype=arr.dtype)
                sub = arr[ty:ty + th, tx:tx + tw]
                tile[:sub.shape[0], :sub.shape[1]] = sub
                blocks.append(compress(tile))
    else:
        rows_per_strip = min(64, h)
        for y0 in range(0, h, rows_per_strip):
            blocks.append(compress(arr[y0:y0 + rows_per_strip]))

    entries = []  # (tag, type, count, value_or_bytes)

    def add(tag, typ, values):
        vals = np.atleast_1d(np.asarray(values))
        entries.append((tag, typ, len(vals), vals))

    add(_IMAGEWIDTH, _T_LONG, w)
    add(_IMAGELENGTH, _T_LONG, h)
    add(_BITSPERSAMPLE, _T_SHORT, [bits] * bands)
    add(_COMPRESSION, _T_SHORT, comp_code)
    add(_PHOTOMETRIC, _T_SHORT, 1)  # BlackIsZero
    add(_SAMPLESPERPIXEL, _T_SHORT, bands)
    add(_PLANARCONFIG, _T_SHORT, 1)
    add(_SAMPLEFORMAT, _T_SHORT, [sf] * bands)
    if predictor == 2:
        add(_PREDICTOR, _T_SHORT, 2)
    if tile_size:
        add(_TILEWIDTH, _T_SHORT, tile_size)
        add(_TILELENGTH, _T_SHORT, tile_size)
        add(_TILEOFFSETS, _T_LONG, [0] * len(blocks))      # patched below
        add(_TILEBYTECOUNTS, _T_LONG, [len(b) for b in blocks])
    else:
        add(_ROWSPERSTRIP, _T_LONG, min(64, h))
        add(_STRIPOFFSETS, _T_LONG, [0] * len(blocks))     # patched below
        add(_STRIPBYTECOUNTS, _T_LONG, [len(b) for b in blocks])
    if transform is not None:
        x0, pxw, _r0, y0t, _r1, neg_pxh = transform
        add(_MODELPIXELSCALE, _T_DOUBLE, [pxw, -neg_pxh, 0.0])
        add(_MODELTIEPOINT, _T_DOUBLE, [0.0, 0.0, 0.0, x0, y0t, 0.0])
    gk = _geokeys(epsg)
    if gk is not None:
        add(_GEOKEYDIRECTORY, _T_SHORT, gk)
    if nodata is not None:
        # GDAL writes the repr it parses back with atof; integral
        # floats print without the trailing .0 (frmts/gtiff)
        nd = float(nodata)
        txt = str(int(nd)) if nd == int(nd) else repr(nd)
        raw = txt.encode("ascii") + b"\x00"
        entries.append((_GDAL_NODATA, 2, len(raw),
                        np.frombuffer(raw, dtype=np.uint8)))

    entries.sort(key=lambda e: e[0])

    data_bytes = sum(len(b) for b in blocks)
    if bigtiff is None:  # GDAL BIGTIFF=IF_NEEDED
        bigtiff = data_bytes + 65536 > 0xFFFFFFFF

    if bigtiff:
        # BigTIFF (version 43): 16-byte header, u64 entry count,
        # 20-byte entries with 8-byte inline values, LONG8 offsets
        inline, off_typ, off_np = 8, _T_LONG8, "<u8"
        header_len, cnt_len, ent_len, next_len = 16, 8, 20, 8
    else:
        inline, off_typ, off_np = 4, _T_LONG, "<u4"
        header_len, cnt_len, ent_len, next_len = 8, 2, 12, 4

    # offsets/bytecounts tags were added as LONG; retype for bigtiff
    if bigtiff:
        retag = {_TILEOFFSETS, _STRIPOFFSETS}
        entries = [(tag, off_typ if tag in retag else typ, count, vals)
                   for tag, typ, count, vals in entries]

    # layout: header | IFD | overflow values | block data
    ifd_off = header_len
    ifd_size = cnt_len + ent_len * len(entries) + next_len
    overflow_off = ifd_off + ifd_size
    overflow = b""
    packed = []
    np_types = {2: "u1", _T_SHORT: "<u2", _T_LONG: "<u4", _T_DOUBLE: "<f8",
                _T_LONG8: "<u8"}
    ptr_fmt = "<Q" if bigtiff else "<I"
    for tag, typ, count, vals in entries:
        size = _TYPE_SIZE[typ] * count
        raw = np.asarray(vals).astype(np_types[typ]).tobytes()
        if size <= inline:
            packed.append((tag, typ, count, raw.ljust(inline, b"\0"),
                           None))
        else:
            packed.append((tag, typ, count,
                           struct.pack(ptr_fmt,
                                       overflow_off + len(overflow)),
                           tag))
            overflow += raw
    data_off = overflow_off + len(overflow)

    # patch strip/tile offsets now that data_off is known
    offsets = []
    pos = data_off
    for b in blocks:
        offsets.append(pos)
        pos += len(b)
    off_tag = _TILEOFFSETS if tile_size else _STRIPOFFSETS
    out_entries = []
    ov = bytearray(overflow)
    cnt_fmt = "<HHQ" if bigtiff else "<HHI"
    for tag, typ, count, val4, ov_tag in packed:
        if tag == off_tag:
            raw = np.asarray(offsets, dtype=off_np).tobytes()
            if len(raw) <= inline:
                val4 = raw.ljust(inline, b"\0")
            else:
                (at,) = struct.unpack(ptr_fmt, val4)
                ov[at - overflow_off:at - overflow_off + len(raw)] = raw
        out_entries.append(struct.pack(cnt_fmt, tag, typ, count) + val4)

    if bigtiff:
        header = b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
        ifd = (struct.pack("<Q", len(entries)) + b"".join(out_entries)
               + struct.pack("<Q", 0))
    else:
        header = b"II" + struct.pack("<HI", 42, ifd_off)
        ifd = (struct.pack("<H", len(entries)) + b"".join(out_entries)
               + struct.pack("<I", 0))
    return header + ifd + bytes(ov) + b"".join(blocks)


_NEWSUBFILETYPE = 254


def _downsample2x(arr: np.ndarray) -> np.ndarray:
    """2x average overview (GDAL 'average' resampling); odd edges
    replicate. Integer dtypes round-half-up like gdaladdo."""
    h, w, b = arr.shape
    if h % 2 or w % 2:
        arr = np.pad(arr, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    s = (arr[0::2, 0::2].astype(np.float64) + arr[1::2, 0::2]
         + arr[0::2, 1::2] + arr[1::2, 1::2]) / 4.0
    if np.issubdtype(arr.dtype, np.integer):
        s = np.floor(s + 0.5)
    return s.astype(arr.dtype)


def encode_cog(arr: np.ndarray,
               transform: Optional[Tuple[float, ...]] = None,
               epsg: Optional[int] = None,
               compression: str = "deflate",
               tile_size: int = 256,
               compress_level: int = 6) -> bytes:
    """Cloud-Optimized GeoTIFF: tiled full-resolution IFD + embedded
    2x 'average' overview IFDs (NewSubfileType=1), laid out per the
    public COG spec — header, then the whole IFD chain, then tile data
    with the SMALLEST overview first and full resolution last, so a
    range-reader gets metadata + low zoom from the file head
    (`frmts/gtiff/cogdriver.cpp` layout contract)."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if tile_size % 16:
        raise ValueError("TIFF tile size must be a multiple of 16")
    bits, sf = _DTYPES[arr.dtype]
    comp_code = {"none": 1, "lzw": 5, "deflate": 8,
                 "packbits": 32773}[compression]

    # page pyramid: halve until it fits one tile
    pages = [arr]
    while max(pages[-1].shape[0], pages[-1].shape[1]) > tile_size:
        pages.append(_downsample2x(pages[-1]))

    def tile_blocks(a):
        h, w, bands = a.shape
        blocks = []
        for ty in range(0, h, tile_size):
            for tx in range(0, w, tile_size):
                tile = np.zeros((tile_size, tile_size, bands),
                                dtype=a.dtype)
                sub = a[ty:ty + tile_size, tx:tx + tile_size]
                tile[:sub.shape[0], :sub.shape[1]] = sub
                raw = tile.tobytes()
                if comp_code == 8:
                    blocks.append(zlib.compress(raw, compress_level))
                elif comp_code == 5:
                    blocks.append(_lzw_encode(raw))
                elif comp_code == 32773:
                    out = bytearray()
                    for i in range(0, len(raw), 128):
                        chunk = raw[i:i + 128]
                        out.append(len(chunk) - 1)
                        out += chunk
                    blocks.append(bytes(out))
                else:
                    blocks.append(raw)
        return blocks

    def page_entries(a, level):
        h, w, bands = a.shape
        ent = []

        def add(tag, typ, values):
            vals = np.atleast_1d(np.asarray(values))
            ent.append((tag, typ, len(vals), vals))

        if level > 0:
            add(_NEWSUBFILETYPE, _T_LONG, 1)  # reduced-resolution
        add(_IMAGEWIDTH, _T_LONG, w)
        add(_IMAGELENGTH, _T_LONG, h)
        add(_BITSPERSAMPLE, _T_SHORT, [bits] * bands)
        add(_COMPRESSION, _T_SHORT, comp_code)
        add(_PHOTOMETRIC, _T_SHORT, 1)
        add(_SAMPLESPERPIXEL, _T_SHORT, bands)
        add(_PLANARCONFIG, _T_SHORT, 1)
        add(_SAMPLEFORMAT, _T_SHORT, [sf] * bands)
        add(_TILEWIDTH, _T_SHORT, tile_size)
        add(_TILELENGTH, _T_SHORT, tile_size)
        nblk = ((h + tile_size - 1) // tile_size) \
            * ((w + tile_size - 1) // tile_size)
        add(_TILEOFFSETS, _T_LONG, [0] * nblk)      # patched below
        add(_TILEBYTECOUNTS, _T_LONG, [0] * nblk)   # patched below
        if level == 0:
            if transform is not None:
                x0, pxw, _r0, y0t, _r1, neg_pxh = transform
                add(_MODELPIXELSCALE, _T_DOUBLE, [pxw, -neg_pxh, 0.0])
                add(_MODELTIEPOINT, _T_DOUBLE,
                    [0.0, 0.0, 0.0, x0, y0t, 0.0])
            gk = _geokeys(epsg)
            if gk is not None:
                add(_GEOKEYDIRECTORY, _T_SHORT, gk)
        ent.sort(key=lambda e: e[0])
        return ent

    all_blocks = [tile_blocks(p) for p in pages]
    all_entries = [page_entries(p, i) for i, p in enumerate(pages)]

    np_tt = {_T_SHORT: "<u2", _T_LONG: "<u4", _T_DOUBLE: "<f8"}
    # layout pass 1: IFD chain positions (each IFD then its overflow)
    pos = 8
    ifd_pos, ov_pos = [], []
    for ent in all_entries:
        ifd_pos.append(pos)
        pos += 2 + 12 * len(ent) + 4
        ov_pos.append(pos)
        pos += sum(_TYPE_SIZE[typ] * count
                   for _tag, typ, count, _v in ent
                   if _TYPE_SIZE[typ] * count > 4)
    # data: smallest overview first, full-res last
    data_order = list(range(len(pages) - 1, -1, -1))
    blk_off = []
    for pi in range(len(pages)):
        blk_off.append([0] * len(all_blocks[pi]))
    for pi in data_order:
        for bi, b in enumerate(all_blocks[pi]):
            blk_off[pi][bi] = pos
            pos += len(b)

    # emit
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_pos[0])
    for pi, ent in enumerate(all_entries):
        ov = bytearray()
        body = bytearray()
        for tag, typ, count, vals in ent:
            if tag == _TILEOFFSETS:
                vals = np.asarray(blk_off[pi])
            elif tag == _TILEBYTECOUNTS:
                vals = np.asarray([len(b) for b in all_blocks[pi]])
            raw = np.asarray(vals).astype(np_tt[typ]).tobytes()
            if len(raw) <= 4:
                val4 = raw.ljust(4, b"\0")
            else:
                val4 = struct.pack("<I", ov_pos[pi] + len(ov))
                ov += raw
            body += struct.pack("<HHI", tag, typ, count) + val4
        nxt = ifd_pos[pi + 1] if pi + 1 < len(all_entries) else 0
        out += struct.pack("<H", len(ent)) + bytes(body) \
            + struct.pack("<I", nxt) + bytes(ov)
    for pi in data_order:
        for b in all_blocks[pi]:
            out += b
    return bytes(out)


def decode_geotiff_meta(buf: bytes) -> dict:
    """Header-only decode: the IFD tags without touching pixel blocks
    (gdalinfo/gdaltindex contract — O(header) per file, not O(pixels))."""
    arr_meta = decode_geotiff(buf, meta_only=True)
    return arr_meta[1]


def decode_geotiff(buf: bytes, meta_only: bool = False, ifd: int = 0):
    """GeoTIFF bytes -> (array, meta).

    array: (H, W) or (H, W, B); meta: {width, height, bands, transform
    (GDAL 6-tuple or None), epsg (int or None), compression,
    overviews: [(w, h), ...] for reduced-resolution IFDs}. ifd selects
    which IFD decodes (0 = full resolution, 1+ = COG overviews).
    """
    if buf[:2] == b"II":
        fmt = "<"
    elif buf[:2] == b"MM":
        fmt = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = struct.unpack_from(fmt + "H", buf, 2)
    if magic == 42:
        (ifd_off,) = struct.unpack_from(fmt + "I", buf, 4)
        inline, ent_len, hdr = 4, 12, 2
        nent_fmt, cnt_fmt, ptr = "H", "I", "I"
    elif magic == 43:
        # BigTIFF: u16 offset-size (must be 8), u16 pad, u64 IFD offset
        osize, _pad, ifd_off = struct.unpack_from(fmt + "HHQ", buf, 4)
        if osize != 8:
            raise ValueError(f"BigTIFF offset size {osize} != 8")
        inline, ent_len, hdr = 8, 20, 8
        nent_fmt, cnt_fmt, ptr = "Q", "Q", "Q"
    else:
        raise ValueError(f"bad TIFF magic {magic}")
    np_types = {1: "u1", _T_SHORT: "u2", _T_LONG: "u4", _T_DOUBLE: "f8",
                2: "u1", 6: "i1", 8: "i2", 9: "i4", 11: "f4",
                _T_LONG8: "u8", 17: "i8"}

    def read_ifd(at):
        (n_entries,) = struct.unpack_from(fmt + nent_fmt, buf, at)
        t = {}
        for i in range(int(n_entries)):
            off = at + hdr + ent_len * i
            tag, typ = struct.unpack_from(fmt + "HH", buf, off)
            (count,) = struct.unpack_from(fmt + cnt_fmt, buf, off + 4)
            count = int(count)
            if typ not in np_types:
                continue
            size = np.dtype(np_types[typ]).itemsize * count
            voff_pos = off + 4 + struct.calcsize(cnt_fmt)
            if size <= inline:
                vals = np.frombuffer(buf, dtype=fmt + np_types[typ],
                                     count=count, offset=voff_pos)
            else:
                (voff,) = struct.unpack_from(fmt + ptr, buf, voff_pos)
                vals = np.frombuffer(buf, dtype=fmt + np_types[typ],
                                     count=count, offset=voff)
            t[tag] = vals
        (nxt,) = struct.unpack_from(
            fmt + ptr, buf, at + hdr + ent_len * int(n_entries))
        return t, int(nxt)

    # walk the IFD chain (COG overviews are reduced-resolution IFDs)
    chain = []
    at = ifd_off
    while at and len(chain) < 64:
        t, at = read_ifd(at)
        chain.append(t)
    if ifd >= len(chain):
        raise ValueError(f"IFD {ifd} out of range ({len(chain)} IFDs)")
    tags = chain[ifd]
    overviews = [(int(t[_IMAGEWIDTH][0]), int(t[_IMAGELENGTH][0]))
                 for t in chain[1:]]

    w = int(tags[_IMAGEWIDTH][0])
    h = int(tags[_IMAGELENGTH][0])
    bands = int(tags.get(_SAMPLESPERPIXEL, [1])[0])
    bits = int(tags[_BITSPERSAMPLE][0]) if _BITSPERSAMPLE in tags else 8
    sf = int(tags.get(_SAMPLEFORMAT, [1])[0])
    comp = int(tags.get(_COMPRESSION, [1])[0])
    planar = int(tags.get(_PLANARCONFIG, [1])[0])
    pred = int(tags.get(_PREDICTOR, [1])[0])
    if planar not in (1, 2):
        raise ValueError(f"unsupported PlanarConfig {planar}")
    if comp not in (1, 5, 7, 8, 32773, 32946):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if pred not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {pred}")
    dt = _BACK.get((bits, sf))
    if dt is None:
        raise ValueError(f"unsupported sample type bits={bits} fmt={sf}")
    dt = np.dtype(dt).newbyteorder(fmt)

    def decomp(off, cnt):
        raw = buf[off:off + cnt]
        if comp in (8, 32946):  # 32946 = legacy Deflate
            return zlib.decompress(raw)
        if comp == 5:
            return _lzw_decode(raw)
        if comp == 32773:
            return _packbits_decode(raw)
        return raw

    def block_array(off, cnt, rows, width):
        if comp == 7:
            from .jpeg import decode_jpeg

            img = decode_jpeg(buf[int(off):int(off) + int(cnt)])
            if img.ndim == 2:
                img = img[:, :, None]
            out7 = np.zeros((rows, width, bands), dtype=dt)
            out7[:img.shape[0], :img.shape[1]] = \
                img[:rows, :width].astype(dt)
            return out7
        a = np.frombuffer(decomp(int(off), int(cnt)), dtype=dt,
                          count=rows * width * bands).copy()
        if pred == 2:
            a = _undo_predictor2(a.astype(a.dtype.newbyteorder("=")),
                                 rows, width, bands)
        return a.reshape(rows, width, bands)

    out = np.zeros((h, w, bands) if not meta_only else (0, 0, bands),
                   dtype=dt)
    if meta_only:
        pass  # skip pixel blocks — tags only (gdalinfo contract)
    elif _TILEOFFSETS in tags:
        tw = int(tags[_TILEWIDTH][0])
        th = int(tags[_TILELENGTH][0])
        offs = tags[_TILEOFFSETS]
        cnts = tags[_TILEBYTECOUNTS]
        tiles_across = (w + tw - 1) // tw
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            tile = block_array(o, c, th, tw)
            ty, tx = (ti // tiles_across) * th, (ti % tiles_across) * tw
            out[ty:ty + th, tx:tx + tw] = tile[:min(th, h - ty), :min(tw, w - tx)]
    elif planar == 2:
        # PlanarConfig=2: strips are band-major — all strips of band
        # 1 first, each holding one band's rows (TIFF 6.0 §14)
        rps = int(tags.get(_ROWSPERSTRIP, [h])[0])
        offs = tags[_STRIPOFFSETS]
        cnts = tags[_STRIPBYTECOUNTS]
        spb = (h + rps - 1) // rps  # strips per band
        saved_bands = bands
        bands = 1                   # block_array decodes one plane
        for si, (o, c) in enumerate(zip(offs, cnts)):
            bi, ri = si // spb, si % spb
            y0 = ri * rps
            nrows = min(rps, h - y0)
            out[y0:y0 + nrows, :, bi] = block_array(o, c, nrows,
                                                    w)[:, :, 0]
        bands = saved_bands
    else:
        rps = int(tags.get(_ROWSPERSTRIP, [h])[0])
        offs = tags[_STRIPOFFSETS]
        cnts = tags[_STRIPBYTECOUNTS]
        for si, (o, c) in enumerate(zip(offs, cnts)):
            y0 = si * rps
            nrows = min(rps, h - y0)
            out[y0:y0 + nrows] = block_array(o, c, nrows, w)

    transform = None
    if _MODELPIXELSCALE in tags and _MODELTIEPOINT in tags:
        sx, sy = float(tags[_MODELPIXELSCALE][0]), float(tags[_MODELPIXELSCALE][1])
        tp = tags[_MODELTIEPOINT]
        # tiepoint maps raster (i,j) -> model (x,y): x0 = x - i*sx
        x0 = float(tp[3]) - float(tp[0]) * sx
        y0 = float(tp[4]) + float(tp[1]) * sy
        transform = (x0, sx, 0.0, y0, 0.0, -sy)
    epsg = None
    if _GEOKEYDIRECTORY in tags:
        gk = tags[_GEOKEYDIRECTORY]
        nkeys = int(gk[3])
        for k in range(nkeys):
            kid, loc, cnt, val = (int(v) for v in gk[4 + 4 * k:8 + 4 * k])
            if kid in (2048, 3072) and loc == 0:
                epsg = val
    nodata = None
    if _GDAL_NODATA in tags:
        try:
            nodata = float(tags[_GDAL_NODATA].tobytes()
                           .split(b"\x00")[0].decode("ascii"))
        except ValueError:
            pass
    arr = out[:, :, 0] if bands == 1 else out
    meta = {"width": w, "height": h, "bands": bands, "transform": transform,
            "epsg": epsg, "nodata": nodata,
            "compression": {1: "none", 5: "lzw", 7: "jpeg", 8: "deflate",
                            32946: "deflate", 32773: "packbits"}[comp],
            "dtype": str(np.dtype(dt).newbyteorder("=")),
            "overviews": overviews}
    return np.ascontiguousarray(arr), meta
