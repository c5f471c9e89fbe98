"""Header-file raw formats: PAux, MFF, MFF2 (HKV), GSC, DOQ1, DOQ2,
Terragen, Leveller.

Parity targets: frmts/raw/pauxdataset.cpp (PCI .aux ASCII —
RawDefinition pixels/lines/channels, ChanDefinition-N "type offset
pixoffset lineoffset Swapped|Unswapped", UpLeftX/LoRightY georef),
frmts/raw/mffdataset.cpp (MFF .hdr IMAGE_LINES/LINE_SAMPLES, band
files by extension initial (b=Byte, i=UInt16, j=CInt16, r=Float32,
x=CFloat32) or refined "type" (I*1/I*2/U*2/R*4/...), tiled variant
via tile_size_rows/columns with too-large-tile rejection),
frmts/raw/hkvdataset.cpp (MFF2: directory holding `attrib` +
`image_data` (+`georef`), pixel.size/encoding/field/order election),
frmts/raw/gscdataset.cpp (Fortran sequential records: int32 LE
record length == 4*pixels framed by markers, float32 data, band at
reclen*2+4 with stride reclen+8), frmts/raw/doq1dataset.cpp (fixed-
offset ASCII fields with D exponents: height@144/width@150/
band-types@156, data after 4 line records, georef ULX@288 ULY@312 of
record 2, pixel sizes @59/@71 of record 3), frmts/raw/doq2dataset.cpp
(BEGIN_USGS_DOQ_HEADER keyword block: SAMPLES_AND_LINES, BYTE_COUNT
skip, XY_ORIGIN, HORIZONTAL_RESOLUTION, BAND_CONTENT count),
frmts/terragen/terragendataset.cpp (16-byte TERRAGENTERRAIN magic +
SIZE/XPTS/YPTS/SCAL/ALTW chunks, int16 rows stored bottom-up),
frmts/leveller/levellerdataset.cpp (trrn v4-7 tag stream:
[len][name][u32 size][data], hf_w/hf_b dims, float32 hf_data rows
top-down).

Each file is small -> one Ray decode task via open_raster_path.
"""

from __future__ import annotations

import os
import re
import struct
from typing import Dict, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------- PAux

_PAUX_TYPES = {"8U": np.uint8, "16U": np.uint16, "16S": np.int16,
               "32R": np.float32}


def decode_paux(path: str) -> Tuple[np.ndarray, dict]:
    """path = raw file; sibling .aux holds the layout."""
    aux = path + ".aux"
    if not os.path.exists(aux):
        aux = os.path.splitext(path)[0] + ".aux"
    with open(aux, encoding="latin-1") as fh:
        lines = {}
        chans = []
        for line in fh:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            k, v = k.strip(), v.strip()
            if k.startswith("ChanDefinition-"):
                chans.append(v.split())
            else:
                lines[k] = v
    pixels, nlines, _nchan = map(int, lines["RawDefinition"].split())
    with open(path, "rb") as fh:
        raw = fh.read()
    bands = []
    for c in chans:
        dt = _PAUX_TYPES.get(c[0])
        if dt is None:
            raise ValueError(f"PAux: channel type {c[0]}")
        off, pixoff, lineoff = int(c[1]), int(c[2]), int(c[3])
        # PCI quirk (pauxdataset.cpp:664): "Swapped" means swapped
        # from big-endian, i.e. little-endian data
        swapped = len(c) > 4 and c[4].lower().startswith("swap")
        bo = "<" if swapped else ">"
        band = np.empty((nlines, pixels), dt)
        step = np.dtype(dt).itemsize
        for j in range(nlines):
            row = np.frombuffer(raw, np.dtype(dt).newbyteorder(bo),
                                pixels * max(1, pixoff // step),
                                off + j * lineoff)
            band[j] = row[::max(1, pixoff // step)][:pixels]
        bands.append(band)
    arr = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)
    meta: Dict[str, object] = {"transform": None}
    if "UpLeftX" in lines and "LoRightX" in lines:
        ulx, uly = float(lines["UpLeftX"]), float(lines["UpLeftY"])
        lrx, lry = float(lines["LoRightX"]), float(lines["LoRightY"])
        meta["transform"] = (ulx, (lrx - ulx) / pixels, 0.0, uly, 0.0,
                             -(uly - lry) / nlines)
    return arr, meta


# ----------------------------------------------------------------- MFF

_MFF_REFINED = {"I*1": np.uint8, "I*2": np.int16, "I*4": np.int32,
                "U*2": np.uint16, "U*4": np.uint32, "R*4": np.float32,
                "R*8": np.float64}
_MFF_EXT = {"b": np.uint8, "i": np.uint16, "r": np.float32}


def _read_kv(path: str, sep: str = "=") -> Dict[str, str]:
    out = {}
    with open(path, encoding="latin-1") as fh:
        for line in fh:
            if sep in line:
                k, v = line.split(sep, 1)
                out[k.strip()] = v.strip()
    return out


def decode_mff(path: str) -> Tuple[np.ndarray, dict]:
    hdr = _read_kv(path)
    ny = int(hdr.get("IMAGE_LINES") or hdr.get("no_lines") or 0)
    nx = int(hdr.get("LINE_SAMPLES") or hdr.get("no_pixels") or 0)
    if nx < 1 or ny < 1:
        raise ValueError("MFF: missing dimensions")
    tiled = "tile_size_rows" in hdr or "tile_size_columns" in hdr
    tny = int(hdr.get("tile_size_rows", 1) or 1)
    tnx = int(hdr.get("tile_size_columns", 1) or 1)
    if tiled and tnx * tny > (1 << 28):
        raise ValueError("MFF: too large tile")
    bo = ">" if hdr.get("BYTE_ORDER", "LSB").upper() == "MSB" else "<"
    base = os.path.splitext(path)[0]
    d = os.path.dirname(os.path.abspath(path)) or "."
    stem = os.path.basename(base)
    bands = []
    for fn in sorted(os.listdir(d)):
        froot, fext = os.path.splitext(fn)
        if froot != stem or not fext or fext.lower() == ".hdr":
            continue
        letter = fext[1:2].lower()
        dt = _MFF_REFINED.get(hdr.get("type", "")) or _MFF_EXT.get(letter)
        if dt is None:
            continue
        with open(os.path.join(d, fn), "rb") as fh:
            raw = fh.read()
        step = np.dtype(dt).itemsize
        if tiled:
            tx = (nx + tnx - 1) // tnx
            ty = (ny + tny - 1) // tny
            band = np.zeros((ty * tny, tx * tnx), dt)
            want = tnx * tny * step
            for t in range(tx * ty):
                chunk = raw[t * want:(t + 1) * want]
                tile = np.zeros(tnx * tny, dt)
                got = np.frombuffer(chunk,
                                    np.dtype(dt).newbyteorder(bo))
                tile[:len(got)] = got
                r, c = divmod(t, tx)
                band[r * tny:(r + 1) * tny, c * tnx:(c + 1) * tnx] = \
                    tile.reshape(tny, tnx)
            band = band[:ny, :nx]
        else:
            flat = np.zeros(nx * ny, dt)
            got = np.frombuffer(raw, np.dtype(dt).newbyteorder(bo),
                                min(len(raw) // step, nx * ny))
            flat[:len(got)] = got
            band = flat.reshape(ny, nx)
        bands.append(band)
    if not bands:
        raise ValueError("MFF: no band files found")
    arr = bands[0] if len(bands) == 1 else np.stack(bands, axis=-1)
    return arr, {"transform": None,
                 "projection": hdr.get("PROJECTION_NAME")}


# ---------------------------------------------------------- MFF2 (HKV)

_MFF2_SIZES = {(8, "unsigned"): np.uint8, (8, "twos-complement"): np.int8,
               (16, "unsigned"): np.uint16,
               (16, "twos-complement"): np.int16,
               (32, "unsigned"): np.uint32,
               (32, "twos-complement"): np.int32,
               (32, "ieee-754"): np.float32, (64, "ieee-754"): np.float64}


def _starred(v: str, default: str) -> str:
    m = re.search(r"\*(\S+)", v)
    return m.group(1) if m else default


def decode_mff2(path: str) -> Tuple[np.ndarray, dict]:
    """path = the dataset DIRECTORY (attrib + image_data)."""
    attrib = _read_kv(os.path.join(path, "attrib"))
    nx = int(attrib["extent.cols"])
    ny = int(attrib["extent.rows"])
    nbands = int(attrib.get("channel.enumeration", "1").split()[0])
    bits = int(attrib.get("pixel.size", "8"))
    enc = _starred(attrib.get("pixel.encoding", "*unsigned"), "unsigned")
    order = _starred(attrib.get("pixel.order", "*lsbf"), "lsbf")
    field = _starred(attrib.get("pixel.field", "*real"), "real")
    dt = _MFF2_SIZES.get((bits, enc))
    if dt is None or field != "real":
        raise ValueError(f"MFF2: unsupported pixel {bits}/{enc}/{field}")
    bo = ">" if order == "msbf" else "<"
    with open(os.path.join(path, "image_data"), "rb") as fh:
        raw = fh.read()
    data = np.frombuffer(raw, np.dtype(dt).newbyteorder(bo),
                         nx * ny * nbands)
    arr = data.reshape(ny, nx, nbands).astype(dt)
    if nbands == 1:
        arr = arr[:, :, 0]
    return arr, {"transform": None}


# ----------------------------------------------------------------- GSC

def decode_gsc(buf: bytes) -> Tuple[np.ndarray, dict]:
    reclen, pixels, nlines = struct.unpack_from("<3i", buf, 0)
    if pixels < 1 or nlines < 1 or pixels > 100000 or nlines > 100000 \
            or reclen != pixels * 4:
        raise ValueError("not a GSC grid")
    reclen += 8  # record length markers
    arr = np.zeros((nlines, pixels), np.float32)
    for j in range(nlines):
        off = reclen * 2 + 4 + j * reclen
        got = np.frombuffer(buf, "<f4",
                            min(pixels, max(0, (len(buf) - off) // 4)), off)
        arr[j, :len(got)] = got
    return arr, {"transform": None}


def identify_gsc(buf: bytes) -> bool:
    if len(buf) < 12:
        return False
    reclen, pixels, nlines = struct.unpack_from("<3i", buf, 0)
    return 1 <= pixels <= 100000 and 1 <= nlines <= 100000 and \
        reclen == pixels * 4


# ---------------------------------------------------------------- DOQ1

def _doq_field(buf: bytes, off: int, n: int) -> float:
    s = buf[off:off + n].replace(b"D", b"E").replace(b"d", b"E").strip()
    try:
        return float(s) if s else 0.0
    except ValueError:
        return 0.0


def decode_doq1(buf: bytes) -> Tuple[np.ndarray, dict]:
    nx = int(_doq_field(buf, 150, 6))
    ny = int(_doq_field(buf, 144, 6))
    band_types = int(_doq_field(buf, 156, 3))
    if nx < 1 or ny < 1 or nx > 25000 or ny > 25000 or band_types > 5:
        raise ValueError("not a DOQ1 file")
    npix = 1 if band_types < 5 else 3
    nline = npix * nx
    skip = 4 * nline
    if len(buf) < skip + nline * ny:
        raise ValueError("DOQ1: truncated image data")
    data = np.frombuffer(buf, np.uint8, nline * ny, skip)
    arr = data.reshape(ny, nx, npix)
    if npix == 1:
        arr = arr[:, :, 0]
    ulx = _doq_field(buf, nline * 2 + 288, 24)
    uly = _doq_field(buf, nline * 2 + 312, 24)
    xps = _doq_field(buf, nline * 3 + 59, 12)
    yps = _doq_field(buf, nline * 3 + 71, 12)
    return arr, {"transform": (ulx, xps, 0.0, uly, 0.0, -yps)}


# ---------------------------------------------------------------- DOQ2

def identify_doq2(buf: bytes) -> bool:
    return buf.lstrip()[:21].upper() == b"BEGIN_USGS_DOQ_HEADER"


def decode_doq2(buf: bytes) -> Tuple[np.ndarray, dict]:
    if not identify_doq2(buf):
        raise ValueError("not a DOQ2 file")
    nx = ny = 0
    skip = 0
    bpp = 1
    nband_content = 0
    ulx = uly = xps = yps = 0.0
    meta: Dict[str, object] = {}
    end = buf.find(b"END_USGS_DOQ_HEADER")
    header = buf[:end if end > 0 else 4096].decode("latin-1", "replace")
    for line in header.splitlines()[1:]:
        toks = line.split()
        if len(toks) < 2:
            continue
        key = toks[0].upper()
        if key == "SAMPLES_AND_LINES":
            nx, ny = int(toks[1]), int(toks[2])
        elif key == "BYTE_COUNT":
            skip = int(toks[1])
        elif key == "XY_ORIGIN":
            ulx, uly = float(toks[1]), float(toks[2])
        elif key == "HORIZONTAL_RESOLUTION":
            xps = yps = float(toks[1])
        elif key == "BAND_CONTENT":
            nband_content += 1
        elif key == "BITS_PER_PIXEL":
            bpp = int(toks[1]) // 8
        else:
            # doq2dataset.cpp tokenizes honoring quotes then rejoins:
            # quotes vanish, whitespace collapses, trailing comment kept
            meta[key] = " ".join(toks[1:]).replace('"', "")
    if nx < 1 or ny < 1:
        raise ValueError("DOQ2: missing SAMPLES_AND_LINES")
    nbands = bpp if bpp > 1 else max(1, nband_content)
    nline = nbands * nx
    avail = max(0, (len(buf) - skip) // nline)
    data = np.zeros(ny * nline, np.uint8)
    got = np.frombuffer(buf, np.uint8, min(ny, avail) * nline, skip)
    data[:len(got)] = got
    arr = data.reshape(ny, nx, nbands)
    if nbands == 1:
        arr = arr[:, :, 0]
    return arr, {"transform": (ulx, xps, 0.0, uly, 0.0, -yps),
                 "metadata": meta}


# ------------------------------------------------------------ Terragen

def identify_terragen(buf: bytes) -> bool:
    return buf[:16] == b"TERRAGENTERRAIN "


def decode_terragen(buf: bytes) -> Tuple[np.ndarray, dict]:
    """-> int16 array (raw heights; real value = SCAL/65536*hs*v +
    SCAL*bh, exposed via meta scale/offset like the reference band)."""
    if not identify_terragen(buf):
        raise ValueError("not a Terragen terrain file")
    pos = 16
    size = struct.unpack_from("<H", buf, pos + 4)[0]
    pos += 8
    xpts = ypts = size + 1
    scal = 30.0
    hs = bs = 0
    data_off = None
    while pos + 4 <= len(buf):
        tag = buf[pos:pos + 4]
        pos += 4
        if tag == b"XPTS":
            xpts = struct.unpack_from("<H", buf, pos)[0]
            pos += 4
        elif tag == b"YPTS":
            ypts = struct.unpack_from("<H", buf, pos)[0]
            pos += 4
        elif tag == b"SCAL":
            scal = struct.unpack_from("<3f", buf, pos)[1]
            pos += 12
        elif tag == b"CRAD":
            pos += 4
        elif tag == b"CRVM":
            pos += 4
        elif tag == b"ALTW":
            hs, bs = struct.unpack_from("<2h", buf, pos)
            data_off = pos + 4
            pos += 4 + xpts * ypts * 2
        elif tag == b"EOF ":
            break
        else:
            break
    if data_off is None:
        raise ValueError("Terragen: no ALTW chunk")
    data = np.frombuffer(buf, "<i2", xpts * ypts, data_off)
    arr = data.reshape(ypts, xpts)[::-1].astype(np.int16)  # bottom-up
    return arr, {"transform": None, "scale": scal / 65536.0 * hs,
                 "offset": scal * bs, "units": "m"}


def encode_terragen(arr: np.ndarray) -> bytes:
    a = np.asarray(arr).astype(np.int16)
    ny, nx = a.shape
    out = [b"TERRAGENTERRAIN "]
    out.append(b"SIZE" + struct.pack("<Hxx", min(nx, ny) - 1))
    out.append(b"XPTS" + struct.pack("<Hxx", nx))
    out.append(b"YPTS" + struct.pack("<Hxx", ny))
    out.append(b"SCAL" + struct.pack("<3f", 30.0, 30.0, 30.0))
    out.append(b"ALTW" + struct.pack("<2h", 1, 0))
    out.append(np.ascontiguousarray(a[::-1], "<i2").tobytes())
    out.append(b"EOF ")
    return b"".join(out)


# ------------------------------------------------------------ Leveller

def identify_leveller(buf: bytes) -> bool:
    return buf[:4] == b"trrn" and 4 <= buf[4] <= 12


def _leveller_tags(buf: bytes):
    pos = 5
    while pos < len(buf):
        dlen = buf[pos]
        if dlen == 0 or dlen > 64 or pos + 1 + dlen + 4 > len(buf):
            return
        name = buf[pos + 1:pos + 1 + dlen].decode("latin-1")
        datalen = struct.unpack_from("<I", buf, pos + 1 + dlen)[0]
        data_off = pos + 1 + dlen + 4
        yield name, data_off, datalen
        pos = data_off + datalen


def decode_leveller(buf: bytes) -> Tuple[np.ndarray, dict]:
    if not identify_leveller(buf):
        raise ValueError("not a Leveller heightfield")
    tags = {n: (o, ln) for n, o, ln in _leveller_tags(buf)}
    if "hf_w" not in tags or "hf_data" not in tags:
        raise ValueError("Leveller: missing heightfield tags")
    nx = struct.unpack_from("<i", buf, tags["hf_w"][0])[0]
    ny = struct.unpack_from("<i", buf, tags["hf_b"][0])[0]
    off, dlen = tags["hf_data"]
    data = np.frombuffer(buf, "<f4", nx * ny, off)
    arr = data.reshape(ny, nx).astype(np.float32)  # rows top-down
    meta: Dict[str, object] = {"transform": None, "version": buf[4]}
    for name, key in (("hf_worldspacing", "world_spacing"),
                      ("hf_elevscale", "scale"),
                      ("hf_elevoffset", "offset")):
        if name in tags and tags[name][1] >= 4:
            meta[key] = struct.unpack_from("<f", buf, tags[name][0])[0]
    return arr, meta
