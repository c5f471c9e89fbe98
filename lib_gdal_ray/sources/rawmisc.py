"""Misc raw-binary / ASCII raster drivers: EIR, GenBin, ISCE, ROI_PAC,
NDF (NLAPS), SNODAS, NOAA_B, CTG, NGSGEOID, LOSLAS, NSIDCbin.

Parity targets (reference file:line cited per format):
- EIR (Erdas Imagine Raw): `frmts/raw/eirdataset.cpp:278-400` —
  IMAGINE_RAW_FILE keyword header, WIDTH/HEIGHT/NUM_LAYERS,
  PIXEL_FILES sibling, FORMAT BIL/BIP/BSQ, DATATYPE U1..F64,
  BYTE_ORDER LSB/MSB (default MSB), DATA_OFFSET.
- GenBin (Generic Binary .hdr): `frmts/raw/genbindataset.cpp:424-710`
  — "KEY: value" header with BANDS/ROWS/COLS/INTERLEAVING/DATATYPE/
  BYTE_ORDER; GT from UL/LR pixel-center coordinates spread over
  (n-1) steps then shifted out half a pixel.
- ISCE: `frmts/raw/iscedataset.cpp` — <imageFile> XML sibling with
  WIDTH/LENGTH/DATA_TYPE/SCHEME properties and Coordinate1/2
  startingValue/delta as the geotransform (no half-pixel shift).
- ROI_PAC: `frmts/raw/roipacdataset.cpp` — .rsc sibling WIDTH/
  FILE_LENGTH/X_FIRST/X_STEP...; dtype by extension (.dem int16,
  .int/.slc cfloat32, .flg byte, .cor/.hgt/.unw 2-band RMG float32).
- NDF (NLAPS): `frmts/raw/ndfdataset.cpp:116-340` — KEY=VALUE;
  header, BANDn_FILENAME byte rasters, GT from pixel-center corner
  fields spread over (n-1) and shifted by half a pixel (incl. the
  cross terms).
- SNODAS: `frmts/raw/snodasdataset.cpp` — "Key: value" .hdr,
  big-endian int16 .dat sibling, GT from min/max axis coordinates.
- NOAA_B: `frmts/raw/noaabdataset.cpp` — fortran-blocked binary:
  52-byte header record (4 f64 SWlat/SWlon/dlat/dlon + 3 i32
  rows/cols/kind, either endianness), rows stored south->north with
  4-byte record framing; kind 0=int32 1=float32 else int16.
- CTG (USGS LULC): `frmts/ctg/ctgdataset.cpp:212-440` — 80-char
  records; header rows/cols/cellsize/zone; each data record carries
  a cell's UTM position plus 6 themed values (6 int32 bands).
- NGSGEOID: `frmts/ngsgeoid/ngsgeoiddataset.cpp:121-230` — 44-byte
  header (SLAT WLON DLAT DLON f64 + NLAT NLON IKIND i32, LE or BE
  detected from IKIND==1), float32 rows south->north.
- LOSLAS: `frmts/raw/loslasdataset.cpp:139-215` — NADGRD/GEOGRD tag
  at byte 56, i32 nx/ny at 64, f32 grid spec at 76, fortran-framed
  float32 rows bottom-up.
- NSIDCbin: `frmts/raw/nsidcbindataset.cpp` — 300-byte ASCII header
  of 6-char fields (columns at 6, rows at 12), byte data, polar
  stereographic grids keyed by ANTARCTIC/ARCTIC in the title.

Truncated-file tolerance: the reference's RawRasterBand reads lazily
so its autotest fixtures are legally truncated; decoders here accept
``window=(xoff, yoff, xsize, ysize)`` to decode just the pinned
window, and otherwise zero-pad short payloads (flagged in meta).
"""

from __future__ import annotations

import os
import re
import struct
from typing import Optional, Tuple

import numpy as np

Window = Optional[Tuple[int, int, int, int]]


def _window(arr: np.ndarray, window: Window) -> np.ndarray:
    if window is None:
        return arr
    x, y, w, h = window
    return arr[y:y + h, x:x + w]


def _from_raw(raw: bytes, dt: np.dtype, rows: int, cols: int, bands: int,
              layout: str, offset: int = 0):
    """Decode a BIL/BIP/BSQ raw payload to (rows, cols[, bands]),
    zero-padding when the file is shorter than the declared grid."""
    need = rows * cols * bands
    avail = max(0, (len(raw) - offset) // dt.itemsize)
    data = np.frombuffer(raw, dtype=dt, count=min(need, avail),
                         offset=offset)
    truncated = len(data) < need
    if truncated:
        data = np.concatenate([data, np.zeros(need - len(data), dt)])
    layout = layout.upper()
    if layout in ("BSQ", "NA"):
        arr = data.reshape(bands, rows, cols).transpose(1, 2, 0)
    elif layout == "BIP":
        arr = data.reshape(rows, cols, bands)
    else:  # BIL
        arr = data.reshape(rows, bands, cols).transpose(0, 2, 1)
    if bands == 1:
        arr = arr[:, :, 0]
    return np.ascontiguousarray(arr), truncated


# ------------------------------------------------------------------ EIR

_EIR_DT = {"U1": np.uint8, "U2": np.uint8, "U4": np.uint8,
           "U8": np.uint8, "U16": np.uint16, "U32": np.uint32,
           "S16": np.int16, "S32": np.int32,
           "F32": np.float32, "F64": np.float64}


def identify_eir(buf: bytes) -> bool:
    return buf.lstrip()[:16].startswith(b"IMAGINE_RAW_FILE")


def decode_eir(path: str, window: Window = None):
    with open(path, "r", errors="replace") as f:
        lines = [ln.strip() for ln in f.read().splitlines()]
    if not lines or lines[0] != "IMAGINE_RAW_FILE":
        raise ValueError("not an EIR header")
    cols = rows = bands = 0
    pixfile, layout, dtname, order, skip = None, "BIL", "U8", "M", 0
    for ln in lines[1:]:
        if ln == "END_RAW_FILE":
            break
        tok = ln.split()
        if len(tok) < 2:
            continue
        k = tok[0].upper()
        if k == "WIDTH":
            cols = int(tok[1])
        elif k == "HEIGHT":
            rows = int(tok[1])
        elif k == "NUM_LAYERS":
            bands = int(tok[1])
        elif k == "PIXEL_FILES":
            pixfile = tok[1]
        elif k == "FORMAT":
            layout = tok[1].upper()
        elif k in ("DATATYPE", "DATA_TYPE"):
            dtname = tok[1].upper()
        elif k == "BYTE_ORDER":
            order = tok[1][0].upper()
        elif k == "DATA_OFFSET":
            skip = int(tok[1])
    if cols <= 0 or rows <= 0 or bands <= 0 or pixfile is None:
        raise ValueError("EIR: incomplete header")
    dt = np.dtype(_EIR_DT[dtname]).newbyteorder(
        "<" if order == "L" else ">")
    raw = open(os.path.join(os.path.dirname(path), pixfile), "rb").read()
    arr, trunc = _from_raw(raw, dt, rows, cols, bands, layout, skip)
    arr = np.ascontiguousarray(_window(arr, window))
    return arr.astype(arr.dtype.newbyteorder("=")), \
        {"transform": None, "truncated": trunc}


# --------------------------------------------------------------- GenBin

_GENBIN_DT = {"U8": np.uint8, "U16": np.uint16, "S16": np.int16,
              "F32": np.float32, "F64": np.float64,
              "U1": np.uint8, "U2": np.uint8, "U4": np.uint8}


def parse_genbin_header(path: str) -> dict:
    hdr = {}
    key = None
    for ln in open(path, "r", errors="replace"):
        if ln[:1] in ("\t", " ") and key == "PROJECTION_PARAMETERS":
            hdr.setdefault(key, []).append(float(ln.strip()))
            continue
        if ":" not in ln:
            continue
        k, v = ln.split(":", 1)
        key = k.strip().upper()
        if key != "PROJECTION_PARAMETERS":
            hdr[key] = v.strip()
    return hdr


def decode_genbin(path: str, window: Window = None):
    base = path[:path.rfind(".")] if "." in os.path.basename(path) else path
    hdrpath = base + ".hdr"
    if not os.path.exists(hdrpath):
        hdrpath = path
        for ext in (".bil", ".bsq", ".bip"):
            if os.path.exists(base + ext):
                path = base + ext
                break
    hdr = parse_genbin_header(hdrpath)
    bands = int(hdr["BANDS"])
    rows = int(hdr["ROWS"])
    cols = int(hdr["COLS"])
    layout = hdr.get("INTERLEAVING", "BIL")
    dtname = hdr.get("DATATYPE", "U8").upper()
    dt = np.dtype(_GENBIN_DT[dtname])
    if hdr.get("BYTE_ORDER", "NA").upper() == "LSB":
        dt = dt.newbyteorder("<")
    else:
        dt = dt.newbyteorder(">")
    raw = open(path, "rb").read()
    arr, trunc = _from_raw(raw, dt, rows, cols, bands, layout)
    meta = {"transform": None, "truncated": trunc}
    if rows > 1 and cols > 1 and "UL_X_COORDINATE" in hdr:
        ulx, uly = float(hdr["UL_X_COORDINATE"]), float(
            hdr["UL_Y_COORDINATE"])
        lrx, lry = float(hdr["LR_X_COORDINATE"]), float(
            hdr["LR_Y_COORDINATE"])
        px = (lrx - ulx) / (cols - 1)
        py = (lry - uly) / (rows - 1)
        meta["transform"] = (ulx - px * 0.5, px, 0.0,
                             uly - py * 0.5, 0.0, py)
    if hdr.get("PROJECTION_NAME", "").upper().startswith("STATE PLANE") \
            and hdr.get("PROJECTION_ZONE"):
        meta["state_plane_zone"] = int(hdr["PROJECTION_ZONE"])
    elif hdr.get("PROJECTION_NAME", "").upper() == "UTM" \
            and hdr.get("PROJECTION_ZONE"):
        meta["utm_zone"] = int(hdr["PROJECTION_ZONE"])
    arr = np.ascontiguousarray(_window(arr, window))
    return arr.astype(arr.dtype.newbyteorder("=")), meta


# ----------------------------------------------------------------- ISCE

_ISCE_DT = {"BYTE": np.uint8, "SHORT": np.int16, "INT": np.int32,
            "LONG": np.int64, "FLOAT": np.float32, "DOUBLE": np.float64,
            "CFLOAT": np.complex64, "CDOUBLE": np.complex128}


def decode_isce(path: str, window: Window = None):
    import xml.etree.ElementTree as ET

    xmlpath = path + ".xml"
    root = ET.parse(xmlpath).getroot()
    props = {}
    for p in root.findall("property"):
        v = p.find("value")
        if v is not None and v.text is not None:
            props[p.get("name", "").upper()] = v.text.strip()
    coords = {}
    for comp in root.findall("component"):
        cp = {}
        for p in comp.findall("property"):
            v = p.find("value")
            if v is not None and v.text is not None:
                cp[p.get("name", "").lower()] = v.text.strip()
        coords[comp.get("name", "")] = cp
    cols = int(props["WIDTH"])
    rows = int(props["LENGTH"])
    bands = int(props.get("NUMBER_BANDS", "1"))
    layout = props.get("SCHEME", "BIP")
    dt = np.dtype(_ISCE_DT[props.get("DATA_TYPE", "FLOAT").upper()])
    if props.get("BYTE_ORDER", "l").lower().startswith("b"):
        dt = dt.newbyteorder(">")
    else:
        dt = dt.newbyteorder("<")
    raw = open(path, "rb").read()
    arr, trunc = _from_raw(raw, dt, rows, cols, bands, layout)
    meta = {"transform": None, "truncated": trunc,
            "isce_metadata": {k: v for k, v in props.items()}}
    c1, c2 = coords.get("Coordinate1"), coords.get("Coordinate2")
    if c1 and c2 and "startingvalue" in c1 and "startingvalue" in c2:
        meta["transform"] = (float(c1["startingvalue"]),
                             float(c1["delta"]), 0.0,
                             float(c2["startingvalue"]), 0.0,
                             float(c2["delta"]))
        meta["epsg"] = 4326
    arr = np.ascontiguousarray(_window(arr, window))
    return arr.astype(arr.dtype.newbyteorder("=")), meta


# --------------------------------------------------------------- ROIPAC

def _roipac_dtype(path: str):
    ext = path.lower().rsplit(".", 1)[-1]
    # roipacdataset.cpp: dtype + band layout by extension
    if ext in ("raw",):
        return np.uint8, 1, "BIP"
    if ext == "flg":
        return np.uint8, 1, "BIP"
    if ext == "dem":
        return np.int16, 1, "BIP"
    if ext in ("int", "slc"):
        return np.complex64, 1, "BIP"
    if ext in ("cor", "hgt", "unw", "msk", "trans"):
        return np.float32, 2, "RMG"  # line-interleaved pair
    if ext == "amp":
        return np.float32, 2, "BIP"
    raise ValueError(f"ROI_PAC: unknown extension .{ext}")


def decode_roipac(path: str, window: Window = None):
    rsc = {}
    for ln in open(path + ".rsc", "r", errors="replace"):
        tok = ln.split(None, 1)
        if len(tok) == 2:
            rsc[tok[0].upper()] = tok[1].strip()
    cols = int(rsc["WIDTH"])
    rows = int(rsc["FILE_LENGTH"])
    dt, bands, layout = _roipac_dtype(path)
    dtl = np.dtype(dt).newbyteorder("<")
    raw = open(path, "rb").read()
    if layout == "RMG":  # two bands interleaved by line (BIL)
        arr, trunc = _from_raw(raw, dtl, rows, cols, bands, "BIL")
    else:
        arr, trunc = _from_raw(raw, dtl, rows, cols, bands, layout)
    meta = {"transform": None, "truncated": trunc, "roipac_metadata": rsc}
    if "X_FIRST" in rsc:
        meta["transform"] = (float(rsc["X_FIRST"]), float(rsc["X_STEP"]),
                             0.0, float(rsc["Y_FIRST"]), 0.0,
                             float(rsc["Y_STEP"]))
    if rsc.get("PROJECTION", "").upper() == "LL":
        meta["epsg"] = 4326
    if "Z_OFFSET" in rsc:
        meta["offset"] = float(rsc["Z_OFFSET"])
    if "Z_SCALE" in rsc:
        meta["scale"] = float(rsc["Z_SCALE"])
    arr = np.ascontiguousarray(_window(arr, window))
    return arr.astype(arr.dtype.newbyteorder("=")), meta


# ------------------------------------------------------------------ NDF

def identify_ndf(buf: bytes) -> bool:
    head = buf[:20].upper()
    return head.startswith(b"NDF_REVISION=2") or \
        head.startswith(b"NDF_REVISION=0")


def decode_ndf(path: str, window: Window = None):
    hdr = {}
    for ln in open(path, "r", errors="replace"):
        ln = ln.strip().rstrip(";")
        if "=" in ln:
            k, v = ln.split("=", 1)
            hdr[k.strip().upper()] = v.strip()
    if hdr.get("PIXEL_FORMAT", "").upper() != "BYTE" or \
            hdr.get("BITS_PER_PIXEL") != "8":
        raise ValueError("NDF: only 8-bit BYTE supported (like GDAL)")
    cols = int(hdr["PIXELS_PER_LINE"])
    rows = int(hdr["LINES_PER_DATA_FILE"])
    bands = int(hdr.get("NUMBER_OF_BANDS_IN_VOLUME",
                        hdr.get("NUMBER_OF_DATA_FILES", "1")))
    dirname = os.path.dirname(path)
    stem = os.path.basename(path)
    stem = stem[:stem.rfind(".")] if "." in stem else stem
    planes = []
    trunc = False
    for b in range(1, bands + 1):
        fn = hdr.get(f"BAND{b}_FILENAME", f"{stem}.I{b}")
        raw = open(os.path.join(dirname, fn), "rb").read()
        plane, t = _from_raw(raw, np.dtype(np.uint8), rows, cols, 1, "BIP")
        trunc = trunc or t
        planes.append(plane)
    arr = planes[0] if bands == 1 else np.stack(planes, axis=-1)
    meta = {"transform": None, "truncated": trunc, "ndf_header": hdr}
    ul = hdr.get("UPPER_LEFT_CORNER", "").split(",")
    ur = hdr.get("UPPER_RIGHT_CORNER", "").split(",")
    llc = hdr.get("LOWER_LEFT_CORNER", "").split(",")
    if len(ul) == 4 and len(ur) == 4 and len(llc) == 4:
        g1 = (float(ur[2]) - float(ul[2])) / (cols - 1)
        g2 = (float(ur[3]) - float(ul[3])) / (cols - 1)
        g4 = (float(llc[2]) - float(ul[2])) / (rows - 1)
        g5 = (float(llc[3]) - float(ul[3])) / (rows - 1)
        meta["transform"] = (float(ul[2]) - g1 * 0.5 - g4 * 0.5, g1, g2,
                             float(ul[3]) - g2 * 0.5 - g5 * 0.5, g4, g5)
    if hdr.get("MAP_PROJECTION_NAME", "").upper().startswith("UTM") and \
            hdr.get("USGS_MAP_ZONE"):
        meta["utm_zone"] = int(hdr["USGS_MAP_ZONE"])
    arr = np.ascontiguousarray(_window(arr, window))
    return arr, meta


# --------------------------------------------------------------- SNODAS

def identify_snodas(buf: bytes) -> bool:
    return buf[:15] == b"Format version:" and b"NOHRSC" in buf[:80]


def decode_snodas(path: str, window: Window = None):
    hdr = {}
    for ln in open(path, "r", errors="replace"):
        if ":" not in ln:
            continue
        k, v = ln.split(":", 1)
        hdr[k.strip()] = v.strip()
    cols = int(hdr["Number of columns"])
    rows = int(hdr["Number of rows"])
    datpath = os.path.join(os.path.dirname(path),
                           os.path.basename(hdr.get("Data file pathname",
                                                    "")))
    if not os.path.exists(datpath):
        datpath = path[:path.rfind(".")] + ".dat"
    raw = open(datpath, "rb").read()
    arr, trunc = _from_raw(raw, np.dtype(np.int16).newbyteorder(">"),
                           rows, cols, 1, "BIP")
    minx = float(hdr["Minimum x-axis coordinate"])
    maxx = float(hdr["Maximum x-axis coordinate"])
    miny = float(hdr["Minimum y-axis coordinate"])
    maxy = float(hdr["Maximum y-axis coordinate"])
    meta = {"transform": (minx, (maxx - minx) / cols, 0.0,
                          maxy, 0.0, -(maxy - miny) / rows),
            "truncated": trunc, "epsg": 4326}
    if "No data value" in hdr:
        meta["nodata"] = float(hdr["No data value"])
    if "Minimum data value" in hdr:
        meta["min"] = float(hdr["Minimum data value"])
    if "Maximum data value" in hdr:
        meta["max"] = float(hdr["Maximum data value"])
    arr = np.ascontiguousarray(_window(arr, window))
    return arr.astype(np.int16), meta


# --------------------------------------------------------------- NOAA_B

def _noaa_b_header(buf: bytes, big: bool):
    e = ">" if big else "<"
    swlat, swlon, dlat, dlon = struct.unpack_from(e + "4d", buf, 4)
    rows, cols, kind = struct.unpack_from(e + "3i", buf, 36)
    return swlat, swlon, dlat, dlon, rows, cols, kind


def identify_noaa_b(buf: bytes, path: str = "") -> bool:
    if len(buf) < 52 or (path and not path.lower().endswith(".b")):
        return False
    return _noaa_b_detect(buf) is not None


def _noaa_b_detect(buf: bytes):
    """Reference order: big-endian interpretation tried FIRST
    (noaabdataset.cpp:142-163) — a BE header can also pass the LE
    sanity checks as denormal doubles."""
    if len(buf) < 52:
        return None
    for big in (True, False):
        try:
            swlat, swlon, dlat, dlon, rows, cols, kind = \
                _noaa_b_header(buf, big)
        except struct.error:
            return None
        if (abs(swlat) <= 90 and abs(swlon) <= 360
                and 0 < dlat <= 1 and 0 < dlon <= 1
                and rows > 0 and swlat + (rows - 1) * dlat <= 90
                and cols > 0 and (cols - 1) * dlon <= 360
                and -1 <= kind <= 2):
            return big
    return None


def decode_noaa_b(buf: bytes, window: Window = None):
    big = _noaa_b_detect(buf)
    if big is None:
        raise ValueError("not a NOAA .b grid")
    swlat, swlon, dlat, dlon, rows, cols, kind = _noaa_b_header(buf, big)
    e = ">" if big else "<"
    dt = np.dtype({0: np.int32, 1: np.float32}.get(kind, np.int16))
    dt = dt.newbyteorder(e)
    line = 4 + cols * dt.itemsize + 4
    out = np.zeros((rows, cols), dt.newbyteorder("="))
    for r in range(rows):  # rows stored south->north
        off = 52 + (rows - 1 - r) * line + 4
        out[r] = np.frombuffer(buf, dt, cols, off)
    gt = (swlon - dlon / 2, dlon, 0.0,
          swlat + (rows - 1) * dlat + dlat / 2, 0.0, -dlat)
    arr = np.ascontiguousarray(_window(out, window))
    return arr, {"transform": gt, "epsg": 4269}


# ------------------------------------------------------------------ CTG

_CTG_BAND_NAMES = (
    "Land Use and Land Cover", "Political units",
    "Census county subdivisions and SMSA tracts", "Hydrologic units",
    "Federal land ownership", "State land ownership")


def identify_ctg(buf: bytes, path: str = "") -> bool:
    if len(buf) < 400:
        return False
    head = buf[:400]
    if any(c > 127 for c in head):
        return False
    try:
        rows = int(head[0:10])
        cols = int(head[20:30])
        mincol = int(head[80:85])
        minrow = int(head[85:90])
        maxcol = int(head[90:95])
        maxrow = int(head[95:100])
    except ValueError:
        return False
    return (rows > 0 and cols > 0 and mincol == 1 and minrow == 1
            and maxrow == rows and maxcol == cols)


def decode_ctg(buf: bytes, window: Window = None):
    txt = bytes(buf)

    def field(off, length):
        return txt[off:off + length].decode("ascii", "replace").strip()

    rows = int(field(0, 10))
    cols = int(field(20, 10))
    cell = int(field(35, 5))
    zone = int(field(50, 5))
    nwe = int(field(3 * 80 + 40, 10))
    nwn = int(field(3 * 80 + 50, 10))
    arr = np.zeros((rows, cols, 6), np.int32)
    pos = 5 * 80
    while pos + 80 <= len(txt):
        rec = txt[pos:pos + 80]
        pos += 80
        try:
            easting = int(rec[3:11]) - cell // 2
            northing = int(rec[11:19]) + cell // 2
        except ValueError:
            continue
        i = (easting - nwe) // cell
        j = (nwn - northing) // cell
        if 0 <= i < cols and 0 <= j < rows:
            for b in range(6):
                f = rec[20 + 10 * b:30 + 10 * b].strip()
                if f:
                    arr[j, i, b] = int(f)
    gt = (float(nwe - cell // 2), float(cell), 0.0,
          float(nwn + cell // 2), 0.0, float(-cell))
    arr = np.ascontiguousarray(_window(arr, window))
    return arr, {"transform": gt, "epsg": 32600 + zone, "nodata": 0.0,
                 "band_descriptions": list(_CTG_BAND_NAMES)}


# ------------------------------------------------------------- NGSGEOID

def identify_ngsgeoid(buf: bytes) -> bool:
    if len(buf) < 44:
        return False
    for e in ("<", ">"):
        if struct.unpack_from(e + "i", buf, 40)[0] == 1:
            slat, wlon, dlat, dlon = struct.unpack_from(e + "4d", buf, 0)
            nlat, nlon = struct.unpack_from(e + "2i", buf, 32)
            if (nlat > 0 and nlon > 0 and dlat > 1e-15 and dlon > 1e-15
                    and -90 <= slat and slat + nlat * dlat <= 90
                    and -180 <= wlon and wlon + nlon * dlon <= 360):
                return True
    return False


def decode_ngsgeoid(buf: bytes, window: Window = None):
    e = None
    for cand in ("<", ">"):
        if struct.unpack_from(cand + "i", buf, 40)[0] == 1:
            e = cand
            break
    if e is None:
        raise ValueError("not an NGS geoid .bin")
    slat, wlon, dlat, dlon = struct.unpack_from(e + "4d", buf, 0)
    nlat, nlon = struct.unpack_from(e + "2i", buf, 32)
    dt = np.dtype(np.float32).newbyteorder(e)
    data = np.frombuffer(buf, dt, max(0, (len(buf) - 44) // 4), 44)
    need = nlat * nlon
    trunc = len(data) < need
    if trunc:
        data = np.concatenate([data,
                               np.zeros(need - len(data), np.float32)])
    arr = data[:need].reshape(nlat, nlon)[::-1]  # south->north rows
    gt = (wlon - dlon / 2, dlon, 0.0,
          slat + nlat * dlat - dlat / 2, 0.0, -dlat)
    arr = np.ascontiguousarray(_window(arr, window))
    return arr.astype(np.float32), \
        {"transform": gt, "epsg": 4326, "truncated": trunc}


# --------------------------------------------------------------- LOSLAS

def identify_loslas(buf: bytes, path: str = "") -> bool:
    if len(buf) < 64:
        return False
    if path and not path.lower().endswith((".los", ".las", ".geo")):
        return False
    return buf[56:62].upper() in (b"NADGRD", b"GEOGRD")


def decode_loslas(buf: bytes, window: Window = None):
    cols, rows = struct.unpack_from("<2i", buf, 64)
    min_lon, dlon, min_lat, dlat = struct.unpack_from("<4f", buf, 76)
    rec = cols * 4 + 4
    out = np.zeros((rows, cols), np.float32)
    for r in range(rows):  # rows bottom-up; header is record 0
        off = (rows - r) * rec + 4
        if off + cols * 4 <= len(buf):
            out[r] = np.frombuffer(buf, np.dtype("<f4"), cols, off)
    gt = (min_lon - dlon * 0.5, float(dlon), 0.0,
          min_lat + (rows - 0.5) * dlat, 0.0, -float(dlat))
    arr = np.ascontiguousarray(_window(out, window))
    return arr, {"transform": gt, "epsg": 4326}


# ------------------------------------------------------------- NSIDCbin

def identify_nsidcbin(buf: bytes, path: str = "") -> bool:
    if len(buf) < 300:
        return False
    if path and not path.lower().endswith(".bin"):
        return False
    return (buf[103:105] in (b"19", b"20") or
            buf[102:104] in (b"19", b"20"))


def decode_nsidcbin(buf: bytes, window: Window = None):
    cols = int(buf[6:12].split(b"\x00")[0].decode("ascii", "replace"))
    rows = int(buf[12:18].split(b"\x00")[0].decode("ascii", "replace"))
    south = buf[230:239] == b"ANTARCTIC"
    data = np.frombuffer(buf, np.uint8, min(rows * cols,
                                            len(buf) - 300), 300)
    trunc = len(data) < rows * cols
    if trunc:
        data = np.concatenate([data, np.zeros(rows * cols - len(data),
                                              np.uint8)])
    arr = data.reshape(rows, cols)
    if south:
        gt = (-3950000.0, 25000.0, 0.0, 4350000.0, 0.0, -25000.0)
        epsg = 3412
    else:
        gt = (-3837500.0, 25000.0, 0.0, 5837500.0, 0.0, -25000.0)
        epsg = 3411
    arr = np.ascontiguousarray(_window(arr, window))
    return arr.copy(), {"transform": gt, "epsg": epsg,
                        "truncated": trunc,
                        "header_filename":
                            buf[126:150].decode("ascii",
                                                "replace").strip()}
