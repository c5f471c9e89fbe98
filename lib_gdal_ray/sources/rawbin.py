"""ESRI .hdr-labelled raw rasters (EHdr / BIL) and ERMapper .ers
rasters — the classic header-plus-flat-binary pair.

EHdr (frmts/raw/ehdrdataset.cpp): whitespace key/value .hdr with
ncols/nrows/nbands/nbits/byteorder/layout/skipbytes/pixeltype and
either ulxmap/ulymap+xdim/ydim (pixel-CENTER anchored) or
xllcorner/yllcorner+cellsize; dtype defaults per
ehdrdataset.cpp:1194-1222 (16→UInt16, 32→UInt32 unless
PIXELTYPE=SIGNEDINT/FLOAT; a .flt data extension forces Float32).

ERS (frmts/ers/ersdataset.cpp): nested Begin/End text header with
#-comments; BIL data in the sibling file without the .ers extension
(or DataFile); geotransform from RegistrationCoord
Eastings/Northings or DMS Latitude/Longitude minus the
RegistrationCellX/Y offset (ersdataset.cpp:1150-1205).

Both decode whole-file (raw rasters are one flat buffer; tile
parallelism happens a level up via read_raster_rows over many
files / pixel-row streaming).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# EHdr
# ---------------------------------------------------------------------------


def parse_ehdr_header(text: str) -> Dict[str, str]:
    out = {}
    for line in text.splitlines():
        parts = line.split()
        if len(parts) >= 2:
            out[parts[0].lower()] = parts[1]
    return out


_EHDR_DATA_EXTS = (".bil", ".flt", ".bsq", ".bip", ".dat", ".raw")


def identify_ehdr(path: str) -> bool:
    low = path.lower()
    if low.endswith(".hdr"):
        data = _ehdr_data_path(path)
        return data is not None
    if low.endswith(_EHDR_DATA_EXTS):
        hdr = os.path.splitext(path)[0] + ".hdr"
        if not os.path.exists(hdr):
            return False
        with open(hdr) as fh:
            head = fh.read(64)
        return head.lstrip()[:4] != "ENVI"
    return False


def _ehdr_data_path(hdr_path: str) -> Optional[str]:
    base = os.path.splitext(hdr_path)[0]
    for ext in _EHDR_DATA_EXTS:
        for e in (ext, ext.upper()):
            if os.path.exists(base + e):
                return base + e
    return None


def decode_ehdr(path: str) -> Tuple[np.ndarray, Dict]:
    """-> ((h,w) or (h,w,bands) array, meta with 'transform' and
    'nodata'). `path` may be the .hdr or the data file."""
    if path.lower().endswith(".hdr"):
        hdr_path, data_path = path, _ehdr_data_path(path)
        if data_path is None:
            raise ValueError(f"{path}: no EHdr data file sibling")
    else:
        data_path = path
        hdr_path = os.path.splitext(path)[0] + ".hdr"
    with open(hdr_path) as fh:
        h = parse_ehdr_header(fh.read())

    ncols = int(h["ncols"])
    nrows = int(h["nrows"])
    nbands = int(h.get("nbands", "1"))
    if "nbits" in h:
        nbits = int(h["nbits"])
    else:
        # no NBITS: infer from the data file size (the reference does
        # the same file-size division, ehdrdataset.cpp)
        per_pix = os.path.getsize(data_path) // max(1, ncols * nrows
                                                    * nbands)
        nbits = 8 * per_pix if per_pix in (1, 2, 4, 8) else 8
    ptype = h.get("pixeltype", "").lower()
    if not ptype and "nbits" not in h and nbits == 32:
        ptype = "float"  # 4 B/pixel by file size => float (#3933)
    if not ptype and data_path.lower().endswith(".flt") and nbits == 32:
        ptype = "float"  # ehdrdataset.cpp:1171 (#3933)
    nod = h.get("nodata", h.get("nodata_value"))
    if not ptype and nod is not None and float(nod) < 0:
        ptype = "signed"  # worldclim convention (ehdrdataset.cpp:1180)
    order = "<" if h.get("byteorder", "I").upper()[0] in ("I", "L") else ">"
    if ptype.startswith("float"):
        dt = np.dtype(f"{order}f{nbits // 8}")
    elif ptype.startswith("signed"):
        dt = np.dtype(f"{order}i{nbits // 8}")
    else:
        dt = np.dtype(f"{order}u{nbits // 8}") if nbits > 8 \
            else np.dtype("u1")
    skip = int(h.get("skipbytes", "0"))
    layout = h.get("layout", "bil").lower()

    raw = np.fromfile(data_path, dtype=dt, offset=skip,
                      count=nrows * ncols * nbands)
    if raw.size < nrows * ncols * nbands:  # truncated/sparse raw
        raw = np.pad(raw, (0, nrows * ncols * nbands - raw.size))
    if layout == "bsq":
        arr = raw.reshape(nbands, nrows, ncols).transpose(1, 2, 0)
    elif layout == "bip":
        arr = raw.reshape(nrows, ncols, nbands)
    else:  # BIL
        arr = raw.reshape(nrows, nbands, ncols).transpose(0, 2, 1)
    if nbands == 1:
        arr = arr[:, :, 0]

    transform = None
    if "ulxmap" in h and "ulymap" in h:
        xd = float(h.get("xdim", "1"))
        yd = float(h.get("ydim", "1"))
        # ULXMAP/ULYMAP anchor the CENTER of the UL pixel
        transform = (float(h["ulxmap"]) - xd / 2, xd, 0.0,
                     float(h["ulymap"]) + yd / 2, 0.0, -yd)
    elif "xllcorner" in h and "yllcorner" in h:
        cell = float(h.get("cellsize", "1"))
        transform = (float(h["xllcorner"]), cell, 0.0,
                     float(h["yllcorner"]) + nrows * cell, 0.0, -cell)
    meta = {"transform": transform,
            "nodata": float(nod) if nod is not None else None}
    # worldclim-style hdr extension fields carry declared band stats
    if "minvalue" in h:
        meta["min"] = float(h["minvalue"])
    if "maxvalue" in h:
        meta["max"] = float(h["maxvalue"])
    return arr, meta


# ---------------------------------------------------------------------------
# ERS
# ---------------------------------------------------------------------------

_ERS_TYPES = {
    "unsigned8bitinteger": "u1", "signed8bitinteger": "i1",
    "unsigned16bitinteger": "u2", "signed16bitinteger": "i2",
    "unsigned32bitinteger": "u4", "signed32bitinteger": "i4",
    "ieee4bytereal": "f4", "ieee8bytereal": "f8",
}


def _strip_ers_comments(text: str) -> str:
    """Drop # to end-of-line, except inside double-quoted strings
    (srtm.ers exercises both)."""
    out = []
    in_q = False
    i = 0
    while i < len(text):
        c = text[i]
        if c == '"' and (i == 0 or text[i - 1] != "\\"):
            in_q = not in_q
            out.append(c)
        elif c == "#" and not in_q:
            while i < len(text) and text[i] != "\n":
                i += 1
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


def parse_ers_header(text: str) -> Dict[str, str]:
    """Nested Begin/End blocks -> flat dotted keys
    ('RasterInfo.CellInfo.Xdimension' style, matching the
    reference's ERSHdrNode::Find paths)."""
    text = _strip_ers_comments(text)
    # fold { ... } multi-line values onto one line
    text = re.sub(r"\{([^}]*)\}",
                  lambda m: '"' + m.group(1).replace("\n", " ").replace(
                      '"', "").strip() + '"', text)
    stack = []
    out: Dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        m = re.match(r"^(\w+)\s+Begin$", line, re.I)
        if m:
            stack.append(m.group(1))
            continue
        if re.match(r"^(\w+)\s+End$", line, re.I):
            if stack:
                stack.pop()
            continue
        if "=" in line:
            k, v = line.split("=", 1)
            key = ".".join(stack[1:] + [k.strip()]) if stack \
                else k.strip()
            out[key.lower()] = v.strip().strip('"')
    return out


def _dms(v: str) -> float:
    parts = v.split(":")
    if len(parts) == 1:
        return float(v)
    sign = -1.0 if parts[0].strip().startswith("-") else 1.0
    d = abs(float(parts[0]))
    m = float(parts[1]) if len(parts) > 1 else 0.0
    s = float(parts[2]) if len(parts) > 2 else 0.0
    return sign * (d + m / 60 + s / 3600)


def identify_ers(path: str) -> bool:
    if not path.lower().endswith(".ers"):
        return False
    with open(path, "rb") as fh:
        head = fh.read(256)
    return b"datasetheader begin" in head.lower()


def decode_ers(path: str) -> Tuple[np.ndarray, Dict]:
    with open(path) as fh:
        h = parse_ers_header(fh.read())
    ncols = int(h["rasterinfo.nrofcellsperline"])
    nrows = int(h["rasterinfo.nroflines"])
    nbands = int(h.get("rasterinfo.nrofbands", "1"))
    cell = h.get("rasterinfo.celltype", "Unsigned8BitInteger").lower()
    if cell not in _ERS_TYPES:
        raise ValueError(f"{path}: unsupported ERS CellType {cell!r}")
    order = ">" if h.get("byteorder", "LSBFirst").lower().startswith("m") \
        else "<"
    dt = np.dtype(order + _ERS_TYPES[cell])
    offset = int(h.get("headeroffset", "0"))

    data_path = h.get("datafile")
    if data_path:
        data_path = os.path.join(os.path.dirname(path), data_path)
    else:
        data_path = path[:-4]  # strip .ers
    raw = np.fromfile(data_path, dtype=dt, offset=offset,
                      count=nrows * ncols * nbands)
    if raw.size < nrows * ncols * nbands:  # truncated/sparse raw
        raw = np.pad(raw, (0, nrows * ncols * nbands - raw.size))
    arr = raw.reshape(nrows, nbands, ncols).transpose(0, 2, 1)  # BIL
    if nbands == 1:
        arr = arr[:, :, 0]

    transform = None
    xd = h.get("rasterinfo.cellinfo.xdimension")
    yd = h.get("rasterinfo.cellinfo.ydimension")
    if xd and yd:
        gx = gy = None
        if "rasterinfo.registrationcoord.eastings" in h:
            gx = float(h["rasterinfo.registrationcoord.eastings"])
            gy = float(h["rasterinfo.registrationcoord.northings"])
        elif "rasterinfo.registrationcoord.latitude" in h:
            gx = _dms(h["rasterinfo.registrationcoord.longitude"])
            gy = _dms(h["rasterinfo.registrationcoord.latitude"])
        if gx is not None:
            xdim, ydim = float(xd), float(yd)
            rx = float(h.get("rasterinfo.registrationcellx", "0"))
            ry = float(h.get("rasterinfo.registrationcelly", "0"))
            transform = (gx - rx * xdim, xdim, 0.0,
                         gy - ry * -ydim, 0.0, -ydim)
    nod = h.get("rasterinfo.nullcellvalue")
    return arr, {"transform": transform,
                 "nodata": float(nod) if nod is not None else None,
                 "band_desc": h.get("rasterinfo.bandid.value")}
