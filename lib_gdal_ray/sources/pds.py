"""NASA PDS3 planetary image reader.

Reference frmts/pds/pdsdataset.cpp over the shared PVL/ODL label
parser (sources/isis3.py): ^IMAGE pointer forms (record number,
byte offset, detached file, (file, record) pair), SAMPLE_TYPE ×
SAMPLE_BITS dtype matrix, BAND_STORAGE_TYPE interleaves,
LINE_PREFIX/SUFFIX strip, and the documented PDS3 geotransform
(pdsdataset.cpp:300-395: MAP_SCALE unit conversion; upper-left =
(PROJECTION_OFFSET + shift) × ±scale with the 0.5-default
PDS_*ProjOffset_Shift knobs exposed as parameters).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import numpy as np

from .isis3 import parse_pvl


def identify_pds(buf: bytes) -> bool:
    head = buf[:512].decode("latin-1", "replace")
    return "PDS_VERSION_ID" in head and "PDS3" in head


def _dtype(sample_type: str, bits: int) -> np.dtype:
    st = sample_type.upper()
    if "REAL" in st:
        order = "<" if st.startswith(("PC", "LSB")) else ">"
        return np.dtype(f"{order}f{bits // 8}")
    order = "<" if st.startswith(("LSB", "PC", "VAX")) else ">"
    signed = "UNSIGNED" not in st
    if st == "UNSIGNED_INTEGER":
        order, signed = "<" if bits == 8 else ">", False
    kind = "i" if signed else "u"
    if bits == 8:
        return np.dtype(f"{kind}1")
    return np.dtype(f"{order}{kind}{bits // 8}")


def _image_pointer(val: str, record_bytes: int):
    """^IMAGE value -> (detached_filename|None, byte offset)."""
    v = val.strip()
    m = re.match(r'^\(\s*"?([^",]+)"?\s*,\s*(\d+)\s*(<BYTES>)?\s*\)$', v)
    if m:
        off = int(m.group(2))
        return m.group(1), (off - 1 if m.group(3)
                            else (off - 1) * record_bytes)
    m = re.match(r"^(\d+)\s*(<BYTES>)?$", v)
    if m:
        off = int(m.group(1))
        return None, (off - 1 if m.group(2)
                      else (off - 1) * record_bytes)
    return v.strip('"'), 0


def decode_pds(buf: bytes, path: str = "",
               sample_offset_shift: float = 0.5,
               line_offset_shift: float = 0.5) -> Tuple[np.ndarray, Dict]:
    head = buf[:65536].decode("latin-1", "replace")
    lbl = parse_pvl(head)
    record_bytes = int(float(lbl.get("RECORD_BYTES", "0") or 0))
    img = lbl.get("IMAGE")
    if img is None:
        # the IMAGE object may live under UNCOMPRESSED_FILE etc.
        for v in lbl.values():
            if isinstance(v, dict) and "IMAGE" in v:
                img = v["IMAGE"]
                break
    if img is None:
        raise ValueError("PDS: no IMAGE object")

    nl = int(img["LINES"])
    ns = int(img["LINE_SAMPLES"])
    nb = int(img.get("BANDS", "1"))
    bits = int(img.get("SAMPLE_BITS", "8"))
    dt = _dtype(img.get("SAMPLE_TYPE", "UNSIGNED_INTEGER"), bits)
    prefix = int(img.get("LINE_PREFIX_BYTES", "0"))
    suffix = int(img.get("LINE_SUFFIX_BYTES", "0"))

    ptr = lbl.get("^IMAGE")
    fname, offset = (None, 0) if ptr is None \
        else _image_pointer(ptr, record_bytes)
    data_src = buf
    if fname:
        with open(os.path.join(os.path.dirname(path), fname), "rb") as fh:
            data_src = fh.read()

    row_bytes = prefix + ns * dt.itemsize + suffix
    storage = img.get("BAND_STORAGE_TYPE", "BAND_SEQUENTIAL").upper()
    n_rows = nl * nb if storage.startswith("BAND_SEQ") else nl
    raw = np.frombuffer(data_src, np.uint8, count=row_bytes * n_rows
                        * (1 if storage.startswith("BAND_SEQ") else nb)
                        // (1 if storage.startswith("BAND_SEQ") else 1),
                        offset=offset)
    if storage.startswith("BAND_SEQ"):
        rows = raw.reshape(nb * nl, row_bytes)[:, prefix:prefix
                                               + ns * dt.itemsize]
        vals = np.frombuffer(rows.tobytes(), dt).reshape(nb, nl, ns)
        out = vals.transpose(1, 2, 0)
    elif storage.startswith("LINE_INTER"):
        rows = raw.reshape(nl * nb, row_bytes)[:, prefix:prefix
                                               + ns * dt.itemsize]
        vals = np.frombuffer(rows.tobytes(), dt).reshape(nl, nb, ns)
        out = vals.transpose(0, 2, 1)
    else:  # SAMPLE_INTERLEAVED
        rows = raw.reshape(nl, row_bytes * nb)
        vals = np.frombuffer(rows.tobytes(), dt).reshape(nl, ns, nb)
        out = vals
    out = np.ascontiguousarray(out.astype(dt.newbyteorder("=")))
    if nb == 1:
        out = out[:, :, 0]

    meta: Dict = {"label": lbl}
    proj = lbl.get("IMAGE_MAP_PROJECTION")
    if isinstance(proj, dict) and "MAP_SCALE" in proj:
        scale_txt = proj["MAP_SCALE"]
        scale = float(scale_txt.split()[0])
        unit = (proj.get("_units", {}).get("MAP_SCALE", "KM")
                .split("/")[0].strip().upper())
        if unit in ("M", "METER", "METERS"):
            pass
        elif unit == "CM":
            scale /= 100.0
        else:
            scale *= 1000.0
        dfx, dfy = scale, -scale
        ulx = uly = 0.5
        if "SAMPLE_PROJECTION_OFFSET" in proj:
            ulx = ((float(proj["SAMPLE_PROJECTION_OFFSET"])
                    + sample_offset_shift) * dfx * -1.0)
        if "LINE_PROJECTION_OFFSET" in proj:
            uly = ((float(proj["LINE_PROJECTION_OFFSET"])
                    + line_offset_shift) * -dfy * 1.0)
        if (ulx, uly, dfx, dfy) != (0.5, 0.5, 1.0, -1.0):
            meta["transform"] = (ulx, dfx, 0.0, uly, 0.0, dfy)
        meta["target"] = lbl.get("TARGET_NAME")
        meta["projection"] = proj.get("MAP_PROJECTION_TYPE")
    return out, meta
