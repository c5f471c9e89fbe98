"""NASA PDS4 (XML-label) planetary raster reader.

Reference frmts/pds/pds4dataset.cpp: a Product_Observational XML
label whose File_Area_Observational holds Array_2D/Array_3D(_Image)
objects — byte offset into the sibling file named by <file_name>,
<axes> with named Axis_Array entries (Band/Line/Sample, Last Index
Fastest ordering), <data_type> from the PDS4 dictionary
(UnsignedByte, SignedByte, {Signed,Unsigned}{LSB,MSB}{2,4,8},
IEEE754{LSB,MSB}{Single,Double}), Special_Constants nodata, and the
cartography geotransform from upperleft_corner_x/y ×
pixel_resolution (with km→m unit conversion)."""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple
from xml.etree import ElementTree as ET

import numpy as np

_DTYPES = {
    "unsignedbyte": "u1", "signedbyte": "i1",
    "unsignedlsb2": "<u2", "signedlsb2": "<i2",
    "unsignedmsb2": ">u2", "signedmsb2": ">i2",
    "unsignedlsb4": "<u4", "signedlsb4": "<i4",
    "unsignedmsb4": ">u4", "signedmsb4": ">i4",
    "unsignedlsb8": "<u8", "signedlsb8": "<i8",
    "unsignedmsb8": ">u8", "signedmsb8": ">i8",
    "ieee754lsbsingle": "<f4", "ieee754msbsingle": ">f4",
    "ieee754lsbdouble": "<f8", "ieee754msbdouble": ">f8",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def identify_pds4(buf: bytes) -> bool:
    head = buf[:2048]
    return head.lstrip()[:5] == b"<?xml" and \
        b"Product_Observational" in head


def _to_meters(val: float, unit: Optional[str]) -> float:
    if unit and unit.strip().lower().split("/")[0] == "km":
        return val * 1000.0
    return val


def decode_pds4(buf: bytes, path: str) -> Tuple[np.ndarray, Dict]:
    root = ET.fromstring(buf)
    file_area = None
    for el in root:
        if _local(el.tag) == "File_Area_Observational":
            file_area = el
            break
    if file_area is None:
        raise ValueError("PDS4: no File_Area_Observational")

    fname = None
    array = None
    for el in file_area.iter():
        lt = _local(el.tag)
        if lt == "file_name":
            fname = (el.text or "").strip()
        elif lt.startswith(("Array_2D", "Array_3D")) and array is None:
            array = el
    if array is None or not fname:
        raise ValueError("PDS4: no Array object / file_name")

    offset = 0
    dtype_name = "unsignedbyte"
    axes = []
    nodata = None
    for el in array:
        lt = _local(el.tag)
        if lt == "offset":
            offset = int(float(el.text))
        elif lt == "Element_Array":
            for sub in el:
                if _local(sub.tag) == "data_type":
                    dtype_name = (sub.text or "").strip().lower()
        elif lt == "Axis_Array":
            name = seqno = elements = None
            for sub in el:
                slt = _local(sub.tag)
                if slt == "axis_name":
                    name = (sub.text or "").strip()
                elif slt == "elements":
                    elements = int(sub.text)
                elif slt == "sequence_number":
                    seqno = int(sub.text)
            axes.append((seqno or len(axes) + 1, name, elements))
        elif lt == "Special_Constants":
            for sub in el:
                if _local(sub.tag) == "missing_constant":
                    try:
                        nodata = float(sub.text)
                    except (TypeError, ValueError):
                        pass
    axes.sort()
    dims = {(n or "").upper(): e for _, n, e in axes}
    nb = dims.get("BAND", 1)
    nl = dims.get("LINE", 1)
    ns = dims.get("SAMPLE", 1)
    dt = np.dtype(_DTYPES[dtype_name])

    with open(os.path.join(os.path.dirname(path), fname), "rb") as fh:
        data = fh.read()
    flat = np.frombuffer(data, dt, count=nb * nl * ns, offset=offset)
    # shape follows the sequence order; Last Index Fastest
    order = [(n or "").upper() for _, n, _ in axes]
    shape = [dims[o] for o in order]
    arr = flat.reshape(shape)
    # normalize to (line, sample, band)
    perm = [order.index(k) for k in ("LINE", "SAMPLE", "BAND")
            if k in order]
    if len(perm) == 3:
        arr = arr.transpose(perm)
    out = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    if out.ndim == 3 and out.shape[2] == 1:
        out = out[:, :, 0]
    elif out.ndim == 3 and len(order) == 3 and "BAND" not in order:
        pass

    meta: Dict = {}
    if nodata is not None:
        meta["nodata"] = nodata
    ulx = uly = resx = resy = None
    for el in root.iter():
        lt = _local(el.tag)
        if lt == "upperleft_corner_x":
            ulx = _to_meters(float(el.text), el.get("unit"))
        elif lt == "upperleft_corner_y":
            uly = _to_meters(float(el.text), el.get("unit"))
        elif lt == "pixel_resolution_x":
            resx = _to_meters(float(el.text), el.get("unit"))
        elif lt == "pixel_resolution_y":
            resy = _to_meters(float(el.text), el.get("unit"))
    if None not in (ulx, uly, resx, resy):
        meta["transform"] = (ulx, resx, 0.0, uly, 0.0, -resy)
    return out, meta
