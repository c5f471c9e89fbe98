"""DIMAP (SPOT/Pleiades) metadata-label raster reader — DIMAP v1
(METADATA.DIM beside the imagery file).

The .DIM is XML: Raster_Dimensions (NROWS/NCOLS/NBANDS),
Raster_Encoding, Data_Access/DATA_FILE_PATH href to the pixel
carrier (GeoTIFF — or anything the raster registry probes, including
VRT-content files like the reference's own test fixture),
Dataset_Frame corner vertices as GCPs (pixel centers: col-0.5,
row-0.5 per the reference), and flattened scene metadata
(PROCESSING_LEVEL, SPECTRAL_PHYSICAL_BIAS, ...).

Reference: frmts/dimap/dimapdataset.cpp (v1 path); autotest dimap.py
pins size 6000², window checksum 21586, metadata and the 4 corner
GCPs. Re-derived; no code copied.  DIMAP2 multi-component bundles
out of scope (documented).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np


def identify_dimap(buf: bytes) -> bool:
    return b"<Dimap_Document" in buf[:1024]


def decode_dimap(path: str):
    """METADATA.DIM path -> (array, meta with gcps + scene metadata)."""
    from .rasters import open_raster_path

    tree = ET.parse(path)
    root = tree.getroot()
    base = os.path.dirname(os.path.abspath(path))

    def text(xpath, default=None):
        el = root.find(xpath)
        return el.text if el is not None and el.text else default

    ncols = int(text(".//Raster_Dimensions/NCOLS", "0"))
    nrows = int(text(".//Raster_Dimensions/NROWS", "0"))
    nbands = int(text(".//Raster_Dimensions/NBANDS", "1"))

    data_el = root.find(".//Data_Access/Data_File/DATA_FILE_PATH")
    if data_el is None:
        data_el = root.find(".//DATA_FILE_PATH")
    href = data_el.get("href") if data_el is not None else None
    if not href:
        raise ValueError("DIMAP: no DATA_FILE_PATH")
    img_path = href if os.path.isabs(href) else os.path.join(base, href)

    _drv, arr, img_meta = open_raster_path(img_path)

    gcps = []
    for v in root.findall(".//Dataset_Frame/Vertex"):
        lon = float(v.findtext("FRAME_LON"))
        lat = float(v.findtext("FRAME_LAT"))
        row = float(v.findtext("FRAME_ROW"))
        col = float(v.findtext("FRAME_COL"))
        # pixel centers, the reference's 0.5 convention
        gcps.append({"pixel": col - 0.5, "line": row - 0.5,
                     "x": lon, "y": lat, "z": 0.0})

    md = {}
    lvl = text(".//PROCESSING_LEVEL")
    if lvl:
        md["PROCESSING_LEVEL"] = lvl.strip()
    # Spectral_Band_Info children flatten with a SPECTRAL_ prefix,
    # the reference's metadata naming
    for sb in root.findall(".//Spectral_Band_Info"):
        for el in sb:
            if el.text and el.text.strip():
                md.setdefault("SPECTRAL_" + el.tag, el.text.strip())
    for el in root.iter():
        if el.tag in ("DATASET_NAME", "MISSION",
                      "MISSION_INDEX") and el.text:
            md.setdefault(el.tag, el.text.strip())

    meta = {"width": ncols or img_meta.get("width"),
            "height": nrows or img_meta.get("height"),
            "bands": nbands,
            "transform": img_meta.get("transform"),
            "epsg": img_meta.get("epsg") or 4326,
            "nodata": img_meta.get("nodata"),
            "gcps": gcps, "gcp_epsg": 4326,
            "metadata": md}
    return arr, meta
