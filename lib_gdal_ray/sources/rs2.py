"""RS2 (RADARSAT-2 product.xml) reader with LUT calibration.

product.xml carries imageAttributes/rasterAttributes dims,
fullResolutionImageData hrefs (one imagery file per polarization —
any registry format, typically GeoTIFF), lookupTable hrefs keyed by
incidenceAngleCorrection (Beta/Sigma/Gamma Nought), and the
geographicInformation/rationalFunctions RPC block.  Calibrated
values follow the reference: float = (DN² + offset) / gain[column]
for detected (real) products.

Reference: frmts/rs2/rs2dataset.cpp (:328-530 LUT + calibration,
RPC mapping); autotest rs2.py pins band checksum 4672, BETA0
calibrated checksum 4848, and the RPC key mapping. Re-derived; no
code copied.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np

_RPC_MAP = {
    "ERR_BIAS": "biasError", "ERR_RAND": "randomError",
    "HEIGHT_OFF": "heightOffset", "HEIGHT_SCALE": "heightScale",
    "LAT_OFF": "latitudeOffset", "LAT_SCALE": "latitudeScale",
    "LINE_DEN_COEFF": "lineDenominatorCoefficients",
    "LINE_NUM_COEFF": "lineNumeratorCoefficients",
    "LINE_OFF": "lineOffset", "LINE_SCALE": "lineScale",
    "LONG_OFF": "longitudeOffset", "LONG_SCALE": "longitudeScale",
    "SAMP_DEN_COEFF": "pixelDenominatorCoefficients",
    "SAMP_NUM_COEFF": "pixelNumeratorCoefficients",
    "SAMP_OFF": "pixelOffset", "SAMP_SCALE": "pixelScale",
}

_LUT_KEY = {"beta0": "beta nought", "sigma0": "sigma nought",
            "gamma": "gamma"}


def identify_rs2(buf: bytes) -> bool:
    return b"<product" in buf[:512] and b"rs2" in buf[:512].lower()


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _findall(root, name):
    return [e for e in root.iter() if _local(e.tag) == name]


def decode_rs2(path: str, calibration: Optional[str] = None):
    """product.xml path -> (array (H, W, poles), meta). calibration:
    None (raw DN) or 'beta0'/'sigma0'/'gamma' → float32 (DN²+off)/gain."""
    from .rasters import open_raster_path

    root = ET.parse(path).getroot()
    base = os.path.dirname(os.path.abspath(path))

    imgs = _findall(root, "fullResolutionImageData")
    if not imgs:
        raise ValueError("RS2: no fullResolutionImageData")
    planes, poles = [], []
    for el in imgs:
        p = os.path.join(base, el.text.strip())
        _d, a, _m = open_raster_path(p)
        if a.ndim == 3:
            a = a[:, :, 0]
        planes.append(a)
        poles.append(el.get("pole", ""))

    if calibration is not None:
        want = _LUT_KEY[calibration.lower()]
        lut_file = None
        for el in _findall(root, "lookupTable"):
            if (el.get("incidenceAngleCorrection", "")
                    .lower() == want):
                lut_file = os.path.join(base, el.text.strip())
                break
        if lut_file is None:
            raise ValueError(f"RS2: no LUT for {calibration}")
        lroot = ET.parse(lut_file).getroot()
        offset = float(next((e.text for e in lroot.iter()
                             if _local(e.tag) == "offset"), "0"))
        gains = np.array(next(e.text for e in lroot.iter()
                              if _local(e.tag) == "gains").split(),
                         dtype=np.float64)
        planes = [((a.astype(np.float64) ** 2 + offset)
                   / gains[np.arange(a.shape[1]) % len(gains)]
                   ).astype(np.float32) for a in planes]

    arr = planes[0] if len(planes) == 1 else np.stack(planes, axis=-1)

    rpc = {}
    rf = next(iter(_findall(root, "rationalFunctions")), None)
    if rf is not None:
        by_name = {_local(e.tag): (e.text or "").strip() for e in rf}
        for k, src in _RPC_MAP.items():
            if src in by_name:
                rpc[k] = by_name[src]

    md = {}
    for key in ("satellite", "sensor", "beamModeMnemonic",
                "productType", "dataType", "bitsPerSample"):
        el = next(iter(_findall(root, key)), None)
        if el is not None and el.text:
            md[key.upper()] = el.text.strip()

    meta = {"width": arr.shape[1], "height": arr.shape[0],
            "bands": len(planes), "transform": None, "epsg": None,
            "nodata": None, "poles": poles, "rpc": rpc,
            "metadata": md, "calibration": calibration}
    return np.ascontiguousarray(arr), meta
