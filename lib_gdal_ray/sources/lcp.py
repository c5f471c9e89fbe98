"""FARSITE LCP (Landscape) driver — fire-behavior model stacks.

Layout: 7316-byte little-endian header, then int16 pixel-interleaved
(BIP) band data.  Header: i32 crown-fuel flag @0 (21 = present),
ground-fuel flag @4, latitude @8, per-field min/max/numclass i32
blocks (elevation @44, slope @456, aspect @868, fuel @1280 with the
class-value list from 1292, canopy cover @1692, canopy height @2104,
CBH @2516, CBD @2928, duff @3340, CWD @3752), bounds f64 E/W/N/S
@4172-4196, linear-unit i32 @4204, cell sizes f64 @4208/4216, u16
per-field units @4224-4242, width/height i32 @4164/4168, 256-byte
source-file names from 4244 (stride 256), description @6804.  Band
set: [elev, slope, aspect, fuel, cover] + crown [ht, cbh, cbd] +
ground [duff, cwd] → 5/7/8/10 bands.

Reference: frmts/raw/lcpdataset.cpp (offsets :133-138, :250-298,
band cases :317-720); autotest lcp.py pins 8 band checksums + all
band metadata on both fixtures. Re-derived; no code copied.
"""

from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np

HEADER_SIZE = 7316

# field: (name, prefix, unit_off, min_off, file_off, unit_names)
_FIELDS = {
    "elev": ("Elevation", "ELEVATION", 4224, 44, 4244,
             {0: "Meters", 1: "Feet"}),
    "slope": ("Slope", "SLOPE", 4226, 456, 4500,
              {0: "Degrees", 1: "Percent"}),
    "aspect": ("Aspect", "ASPECT", 4228, 868, 4756,
               {0: "Grass categories", 1: "Grass degrees",
                2: "Azimuth degrees"}),
    "fuel": ("Fuel models", "FUEL_MODEL", 4230, 1280, 5012, {}),
    "cover": ("Canopy cover", "CANOPY_COV", 4232, 1692, 5268,
              {0: "Categories (0-4)", 1: "Percent"}),
    "ht": ("Canopy height", "CANOPY_HT", 4234, 2104, 5524,
           {1: "Meters", 2: "Feet", 3: "Meters x 10", 4: "Feet x 10"}),
    "cbh": ("Canopy base height", "CBH", 4236, 2516, 5780,
            {1: "Meters", 2: "Feet", 3: "Meters x 10", 4: "Feet x 10"}),
    "cbd": ("Canopy bulk density", "CBD", 4238, 2928, 6036,
            {1: "kg/m^3", 2: "lb/ft^3", 3: "kg/m^3 x 100",
             4: "lb/ft^3 x 1000"}),
    "duff": ("Duff", "DUFF", 4240, 3340, 6292,
             {1: "Mg/ha", 2: "t/ac"}),
    "cwd": ("Coarse woody debris", "CWD", 4242, 3752, 6548, {}),
}

_FUEL_OPTION_DESC = {
    0: "no custom models AND no conversion file needed",
    1: "custom models BUT no conversion file needed",
    2: "no custom models BUT conversion file needed",
    3: "custom models AND conversion file needed",
}


def identify_lcp(buf: bytes) -> bool:
    if len(buf) < 50:
        return False
    crown, ground, lat = struct.unpack_from("<iii", buf, 0)
    return crown in (20, 21) and ground in (20, 21) and -90 <= lat <= 90


def _cstr(buf: bytes, off: int, maxlen: int = 256) -> str:
    return buf[off:off + maxlen].split(b"\x00")[0].decode(
        "latin-1", "replace")


def decode_lcp(buf: bytes, path: Optional[str] = None):
    """LCP bytes -> ((H, W, B) int16, meta with per-band metadata)."""
    if not identify_lcp(buf):
        raise ValueError("not an LCP file")
    crown = struct.unpack_from("<i", buf, 0)[0] == 21
    ground = struct.unpack_from("<i", buf, 4)[0] == 21
    lat = struct.unpack_from("<i", buf, 8)[0]
    w = struct.unpack_from("<i", buf, 4164)[0]
    h = struct.unpack_from("<i", buf, 4168)[0]
    east, west, north, south = struct.unpack_from("<dddd", buf, 4172)
    lin_unit = struct.unpack_from("<i", buf, 4204)[0]
    cellx, celly = struct.unpack_from("<dd", buf, 4208)

    fields = ["elev", "slope", "aspect", "fuel", "cover"]
    if crown:
        fields += ["ht", "cbh", "cbd"]
    if ground:
        fields += ["duff", "cwd"]
    nb = len(fields)

    arr = np.frombuffer(buf, dtype="<i2", count=w * h * nb,
                        offset=HEADER_SIZE).reshape(h, w, nb)
    arr = np.ascontiguousarray(arr.astype(np.int16))

    band_meta = []
    for key in fields:
        name, prefix, unit_off, min_off, file_off, unit_names = \
            _FIELDS[key]
        (unit,) = struct.unpack_from("<H", buf, unit_off)
        vmin, vmax, ncls = struct.unpack_from("<iii", buf, min_off)
        md = {"description": name}
        if key == "fuel":
            md["FUEL_MODEL_OPTION"] = str(unit)
            if unit in _FUEL_OPTION_DESC:
                md["FUEL_MODEL_OPTION_DESC"] = _FUEL_OPTION_DESC[unit]
            # the reference reads ncls+1 candidate values, keeping the
            # ones inside [min, max] (lcpdataset.cpp:455-470)
            vals = []
            if 0 < ncls <= 100:
                for i in range(ncls + 1):
                    (v,) = struct.unpack_from("<i", buf, 1292 + 4 * i)
                    if vmin <= v <= vmax:
                        vals.append(str(v))
            md["FUEL_MODEL_VALUES"] = ",".join(vals)
        elif key == "cwd":
            md["CWD_OPTION"] = str(unit)
        else:
            md[f"{prefix}_UNIT"] = str(unit)
            if unit in unit_names:
                md[f"{prefix}_UNIT_NAME"] = unit_names[unit]
        md[f"{prefix}_MIN"] = str(vmin)
        md[f"{prefix}_MAX"] = str(vmax)
        md[f"{prefix}_NUM_CLASSES"] = str(ncls)
        md[f"{prefix}_FILE"] = _cstr(buf, file_off, 255)
        band_meta.append(md)

    proj_name = None
    epsg = None
    if path:
        prj = os.path.splitext(path)[0] + ".prj"
        if not os.path.exists(prj):
            prj = os.path.splitext(path)[0] + ".PRJ"
        if os.path.exists(prj):
            with open(prj, "r", encoding="latin-1") as f:
                wkt = f.read()
            if wkt.startswith("PROJCS[") or wkt.startswith("GEOGCS["):
                proj_name = wkt.split('"', 2)[1]
            if 'AUTHORITY["EPSG"' in wkt:
                try:
                    epsg = int(wkt.rsplit('AUTHORITY["EPSG","',
                                          1)[1].split('"')[0])
                except (IndexError, ValueError):
                    pass

    meta = {"width": w, "height": h, "bands": nb,
            "transform": (west, cellx, 0.0, north, 0.0, -celly),
            "epsg": epsg, "nodata": None,
            "LATITUDE": str(lat),
            "LINEAR_UNIT": {0: "Meters", 1: "Feet"}.get(lin_unit),
            "DESCRIPTION": _cstr(buf, 6804, HEADER_SIZE - 6804),
            "projection_name": proj_name,
            "extent": (east, west, north, south),
            "band_meta": band_meta,
            "crown_fuels": crown, "ground_fuels": ground}
    return arr, meta
