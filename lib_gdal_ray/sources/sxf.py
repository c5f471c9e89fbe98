"""Panorama SXF vector driver (the NextGIS-signature format).

Re-derivation of ogr/ogrsf_frmts/sxf/ (sxffile.cpp, ogrsxflayer.cpp,
rscfile.cpp), "old behavior" surface (the reference default,
SXF_NEW_BEHAVIOR=NO):

- passport v3 (256 B) / v4 (400 B): signature "SXF\\0", header-length
  version switch (sxffile.cpp:806-817), corners, projection info,
  device-coordinate transform dfXOr/dfYOr/dfScaleRatio
  (sxffile.cpp:1286-1300) and TranslateXY (sxffile.cpp:695).
- records: 32-byte headers at 256+44 / 400+52, chained by nFullLength
  (ogrsxfdatasource.cpp:297-380); bitfields per org_sxf_defs.h
  SXFRecordHeaderV3/V4; coordinate pairs stored (Y, X) with value type
  from (nElementType, nCoordinateValueSize) (ogrsxflayer.cpp:974-996);
  H always float32 except DOUBLE records (TranslateXYH).
- geometry: point → POINT / MULTIPOINT with subobjects; line/text →
  MULTILINESTRING / LINESTRING; polygon → rings through an
  organizePolygons containment pass; vector (2 pts) → POINT + ANGLE
  = atan2(dx, dy)·180/π − 90 (ogrsxflayer.cpp:1806-1826).
- semantics (attributes): SC_<code> fields, types 0/126/127/128 text
  (CP866 / CP1251 / UTF-16), 1/2/4/8 numeric × 10^scale
  (ogrsxflayer.cpp:1300-1510).
- layers: RSC classifier SEG (layers) + OBJ (objects) sections map
  full codes "<L|S|P|T|V|C><clcode>" to layers (rscfile.cpp:1048-1105);
  no/unreadable RSC → the default "SYSTEM" layer set
  (rscfile.cpp:1165-1188); unmatched records land in "Not_Classified";
  empty layers are dropped (ogrsxfdatasource.cpp:382-401).

Ray shape: the driver scans only the 32-byte record headers to plan
slices, then geometry/attribute decode fans out per record chunk
(each task re-opens the file and reads only its own byte ranges).
"""

from __future__ import annotations

import math
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from lib_gdal_ray.geom.wkb import (linestring_to_wkb, multilinestring_to_wkb,
                                   multipoint_to_wkb, multipolygon_to_wkb,
                                   polygon_to_wkb)

IDSXFOBJ = 0x7FFF7FFF
TO_DEGREES = 180.0 / math.pi

_GEOM_PREFIX = {0: "L", 1: "S", 2: "P", 3: "T", 4: "V", 5: "C"}
_ENC = {0: "cp866", 1: "cp1251", 2: "koi8_r"}


def identify_sxf(buf: bytes) -> bool:
    return buf[:4] == b"SXF\x00"


def _cstr(b: bytes, enc: str) -> str:
    z = b.find(b"\x00")
    if z >= 0:
        b = b[:z]
    return b.decode(enc, "replace").strip()


# ---------------------------------------------------------------------------
# Passport
# ---------------------------------------------------------------------------

def parse_sxf_passport(buf: bytes) -> Dict:
    if not identify_sxf(buf):
        raise ValueError("not an SXF file")
    hdr_len = struct.unpack_from("<I", buf, 4)[0]
    if hdr_len > 256:
        version = buf[10]  # ver[2] of 4 bytes at offset 8
        pos = 12
    else:
        version = buf[9]  # ver[1] of 2 bytes at offset 8
        pos = 10
    if version not in (3, 4):
        raise ValueError(f"unsupported SXF version {version}")
    pos += 4  # checksum
    pos += 12 if version == 3 else 12  # create date (SXFDate: 12 bytes both)

    encoding = "cp866" if version == 3 else "cp1251"
    if version == 3:
        pos += 24  # sheet nomenclature
        scale = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        pos += 26  # sheet name
        flags = buf[pos]
        has_real = (flags >> 3) & 0x03  # bits: dataState:2, isProjected:1
        pos += 4
        pos += 4 + 8  # class code + reserve
        epsg = 0
    else:
        pos += 32
        scale = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        pos += 32
        b0 = buf[pos]
        text_enc = buf[pos + 1]
        accuracy = buf[pos + 2]
        has_real = ((b0 >> 3) & 0x03) > 0 or accuracy > 0
        encoding = _ENC.get(text_enc, "cp1251")
        pos += 4
        epsg = struct.unpack_from("<I", buf, pos)[0]
        pos += 4

    proj_coords = [0.0] * 8
    geog_coords = [0.0] * 8
    if version == 3:
        vals = struct.unpack_from("<8i", buf, pos)
        proj_coords = [v / 10.0 for v in vals]
        pos += 32
        vals = struct.unpack_from("<8i", buf, pos)
        geog_coords = [v * (180.0 / math.pi) / 1e8 for v in vals]
        pos += 32
    else:
        proj_coords = list(struct.unpack_from("<8d", buf, pos))
        pos += 64
        raw = struct.unpack_from("<8d", buf, pos)
        for i in range(0, 8, 2):
            geog_coords[i] = raw[i + 1] * TO_DEGREES
            geog_coords[i + 1] = raw[i] * TO_DEGREES
        pos += 64

    proj_info = struct.unpack_from("<8B", buf, pos)
    pos += 8
    map_type = proj_info[7]

    pos += 12  # survey date (SXFDate)
    pos += 2  # src type + subtype
    if version == 4:
        pos += 2  # MSK63 zone id + map limit flag

    if version == 3:
        pos += 4 + 4 + 2 + 4  # magnetic decl, meridians, height step, annual
    else:
        pos += 24
    pos += 12  # inclination measure date
    if version == 3:
        pos += 10  # reserve
    else:
        pos += 4 + 8 + 8  # MSK63 zone, height step, axis angle

    frame = [0] * 8
    if version == 3:
        resolution = struct.unpack_from("<i", buf, pos)[0]
        frame = list(struct.unpack_from("<8h", buf, pos + 4))
        pos += 20
    else:
        vals = struct.unpack_from("<9i", buf, pos)
        resolution = vals[0]
        frame = list(vals[1:])
        pos += 36
    pos += 4  # frame code

    x_or = y_or = 0.0
    scale_ratio = 1.0
    if version == 3:
        params = struct.unpack_from("<5i", buf, pos)
        pos += 20
        if params[2] != -1:
            x_or = params[2] * (180.0 / math.pi) / 1e8
        if params[3] != -1:
            y_or = params[2] * (180.0 / math.pi) / 1e8
    else:
        params = struct.unpack_from("<6d", buf, pos)
        pos += 48
        x_or = params[2] * TO_DEGREES
        y_or = params[3] * TO_DEGREES

    if not has_real:
        has_real = resolution < 0
    if not has_real:
        scale_ratio = float(scale) / resolution
        if all(v == 0 for v in frame):
            has_real = True
        else:
            x_or = proj_coords[1] - frame[1] * scale_ratio
            y_or = proj_coords[0] - frame[0] * scale_ratio

    # data descriptor
    desc_off = 256 if version == 3 else 400
    if version == 3:
        n_features = struct.unpack_from("<I", buf, desc_off + 32)[0]
        first_rec = 256 + 44
    else:
        n_features = struct.unpack_from("<I", buf, desc_off + 40)[0]
        first_rec = 400 + 52

    return {
        "version": version, "scale": scale, "epsg": epsg,
        "encoding": encoding, "has_real_coords": bool(has_real),
        "x_or": x_or, "y_or": y_or, "scale_ratio": scale_ratio,
        "n_features": n_features, "first_record": first_rec,
        "proj_corners": proj_coords, "geog_corners": geog_coords,
        "map_type": map_type,
    }


# ---------------------------------------------------------------------------
# RSC classifier
# ---------------------------------------------------------------------------

def _default_layers() -> List[Tuple[str, Dict[str, str]]]:
    codes = {}
    for code, name in (("L1000000001", "Selection line"),
                       ("S1000000002", "Selection square"),
                       ("P1000000003", "Selection point"),
                       ("T1000000004", "Selection text"),
                       ("V1000000005", "Selection vector"),
                       ("C1000000006", "Selection template")):
        codes[code] = name
    for i in range(7, 15):
        codes[f"L10000000{i:02d}"] = "System object"
    return [("SYSTEM", codes)]


def parse_rsc(buf: bytes, layer_fullname: bool = False
              ) -> Optional[List[Tuple[str, Dict[str, str]]]]:
    """RSC → ordered [(layer_name, {full_code: object_name})] or None
    on a malformed file (caller falls back to the default set)."""
    if len(buf) < 3 * 84 or buf[:3] != b"RSC":
        return None
    version = buf[9]  # ver[1]
    if version != 7:
        return None
    # RSCHeader starts after Header(8) + version(4) = offset 12
    base = 12
    # RSCHeader prefix: nEncoding[4] + 4×u32 + date[8] + szMapType[32]
    # + szClassifyName[32] + szClassifyCode[8] + nScale + nScalesRange
    enc_off = base + 4 + 4 * 4 + 8 + 32 + 32 + 8 + 4 + 4
    # sections: Objects, Semantic, ClassifySemantic, DefaultsSemantic,
    # PossibleSemantic, Layers, ...
    sections = {}
    names = ["OBJ", "SEM", "CLS", "DEF", "POS", "SEG", "LIM", "PAR",
             "PRN", "PAL", "TXT", "IML", "IMG", "TAB"]
    off = enc_off
    for name in names:
        o, ln, cnt = struct.unpack_from("<III", buf, off)
        sections[name] = (o, ln, cnt)
        off += 12
    off += 1 + 1 + 30
    font_enc = struct.unpack_from("<I", buf, off)[0]
    enc = "koi8_r" if font_enc == 125 else "cp1251"

    # layers (SEG)
    layers: Dict[int, Tuple[str, Dict[str, str]]] = {}
    o, _ln, cnt = sections["SEG"]
    for _ in range(cnt):
        if o + 58 > len(buf):
            break
        rec_len = struct.unpack_from("<I", buf, o)[0]
        name = _cstr(buf[o + 4:o + 36], enc) if layer_fullname else \
            _cstr(buf[o + 36:o + 52], enc)
        n_no = buf[o + 52]
        layers[n_no] = (name, {})
        o += rec_len

    # objects (OBJ)
    o, _ln, cnt = sections["OBJ"]
    for _ in range(cnt):
        if o + 112 > len(buf):
            break
        rec_len, clcode = struct.unpack_from("<II", buf, o)
        name = _cstr(buf[o + 48:o + 80], enc)
        geom_type = buf[o + 80]
        layer_id = buf[o + 81]
        prefix = _GEOM_PREFIX.get(geom_type)
        if prefix is not None and layer_id in layers:
            layers[layer_id][1][prefix + str(clcode)] = name
        o += rec_len

    return [layers[k] for k in sorted(layers)]


# ---------------------------------------------------------------------------
# Records
# ---------------------------------------------------------------------------

def scan_sxf_records(buf: bytes, passport: Dict) -> List[Dict]:
    """Header-only scan (FillLayers analog): one dict per record with
    offset/classify-code/localization — the Ray read plans slices from
    this without touching geometry bytes."""
    pos = passport["first_record"]
    out = []
    for _ in range(passport["n_features"]):
        if pos + 32 > len(buf):
            break
        sign, full_len = struct.unpack_from("<II", buf, pos)
        if sign != IDSXFOBJ or full_len < 32:
            break
        clcode = struct.unpack_from("<I", buf, pos + 12)[0]
        loc = buf[pos + 20] & 0x0F
        sub_cnt = struct.unpack_from("<H", buf, pos + 28)[0]
        out.append({"offset": pos, "full_length": full_len,
                    "clcode": clcode, "loc": loc, "sub_count": sub_cnt})
        pos += full_len
    return out


def _parse_record_header(buf: bytes, pos: int, version: int) -> Dict:
    sign, full_len, geom_len, clcode = struct.unpack_from("<IIII", buf, pos)
    if sign != IDSXFOBJ:
        raise ValueError("bad record sign")
    g0, g1 = struct.unpack_from("<HH", buf, pos + 16)
    b20, b21, b22 = buf[pos + 20], buf[pos + 21], buf[pos + 22]
    loc = b20 & 0x0F
    has_sem = (b21 >> 1) & 1
    coord_size = (b21 >> 2) & 1
    dim = (b22 >> 1) & 1
    elem_type = (b22 >> 2) & 1
    is_text = (b22 >> 3) & 1
    if version == 4:
        utf16 = (b21 >> 4) & 1
        pt_small = struct.unpack_from("<H", buf, pos + 30)[0]
        if pt_small == 65535:
            n_points = struct.unpack_from("<I", buf, pos + 24)[0]
        else:
            n_points = pt_small
    else:
        utf16 = 0
        n_points = struct.unpack_from("<H", buf, pos + 30)[0]
    sub_cnt = struct.unpack_from("<H", buf, pos + 28)[0]
    attr_len = 0
    if has_sem:
        attr_len = full_len - 32 - geom_len
        if attr_len < 1 or attr_len > 1024 * 1024:
            attr_len = 0
    # value type per GetCoordinateValueType (ogrsxflayer.cpp:974)
    if elem_type == 0:
        vtype = "short" if coord_size == 0 else "int"
    else:
        vtype = "float" if coord_size == 0 else "double"
    return {"full_length": full_len, "geom_length": geom_len,
            "clcode": clcode, "loc": loc, "has_z": dim == 1,
            "vtype": vtype, "n_points": n_points, "sub_count": sub_cnt,
            "attr_length": attr_len, "is_text": is_text == 1,
            "utf16": utf16 == 1, "group": (g0, g1)}


_VT_SIZE = {"short": (2, "<h"), "float": (4, "<f"),
            "int": (4, "<i"), "double": (8, "<d")}


def _read_points(buf: bytes, pos: int, end: int, n: int, hdr: Dict,
                 passport: Dict) -> Tuple[np.ndarray, int]:
    """Read n (Y,X[,H]) tuples; returns (n,2 or 3) transformed coords
    and the new offset. Mirrors TranslateXYH + TranslateXY."""
    sz, fmt = _VT_SIZE[hdr["vtype"]]
    h_sz = 8 if hdr["vtype"] == "double" else 4
    step = 2 * sz + (h_sz if hdr["has_z"] else 0)
    n = min(n, max(0, (end - pos) // step))
    if n <= 0:
        return np.zeros((0, 3 if hdr["has_z"] else 2)), pos
    raw = buf[pos:pos + n * step]
    if hdr["has_z"]:
        if hdr["vtype"] == "double":
            a = np.frombuffer(raw, "<f8").reshape(n, 3)
            y, x, h = a[:, 0], a[:, 1], a[:, 2]
        else:
            dt = np.dtype([("y", fmt[1:]), ("x", fmt[1:]), ("h", "<f4")])
            a = np.frombuffer(raw, dt)
            y = a["y"].astype(np.float64)
            x = a["x"].astype(np.float64)
            h = a["h"].astype(np.float64)
    else:
        a = np.frombuffer(raw, fmt[1:]).astype(np.float64).reshape(n, 2)
        y, x = a[:, 0], a[:, 1]
        h = None
    if not passport["has_real_coords"]:
        x = passport["x_or"] + x * passport["scale_ratio"]
        y = passport["y_or"] + y * passport["scale_ratio"]
    pts = np.column_stack([x, y] + ([h] if h is not None else []))
    return pts, pos + n * step


def _organize_polygons(rings: List[np.ndarray]) -> bytes:
    """organizePolygons analog: a ring whose first vertex falls inside
    an earlier (larger) shell becomes that shell's hole."""
    if not rings:
        return polygon_to_wkb([np.zeros((0, 2))])

    def area(r):
        if len(r) < 3:
            return 0.0
        x, y = r[:, 0], r[:, 1]
        return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    def inside(px, py, ring):
        x, y = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cond = (y > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = x + (py - y) / (y2 - y) * (x2 - x)
        return bool(np.count_nonzero(cond & (px < xs)) & 1)

    order = sorted(range(len(rings)), key=lambda i: -area(rings[i]))
    polys: List[List[np.ndarray]] = []
    for i in order:
        r = rings[i]
        placed = False
        if len(r):
            for rings_out in polys:
                if inside(r[0, 0], r[0, 1], rings_out[0]):
                    rings_out.append(r)
                    placed = True
                    break
        if not placed:
            polys.append([r])
    if len(polys) == 1:
        return polygon_to_wkb(polys[0])
    return multipolygon_to_wkb(polys)


def _close_ring(pts: np.ndarray) -> np.ndarray:
    pts = pts[:, :2]
    if len(pts) and not np.array_equal(pts[0], pts[-1]):
        pts = np.vstack([pts, pts[:1]])
    return pts


def _parse_semantics(buf: bytes, enc: str) -> Dict[str, object]:
    out: Dict[str, object] = {}
    pos, end = 0, len(buf)
    while pos + 4 < end:
        code, typ, scale = struct.unpack_from("<HBB", buf, pos)
        pos += 4
        name = f"SC_{code}"
        if typ in (0, 126):  # ASCIIZ DOS / ANSI
            ln = scale + 1
            if pos + ln > end:
                break
            out[name] = _cstr(buf[pos:pos + ln], enc)
            pos += ln
        elif typ == 127:  # UNICODE (UCS-2)
            ln = scale + 2
            if pos + ln > end:
                break
            out[name] = buf[pos:pos + ln - 2].decode("utf-16-le", "replace")
            pos += ln
        elif typ == 128:  # BIGTEXT (u32 len + UTF-16)
            if pos + 4 > end:
                break
            ln = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
            if pos + ln > end:
                break
            out[name] = buf[pos:pos + ln].decode("utf-16-le", "replace")
            pos += ln
        elif typ in (1, 2, 4, 8):
            if pos + typ > end:
                break
            if typ == 1:
                v = float(buf[pos])
            elif typ == 2:
                v = float(struct.unpack_from("<h", buf, pos)[0])
            elif typ == 4:
                v = float(struct.unpack_from("<i", buf, pos)[0])
            else:
                v = struct.unpack_from("<d", buf, pos)[0]
            sscale = scale - 256 if scale >= 128 else scale
            out[name] = v * (10.0 ** sscale)
            pos += typ
        else:  # unknown: scale+1 bytes, skipped with warning in reference
            pos += scale + 1
    return out


def decode_sxf_record(buf: bytes, pos: int, passport: Dict) -> Optional[Dict]:
    """One record → feature dict (GetRawFeature analog, old behavior)."""
    hdr = _parse_record_header(buf, pos, passport["version"])
    gpos = pos + 32
    gend = gpos + hdr["geom_length"]
    enc = passport["encoding"]

    sem: Dict[str, object] = {}
    if hdr["attr_length"]:
        sem = _parse_semantics(buf[gend:gend + hdr["attr_length"]], enc)

    loc = hdr["loc"]
    text = None
    angle = None
    wkb: Optional[bytes] = None

    def read_subheader(p):
        n_sub, n_coord = struct.unpack_from("<HH", buf, p)
        if hdr["n_points"] > 65535:
            n_coord += n_sub << 16
        return n_coord, p + 4

    if loc == 2:  # Point → POINT / MULTIPOINT
        pts, p = _read_points(buf, gpos, gend, 1, hdr, passport)
        all_pts = [pts]
        for _ in range(hdr["sub_count"]):
            if p + 4 > gend:
                break
            n_coord, p = read_subheader(p)
            sub, p = _read_points(buf, p, gend, n_coord, hdr, passport)
            all_pts.append(sub)
        coords = np.vstack([a[:, :2] for a in all_pts if len(a)])
        if hdr["sub_count"] == 0 and len(coords) == 1:
            wkb = struct.pack("<BIdd", 1, 1, coords[0, 0], coords[0, 1])
        else:
            wkb = multipoint_to_wkb(coords)
    elif loc in (0, 3, 5):  # Line / Text / TextTemplate
        pts, p = _read_points(buf, gpos, gend, hdr["n_points"], hdr, passport)
        if loc == 0:
            lines = [pts[:, :2]]
            for _ in range(hdr["sub_count"]):
                if p + 4 > gend:
                    break
                n_coord, p = read_subheader(p)
                sub, p = _read_points(buf, p, gend, n_coord, hdr, passport)
                lines.append(sub[:, :2])
            wkb = multilinestring_to_wkb(lines)
        else:
            if hdr["is_text"] and p < gend:
                tlen = buf[p]
                p += 1
                if p + tlen <= gend:
                    text = _cstr(
                        buf[p:p + tlen + 1],
                        "utf-16-le" if hdr["utf16"] else enc)
                    p += tlen + 1
            wkb = (linestring_to_wkb(pts[:, :2]) if hdr["n_points"] > 1
                   else multipoint_to_wkb(pts[:, :2]))
    elif loc == 1:  # Polygon
        pts, p = _read_points(buf, gpos, gend, hdr["n_points"], hdr, passport)
        rings = [_close_ring(pts)]
        for _ in range(hdr["sub_count"]):
            if p + 4 > gend:
                break
            n_coord, p = read_subheader(p)
            sub, p = _read_points(buf, p, gend, n_coord, hdr, passport)
            rings.append(_close_ring(sub))
        wkb = _organize_polygons(rings)
    elif loc == 4:  # Vector → POINT + ANGLE (old behavior)
        pts, _p = _read_points(buf, gpos, gend, 2, hdr, passport)
        if len(pts) == 2:
            x_diff = pts[0, 0] - pts[1, 0]
            y_diff = pts[0, 1] - pts[1, 1]
            angle = math.atan2(x_diff, y_diff) * TO_DEGREES - 90
            if angle < 0:
                angle += 360
            wkb = struct.pack("<BIdd", 1, 1, pts[0, 0], pts[0, 1])
        else:
            return None
    else:
        return None

    return {
        "CLCODE": int(hdr["clcode"]),
        "full_code": _GEOM_PREFIX.get(loc, "?") + str(hdr["clcode"]),
        "OBJECTNUMB": int(hdr["sub_count"]),
        "ANGLE": angle, "TEXT": text, "geometry": wkb,
        "semantics": sem,
    }


# ---------------------------------------------------------------------------
# Dataset-level open
# ---------------------------------------------------------------------------

def _resolve_rsc(path: str, rsc_path: Optional[str]) -> Optional[bytes]:
    cand = []
    if rsc_path:
        cand.append(rsc_path)
    root = os.path.splitext(path)[0]
    cand += [root + ".rsc", root + ".RSC"]
    for c in cand:
        if os.path.exists(c):
            with open(c, "rb") as f:
                return f.read()
    return None


def open_sxf(path: str, rsc_path: Optional[str] = None,
             layer_fullname: bool = False):
    """Open an SXF sheet: returns (passport, layers, features) where
    layers is the ordered layer list (empty ones dropped, reference
    parity) and features a list of dicts with a 'layer' key."""
    with open(path, "rb") as f:
        buf = f.read()
    passport = parse_sxf_passport(buf)

    rsc_buf = _resolve_rsc(path, rsc_path)
    layer_defs = None
    if rsc_buf is not None:
        layer_defs = parse_rsc(rsc_buf, layer_fullname=layer_fullname)
    if layer_defs is None:
        layer_defs = _default_layers()
    layer_defs = list(layer_defs) + [("Not_Classified", None)]

    records = scan_sxf_records(buf, passport)
    features = []
    counts = {name: 0 for name, _c in layer_defs}
    for fid, rec in enumerate(records):
        feat = decode_sxf_record(buf, rec["offset"], passport)
        if feat is None:
            continue
        layer_name, clname = "Not_Classified", ""
        for name, codes in layer_defs:
            if codes is None or feat["full_code"] in codes:
                layer_name = name
                clname = "" if codes is None else codes.get(feat["full_code"],
                                                            "")
                break
        feat["CLNAME"] = clname
        feat["layer"] = layer_name
        feat["fid"] = fid
        counts[layer_name] += 1
        features.append(feat)

    layers = [name for name, _c in layer_defs if counts[name] > 0]
    return passport, layers, features


def sxf_layer_names(path: str, rsc_path: Optional[str] = None,
                    layer_fullname: bool = False,
                    drop_empty: bool = False) -> List[str]:
    """Layer list as the reference datasource reports it. With
    drop_empty=False mirrors CreateLayers (all classifier layers +
    Not_Classified); True mirrors the post-fill empty-layer sweep."""
    if drop_empty:
        _p, layers, _f = open_sxf(path, rsc_path, layer_fullname)
        return layers
    with open(path, "rb") as f:
        head = f.read(16)
    if not identify_sxf(head):
        raise ValueError("not an SXF file")
    rsc_buf = _resolve_rsc(path, rsc_path)
    layer_defs = None
    if rsc_buf is not None:
        layer_defs = parse_rsc(rsc_buf, layer_fullname=layer_fullname)
    if layer_defs is None:
        layer_defs = _default_layers()
    return [name for name, _c in layer_defs] + ["Not_Classified"]


def read_sxf(path: str, rsc_path: Optional[str] = None,
             layer_fullname: bool = False, geometry_col: str = "geometry",
             chunk_records: int = 2000):
    """SXF → Ray Dataset. Driver scans the 32-byte record headers only;
    geometry/attribute decode fans out (one task per record chunk, each
    re-reading just its own byte range)."""
    import pyarrow as pa
    import ray

    rsc_buf = _resolve_rsc(path, rsc_path)
    layer_defs = None
    if rsc_buf is not None:
        layer_defs = parse_rsc(rsc_buf, layer_fullname=layer_fullname)
    if layer_defs is None:
        layer_defs = _default_layers()
    layer_defs = list(layer_defs) + [("Not_Classified", None)]

    with open(path, "rb") as f:
        full = f.read()
    passport_full = parse_sxf_passport(full)
    records = scan_sxf_records(full, passport_full)
    chunks = []
    for i in range(0, len(records), chunk_records):
        sub = records[i:i + chunk_records]
        chunks.append({"start": sub[0]["offset"], "fid0": i,
                       "offsets": [r["offset"] for r in sub]})
    if not chunks:
        chunks = [{"start": 0, "fid0": 0, "offsets": []}]

    def decode_chunk(batch):
        rows = {"fid": [], "layer": [], "CLCODE": [], "CLNAME": [],
                "OBJECTNUMB": [], "ANGLE": [], "TEXT": [],
                geometry_col: [], "semantics": []}
        with open(path, "rb") as fh:
            data = fh.read()
        for fid0, offsets in zip(batch["fid0"], batch["offsets"]):
            for k, off in enumerate(offsets):
                feat = decode_sxf_record(data, int(off), passport_full)
                if feat is None:
                    continue
                layer_name, clname = "Not_Classified", ""
                for name, codes in layer_defs:
                    if codes is None or feat["full_code"] in codes:
                        layer_name = name
                        clname = "" if codes is None else codes.get(
                            feat["full_code"], "")
                        break
                rows["fid"].append(int(fid0) + k)
                rows["layer"].append(layer_name)
                rows["CLCODE"].append(feat["CLCODE"])
                rows["CLNAME"].append(clname)
                rows["OBJECTNUMB"].append(feat["OBJECTNUMB"])
                rows["ANGLE"].append(feat["ANGLE"])
                rows["TEXT"].append(feat["TEXT"])
                rows[geometry_col].append(feat["geometry"])
                rows["semantics"].append(
                    ";".join(f"{k2}={v2}" for k2, v2 in
                             sorted(feat["semantics"].items())) or None)
        return pa.table({
            "fid": pa.array(rows["fid"], pa.int64()),
            "layer": pa.array(rows["layer"], pa.string()),
            "CLCODE": pa.array(rows["CLCODE"], pa.int64()),
            "CLNAME": pa.array(rows["CLNAME"], pa.string()),
            "OBJECTNUMB": pa.array(rows["OBJECTNUMB"], pa.int64()),
            "ANGLE": pa.array(rows["ANGLE"], pa.float64()),
            "TEXT": pa.array(rows["TEXT"], pa.string()),
            geometry_col: pa.array(rows[geometry_col], pa.binary()),
            "semantics": pa.array(rows["semantics"], pa.string()),
        })

    return ray.data.from_items(chunks).map_batches(
        decode_chunk, batch_format="default")
