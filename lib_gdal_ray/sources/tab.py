"""MapInfo TAB binary driver (read side).

Parity targets:
- ogr/ogrsf_frmts/mitab/mitab_mapheaderblock.cpp:157-377 — .map header
  block at offset 0 (magic 42424242 @0x100, version/blocksize @0x104,
  quadrant @0x161, XY scale/displacement @0x170) and the
  Int2Coordsys quadrant formula with precision rounding.
- mitab_mapobjectblock.cpp — object block header (20 bytes: type,
  numDataBytes, centerX/Y, first/last coord block) and every
  TABMAPObj*::ReadObj record layout (compressed variants read int16
  deltas against the object block center; PLINE/REGION/MULTIPOINT/
  COLLECTION carry their own compressed-origin in the record).
- mitab_mapcoordblock.cpp:388-505 — coordinate blocks (8-byte header
  with next-block pointer, data chained across blocks) and the
  24/28-byte coordinate section headers of REGION/MULTIPLINE.
- mitab_feature.cpp — geometry construction: TABGenerateArc
  (mitab_utils.cpp:46 — numPoints, duplicated end angle, close ring),
  ellipse 180 points, roundrect 45 per corner, arc
  max(2,|Δ|/2+1) points, the region numHoles ring grouping
  (mitab_feature.cpp:3230) and the TABText rotated lower-left anchor
  (mitab_feature.cpp:5600).
- mitab_datfile.cpp — .dat attribute records: dBASE-style header but
  binary-packed native values (Integer int32, Smallint int16, Float
  double, LargeInt int64, Date y16/m8/d8, Time int32 ms, DateTime
  date+time, Logical 'T'/'F', Decimal ASCII), 1-byte deleted flag.
- mitab_idfile.cpp — .id: one little-endian int32 object offset per
  feature (0 = no geometry).

Ray shape: the driver reads the (small) .tab/.id headers, plans
row ranges, and each map_batches task decodes only its own rows'
.dat records + .map objects.
"""

from __future__ import annotations

import math
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import wkb as wkbm

HDR_MAGIC = 42424242


def _c_round(x: float) -> float:
    """C round(): half away from zero."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


class _MapHeader:
    def __init__(self, buf: bytes):
        if struct.unpack_from("<i", buf, 0x100)[0] != HDR_MAGIC:
            raise ValueError("not a MapInfo .map file (bad magic)")
        self.version, self.blocksize = struct.unpack_from("<hh", buf, 0x104)
        self.coord_precision = buf[0x160]
        self.quadrant = buf[0x161]
        (self.xscale, self.yscale,
         self.xdispl, self.ydispl) = struct.unpack_from("<dddd", buf, 0x170)
        if self.version <= 100:  # mitab_mapheaderblock.cpp:272
            self.xscale = self.yscale = 10.0 ** self.coord_precision
            self.xdispl = self.ydispl = 0.0
        # mitab_mapheaderblock.cpp:899 UpdatePrecision
        self.xprec = 10.0 ** _c_round(math.log10(self.xscale))
        self.yprec = 10.0 ** _c_round(math.log10(self.yscale))

    def int2xy(self, ix, iy) -> Tuple[float, float]:
        """Int2Coordsys (mitab_mapheaderblock.cpp:344)."""
        q = self.quadrant
        if q in (2, 3, 0):
            x = -1.0 * (ix + self.xdispl) / self.xscale
        else:
            x = (ix - self.xdispl) / self.xscale
        if q in (3, 4, 0):
            y = -1.0 * (iy + self.ydispl) / self.yscale
        else:
            y = (iy - self.ydispl) / self.yscale
        if self.xprec > 0 and self.yprec > 0:
            x = _c_round(x * self.xprec) / self.xprec
            y = _c_round(y * self.yprec) / self.yprec
        return x, y

    def int2dist(self, n) -> float:
        return n / self.xscale


class _Reader:
    """Sequential little-endian reads over one object record."""

    def __init__(self, buf: bytes, pos: int, center: Tuple[int, int]):
        self.buf = buf
        self.pos = pos
        self.cx, self.cy = center

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def i16(self) -> int:
        v = struct.unpack_from("<h", self.buf, self.pos)[0]
        self.pos += 2
        return v

    def i32(self) -> int:
        v = struct.unpack_from("<i", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def coord(self, compressed: bool) -> Tuple[int, int]:
        if compressed:
            return self.i16() + self.cx, self.i16() + self.cy
        return self.i32(), self.i32()


class _CoordChain:
    """Reads coord-block data following next-block pointers
    (mitab_mapcoordblock.cpp:652 ReadBytes)."""

    def __init__(self, buf: bytes, ptr: int, blocksize: int,
                 compr_org: Tuple[int, int] = (0, 0)):
        self.buf = buf
        self.bs = blocksize
        self.ox, self.oy = compr_org
        self._goto(ptr)

    def _goto(self, ptr: int) -> None:
        self.block_start = (ptr // self.bs) * self.bs
        self.ndata = struct.unpack_from("<h", self.buf,
                                        self.block_start + 2)[0]
        self.next_block = struct.unpack_from("<i", self.buf,
                                             self.block_start + 4)[0]
        self.pos = ptr

    def addr(self) -> int:
        return self.pos

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            end = self.block_start + 8 + self.ndata
            if self.pos >= end:
                if self.next_block <= 0:
                    raise ValueError("TAB: coord chain exhausted")
                self._goto(self.next_block + 8)
            avail = min(n, self.block_start + 8 + self.ndata - self.pos)
            out += self.buf[self.pos:self.pos + avail]
            self.pos += avail
            n -= avail
        return bytes(out)

    def i16(self) -> int:
        return struct.unpack("<h", self.read(2))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.read(4))[0]

    def coord(self, compressed: bool) -> Tuple[int, int]:
        if compressed:
            return self.i16() + self.ox, self.i16() + self.oy
        return self.i32(), self.i32()

    def coords(self, compressed: bool, n: int) -> np.ndarray:
        """n (x, y) int coordinate pairs -> (n, 2) int64."""
        if compressed:
            raw = np.frombuffer(self.read(4 * n), "<i2").astype(np.int64)
            raw = raw.reshape(n, 2)
            raw[:, 0] += self.ox
            raw[:, 1] += self.oy
            return raw
        return np.frombuffer(self.read(8 * n), "<i4").astype(
            np.int64).reshape(n, 2)


# geometry type codes (mitab_priv.h:84)
_COMPRESSED = {0x01, 0x04, 0x07, 0x0a, 0x0d, 0x10, 0x13, 0x16, 0x19,
               0x25, 0x28, 0x2b, 0x2e, 0x31, 0x34, 0x37, 0x3d, 0x40,
               0x43, 0x46}


def _geom_version(t: int) -> int:
    # TAB_GEOM_GET_VERSION (mitab_priv.h:135)
    if t < 0x2e:
        return 300
    if t < 0x34:
        return 450
    if t < 0x3a:
        return 650
    return 800


def _gen_arc(cx, cy, rx, ry, a1, a2, num_points) -> np.ndarray:
    """TABGenerateArc (mitab_utils.cpp:46): numPoints from a1 to a2
    (radians, CCW), then the end angle duplicated."""
    if a2 < a1:
        a2 += 2.0 * math.pi
    step = (a2 - a1) / (num_points - 1.0)
    ang = a1 + step * np.arange(num_points)
    ang = np.append(ang, ang[-1])
    return np.stack([cx + rx * np.cos(ang), cy + ry * np.sin(ang)], axis=1)


def _close_ring(pts: np.ndarray) -> np.ndarray:
    if not np.array_equal(pts[0], pts[-1]):
        return np.concatenate([pts, pts[:1]])
    return pts


def _xy_arr(hdr: _MapHeader, ipts: np.ndarray) -> np.ndarray:
    """Vectorized Int2Coordsys over an (n, 2) int array."""
    x = ipts[:, 0].astype(np.float64)
    y = ipts[:, 1].astype(np.float64)
    q = hdr.quadrant
    if q in (2, 3, 0):
        x = -1.0 * (x + hdr.xdispl) / hdr.xscale
    else:
        x = (x - hdr.xdispl) / hdr.xscale
    if q in (3, 4, 0):
        y = -1.0 * (y + hdr.ydispl) / hdr.yscale
    else:
        y = (y - hdr.ydispl) / hdr.yscale
    if hdr.xprec > 0 and hdr.yprec > 0:
        # C round: half away from zero (numpy rint is banker's)
        xs = np.where(x >= 0, 1.0, -1.0)
        ys = np.where(y >= 0, 1.0, -1.0)
        x = xs * np.floor(np.abs(x * hdr.xprec) + 0.5) / hdr.xprec
        y = ys * np.floor(np.abs(y * hdr.yprec) + 0.5) / hdr.yprec
    return np.stack([x, y], axis=1)


def _read_sec_hdrs(cc: _CoordChain, compressed: bool, version: int,
                   nsec: int) -> List[dict]:
    """ReadCoordSecHdrs (mitab_mapcoordblock.cpp:388)."""
    sec_size = 28 if version >= 450 else 24
    total_hdr = sec_size * nsec
    out = []
    for _ in range(nsec):
        nv = cc.i32() if version >= 450 else cc.i16()
        nh = cc.i32() if version >= 800 else cc.i16()
        cc.coord(compressed)  # section MBR min
        cc.coord(compressed)  # section MBR max
        data_off = cc.i32()
        out.append({"nv": nv, "nholes": nh,
                    "voff": (data_off - total_hdr) // 8})
    return out


def _pline_like(hdr: _MapHeader, r: _Reader, t: int, buf: bytes):
    """PLINE / MULTIPLINE / REGION (TABMAPObjPLine::ReadObj)."""
    compressed = t in _COMPRESSED
    version = _geom_version(t)
    coord_ptr = r.i32()
    size = r.i32()
    size &= 0x7FFFFFFF  # smooth flag
    if t in (0x07, 0x08):  # PLINE: always one section
        nsec = 1
    elif t in (0x3d, 0x3e, 0x40, 0x41):  # V800: int32 + 33 unknown
        nsec = r.i32()
        r.pos += 33
    else:
        nsec = r.i16()
    if compressed:
        r.i16(), r.i16()  # label deltas
        org = (r.i32(), r.i32())
        for _ in range(4):
            r.i16()  # MBR deltas
    else:
        r.i32(), r.i32()  # label
        mbr = [r.i32() for _ in range(4)]
        org = ((mbr[0] + mbr[2]) // 2, (mbr[1] + mbr[3]) // 2)
    is_region = t in (0x0d, 0x0e, 0x2e, 0x2f, 0x3d, 0x3e)
    cc = _CoordChain(buf, coord_ptr, hdr.blocksize, org)
    if t in (0x07, 0x08):
        npts = size // (4 if compressed else 8)
        secs = [{"nv": npts, "nholes": 0, "voff": 0}]
    else:
        secs = _read_sec_hdrs(cc, compressed, version, nsec)
    total = sum(s["nv"] for s in secs)
    ipts = cc.coords(compressed, total)
    pts = _xy_arr(hdr, ipts)
    parts = [pts[s["voff"]:s["voff"] + s["nv"]] for s in secs]
    if is_region:
        # numHoles grouping (mitab_feature.cpp:3230)
        polys: List[List[np.ndarray]] = []
        holes_left = 0
        cur: List[np.ndarray] = []
        for i, s in enumerate(secs):
            if not cur:
                holes_left = s["nholes"]
            else:
                holes_left -= 1
            cur.append(_close_ring(parts[i]))
            if holes_left < 1:
                polys.append(cur)
                cur = []
                holes_left = 0
        if len(polys) == 1:
            return wkbm.polygon_to_wkb(polys[0])
        return wkbm.multipolygon_to_wkb(polys)
    if len(parts) == 1:
        return wkbm.linestring_to_wkb(parts[0])
    return wkbm.multilinestring_to_wkb(parts)


def _text_anchor(hdr: _MapHeader, angle_deg: float, height: float,
                 xmin, ymin, xmax, ymax) -> Tuple[float, float]:
    """TABText rotated lower-left anchor (mitab_feature.cpp:5600)."""
    s = math.sin(angle_deg * math.pi / 180.0)
    c = math.cos(angle_deg * math.pi / 180.0)
    if s > 0.0 and c > 0.0:
        return xmin + height * s, ymin
    if s > 0.0 and c < 0.0:
        return xmax, ymin - height * c
    if s < 0.0 and c < 0.0:
        return xmax + height * s, ymax
    return xmin, ymax - height * c


def _decode_object(hdr: _MapHeader, buf: bytes, objptr: int,
                   nest: int = 0) -> Optional[bytes]:
    """One object record at absolute offset objptr -> WKB or None."""
    block_start = (objptr // hdr.blocksize) * hdr.blocksize
    center = struct.unpack_from("<ii", buf, block_start + 4)
    r = _Reader(buf, objptr, center)
    t = r.u8()
    r.i32()  # object id
    compressed = t in _COMPRESSED
    if t == 0:
        return None
    if t in (0x01, 0x02):  # SYMBOL point
        ix, iy = r.coord(compressed)
        x, y = hdr.int2xy(ix, iy)
        return wkbm.points_to_wkb(np.array([x]), np.array([y]))[0]
    if t in (0x28, 0x29):  # FONTSYMBOL point
        r.pos += 2       # symbol id + point size
        r.i16()          # font style
        r.pos += 6       # rgb + 3 unknown
        r.i16()          # angle
        ix, iy = r.coord(compressed)
        x, y = hdr.int2xy(ix, iy)
        return wkbm.points_to_wkb(np.array([x]), np.array([y]))[0]
    if t in (0x2b, 0x2c):  # CUSTOMSYMBOL point
        r.pos += 2       # unknown + custom style
        ix, iy = r.coord(compressed)
        x, y = hdr.int2xy(ix, iy)
        return wkbm.points_to_wkb(np.array([x]), np.array([y]))[0]
    if t in (0x04, 0x05):  # LINE (2 points)
        p1 = r.coord(compressed)
        p2 = r.coord(compressed)
        return wkbm.linestring_to_wkb([hdr.int2xy(*p1), hdr.int2xy(*p2)])
    if t in (0x07, 0x08, 0x0d, 0x0e, 0x25, 0x26,
             0x2e, 0x2f, 0x31, 0x32, 0x3d, 0x3e, 0x40, 0x41):
        return _pline_like(hdr, r, t, buf)
    if t in (0x13, 0x14, 0x16, 0x17, 0x19, 0x1a):  # RECT/ROUNDRECT/ELLIPSE
        rw = rh = 0
        if t in (0x16, 0x17):
            if compressed:
                rw, rh = r.i16(), r.i16()
            else:
                rw, rh = r.i32(), r.i32()
        pmin = r.coord(compressed)
        pmax = r.coord(compressed)
        x0, y0 = hdr.int2xy(*pmin)
        x1, y1 = hdr.int2xy(*pmax)
        xmin, xmax = min(x0, x1), max(x0, x1)
        ymin, ymax = min(y0, y1), max(y0, y1)
        if t in (0x19, 0x1a):  # ellipse: 180 pts (mitab_feature.cpp:4625)
            ring = _gen_arc((xmin + xmax) / 2, (ymin + ymax) / 2,
                            (xmax - xmin) / 2, (ymax - ymin) / 2,
                            0.0, 2.0 * math.pi, 180)
            return wkbm.polygon_to_wkb([_close_ring(ring)])
        if t in (0x16, 0x17):  # roundrect: corner DIAMETERS / 2, min'd
            rx = min(hdr.int2dist(rw) / 2.0, (xmax - xmin) / 2.0)
            ry = min(rh / hdr.yscale / 2.0, (ymax - ymin) / 2.0)
            parts = [
                _gen_arc(xmin + rx, ymin + ry, rx, ry,
                         math.pi, 1.5 * math.pi, 45),
                _gen_arc(xmax - rx, ymin + ry, rx, ry,
                         1.5 * math.pi, 2.0 * math.pi, 45),
                _gen_arc(xmax - rx, ymax - ry, rx, ry,
                         0.0, 0.5 * math.pi, 45),
                _gen_arc(xmin + rx, ymax - ry, rx, ry,
                         0.5 * math.pi, math.pi, 45),
            ]
            return wkbm.polygon_to_wkb([_close_ring(np.concatenate(parts))])
        return wkbm.polygon_to_wkb([np.array(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax],
             [xmin, ymax], [xmin, ymin]])])
    if t in (0x0a, 0x0b):  # ARC
        a_start = r.i16()
        a_end = r.i16()
        emin = r.coord(compressed)
        emax = r.coord(compressed)
        r.coord(compressed), r.coord(compressed)  # arc MBR
        # angle quadrant adjustments (mitab_feature.cpp:5030)
        q = hdr.quadrant
        if q in (1, 3, 0):
            a1, a2 = a_start / 10.0, a_end / 10.0
        else:
            a1, a2 = a_end / 10.0, a_start / 10.0
        if q in (2, 3, 0):
            a1 = (180.0 - a1) if a1 <= 180.0 else (540.0 - a1)
            a2 = (180.0 - a2) if a2 <= 180.0 else (540.0 - a2)
        if q in (3, 4, 0):
            a1, a2 = 360.0 - a1, 360.0 - a2
        x0, y0 = hdr.int2xy(*emin)
        x1, y1 = hdr.int2xy(*emax)
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = abs(x1 - x0) / 2.0, abs(y1 - y0) / 2.0
        if a2 < a1:
            npts = max(2, int(abs((a2 + 360.0 - a1) / 2.0) + 1))
        else:
            npts = max(2, int(abs((a2 - a1) / 2.0) + 1))
        pts = _gen_arc(cx, cy, rx, ry, a1 * math.pi / 180.0,
                       a2 * math.pi / 180.0, npts)
        return wkbm.linestring_to_wkb(pts)
    if t in (0x10, 0x11):  # TEXT -> anchor point
        r.i32()  # string ptr
        r.i16()  # string length
        r.i16()  # alignment
        angle = r.i16() / 10.0
        r.i16()  # font style
        r.pos += 6  # fg/bg rgb
        r.coord(compressed)  # label line end
        h = r.i16() if compressed else r.i32()
        height = hdr.int2dist(0), hdr.int2dist(h)  # (junk, height)
        r.u8()  # font id
        pmin = r.coord(compressed)
        pmax = r.coord(compressed)
        x0, y0 = hdr.int2xy(*pmin)
        x1, y1 = hdr.int2xy(*pmax)
        xmin, xmax = min(x0, x1), max(x0, x1)
        ymin, ymax = min(y0, y1), max(y0, y1)
        x, y = _text_anchor(hdr, angle, height[1], xmin, ymin, xmax, ymax)
        return wkbm.points_to_wkb(np.array([x]), np.array([y]))[0]
    if t in (0x34, 0x35, 0x43, 0x44):  # MULTIPOINT
        coord_ptr = r.i32()
        npts = r.i32()
        r.pos += 15  # 3x int32 + 3 bytes unknown
        if t in (0x43, 0x44):
            r.pos += 33
        r.u8()  # symbol id
        r.u8()  # unknown
        if compressed:
            r.i16(), r.i16()
            org = (r.i32(), r.i32())
        else:
            r.i32(), r.i32()
            mbr = [r.i32() for _ in range(4)]
            org = ((mbr[0] + mbr[2]) // 2, (mbr[1] + mbr[3]) // 2)
        cc = _CoordChain(buf, coord_ptr, hdr.blocksize, org)
        pts = _xy_arr(hdr, cc.coords(compressed, npts))
        return wkbm.multipoint_to_wkb([tuple(p) for p in pts])
    if t in (0x37, 0x38, 0x46, 0x47):  # COLLECTION
        version = _geom_version(t)
        coord_ptr = r.i32()
        n_mpoints = r.i32()
        r.i32()  # region data size
        r.i32()  # polyline data size
        if version >= 800:
            n_reg = r.i32()
            n_pline = r.i32()
            r.u8()  # the constant 4
        else:
            n_reg = r.i16()
            n_pline = r.i16()
        r.pos += 12 + 3  # 3x int32 + 3 bytes unknown
        r.u8()  # multipoint symbol id
        r.u8()  # unknown
        r.u8(), r.u8(), r.u8()  # region pen, pline pen, region brush
        if compressed:
            org = (r.i32(), r.i32())
            for _ in range(4):
                r.i16()
        else:
            mbr = [r.i32() for _ in range(4)]
            org = ((mbr[0] + mbr[2]) // 2, (mbr[1] + mbr[3]) // 2)
        cc = _CoordChain(buf, coord_ptr, hdr.blocksize, org)
        members: List[bytes] = []

        def mini_hdr() -> Tuple[int, int]:
            # label + MBR prefix (mitab_feature.cpp:7356)
            if compressed:
                cc.i16(), cc.i16()
                for _ in range(4):
                    cc.i16()
            else:
                cc.i32(), cc.i32()
                for _ in range(4):
                    cc.i32()
            return org

        for kind, nsec in (("region", n_reg), ("pline", n_pline)):
            if nsec <= 0:
                continue
            if version >= 800:
                cc.i32()  # copy of num_parts
            mini_hdr()
            secs = _read_sec_hdrs(cc, compressed, max(450, version), nsec)
            total = sum(s["nv"] for s in secs)
            pts = _xy_arr(hdr, cc.coords(compressed, total))
            parts = [pts[s["voff"]:s["voff"] + s["nv"]] for s in secs]
            if kind == "region":
                polys: List[List[np.ndarray]] = []
                holes_left = 0
                cur: List[np.ndarray] = []
                for i, s in enumerate(secs):
                    if not cur:
                        holes_left = s["nholes"]
                    else:
                        holes_left -= 1
                    cur.append(_close_ring(parts[i]))
                    if holes_left < 1:
                        polys.append(cur)
                        cur = []
                if len(polys) == 1:
                    members.append(wkbm.polygon_to_wkb(polys[0]))
                else:
                    members.append(wkbm.multipolygon_to_wkb(polys))
            else:
                if len(parts) == 1:
                    members.append(wkbm.linestring_to_wkb(parts[0]))
                else:
                    members.append(wkbm.multilinestring_to_wkb(parts))
        if n_mpoints > 0:
            mini_hdr()
            pts = _xy_arr(hdr, cc.coords(compressed, n_mpoints))
            members.append(wkbm.multipoint_to_wkb([tuple(p) for p in pts]))
        return wkbm.geometrycollection_to_wkb(members)
    raise ValueError(f"TAB: unsupported .map object type 0x{t:02x}")


# ------------------------------------------------------------------
# .tab text + .dat attributes

_TAB_TYPES = {"char": pa.string(), "integer": pa.int32(),
              "smallint": pa.int16(), "largeint": pa.int64(),
              "float": pa.float64(), "decimal": pa.float64(),
              "date": pa.string(), "time": pa.string(),
              "datetime": pa.string(), "logical": pa.bool_()}


def parse_tab_text(path: str) -> List[Tuple[str, str]]:
    """.tab Definition Table -> [(field_name, base_type), ...]."""
    fields: List[Tuple[str, str]] = []
    n_fields = 0
    with open(path, encoding="latin-1") as fh:
        lines = fh.read().splitlines()
    for i, line in enumerate(lines):
        toks = line.split()
        if len(toks) >= 2 and toks[0].lower() == "fields":
            n_fields = int(toks[1])
            for fl in lines[i + 1:i + 1 + n_fields]:
                ft = fl.split()
                base = ft[1].lower().split("(")[0]
                fields.append((ft[0], base))
            break
    return fields


def _read_dat_header(buf: bytes):
    n_records = struct.unpack_from("<i", buf, 4)[0]
    first_ptr, rec_size = struct.unpack_from("<hh", buf, 8)
    fields = []
    pos = 32
    while pos < len(buf) and buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("latin-1")
        width = buf[pos + 16]
        fields.append((name, width))
        pos += 32
    return n_records, first_ptr, rec_size, fields


def _decode_dat_rows(buf: bytes, first_ptr: int, rec_size: int,
                     widths: List[int], types: List[str],
                     row_ids: np.ndarray) -> Dict[str, list]:
    out: Dict[str, list] = {}
    cols: List[list] = [[] for _ in widths]
    for rid in row_ids:
        pos = first_ptr + int(rid) * rec_size
        deleted = buf[pos:pos + 1] != b" "
        pos += 1
        for ci, (w, t) in enumerate(zip(widths, types)):
            raw = buf[pos:pos + w]
            pos += w
            if deleted:
                cols[ci].append(None)
                continue
            if t == "char":
                cols[ci].append(
                    raw.split(b"\x00")[0].decode("latin-1").rstrip())
            elif t == "integer":
                cols[ci].append(struct.unpack("<i", raw)[0])
            elif t == "smallint":
                cols[ci].append(struct.unpack("<h", raw)[0])
            elif t == "largeint":
                cols[ci].append(struct.unpack("<q", raw)[0])
            elif t == "float":
                cols[ci].append(struct.unpack("<d", raw)[0])
            elif t == "decimal":
                s = raw.decode("latin-1").strip()
                cols[ci].append(float(s) if s else None)
            elif t == "date":
                y, = struct.unpack_from("<h", raw, 0)
                cols[ci].append(f"{y:04d}{raw[2]:02d}{raw[3]:02d}"
                                if y else None)
            elif t == "time":
                ms, = struct.unpack("<i", raw)
                s, mms = divmod(ms, 1000)
                h, rem = divmod(s, 3600)
                m, sec = divmod(rem, 60)
                cols[ci].append(f"{h:02d}{m:02d}{sec:02d}{mms:03d}")
            elif t == "datetime":
                y, = struct.unpack_from("<h", raw, 0)
                ms, = struct.unpack_from("<i", raw, 4)
                s, mms = divmod(ms, 1000)
                h, rem = divmod(s, 3600)
                m, sec = divmod(rem, 60)
                cols[ci].append(
                    f"{y:04d}{raw[2]:02d}{raw[3]:02d}"
                    f"{h:02d}{m:02d}{sec:02d}{mms:03d}" if y else None)
            elif t == "logical":
                cols[ci].append(raw == b"T")
            else:
                cols[ci].append(raw.decode("latin-1").rstrip())
    return cols


def _sibling(path: str, ext: str) -> Optional[str]:
    base = os.path.splitext(path)[0]
    for cand in (base + ext, base + ext.upper()):
        if os.path.exists(cand):
            return cand
    return None


def read_tab(path: str, *, rows_per_block: int = 4096,
             geometry_col: str = "geometry") -> ray.data.Dataset:
    """MapInfo TAB binary dataset -> Dataset(fid, attrs..., geometry).

    The driver only reads the tiny .tab text and the .id length;
    row-range tasks decode their own .dat records and .map objects.
    """
    fields = parse_tab_text(path)
    dat_path = _sibling(path, ".dat")
    id_path = _sibling(path, ".id")
    map_path = _sibling(path, ".map")
    n_records = 0
    if id_path:
        n_records = os.path.getsize(id_path) // 4
    elif dat_path:
        with open(dat_path, "rb") as fh:
            n_records = struct.unpack("<i", fh.read(8)[4:8])[0]
    names = [f[0] for f in fields]
    types = [f[1] for f in fields]
    schema = pa.schema(
        [("fid", pa.int64())]
        + [(n, _TAB_TYPES.get(t, pa.string())) for n, t in fields]
        + [(geometry_col, pa.binary())])
    if n_records == 0:
        return ray.data.from_arrow(schema.empty_table())

    starts = list(range(0, n_records, rows_per_block))
    items = [{"start": s, "stop": min(s + rows_per_block, n_records)}
             for s in starts]

    def decode(batch: pa.Table) -> pa.Table:
        dat_buf = open(dat_path, "rb").read() if dat_path else b""
        map_buf = open(map_path, "rb").read() if map_path else b""
        id_buf = open(id_path, "rb").read() if id_path else b""
        hdr = _MapHeader(map_buf) if map_buf else None
        obj_ptrs = np.frombuffer(id_buf, "<i4") if id_buf else None
        widths = []
        first_ptr = rec_size = 0
        if dat_buf:
            _, first_ptr, rec_size, dat_fields = _read_dat_header(dat_buf)
            widths = [w for _, w in dat_fields]
        tables = []
        for start, stop in zip(batch["start"].to_pylist(),
                               batch["stop"].to_pylist()):
            rids = np.arange(start, stop)
            out: Dict[str, pa.Array] = {
                "fid": pa.array(rids + 1, pa.int64())}
            if dat_buf and widths:
                cols = _decode_dat_rows(dat_buf, first_ptr, rec_size,
                                        widths, types, rids)
                for (nm, t), vals in zip(fields, cols):
                    out[nm] = pa.array(vals, _TAB_TYPES.get(t, pa.string()))
            else:
                for nm, t in fields:
                    out[nm] = pa.nulls(len(rids),
                                       _TAB_TYPES.get(t, pa.string()))
            geoms: List[Optional[bytes]] = []
            for rid in rids:
                ptr = int(obj_ptrs[rid]) if obj_ptrs is not None else 0
                geoms.append(_decode_object(hdr, map_buf, ptr)
                             if ptr > 0 and hdr else None)
            out[geometry_col] = pa.array(geoms, pa.binary())
            tables.append(pa.table(out))
        return pa.concat_tables(tables)

    n_blocks = max(1, len(items))
    return (ray.data.from_items(items, override_num_blocks=n_blocks)
            .map_batches(decode, batch_format="pyarrow"))
