"""Northwood/VerticalMapper grid drivers: GRD (numeric surface) and
GRC (classified).

Layout (both): 1024-byte header, magic "HGPC", type char at [4]
('1' = GRD, '8' = GRC); u16 dims at 9/11 (u32 fallbacks at 128/132),
f64 bounds at 13/21/29/37, f32 z-min/max at 45/49, MapInfo coordsys
string at 256, display flags at 513, u16 inflection count at 516 with
7-byte (f32 z, r, g, b) entries from 518, bits-per-pixel selector at
[1023].  GRD data: u16 rows from offset 1024, value = zmin +
(raw-1) * (zmax-zmin)/65534, raw 0 = nodata (-1e37); GDAL exposes 4
bands — R/G/B from a 4096-entry color ramp indexed raw/16 plus Z.
GRC data: u8/u16 class codes, the class dictionary (u16 count, then
9-byte entries pixval/r/g/b/len + name) sits AFTER the pixel block.

Reference: frmts/northwood/northwood.cpp:30-240 (header/dictionary),
grddataset.cpp:150-420 (scale + 4-band expose + ColorMap[raw/16]),
nwt_LoadColors/createIP/linearColor (:242-377) for the color ramp;
autotest nwt_grd.py pins band checksums 28093/33690/20365/25856,
nwt_grc.py pins 46760. Re-derived; no code copied.
"""

from __future__ import annotations

import struct

import numpy as np

NODATA = np.float32(-1.0e37)


def identify_nwt(buf: bytes) -> str:
    if buf[:4] != b"HGPC":
        return ""
    if buf[4:5] == b"1":
        return "NWT_GRD"
    if buf[4:5] == b"8":
        return "NWT_GRC"
    return ""


def _parse_header(buf: bytes) -> dict:
    h = {}
    (xs,) = struct.unpack_from("<H", buf, 9)
    (ys,) = struct.unpack_from("<H", buf, 11)
    if xs == 0:
        (xs,) = struct.unpack_from("<I", buf, 128)
    if ys == 0:
        (ys,) = struct.unpack_from("<I", buf, 132)
    h["nx"], h["ny"] = int(xs), int(ys)
    h["xmin"], h["xmax"], h["ymin"], h["ymax"] = struct.unpack_from(
        "<dddd", buf, 13)
    h["step"] = (h["xmax"] - h["xmin"]) / (h["nx"] - 1)
    h["zmin"], h["zmax"] = struct.unpack_from("<ff", buf, 45)
    h["coordsys"] = buf[256:512].split(b"\x00")[0].decode(
        "ascii", "replace")
    (n_infl,) = struct.unpack_from("<H", buf, 516)
    if n_infl > 32:
        n_infl = 0
    infl = []
    for i in range(n_infl):
        (z,) = struct.unpack_from("<f", buf, 518 + 7 * i)
        r, g, b = buf[522 + 7 * i], buf[523 + 7 * i], buf[524 + 7 * i]
        infl.append((float(z), r, g, b))
    h["inflections"] = infl
    h["fmt_byte"] = buf[1023]
    return h


def _create_ip(index, r, g, b, cmap, marker):
    """Fill the ramp linearly from the last set index (watermark) up to
    `index` — the reference's createIP fill rule, +0.5 rounding."""
    if index == 0:
        cmap[0] = (r, g, b)
        return 0
    if index <= marker:
        return marker
    wm = marker
    span = index - wm
    r0, g0, b0 = cmap[wm]
    for i in range(wm + 1, index):
        t = i - wm
        cmap[i] = (int(r0 + t * (r - r0) / span + 0.5),
                   int(g0 + t * (g - g0) / span + 0.5),
                   int(b0 + t * (b - b0) / span + 0.5))
    cmap[index] = (r, g, b)
    return index


def _linear_color(lo, hi, mid):
    zl, rl, gl, bl = lo
    zh, rh, gh, bh = hi
    if mid < zl:
        return rl, gl, bl
    if mid > zh:
        return rh, gh, bh
    t = (mid - zl) / (zh - zl)
    return (int(t * (rh - rl) + rl + 0.5), int(t * (gh - gl) + gl + 0.5),
            int(t * (bh - bl) + bl + 0.5))


def _load_colors(h: dict, size: int = 4096) -> np.ndarray:
    cmap = [(0, 0, 0)] * size
    marker = _create_ip(0, 255, 255, 255, cmap, 0)
    infl = h["inflections"]
    zmin, zmax = h["zmin"], h["zmax"]
    if infl:
        if zmin <= infl[0][0]:
            marker = _create_ip(1, infl[0][1], infl[0][2], infl[0][3],
                                cmap, marker)
        i = 1
        while i < len(infl):
            if zmin < infl[i][0]:
                r, g, b = _linear_color(infl[i - 1], infl[i], zmin)
                marker = _create_ip(1, r, g, b, cmap, marker)
                break
            i += 1
        if i >= len(infl):
            last = infl[-1]
            marker = _create_ip(1, last[1], last[2], last[3], cmap, marker)
            marker = _create_ip(size - 1, last[1], last[2], last[3],
                                cmap, marker)
        else:
            index = 0
            while i < len(infl):
                if zmax < infl[i][0]:
                    r, g, b = _linear_color(infl[i - 1], infl[i], zmax)
                    index = size - 1
                    marker = _create_ip(index, r, g, b, cmap, marker)
                    break
                index = int(((infl[i][0] - zmin) / (zmax - zmin)) * size)
                index = min(index, size - 1)
                marker = _create_ip(index, infl[i][1], infl[i][2],
                                    infl[i][3], cmap, marker)
                i += 1
            if index < size - 1:
                last = infl[-1]
                marker = _create_ip(size - 1, last[1], last[2], last[3],
                                    cmap, marker)
    return np.array(cmap, dtype=np.uint8)


def decode_nwt_grd(buf: bytes):
    """-> ((H, W, 4) stacked [R, G, B, Z-as-float] is NOT possible in
    one dtype; returns (H, W, 4) float32 where bands 1-3 are the byte
    color ramp values and band 4 the Z surface — matching GDAL's
    4-band expose (grddataset.cpp:330)."""
    h = _parse_header(buf)
    nx, ny = h["nx"], h["ny"]
    raw = np.frombuffer(buf, dtype="<u2", count=nx * ny,
                        offset=1024).reshape(ny, nx)
    scale = (h["zmax"] - h["zmin"]) / 65534.0
    z = (h["zmin"] + (raw.astype(np.float64) - 1) * scale).astype(
        np.float32)
    z[raw == 0] = NODATA
    cmap = _load_colors(h)
    rgb = cmap[(raw // 16).astype(np.int32)]  # (ny, nx, 3) uint8
    arr = np.concatenate([rgb.astype(np.float32), z[:, :, None]], axis=2)
    gt = (h["xmin"] - h["step"] * 0.5, h["step"], 0.0,
          h["ymax"] + h["step"] * 0.5, 0.0, -h["step"])
    meta = {"width": nx, "height": ny, "bands": 4, "transform": gt,
            "epsg": None, "nodata": float(NODATA),
            "coordsys": h["coordsys"], "zmin": h["zmin"],
            "zmax": h["zmax"],
            "band_dtypes": ["u1", "u1", "u1", "f4"]}
    return arr, meta


def decode_nwt_grc(buf: bytes):
    """-> (class-code array (H, W), meta with class dict/color table)."""
    h = _parse_header(buf)
    nx, ny = h["nx"], h["ny"]
    fmt = h["fmt_byte"]
    bits = 16 if fmt == 0 else fmt * 4
    if bits == 8:
        dt = "u1"
    elif bits == 16:
        dt = "<u2"
    elif bits == 32:
        dt = "<u4"
    else:
        raise ValueError(f"NWT_GRC: unsupported bits per pixel {bits}")
    npx = nx * ny
    arr = np.frombuffer(buf, dtype=dt, count=npx,
                        offset=1024).reshape(ny, nx)
    arr = np.ascontiguousarray(arr.astype(np.dtype(dt).newbyteorder("=")))
    # class dictionary after the pixel block
    pos = 1024 + npx * (bits // 8)
    (n_items,) = struct.unpack_from("<H", buf, pos)
    pos += 2
    classes = []
    for _ in range(n_items):
        pixval, _res1, r, g, b, _res2, slen = struct.unpack_from(
            "<HBBBBBH", buf, pos)
        pos += 9
        name = buf[pos:pos + slen].split(b"\x00")[0].decode(
            "ascii", "replace")
        pos += slen
        classes.append({"value": int(pixval), "r": r, "g": g, "b": b,
                        "name": name})
    gt = (h["xmin"] - h["step"] * 0.5, h["step"], 0.0,
          h["ymax"] + h["step"] * 0.5, 0.0, -h["step"])
    meta = {"width": nx, "height": ny, "bands": 1, "transform": gt,
            "epsg": None, "nodata": 0.0, "coordsys": h["coordsys"],
            "classes": classes}
    return arr, meta
