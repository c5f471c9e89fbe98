"""ASCII raster interchange formats: Arc/Info ASCII Grid + XYZ.

Parity targets: `frmts/aaigrid/aaigriddataset.cpp` (ncols/nrows/
xllcorner|xllcenter/cellsize|dx,dy/NODATA_value header, whitespace
token stream, south-west anchored georeferencing) and
`frmts/xyz/xyzdataset.cpp` (optional column-name header, one
"x y z" line per cell at pixel centers, grid inferred from the
coordinate stream, blank lines tolerated).

Both are text formats a user brings for interchange; both decode to
the same (array, meta) contract as the binary codecs so they plug
into the driver registry (`sources/rasters.py`) and every pixel
pipeline downstream. Parsing is numpy-vectorized (`np.fromstring`-
style token splits), not a Python loop per line.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_AAIGRID_KEYS = ("ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
                 "yllcenter", "cellsize", "dx", "dy", "nodata_value")


def decode_aaigrid(buf: bytes) -> Tuple[np.ndarray, dict]:
    """AAIGrid text -> ((nrows, ncols) float64 array, meta).

    meta: transform (GDAL north-up affine), nodata. Values equal to
    NODATA_value come back as NaN (AAIGridRasterBand::IReadBlock's
    nodata contract surfaced Arrow/numpy-style)."""
    text = buf.decode("ascii", errors="replace")
    toks = text.split()
    hdr = {}
    i = 0
    while i + 1 < len(toks):
        key = toks[i].lower()
        if key not in _AAIGRID_KEYS:
            break
        hdr[key] = toks[i + 1]
        i += 2
    if "ncols" not in hdr or "nrows" not in hdr:
        raise ValueError("not an AAIGrid (missing ncols/nrows header)")
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    dx = float(hdr.get("dx", hdr.get("cellsize", 1.0)))
    dy = float(hdr.get("dy", hdr.get("cellsize", 1.0)))
    if "xllcorner" in hdr:
        x0 = float(hdr["xllcorner"])
    else:
        x0 = float(hdr.get("xllcenter", 0.0)) - dx / 2.0
    if "yllcorner" in hdr:
        yll = float(hdr["yllcorner"])
    else:
        yll = float(hdr.get("yllcenter", 0.0)) - dy / 2.0
    vals = np.array(toks[i:i + w * h], dtype=np.float64)
    if vals.size != w * h:
        raise ValueError(f"AAIGrid data truncated: {vals.size} of {w * h}")
    arr = vals.reshape(h, w)
    nodata = None
    if "nodata_value" in hdr:
        nodata = float(hdr["nodata_value"])
        if not np.isnan(nodata):
            arr = np.where(arr == nodata, np.nan, arr)
    transform = (x0, dx, 0.0, yll + h * dy, 0.0, -dy)
    return arr, {"width": w, "height": h, "bands": 1,
                 "transform": transform, "nodata": nodata,
                 "dtype": "float64"}


def encode_aaigrid(arr: np.ndarray, transform: Optional[tuple] = None,
                   nodata: Optional[float] = None, **_kw) -> bytes:
    """(H, W) array -> AAIGrid text (AAIGCreateCopy layout). NaNs are
    written as the nodata value (default -9999)."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        if arr.shape[2] != 1:
            raise ValueError("AAIGrid is single-band")
        arr = arr[:, :, 0]
    h, w = arr.shape
    gt = transform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    if abs(gt[2]) > 0 or abs(gt[4]) > 0:
        raise ValueError("AAIGrid cannot encode rotated rasters")
    dx, dy = gt[1], -gt[5]
    if abs(dx - dy) > 1e-9 * max(abs(dx), abs(dy)):
        header_res = f"dx           {dx!r}\ndy           {dy!r}\n"
    else:
        header_res = f"cellsize     {dx!r}\n"
    yll = gt[3] - h * dy
    out = [f"ncols        {w}\n"
           f"nrows        {h}\n"
           f"xllcorner    {gt[0]!r}\n"
           f"yllcorner    {yll!r}\n"
           + header_res]
    a = arr.astype(np.float64)
    if np.isnan(a).any():
        nd = -9999.0 if nodata is None else float(nodata)
        out.append(f"NODATA_value {nd!r}\n")
        a = np.where(np.isnan(a), nd, a)
    elif nodata is not None:
        out.append(f"NODATA_value {float(nodata)!r}\n")
    ints = np.all(a == np.rint(a)) and np.all(np.abs(a) < 2**53)
    for row in a:
        if ints:
            out.append(" ".join(str(int(v)) for v in row) + "\n")
        else:
            out.append(" ".join(repr(float(v)) for v in row) + "\n")
    return "".join(out).encode("ascii")


def identify_aaigrid(buf: bytes) -> bool:
    head = buf[:256].lstrip().lower()
    return head.startswith(b"ncols")


def decode_xyz(buf: bytes) -> Tuple[np.ndarray, dict]:
    """XYZ text -> ((h, w) float64 array, meta).

    Column order comes from an optional header line (any of
    x/y/z | lon/lat | east/north names, XYZDataset::Identify's
    header probe); default X Y Z. The grid is inferred from the
    unique sorted coordinates; cells absent from the stream are NaN.
    Output is normalized north-up (rows sorted by descending Y)."""
    text = buf.decode("ascii", errors="replace")
    lines = text.splitlines()
    ix, iy, iz = 0, 1, 2
    start = 0
    for ln in lines:
        t = ln.strip()
        if not t:
            start += 1
            continue
        first = t.replace(",", " ").split()
        try:
            float(first[0])
        except ValueError:
            names = [c.strip('"').lower() for c in first]
            for j, nm in enumerate(names[:3]):
                if nm in ("x", "lon", "long", "longitude", "east", "easting"):
                    ix = j
                elif nm in ("y", "lat", "latitude", "north", "northing"):
                    iy = j
                elif nm in ("z", "alt", "height", "val", "value"):
                    iz = j
            start += 1
        break
    body = " ".join(ln.replace(",", " ") for ln in lines[start:])
    toks = np.array(body.split(), dtype=np.float64)
    if toks.size == 0 or toks.size % 3 != 0:
        raise ValueError("XYZ stream is not triplets")
    triples = toks.reshape(-1, 3)
    xs, ys, zs = triples[:, ix], triples[:, iy], triples[:, iz]
    ux = np.unique(xs)
    uy = np.unique(ys)
    w, h = len(ux), len(uy)
    dx = float(np.min(np.diff(ux))) if w > 1 else 1.0
    dy = float(np.min(np.diff(uy))) if h > 1 else 1.0
    arr = np.full((h, w), np.nan)
    ci = np.searchsorted(ux, xs)
    ri = np.searchsorted(uy, ys)
    arr[(h - 1) - ri, ci] = zs  # descending Y = north-up rows
    transform = (float(ux[0]) - dx / 2.0, dx, 0.0,
                 float(uy[-1]) + dy / 2.0, 0.0, -dy)
    return arr, {"width": w, "height": h, "bands": 1,
                 "transform": transform, "nodata": None,
                 "dtype": "float64"}


def encode_xyz(arr: np.ndarray, transform: Optional[tuple] = None,
               **_kw) -> bytes:
    """(H, W) array -> "X Y Z" lines at pixel centers, row-major from
    the top row (XYZCreateCopy layout). NaN cells are skipped."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        if arr.shape[2] != 1:
            raise ValueError("XYZ is single-band")
        arr = arr[:, :, 0]
    h, w = arr.shape
    gt = transform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    yy, xx = np.mgrid[0:h, 0:w]
    cx = gt[0] + (xx + 0.5) * gt[1]
    cy = gt[3] + (yy + 0.5) * gt[5]
    vv = arr.astype(np.float64)
    keep = ~np.isnan(vv.ravel())
    out = ["X Y Z\n"]
    for x, y, v in zip(cx.ravel()[keep], cy.ravel()[keep], vv.ravel()[keep]):
        vs = str(int(v)) if v == int(v) and abs(v) < 2**53 else repr(v)
        out.append(f"{x!r} {y!r} {vs}\n")
    return "".join(out).encode("ascii")


def identify_xyz(buf: bytes) -> bool:
    head = buf[:512].decode("ascii", errors="replace")
    lines = [ln for ln in head.splitlines() if ln.strip()][:2]
    if not lines:
        return False
    toks = lines[0].replace(",", " ").split()
    if len(toks) != 3:
        return False
    names = {t.strip('"').lower() for t in toks}
    if names & {"x", "y", "z", "lon", "lat"}:
        return len(names & {"x", "y", "z", "lon", "lat", "long", "latitude",
                            "longitude", "alt", "value", "val"}) >= 2
    try:
        [float(t) for t in toks]
        return True
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# GRASS ASCII grid (frmts/aaigrid GRASSASCIIDataset analog)
# ---------------------------------------------------------------------------

def identify_grassascii(buf: bytes) -> bool:
    head = buf[:256].lstrip().lower()
    return head.startswith(b"north:") or head.startswith(b"north ")


def decode_grassascii(buf: bytes) -> Tuple[np.ndarray, dict]:
    """GRASS ASCII grid (r.out.ascii): north/south/east/west/rows/cols
    header lines (plus optional null:/type:), then row-major values
    top-down.  GT = (west, (east-west)/cols, 0, north, 0,
    -(north-south)/rows) — autotest grassasciigrid.py pins
    [-100, 62.5, 0, 250, 0, -41.666...] + checksum 212 on the
    reference fixture (reference GRASSASCIIDataset::ParseHeader,
    aaigriddataset.cpp:626)."""
    text = buf.decode("ascii", errors="replace")
    kv = {}
    rows_txt = []
    for ln in text.splitlines():
        t = ln.strip()
        if not t:
            continue
        key = t.split(":", 1)[0].lower()
        if key in ("north", "south", "east", "west", "rows", "cols",
                   "null", "type") and ":" in t:
            kv[key] = t.split(":", 1)[1].strip()
        else:
            rows_txt.append(t)
    north, south = float(kv["north"]), float(kv["south"])
    east, west = float(kv["east"]), float(kv["west"])
    nrows, ncols = int(kv["rows"]), int(kv["cols"])
    null = kv.get("null", "*")
    flat = []
    for t in rows_txt:
        flat.extend(t.split())
    vals = np.array([np.nan if v == null else float(v) for v in flat],
                    dtype=np.float64)
    arr = vals[:nrows * ncols].reshape(nrows, ncols)
    if kv.get("type", "").lower() in ("int", "cell") or (
            "type" not in kv and not np.isnan(arr).any()
            and np.all(arr == np.rint(arr))):
        arr = arr.astype(np.int32)
    meta = {"width": ncols, "height": nrows, "bands": 1,
            "transform": (west, (east - west) / ncols, 0.0,
                          north, 0.0, -(north - south) / nrows),
            "epsg": None,
            "nodata": None if null == "*" else None}
    return arr, meta


def encode_grassascii(arr: np.ndarray,
                      transform: Optional[tuple] = None) -> bytes:
    a = np.asarray(arr)
    h, w = a.shape
    if transform is None:
        transform = (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    x0, pxw, _r0, y0, _r1, neg_pxh = transform
    out = [f"north: {y0:.6f}\n",
           f"south: {y0 + neg_pxh * h:.6f}\n",
           f"east: {x0 + pxw * w:.6f}\n",
           f"west: {x0:.6f}\n",
           f"rows: {h}\n", f"cols: {w}\n"]
    ints = np.issubdtype(a.dtype, np.integer)
    for row in a:
        out.append(" ".join(str(int(v)) if ints else f"{float(v):.10g}"
                            for v in row) + "\n")
    return "".join(out).encode("ascii")


# ---------------------------------------------------------------------------
# ISG geoid grid (frmts/aaigrid ISGDataset analog)
# ---------------------------------------------------------------------------

def identify_isg(buf: bytes) -> bool:
    head = buf[:4096]
    return (b"begin_of_head" in head and b"lat min" in head
            and b"delta lat" in head)


def _isg_num(s: str) -> float:
    """Decimal or DMS (40\xb000'00\") coordinate value."""
    s = s.strip()
    # latin-1-decoded UTF-8 degree sign reads as "\xc2\xb0"
    for deg in ("\xc2\xb0", "\xb0"):
        if deg in s:
            d, rest = s.split(deg, 1)
            m, sec = "0", "0"
            if "'" in rest:
                m, rest = rest.split("'", 1)
                sec = rest.replace('"', "").strip() or "0"
            sign = -1.0 if d.strip().startswith("-") else 1.0
            return sign * (abs(float(d)) + float(m) / 60.0
                           + float(sec) / 3600.0)
    return float(s)


def _isg_try_round(delta, rounded, vmin, vmax, nvals, tol):
    """The reference's TryRoundTo half/whole-cell snap
    (aaigriddataset.cpp:878-935)."""
    import math

    def snap(v, half):
        q = abs(v / rounded)
        base = math.floor(q) + 0.5 if half else math.floor(q + 0.5)
        out = base * rounded
        return -out if v < 0 else out

    for half in (True, False):
        if rounded == delta:
            continue
        q1 = abs(vmin / rounded)
        q2 = abs(vmax / rounded)
        t1 = abs(q1 - ((math.floor(q1) + 0.5) if half
                       else math.floor(q1 + 0.5)))
        t2 = abs(q2 - ((math.floor(q2) + 0.5) if half
                       else math.floor(q2 + 0.5)))
        if t1 < tol and t2 < tol:
            mn, mx = snap(vmin, half), snap(vmax, half)
            if abs(mn + rounded * nvals - mx) < tol * rounded:
                return rounded, mn, mx, True
    if abs(vmin + delta * nvals - vmax) < tol * delta:
        return delta, vmin, vmax, True
    return delta, vmin, vmax, False


def decode_isg(buf: bytes) -> Tuple[np.ndarray, dict]:
    """ISG (International Service for the Geoid) ascii geoid grid,
    format versions 1.x / 2.0 (half-cell shift).  Reproduces the
    reference's rounding-error auto-correction: deltas like 0.0167
    snap to 1/60 when min/max sit on half- or whole-cell multiples,
    else an approximate fallback recomputes delta from the extent
    (aaigriddataset.cpp:732-990; autotest isg.py pins checksum 159 +
    all four georef fixtures)."""
    import math

    text = buf.decode("latin-1")
    head_start = text.find("begin_of_head")
    head_end = text.find("end_of_head")
    header = text[head_start:head_end]
    body = text[head_end:].split("\n", 1)[1]
    kv = {}
    for ln in header.splitlines():
        if ":" in ln and "=" not in ln.split(":", 1)[0]:
            k, v = ln.split(":", 1)
            kv[k.strip().lower()] = v.strip()
        if "=" in ln:
            k, v = ln.split("=", 1)
            kv[k.strip().lower()] = v.strip()
    use_dms = kv.get("coord units", "").strip() == "dms"

    def num(key):
        s = kv[key]
        return _isg_num(s) if use_dms else float(s)

    lat_min, lat_max = num("lat min"), num("lat max")
    lon_min, lon_max = num("lon min"), num("lon max")
    dlat, dlon = num("delta lat"), num("delta lon")
    nrows, ncols = int(kv["nrows"]), int(kv["ncols"])
    nodata = float(kv.get("nodata", "-9999"))
    version = float(kv.get("isg format", "1.0"))
    if version >= 2.0:
        lat_min -= dlat / 2
        lat_max += dlat / 2
        lon_min -= dlon / 2
        lon_max += dlon / 2

    def rounded_delta(s_txt, d):
        if s_txt == "0.0167" or (d < 1 and
                                 abs(1. / d - math.floor(1. / d + 0.5))
                                 < 0.06):
            return 1. / math.floor(1. / d + 0.5)
        return d

    rd_lon = rounded_delta(kv["delta lon"], dlon)
    rd_lat = rounded_delta(kv["delta lat"], dlat)
    dlon2, lon_min2, lon_max2, ok1 = _isg_try_round(
        dlon, rd_lon, lon_min, lon_max, ncols, 1e-2)
    dlat2, lat_min2, lat_max2, ok2 = _isg_try_round(
        dlat, rd_lat, lat_min, lat_max, nrows, 1e-2)
    ok = ok1 and ok2
    if not ok and kv["delta lon"] == "0.0167" and \
            kv["delta lat"] == "0.0167":
        dlon2, lon_min2, lon_max2, ok1 = _isg_try_round(
            dlon, 0.016667, lon_min, lon_max, ncols, 1e-1)
        dlat2, lat_min2, lat_max2, ok2 = _isg_try_round(
            dlat, 0.016667, lat_min, lat_max, nrows, 1e-1)
        ok = ok1 and ok2
    if ok:
        dlon, lon_min, lon_max = dlon2, lon_min2, lon_max2
        dlat, lat_min, lat_max = dlat2, lat_min2, lat_max2
    else:
        if (abs((lon_max - lon_min) / ncols - dlon) < 0.005 * dlon and
                abs((lat_max - lat_min) / nrows - dlat) < 0.005 * dlat):
            dlon = (lon_max - lon_min) / ncols
            dlat = (lat_max - lat_min) / nrows
        else:
            raise ValueError(
                "ISG: inconsistent extent/resolution/raster dimension")

    vals = np.array(body.split(), dtype=np.float64)[:nrows * ncols]
    if len(vals) < nrows * ncols:  # header-only / truncated fixture
        vals = np.concatenate([vals, np.full(nrows * ncols - len(vals),
                                             nodata)])
    arr = vals.reshape(nrows, ncols).astype(np.float32)
    meta = {"width": ncols, "height": nrows, "bands": 1,
            "transform": (lon_min, dlon, 0.0, lat_max, 0.0, -dlat),
            "epsg": 4326, "nodata": nodata,
            "model_name": kv.get("model name")}
    return arr, meta
