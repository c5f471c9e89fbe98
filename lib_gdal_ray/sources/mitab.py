"""MapInfo MIF/MID vector driver (interchange flavor).

Reference parity: `ogr/ogrsf_frmts/mitab/` (mitab_miffile.cpp,
mitab_feature_mif.cpp) against the reference's own golden oracle
`autotest/ogr/data/mitab/all_geoms.mif.golden.csv`:

  * all MIF object types: Point / Line / Pline [Multiple] / Rect /
    RoundRect / Ellipse / Arc / Text / MultiPoint / Region /
    Collection / None
  * GDAL's exact curve linearization: ellipse-derived shapes use 180
    vertices per full circle (step 360/179 deg; RoundRect corners 45
    per quarter, step 90/44) and Arc entities step 2 deg; every arc
    appends its end point once more after the loop, and polygon
    rings close on their first vertex — reproduced bit-for-bit
    (golden WKT comparison in tests/test_mitab.py).
  * MID attribute rows: Char/Integer/Smallint/LargeInt/Float/
    Decimal/Date/Time/DateTime/Logical columns, custom Delimiter,
    quoted strings.

Ray shape: the header parses driver-side (tiny); the Data section
splits into per-feature text fragments in ONE driver pass (string
scan, no geometry work), then fragments fan out over
`from_items -> map_batches` for parallel geometry decoding — the
same fragment pattern as the XML vector drivers.  MID lines pair
1:1 with MIF features, so each fragment carries its attribute line.
Writes go through parallel fragment serialization + the shared
driver-side streaming concat (two files, .mif + .mid).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import wkb as wkbm

_STYLE_WORDS = ("symbol", "pen", "brush", "font", "smooth", "center",
                "spacing", "justify", "angle", "label")
_GEOM_WORDS = ("point", "line", "pline", "rect", "roundrect", "ellipse",
               "arc", "text", "multipoint", "region", "collection", "none")


# ------------------------------------------------------------------
# GDAL-exact curve linearization (mitab_feature_mif.cpp semantics)

def _arc_points(cx, cy, rx, ry, a1_deg, a2_deg, step_deg) -> np.ndarray:
    """Vertices a1..a2 at `step` degrees, inclusive start, then the
    exact end angle appended once more (the reference emits the end
    point after its loop, duplicating it when the loop lands on it)."""
    n = int(np.floor((a2_deg - a1_deg) / step_deg + 1e-9))
    ang = a1_deg + step_deg * np.arange(n + 1)
    ang = np.append(ang, a2_deg)
    rad = np.radians(ang)
    return np.stack([cx + rx * np.cos(rad), cy + ry * np.sin(rad)], axis=1)


def ellipse_ring(xmin, ymin, xmax, ymax) -> np.ndarray:
    cx, cy = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
    rx, ry = abs(xmax - xmin) / 2.0, abs(ymax - ymin) / 2.0
    pts = _arc_points(cx, cy, rx, ry, 0.0, 360.0, 360.0 / 179.0)
    return np.concatenate([pts, pts[:1]])       # ring closure


def roundrect_ring(xmin, ymin, xmax, ymax, r) -> np.ndarray:
    """CCW from (xmin, ymin+r): four 45-vertex quarter arcs (step
    90/44 deg), each with the reference's duplicated end point."""
    if xmin > xmax:
        xmin, xmax = xmax, xmin
    if ymin > ymax:
        ymin, ymax = ymax, ymin
    # the MIF parameter is the corner diameter (mitab halves it)
    rr = min(r / 2.0, (xmax - xmin) / 2.0, (ymax - ymin) / 2.0)
    step = 90.0 / 44.0
    parts = [
        _arc_points(xmin + rr, ymin + rr, rr, rr, 180.0, 270.0, step),
        _arc_points(xmax - rr, ymin + rr, rr, rr, 270.0, 360.0, step),
        _arc_points(xmax - rr, ymax - rr, rr, rr, 0.0, 90.0, step),
        _arc_points(xmin + rr, ymax - rr, rr, rr, 90.0, 180.0, step),
    ]
    ring = np.concatenate(parts)
    return np.concatenate([ring, ring[:1]])


def rect_ring(xmin, ymin, xmax, ymax) -> np.ndarray:
    if xmin > xmax:
        xmin, xmax = xmax, xmin
    if ymin > ymax:
        ymin, ymax = ymax, ymin
    return np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax],
                     [xmin, ymax], [xmin, ymin]])


def arc_line(xmin, ymin, xmax, ymax, a1, a2) -> np.ndarray:
    cx, cy = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
    rx, ry = abs(xmax - xmin) / 2.0, abs(ymax - ymin) / 2.0
    if a2 <= a1:
        a2 += 360.0
    return _arc_points(cx, cy, rx, ry, a1, a2, 2.0)


# ------------------------------------------------------------------
# header / fragment scan (driver-side, one pass)

_TYPE_MAP = {
    "char": pa.string(), "integer": pa.int32(), "smallint": pa.int32(),
    "largeint": pa.int64(), "float": pa.float64(), "decimal": pa.float64(),
    "date": pa.string(), "time": pa.string(), "datetime": pa.string(),
    "logical": pa.bool_(),
}


def _parse_header(lines: List[str]) -> Tuple[dict, int]:
    """MIF header -> (meta, index of first Data-section line)."""
    meta = {"delimiter": "\t", "columns": []}
    i = 0
    while i < len(lines):
        s = lines[i].strip()
        low = s.lower()
        if low.startswith("delimiter"):
            m = re.search(r'"(.*)"', s)
            if m:
                meta["delimiter"] = m.group(1)
        elif low.startswith("columns"):
            n = int(s.split()[1])
            for j in range(n):
                i += 1
                name, typ = lines[i].strip().split(None, 1)
                base = typ.split("(")[0].strip().lower()
                meta["columns"].append((name, base,
                                        _TYPE_MAP.get(base, pa.string())))
        elif low.startswith("data"):
            return meta, i + 1
        i += 1
    return meta, len(lines)


def _is_feature_start(line: str) -> bool:
    w = line.strip().split()
    if not w:
        return False
    first = w[0].lower()
    if first in ("pline",):
        return True
    return first in _GEOM_WORDS and first not in ("line",) or (
        first == "line" and len(w) >= 5)


def _scan_fragments(mif_lines: List[str], start: int) -> List[List[str]]:
    """Split the Data section into per-feature line fragments.
    Continuation lines (coordinates, counts, style clauses) attach to
    the open feature; a new feature starts at a geometry keyword at
    nesting depth 0 (COLLECTION bodies keep their members inline)."""
    frags: List[List[str]] = []
    cur: Optional[List[str]] = None
    pending = 0          # member geometries still owed to a COLLECTION
    pend_lines = 0       # non-keyword lines owed (coords/counts)
    for raw in mif_lines[start:]:
        s = raw.strip()
        if not s:
            continue
        w0 = s.split()[0].lower()
        is_kw = w0 in _GEOM_WORDS
        if is_kw and pending > 0:
            pending -= 1
            cur.append(raw)
            continue
        if is_kw and pend_lines <= 0:
            cur = [raw]
            frags.append(cur)
            if w0 == "collection":
                pending = int(s.split()[1])
            continue
        if cur is not None:
            cur.append(raw)
            if pend_lines > 0:
                pend_lines -= 1
    return frags


# ------------------------------------------------------------------
# per-fragment geometry parse

def _floats(tokens) -> List[float]:
    return [float(t) for t in tokens]


class _Frag:
    def __init__(self, lines: List[str]):
        self.lines = [ln.strip() for ln in lines if ln.strip()]
        self.i = 0

    def peek(self) -> str:
        return self.lines[self.i] if self.i < len(self.lines) else ""

    def next(self) -> str:
        s = self.peek()
        self.i += 1
        return s

    def style(self) -> str:
        out = []
        while self.i < len(self.lines):
            w0 = self.peek().split()[0].lower()
            if w0 in _STYLE_WORDS:
                out.append(self.next())
            else:
                break
        return " ".join(out)


def _read_pline(f: _Frag, header_words: List[str]):
    words = [w.lower() for w in header_words]
    nsec = 1
    if "multiple" in words:
        nsec = int(header_words[words.index("multiple") + 1])
        counts_inline = False
    else:
        counts_inline = len(header_words) > 1
    sections = []
    for _ in range(nsec):
        if counts_inline and nsec == 1:
            n = int(header_words[1])
        else:
            n = int(f.next().split()[0])
        pts = np.array([_floats(f.next().split()[:2]) for _ in range(n)])
        sections.append(pts)
    return sections


def _parse_feature(lines: List[str]) -> Tuple[Optional[bytes], str]:
    """One MIF fragment -> (WKB or None, raw style string)."""
    f = _Frag(lines)
    geom = _parse_object(f)
    style = f.style()
    if geom is None:
        return None, style
    return geom, style


def _parse_object(f: _Frag) -> Optional[bytes]:
    head = f.next()
    w = head.split()
    kind = w[0].lower()
    if kind == "none":
        return None
    if kind == "point":
        x, y = _floats(w[1:3])
        return wkbm.points_to_wkb(np.array([x]), np.array([y]))[0]
    if kind == "multipoint":
        n = int(w[1])
        pts = [_floats(f.next().split()[:2]) for _ in range(n)]
        return wkbm.multipoint_to_wkb(pts)
    if kind == "line":
        x1, y1, x2, y2 = _floats(w[1:5])
        return wkbm.linestring_to_wkb([(x1, y1), (x2, y2)])
    if kind == "pline":
        secs = _read_pline(f, w)
        if len(secs) == 1:
            return wkbm.linestring_to_wkb(secs[0])
        return wkbm.multilinestring_to_wkb(secs)
    if kind == "rect":
        return wkbm.polygon_to_wkb([rect_ring(*_floats(w[1:5]))])
    if kind == "roundrect":
        return wkbm.polygon_to_wkb([roundrect_ring(*_floats(w[1:6]))])
    if kind == "ellipse":
        return wkbm.polygon_to_wkb([ellipse_ring(*_floats(w[1:5]))])
    if kind == "arc":
        vals = _floats(w[1:])
        if len(vals) >= 6:
            a1, a2 = vals[4], vals[5]
        else:
            a1, a2 = _floats(f.next().split()[:2])
        return wkbm.linestring_to_wkb(arc_line(vals[0], vals[1],
                                               vals[2], vals[3], a1, a2))
    if kind == "text":
        # Text "string" then bounds x1 y1 x2 y2 -> anchor point
        # (center-x, min-y), mitab_feature_mif.cpp TABText; the
        # string may sit on its own line after the keyword
        if len(w) == 1:
            f.next()
        vals_line = f.next()
        x1, y1, x2, y2 = _floats(vals_line.split()[:4])
        return wkbm.points_to_wkb(np.array([(x1 + x2) / 2.0]),
                                  np.array([min(y1, y2)]))[0]
    if kind == "region":
        nrings = int(w[1])
        rings = []
        for _ in range(nrings):
            n = int(f.next().split()[0])
            pts = np.array([_floats(f.next().split()[:2])
                            for _ in range(n)])
            if not np.array_equal(pts[0], pts[-1]):
                pts = np.concatenate([pts, pts[:1]])
            rings.append(pts)
        return _region_wkb(rings)
    if kind == "collection":
        n = int(w[1])
        members = []
        for _ in range(n):
            g = _parse_object(f)
            if g is not None:
                members.append(g)
        return wkbm.geometrycollection_to_wkb(members)
    raise ValueError(f"MIF: unsupported object {kind!r}")


def _region_wkb(rings: List[np.ndarray]) -> bytes:
    """Region rings -> POLYGON (or MULTIPOLYGON when several outer
    rings): a ring inside the current outer is a hole, else it opens
    a new polygon (organizePolygons-lite; containment by PIP of the
    first vertex)."""
    from ..geom import pip

    polys: List[List[np.ndarray]] = []
    for ring in rings:
        placed = False
        for poly in polys:
            if pip.points_in_ring(ring[:1, 0], ring[:1, 1], poly[0])[0]:
                poly.append(ring)
                placed = True
                break
        if not placed:
            polys.append([ring])
    if len(polys) == 1:
        return wkbm.polygon_to_wkb(polys[0])
    return wkbm.multipolygon_to_wkb(polys)


# ------------------------------------------------------------------
# MID attribute parsing

def _split_mid(line: str, delim: str) -> List[str]:
    out, cur, q = [], [], False
    for ch in line:
        if ch == '"':
            q = not q
        elif ch == delim and not q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _typed_column(vals: List[str], base: str, typ: pa.DataType) -> pa.Array:
    if base == "logical":
        return pa.array([None if v == "" else v.upper().startswith("T")
                         for v in vals], typ)
    if typ in (pa.int32(), pa.int64()):
        return pa.array([None if v == "" else int(v) for v in vals], typ)
    if typ == pa.float64():
        return pa.array([None if v == "" else float(v) for v in vals], typ)
    return pa.array(vals, typ)


# ------------------------------------------------------------------
# reader

def read_mif(path: str, *, frags_per_block: int = 2048) -> ray.data.Dataset:
    """.mif [+ .mid] -> Dataset (geometry WKB + typed attribute
    columns + raw `mif_style`).  Header + fragment boundaries scan
    driver-side (one string pass, no geometry math); fragments decode
    in parallel map_batches tasks."""
    with open(path, encoding="utf-8", errors="replace") as fh:
        mif_lines = fh.read().splitlines()
    meta, data_at = _parse_header(mif_lines)
    frags = _scan_fragments(mif_lines, data_at)

    mid_path = os.path.splitext(path)[0] + ".mid"
    if not os.path.exists(mid_path):
        mid_path = os.path.splitext(path)[0] + ".MID"
    mid_rows: List[str] = []
    if meta["columns"] and os.path.exists(mid_path):
        with open(mid_path, encoding="utf-8", errors="replace") as fh:
            mid_rows = fh.read().splitlines()
    items = [{"fid": i, "text": "\n".join(fr),
              "mid": (mid_rows[i] if i < len(mid_rows) else "")}
             for i, fr in enumerate(frags)]
    cols = meta["columns"]
    delim = meta["delimiter"] or "\t"
    if not items:
        schema = pa.schema(
            [("fid", pa.int64())]
            + [(n, t) for n, _b, t in cols]
            + [("mif_style", pa.string()), ("geometry", pa.binary())])
        return ray.data.from_arrow(schema.empty_table())
    n_blocks = max(1, len(items) // frags_per_block)

    def parse(batch: pa.Table) -> pa.Table:
        fids = batch["fid"].to_pylist()
        texts = batch["text"].to_pylist()
        mids = batch["mid"].to_pylist()
        geoms, styles = [], []
        attr_rows: List[List[str]] = []
        for t, m in zip(texts, mids):
            g, s = _parse_feature(t.splitlines())
            geoms.append(g)
            styles.append(s)
            attr_rows.append(_split_mid(m, delim) if cols else [])
        out: Dict[str, pa.Array] = {"fid": pa.array(fids, pa.int64())}
        for ci, (name, base, typ) in enumerate(cols):
            vals = [r[ci] if ci < len(r) else "" for r in attr_rows]
            out[name] = _typed_column(vals, base, typ)
        out["mif_style"] = pa.array(styles, pa.string())
        out["geometry"] = pa.array(geoms, pa.binary())
        return pa.table(out)

    return (ray.data.from_items(items, override_num_blocks=n_blocks)
            .map_batches(parse, batch_format="pyarrow"))


# ------------------------------------------------------------------
# writer

_W_TYPE = {pa.string(): "Char(254)", pa.int32(): "Integer",
           pa.int64(): "LargeInt", pa.float64(): "Float",
           pa.bool_(): "Logical"}


def _fmt(v: float) -> str:
    return repr(float(v))


def _geom_to_mif(g: Optional[bytes]) -> str:
    if g is None:
        return "None"
    kind, payload = wkbm.parse_wkb(g)
    if kind == "point":
        return f"Point {_fmt(payload[0][0])} {_fmt(payload[0][1])}"
    if kind == "multipoint":
        pts = "\n".join(f"{_fmt(x)} {_fmt(y)}" for x, y in payload)
        return f"MultiPoint {len(payload)}\n{pts}"
    if kind == "linestring":
        pts = "\n".join(f"{_fmt(x)} {_fmt(y)}" for x, y in payload)
        return f"Pline {len(payload)}\n{pts}"
    if kind == "multilinestring":
        secs = "\n".join(
            f"{len(seg)}\n" + "\n".join(f"{_fmt(x)} {_fmt(y)}"
                                        for x, y in seg)
            for seg in payload)
        return f"Pline Multiple {len(payload)}\n{secs}"
    if kind == "polygon":
        rings = payload
    elif kind == "multipolygon":
        rings = [r for poly in payload for r in poly]
    else:
        if kind == "geometrycollection":
            parts = [_geom_to_mif(wkbm_member) for wkbm_member in
                     _collection_wkbs(payload)]
            return f"Collection {len(parts)}\n" + "\n".join(parts)
        raise ValueError(f"MIF writer: unsupported {kind}")
    body = "\n".join(
        f"{len(r)}\n" + "\n".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r)
        for r in rings)
    return f"Region {len(rings)}\n{body}"


def _collection_wkbs(members) -> List[bytes]:
    out = []
    for kind, payload in members:
        if kind == "point":
            out.append(wkbm.points_to_wkb(np.array([payload[0][0]]),
                                          np.array([payload[0][1]]))[0])
        elif kind == "linestring":
            out.append(wkbm.linestring_to_wkb(payload))
        elif kind == "polygon":
            out.append(wkbm.polygon_to_wkb(payload))
        elif kind == "multipoint":
            out.append(wkbm.multipoint_to_wkb(payload))
        elif kind == "multilinestring":
            out.append(wkbm.multilinestring_to_wkb(payload))
        elif kind == "multipolygon":
            out.append(wkbm.multipolygon_to_wkb(payload))
    return out


def write_mif(ds: ray.data.Dataset, path: str,
              geometry_col: str = "geometry") -> int:
    """Dataset -> one .mif/.mid pair (parallel fragment shards +
    driver-side streaming concat, the XML writers' pattern).
    Returns the feature count."""
    schema = ds.schema()
    names = [n for n in schema.names if n != geometry_col]
    types = {n: t for n, t in zip(schema.names, schema.types)}
    col_decls = []
    for n in names:
        t = types[n]
        decl = _W_TYPE.get(t)
        if decl is None:
            if pa.types.is_integer(t):
                decl = "LargeInt"
            elif pa.types.is_floating(t):
                decl = "Float"
            else:
                decl = "Char(254)"
        col_decls.append(f"  {n} {decl}")
    header = ("Version 300\nCharset \"Neutral\"\nDelimiter \",\"\n"
              f"Columns {len(names)}\n" + "\n".join(col_decls)
              + ("\n" if col_decls else "") + "Data\n\n")

    def to_lines(batch: pa.Table) -> pa.Table:
        gcol = (batch[geometry_col].to_pylist()
                if geometry_col in batch.column_names
                else [None] * len(batch))
        attr_cols = {n: batch[n].to_pylist() for n in names
                     if n in batch.column_names}
        mifs, mids = [], []
        for i, g in enumerate(gcol):
            mifs.append(_geom_to_mif(g).replace("\n", "\x01"))
            vals = []
            for n in names:
                v = attr_cols.get(n, [None] * len(gcol))[i]
                if v is None:
                    vals.append("")
                elif isinstance(v, bool):
                    vals.append("T" if v else "F")
                elif isinstance(v, str):
                    vals.append(f'"{v}"')
                else:
                    vals.append(str(v))
            mids.append(",".join(vals))
        return pa.table({"mif": pa.array(mifs), "mid": pa.array(mids)})

    frag = ds.map_batches(to_lines, batch_format="pyarrow")
    out_dir = os.path.dirname(os.path.abspath(path)) or "."
    shard_dir = tempfile.mkdtemp(prefix=".mif_shards_", dir=out_dir)
    mid_path = os.path.splitext(path)[0] + ".mid"
    try:
        from .vector_formats import _TextLineDatasink

        sink = _TextLineDatasink.get()(shard_dir, column="mif")
        frag = frag.materialize()
        frag.write_datasink(sink)
        sink2 = _TextLineDatasink.get()(shard_dir + "_mid", column="mid")
        frag.write_datasink(sink2)
        n = 0
        with open(path + ".tmp", "w") as out:
            out.write(header)
            for name in sorted(os.listdir(shard_dir)):
                with open(os.path.join(shard_dir, name)) as f:
                    for line in f:
                        out.write(line.rstrip("\n").replace("\x01", "\n")
                                  + "\n")
                        n += 1
        with open(mid_path + ".tmp", "w") as out:
            for name in sorted(os.listdir(shard_dir + "_mid")):
                with open(os.path.join(shard_dir + "_mid", name)) as f:
                    shutil.copyfileobj(f, out)
        os.replace(path + ".tmp", path)
        os.replace(mid_path + ".tmp", mid_path)
        return n
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)
        shutil.rmtree(shard_dir + "_mid", ignore_errors=True)
        for p in (path + ".tmp", mid_path + ".tmp"):
            if os.path.exists(p):
                os.unlink(p)
