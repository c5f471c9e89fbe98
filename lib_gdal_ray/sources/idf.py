"""INTREST Data Format (IDF) vector reader — the German road-network
interchange text format handled by the reference's VDV driver.

Grammar: `tbl;Name` opens a table, `atr;` names columns, `frm;`
types them (decimal(w[,p]) → int/float, string(n) → text), `rec;`
rows (quoted strings), `end;` closes.  Geometry assembly per the
reference: the Node table (NODE_ID/X/Y[/Z]) makes points, the Link
table (LINK_ID/FROM_NODE/TO_NODE) makes linestrings from the
from-node point, the LinkCoordinate rows (LINK_ID/COUNT/X/Y[/Z]) in
COUNT order, then the to-node point; LinkCoordinate itself also
surfaces as a point layer; other tables are attribute-only layers.

Reference: ogr/ogrsf_frmts/vdv/ogrvdvdatasource.cpp (OGRIDFDataSource
::Parse); autotest ogr_vdv.py test_ogr_idf_1/_3d pin the Node point,
the 4-vertex link line, and the 3D variant. Re-derived; no code
copied.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkb_mod


def identify_idf(buf: bytes) -> bool:
    head = buf[:256]
    return head.startswith(b"chs;") or head.startswith(b"tbl;")


def _split_rec(line: str) -> List[str]:
    out, cur, q = [], [], False
    for ch in line:
        if ch == '"':
            q = not q
        elif ch == ";" and not q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def read_idf(path: str) -> Dict[str, pa.Table]:
    """IDF file -> {layer_name: Arrow table} with geometry columns on
    Node / Link / LinkCoordinate."""
    tables: Dict[str, dict] = {}
    name = None
    atr: List[str] = []
    frm: List[str] = []
    rows: List[list] = []
    with open(path, "r", encoding="latin-1") as f:
        for line in f:
            line = line.rstrip("\r\n")
            if not line:
                continue
            key = line.split(";", 1)[0]
            if key == "tbl":
                name = line.split(";", 1)[1].strip()
                atr, frm, rows = [], [], []
            elif key == "atr":
                atr = [c.strip() for c in line.split(";")[1:]]
            elif key == "frm":
                frm = [c.strip() for c in line.split(";")[1:]]
            elif key == "rec":
                rows.append(_split_rec(line)[1:])
            elif key == "end" and name:
                tables[name] = {"atr": atr, "frm": frm, "rows": rows}
                name = None

    def typed(tbl: dict) -> dict:
        cols: dict = {}
        for i, cname in enumerate(tbl["atr"]):
            fmt = tbl["frm"][i] if i < len(tbl["frm"]) else "string"
            vals = [r[i] if i < len(r) else None for r in tbl["rows"]]
            if fmt.startswith("decimal") and "," not in fmt:
                cols[cname] = [int(v) if v not in (None, "") else None
                               for v in vals]
            elif fmt.startswith("decimal"):
                cols[cname] = [float(v) if v not in (None, "") else None
                               for v in vals]
            else:
                cols[cname] = vals
        return cols

    out: Dict[str, pa.Table] = {}
    node_xy = {}
    node = tables.get("Node")
    if node:
        c = typed(node)
        has_z = "Z" in c
        xs = np.array(c["X"], dtype=np.float64)
        ys = np.array(c["Y"], dtype=np.float64)
        if has_z:
            zs = np.array(c["Z"], dtype=np.float64)
            geoms = [wkb_mod.point_z_to_wkb(x, y, z)
                     for x, y, z in zip(xs, ys, zs)]
            node_xy = {i: (x, y, z) for i, x, y, z in
                       zip(c["NODE_ID"], xs, ys, zs)}
        else:
            pw = wkb_mod.points_to_wkb(xs, ys)
            geoms = [bytes(g) for g in pw]
            node_xy = {i: (x, y) for i, x, y in zip(c["NODE_ID"], xs, ys)}
        c["geometry"] = pa.array(geoms, pa.binary())
        out["Node"] = pa.table(c)

    lc = tables.get("LinkCoordinate")
    link_coords: Dict[int, list] = {}
    if lc:
        c = typed(lc)
        has_z = "Z" in c
        order = sorted(range(len(c["LINK_ID"])),
                       key=lambda i: (c["LINK_ID"][i], c["COUNT"][i]))
        for i in order:
            pt = (c["X"][i], c["Y"][i]) if not has_z else \
                (c["X"][i], c["Y"][i], c["Z"][i])
            link_coords.setdefault(c["LINK_ID"][i], []).append(pt)
        if has_z:
            geoms = [wkb_mod.point_z_to_wkb(x, y, z)
                     for x, y, z in zip(c["X"], c["Y"], c["Z"])]
        else:
            geoms = [bytes(g) for g in wkb_mod.points_to_wkb(
                np.array(c["X"], dtype=np.float64),
                np.array(c["Y"], dtype=np.float64))]
        c["geometry"] = pa.array(geoms, pa.binary())
        out["LinkCoordinate"] = pa.table(c)

    link = tables.get("Link")
    if link:
        c = typed(link)
        geoms = []
        for lid, fn, tn in zip(c["LINK_ID"], c["FROM_NODE"],
                               c["TO_NODE"]):
            pts = []
            if fn in node_xy:
                pts.append(node_xy[fn])
            pts.extend(link_coords.get(lid, []))
            if tn in node_xy:
                pts.append(node_xy[tn])
            if len(pts) >= 2:
                arr = np.array([p[:2] for p in pts], dtype=np.float64)
                if len(pts[0]) == 3 and all(len(p) == 3 for p in pts):
                    geoms.append(wkb_mod.linestring_z_to_wkb(
                        np.array(pts, dtype=np.float64)))
                else:
                    geoms.append(wkb_mod.linestring_to_wkb(arr))
            else:
                geoms.append(None)
        c["geometry"] = pa.array(geoms, pa.binary())
        out["Link"] = pa.table(c)

    for tname, tbl in tables.items():
        if tname not in ("Node", "Link", "LinkCoordinate"):
            out[tname] = pa.table(typed(tbl))
    return out
