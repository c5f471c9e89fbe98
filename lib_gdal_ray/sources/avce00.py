"""Arc/Info E00 (AVCE00) vector coverage reader.

E00 is the ASCII interchange dump of an Arc/Info coverage: sections
ARC (arcs: id, userid, from/to node, left/right poly, vertex count,
E-format coordinate pairs), LAB (label points), PAL (polygon arc
lists: count + bbox, then (arc, fnode, adjpoly) triplets, arc id 0
separating rings, record 1 = universe polygon), CNT (centroids), TOL,
PRJ (projection keywords), and IFO tables (INFO: fixed-width records
wrapped at 80 chars; field widths by type/size — float(60) size 4 →
14 chars %14.7E, int(50) size 4 → 11 / size 2 → 6, char(20) → size
chars, date(10) → 8).

Layer assembly mirrors the reference OGR driver: ARC features carry
UserId/FNODE_/TNODE_/LPOLY_/RPOLY_ (+ .AAT join), PAL features carry
ArcIds + the .PAT join (universe polygon skipped, rings chained from
the arc table by greedy endpoint matching), LAB carries ValueId/
PolyId (+ .PAT join when the coverage has no PAL), CNT carries
LabelIds.  Precision 2 coordinates are float32 (widened), 3 float64.

Reference: ogr/ogrsf_frmts/avc (ogravclayer.cpp:71-146 schemas,
avc_e00parse.c record grammar), public E00 description at Annex A of
the AVCE00 docs; autotest ogr_avc.py pins arc/polygon WKTs, ArcIds
[-4,-5], AREA 9939.059, the 80-point well coverage. Re-derived; no
code copied.  Compressed E00 and binary AVCBin coverages are out of
scope (documented).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkb_mod


def identify_e00(buf: bytes) -> bool:
    return buf[:4] == b"EXP " or buf[:4] == b"EXP\t"


class _Lines:
    def __init__(self, text: str):
        self.lines = text.splitlines()
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.lines[self.i] if self.i < len(self.lines) else None

    def next(self) -> str:
        ln = self.lines[self.i]
        self.i += 1
        return ln


def _floats(ln: str) -> List[float]:
    return [float(v) for v in ln.split()]


def _parse_arcs(L: _Lines, single: bool):
    arcs = {}
    order = []
    while True:
        head = [int(v) for v in L.next().split()]
        if head[0] == -1:
            break
        arc_id, user_id, fnode, tnode, lpoly, rpoly, npts = head[:7]
        coords = []
        while len(coords) < npts * 2:
            coords.extend(_floats(L.next()))
        pts = np.array(coords[:npts * 2], dtype=np.float64).reshape(-1, 2)
        if single:
            pts = pts.astype(np.float32).astype(np.float64)
        arcs[arc_id] = {"user_id": user_id, "fnode": fnode,
                        "tnode": tnode, "lpoly": lpoly, "rpoly": rpoly,
                        "pts": pts}
        order.append(arc_id)
    return arcs, order


def _parse_labs(L: _Lines, single: bool):
    labs = []
    while True:
        parts = L.next().split()
        if int(parts[0]) == -1:
            break
        lab_id, poly_id = int(parts[0]), int(parts[1])
        x, y = float(parts[2]), float(parts[3])
        # the label box: 2 pairs (single: one line; double: two)
        got = 0
        while got < 4:
            got += len(_floats(L.next()))
        if single:
            x = float(np.float32(x))
            y = float(np.float32(y))
        labs.append({"value_id": lab_id, "poly_id": poly_id,
                     "x": x, "y": y})
    return labs


def _parse_pal(L: _Lines):
    pals = []
    while True:
        parts = L.next().split()
        n = int(parts[0])
        if n == -1:
            break
        vals = parts[1:]
        while len(vals) < 4:
            vals.extend(L.next().split())
        trips = []
        while len(trips) < n * 3:
            trips.extend(int(v) for v in L.next().split())
        arcs = [(trips[i], trips[i + 1], trips[i + 2])
                for i in range(0, n * 3, 3)]
        pals.append({"n": n, "arcs": arcs})
    return pals


def _parse_cnt(L: _Lines):
    cnts = []
    while True:
        parts = L.next().split()
        n = int(parts[0])
        if n == -1:
            break
        x, y = float(parts[1]), float(parts[2])
        ids = []
        while len(ids) < n:
            ids.extend(int(v) for v in L.next().split())
        cnts.append({"x": x, "y": y, "label_ids": ids})
    return cnts


def _field_width(ftype: int, size: int, outw: int) -> int:
    if ftype == 60:
        return 14 if size == 4 else 24
    if ftype == 50:
        return 6 if size <= 2 else 11
    if ftype == 40:
        return 14
    if ftype == 10:
        return 8
    return size  # 20 = character


def _parse_ifo(L: _Lines):
    """IFO tables -> {table_name: {fields: [(name, type)], rows}}."""
    tables = {}
    while True:
        ln = L.next()
        if ln.strip() == "EOI":
            break
        name = ln[:32].strip()
        ints = [int(t) for t in ln[32:].replace("XX", " ").split()]
        n_fields, n_records = ints[0], ints[-1]
        fields = []
        for _ in range(n_fields):
            fln = L.next()
            fname = fln[:16].strip()
            import re as _re

            nums = [int(v) for v in _re.findall(r"-?\d+", fln[16:])]
            size, outw, prec, ftype = nums[0], nums[4], nums[5], nums[6]
            fields.append((fname, ftype, _field_width(ftype, size, outw)))
        rec_len = sum(w for _, _, w in fields)
        n_lines = max(1, (rec_len + 79) // 80)
        rows = []
        for _ in range(n_records):
            raw = ""
            for _ln in range(n_lines):
                raw += L.next().ljust(80)
            pos = 0
            row = {}
            for fname, ftype, w in fields:
                tok = raw[pos:pos + w]
                pos += w
                if ftype in (50,):
                    row[fname] = int(tok) if tok.strip() else None
                elif ftype in (60, 40):
                    row[fname] = float(tok) if tok.strip() else None
                else:
                    row[fname] = tok.strip()
            rows.append(row)
        tables[name] = {"fields": fields, "rows": rows}
    return tables


def _skip_until(L: _Lines, token: str):
    while True:
        if L.next().strip() == token:
            return


def _parse_prj(L: _Lines):
    prj = {}
    while True:
        ln = L.next()
        if ln.strip() == "EOP":
            return prj
        if ln.strip() == "~":
            continue
        parts = ln.split(None, 1)
        if parts:
            prj[parts[0]] = parts[1].strip() if len(parts) > 1 else ""


def _chain_ring(arc_ids, arcs) -> Optional[np.ndarray]:
    """Greedy endpoint chaining of the referenced arcs into a closed
    ring (sign-agnostic, as the reference's geometry generator)."""
    segs = [arcs[abs(a)]["pts"] for a in arc_ids if abs(a) in arcs]
    if not segs:
        return None
    ring = segs[0]
    rest = segs[1:]
    while rest:
        end = ring[-1]
        for i, s in enumerate(rest):
            if np.allclose(s[0], end, atol=1e-6):
                ring = np.vstack([ring, s[1:]])
                rest.pop(i)
                break
            if np.allclose(s[-1], end, atol=1e-6):
                ring = np.vstack([ring, s[::-1][1:]])
                rest.pop(i)
                break
        else:
            # no continuation found: flip the ring once, else bail
            ring = ring[::-1]
            end2 = ring[-1]
            if not any(np.allclose(s[0], end2, atol=1e-6) or
                       np.allclose(s[-1], end2, atol=1e-6)
                       for s in rest):
                ring = np.vstack([ring] + rest)
                break
    if not np.allclose(ring[0], ring[-1], atol=1e-6):
        ring = np.vstack([ring, ring[:1]])
    return ring


def read_e00(path: str) -> Dict[str, pa.Table]:
    """E00 file -> {layer_name: Arrow table}. Layers: ARC, PAL, LAB,
    CNT (whichever the coverage carries)."""
    with open(path, "r", encoding="latin-1") as f:
        text = f.read()
    if text[:7].startswith("EXP  1") or "compressed" in text[:40].lower():
        # Reference parity: the AVCE00 driver itself rejects
        # compressed archives (avc_e00read.cpp:1374-1385,
        # autotest/ogr/ogr_avc.py:77-83 asserts the open FAILS) —
        # same contract, same guidance
        raise ValueError(
            "This looks like a compressed E00 file and cannot be "
            "processed directly. You may need to uncompress it first "
            "using the E00compr library or the e00conv program.")
    L = _Lines(text)
    first = L.next()
    if not first.startswith("EXP"):
        raise ValueError("not an E00 file")

    arcs: dict = {}
    arc_order: list = []
    labs: list = []
    pals: list = []
    cnts: list = []
    tables: dict = {}
    prj: dict = {}
    while L.peek() is not None:
        ln = L.next()
        tok = ln.split()
        if not tok:
            continue
        sec = tok[0]
        single = len(tok) > 1 and tok[1] == "2"
        if sec == "ARC":
            arcs, arc_order = _parse_arcs(L, single)
        elif sec == "LAB":
            labs = _parse_labs(L, single)
        elif sec == "PAL":
            pals = _parse_pal(L)
        elif sec == "CNT":
            cnts = _parse_cnt(L)
        elif sec == "TOL":
            while int(L.next().split()[0]) != -1:
                pass
        elif sec == "PRJ":
            prj = _parse_prj(L)
        elif sec == "LOG":
            _skip_until(L, "EOL")
        elif sec == "SIN":
            pass  # followed by EOX on its own line
        elif sec == "IFO":
            tables = _parse_ifo(L)
        elif sec in ("EOX", "EOS"):
            continue

    out: Dict[str, pa.Table] = {}
    meta = {b"e00_prj_" + k.encode(): v.encode()
            for k, v in prj.items()} if prj else None

    def table_rows(suffix: str):
        for name, t in tables.items():
            if name.upper().endswith(suffix):
                return t["rows"]
        return None

    if arcs:
        aat = table_rows(".AAT")
        cols = {
            "fid": pa.array(arc_order, pa.int64()),
            "UserId": pa.array([arcs[a]["user_id"] for a in arc_order],
                               pa.int64()),
            "FNODE_": pa.array([arcs[a]["fnode"] for a in arc_order],
                               pa.int64()),
            "TNODE_": pa.array([arcs[a]["tnode"] for a in arc_order],
                               pa.int64()),
            "LPOLY_": pa.array([arcs[a]["lpoly"] for a in arc_order],
                               pa.int64()),
            "RPOLY_": pa.array([arcs[a]["rpoly"] for a in arc_order],
                               pa.int64()),
        }
        _merge_table(cols, aat, len(arc_order))
        cols["geometry"] = pa.array(
            [wkb_mod.linestring_to_wkb(arcs[a]["pts"])
             for a in arc_order], pa.binary())
        out["ARC"] = pa.table(cols)
        if meta:
            out["ARC"] = out["ARC"].replace_schema_metadata(meta)

    if pals:
        pat = table_rows(".PAT")
        rows = pals[1:]  # record 1 = universe polygon
        arc_id_lists = []
        geoms = []
        for p in rows:
            ids = [t[0] for t in p["arcs"]]
            rings_ids: List[list] = [[]]
            for a in ids:
                if a == 0:
                    rings_ids.append([])
                else:
                    rings_ids[-1].append(a)
            rings = [r for r in
                     (_chain_ring(g, arcs) for g in rings_ids if g)
                     if r is not None]
            geoms.append(wkb_mod.polygon_to_wkb(rings) if rings
                         else None)
            arc_id_lists.append(ids)
        cols = {"fid": pa.array(range(1, len(rows) + 1), pa.int64()),
                "ArcIds": pa.array(arc_id_lists,
                                   pa.list_(pa.int64()))}
        _merge_table(cols, pat[1:] if pat and len(pat) > len(rows)
                     else pat, len(rows))
        cols["geometry"] = pa.array(geoms, pa.binary())
        out["PAL"] = pa.table(cols)

    if labs:
        cols = {"fid": pa.array(range(1, len(labs) + 1), pa.int64()),
                "ValueId": pa.array([r["value_id"] for r in labs],
                                    pa.int64()),
                "PolyId": pa.array([r["poly_id"] for r in labs],
                                   pa.int64())}
        if not pals:  # point coverage: PAT describes the labels
            _merge_table(cols, table_rows(".PAT"), len(labs))
        cols["geometry"] = pa.array(
            [bytes(wkb_mod.points_to_wkb(np.array([r["x"]]),
                                         np.array([r["y"]]))[0])
             for r in labs], pa.binary())
        out["LAB"] = pa.table(cols)

    if cnts:
        out["CNT"] = pa.table({
            "fid": pa.array(range(1, len(cnts) + 1), pa.int64()),
            "LabelIds": pa.array([c["label_ids"] for c in cnts],
                                 pa.list_(pa.int64())),
            "geometry": pa.array(
                [bytes(wkb_mod.points_to_wkb(np.array([c["x"]]),
                                             np.array([c["y"]]))[0])
                 for c in cnts], pa.binary()),
        })
    return out


def _merge_table(cols: dict, rows, n: int):
    if not rows or len(rows) < n:
        return
    rows = rows[:n] if len(rows) == n else rows[-n:]
    for fname in rows[0]:
        vals = [r[fname] for r in rows]
        if all(v is None or isinstance(v, int) for v in vals):
            cols[fname] = pa.array(vals, pa.int64())
        elif all(v is None or isinstance(v, (int, float))
                 for v in vals):
            cols[fname] = pa.array(
                [None if v is None else float(v) for v in vals],
                pa.float64())
        else:
            cols[fname] = pa.array([None if v is None else str(v)
                                    for v in vals], pa.string())
