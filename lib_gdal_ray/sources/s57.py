"""S-57 (IHO ENC nautical chart) vector driver over ISO 8211.

Re-derivation of ogr/ogrsf_frmts/s57/ (s57reader.cpp feature/spatial
assembly, ogrs57datasource.cpp layer classification,
s57classregistrar.cpp CSV registry):

- cell = one ISO 8211 module (codecs/iso8211.py): DSID/DSSI metadata,
  DSPM scale factors (COMF for coordinates, SOMF for soundings),
  vector records VI(110)/VC(120)/VE(130) with SG2D/SG3D coordinate
  arrays + VRPT begin/end-node pointers, feature records FRID with
  FOID identity, ATTF/NATF attributes and FSPT spatial pointers.
- geometry assembly (s57reader.cpp AssemblePointGeometry /
  AssembleLineGeometry / AssembleAreaGeometry): points read their
  node (SG3D nodes -> MULTIPOINT Z with depth = VE3D/SOMF); lines
  walk FSPT edges, each edge = begin node + SG2D + end node,
  reversed when ORNT=2, contiguous edges merged into one part; areas
  stitch edge chains into closed rings, USAG=2 rings become holes of
  the exterior ring that contains them.
- layers: features group by OBJL through the object-class registry
  (s57objectclasses.csv / s57attributes.csv, the public IHO object
  catalogue; pass `registry_dir=` or set $S57_CSV — a built-in
  subset of common classes covers registry-less operation); the DSID
  layer carries the dataset identification fields.
- updates: sibling .001/.002/... cells are applied in order
  (s57reader.cpp ApplyUpdates): RUIN 1=insert/2=delete/3=modify,
  ATTF merge by attribute code, FSPC/VRPC pointer splices, SGCC
  coordinate splices; an update DSID replaces the base DSID fields.

Ray shape: one cell file = one decode task (cells are small by
standard, <= a few MB); datasets of many cells fan out per file.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

from lib_gdal_ray.codecs.iso8211 import decode_field, read_module
from lib_gdal_ray.geom.wkb import (linestring_to_wkb, multilinestring_to_wkb,
                                   point_z_to_wkb, polygon_to_wkb)
from lib_gdal_ray.geom.pip import points_in_ring

RCNM_FE, RCNM_DS, RCNM_DP = 100, 10, 20
RCNM_VI, RCNM_VC, RCNM_VE = 110, 120, 130

# built-in subset of the IHO S-57 object catalogue (code -> acronym);
# the full table loads from s57objectclasses.csv when available.
_BUILTIN_CLASSES = {
    30: "COALNE", 42: "DEPARE", 43: "DEPCNT", 58: "FOGSIG", 71: "LNDARE",
    72: "LNDELV", 73: "LNDMRK", 74: "LNDRGN", 75: "LIGHTS", 84: "OBSTRN",
    86: "PILPNT", 90: "PONTON", 94: "RIVERS", 109: "ROADWY", 112: "SEAARE",
    119: "SLCONS", 121: "SBDARE", 122: "SLCONS", 126: "SLOTOP",
    129: "SOUNDG", 144: "TOPMAR", 153: "UWTROC", 159: "WRECKS",
    302: "M_COVR", 305: "M_NPUB", 306: "M_NSYS", 308: "M_QUAL",
}
_BUILTIN_ATTRS = {
    18: ("CATZOC", "E"), 75: ("DRVAL1", "F"), 76: ("DRVAL2", "F"),
    102: ("INFORM", "S"), 103: ("NINFOM", "S"), 116: ("OBJNAM", "S"),
    117: ("NOBJNM", "S"), 133: ("QUASOU", "L"), 179: ("VALDCO", "F"),
    178: ("VALACM", "F"), 90: ("HEIGHT", "F"), 178 + 1000: ("", "S"),
}


class S57Registry:
    """OBJL code -> acronym / attribute code -> (acronym, type)."""

    def __init__(self, registry_dir: Optional[str] = None):
        self.classes: Dict[int, str] = dict(_BUILTIN_CLASSES)
        self.class_prims: Dict[int, str] = {}
        self.attrs: Dict[int, Tuple[str, str]] = {
            k: v for k, v in _BUILTIN_ATTRS.items() if v[0]}
        d = registry_dir or os.environ.get("S57_CSV")
        if d:
            self._load_csv(d)

    def _load_csv(self, d: str) -> None:
        import csv
        oc = os.path.join(d, "s57objectclasses.csv")
        at = os.path.join(d, "s57attributes.csv")
        if os.path.exists(oc):
            with open(oc, newline="", encoding="latin-1") as fh:
                for row in csv.DictReader(fh):
                    try:
                        code = int(row["Code"])
                    except (KeyError, ValueError):
                        continue
                    self.classes[code] = row["Acronym"]
                    self.class_prims[code] = row.get("Primitives", "")
        if os.path.exists(at):
            with open(at, newline="", encoding="latin-1") as fh:
                for row in csv.DictReader(fh):
                    try:
                        code = int(row["Code"])
                    except (KeyError, ValueError):
                        continue
                    self.attrs[code] = (row["Acronym"],
                                        row.get("Attributetype", "S"))

    def acronym(self, objl: int) -> str:
        return self.classes.get(objl, f"O{objl}")


def _dec_text(raw, level: int) -> Optional[str]:
    if raw is None:
        return None
    if isinstance(raw, str):
        return raw
    if level == 2:
        b = raw
        if len(b) % 2:
            b = b[:-1]
        return b.decode("utf-16-le", "replace").rstrip("\x00")
    return raw.decode("latin-1" if level else "ascii", "replace")


class _Cell:
    """Decoded record store for one cell + its applied updates."""

    def __init__(self):
        self.dsid: Dict[str, object] = {}
        self.dssi: Dict[str, object] = {}
        self.comf = 1.0
        self.somf = 1.0
        self.nodes: Dict[Tuple[int, int], dict] = {}   # (rcnm,rcid)
        self.features: Dict[int, dict] = {}            # rcid -> feat


def _vrpt_pairs(groups):
    out = []
    for g in groups:
        name = g.get("NAME", b"\x00" * 5)
        out.append({"rcnm": name[0], "rcid": int.from_bytes(name[1:5],
                                                            "little"),
                    "ornt": g.get("ORNT", 255), "usag": g.get("USAG", 255),
                    "topi": g.get("TOPI", 255), "mask": g.get("MASK", 255)})
    return out


def _parse_cell_file(buf: bytes, cell: _Cell, is_update: bool) -> None:
    defns, recs = read_module(buf)

    def dec(tag, rec):
        raw = rec.raw(tag)
        return decode_field(defns[tag], raw) if raw is not None else []

    for rec in recs:
        if "DSID" in rec.fields:
            g = dec("DSID", rec)[0]
            cell.dsid.update(g)
            if "DSSI" in rec.fields:
                cell.dssi.update(dec("DSSI", rec)[0])
            continue
        if "DSPM" in rec.fields:
            g = dec("DSPM", rec)[0]
            cell.comf = float(g.get("COMF") or 1.0)
            cell.somf = float(g.get("SOMF") or 1.0)
            continue
        if "VRID" in rec.fields:
            v = dec("VRID", rec)[0]
            key = (v["RCNM"], v["RCID"])
            ruin = v.get("RUIN", 1)
            sg2d = dec("SG2D", rec)
            sg3d = dec("SG3D", rec)
            coords = [(g["XCOO"], g["YCOO"]) for g in sg2d]
            coords3 = [(g["XCOO"], g["YCOO"], g["VE3D"]) for g in sg3d]
            vrpt = _vrpt_pairs(dec("VRPT", rec))
            if not is_update or ruin == 1:
                cell.nodes[key] = {"rver": v.get("RVER", 1), "xy": coords,
                                   "xyz": coords3, "vrpt": vrpt}
                continue
            if ruin == 2:
                cell.nodes.pop(key, None)
                continue
            # modify
            node = cell.nodes.get(key)
            if node is None:
                continue
            node["rver"] = v.get("RVER", node["rver"])
            sgcc = dec("SGCC", rec)
            if sgcc:
                c = sgcc[0]
                ccui, ccix = c.get("CCUI", 3), c.get("CCIX", 1)
                ccnc = c.get("CCNC", len(coords) or len(coords3))
                tgt = "xyz" if (coords3 or node["xyz"]) else "xy"
                new = coords3 if tgt == "xyz" else coords
                arr = node[tgt]
                i = ccix - 1
                if ccui == 1:      # insert before CCIX
                    node[tgt] = arr[:i] + new + arr[i:]
                elif ccui == 2:    # delete CCNC at CCIX
                    node[tgt] = arr[:i] + arr[i + ccnc:]
                else:              # modify in place
                    node[tgt] = arr[:i] + new + arr[i + len(new):]
            elif coords or coords3:
                if coords:
                    node["xy"] = coords
                if coords3:
                    node["xyz"] = coords3
            vrpc = dec("VRPC", rec)
            if vrpc and vrpt:
                c = vrpc[0]
                vpui, vpix = c.get("VPUI", 3), c.get("VPIX", 1)
                nvpt = c.get("NVPT", len(vrpt))
                arr = node["vrpt"]
                i = vpix - 1
                if vpui == 1:
                    node["vrpt"] = arr[:i] + vrpt + arr[i:]
                elif vpui == 2:
                    node["vrpt"] = arr[:i] + arr[i + nvpt:]
                else:
                    node["vrpt"] = arr[:i] + vrpt + arr[i + len(vrpt):]
            elif vrpt:
                node["vrpt"] = vrpt
            continue
        if "FRID" in rec.fields:
            f = dec("FRID", rec)[0]
            rcid = f["RCID"]
            ruin = f.get("RUIN", 1)
            foid = dec("FOID", rec)
            attf = dec("ATTF", rec)
            natf = dec("NATF", rec)
            fspt = _vrpt_pairs(dec("FSPT", rec))
            ffpt = dec("FFPT", rec)
            if not is_update or ruin == 1:
                cell.features[rcid] = {
                    "frid": f, "foid": foid[0] if foid else {},
                    "attf": {g["ATTL"]: g["ATVL"] for g in attf},
                    "natf": {g["ATTL"]: g["ATVL"] for g in natf},
                    "fspt": fspt, "ffpt": ffpt}
                continue
            if ruin == 2:
                cell.features.pop(rcid, None)
                continue
            feat = cell.features.get(rcid)
            if feat is None:
                continue
            feat["frid"]["RVER"] = f.get("RVER", feat["frid"].get("RVER"))
            for g in attf:
                feat["attf"][g["ATTL"]] = g["ATVL"]
            for g in natf:
                feat["natf"][g["ATTL"]] = g["ATVL"]
            fspc = dec("FSPC", rec)
            if fspc:
                c = fspc[0]
                fsui, fsix = c.get("FSUI", 3), c.get("FSIX", 1)
                nspt = c.get("NSPT", len(fspt))
                arr = feat["fspt"]
                i = fsix - 1
                if fsui == 1:
                    feat["fspt"] = arr[:i] + fspt + arr[i:]
                elif fsui == 2:
                    feat["fspt"] = arr[:i] + arr[i + nspt:]
                else:
                    feat["fspt"] = arr[:i] + fspt + arr[i + len(fspt):]
            elif fspt:
                feat["fspt"] = fspt


def _update_paths(path: str) -> List[str]:
    base = path[:-4]
    out = []
    n = 1
    while True:
        p = f"{base}.{n:03d}"
        if not os.path.exists(p):
            break
        out.append(p)
        n += 1
    return out


def open_s57(path: str) -> _Cell:
    cell = _Cell()
    with open(path, "rb") as fh:
        _parse_cell_file(fh.read(), cell, is_update=False)
    for up in _update_paths(path):
        with open(up, "rb") as fh:
            _parse_cell_file(fh.read(), cell, is_update=True)
    return cell


# ---------------------------------------------------------------- geometry

def _node_xy(cell: _Cell, rcnm: int, rcid: int) -> Optional[Tuple[float,
                                                                  float]]:
    node = cell.nodes.get((rcnm, rcid))
    if not node:
        return None
    pts = node["xy"] or [(x, y) for x, y, _ in node["xyz"]]
    if not pts:
        return None
    x, y = pts[0]
    return x / cell.comf, y / cell.comf


def _edge_coords(cell: _Cell, rcid: int, ornt: int) -> Optional[np.ndarray]:
    """Edge rcid -> (n,2) points: begin node + SG2D + end node, the
    whole run reversed when ORNT=2 (s57reader.cpp AssembleLineGeometry;
    area assembly passes ornt=1: edges ride as stored)."""
    edge = cell.nodes.get((RCNM_VE, rcid))
    if edge is None:
        return None
    vrpt = edge["vrpt"]
    first = _node_xy(cell, vrpt[0]["rcnm"], vrpt[0]["rcid"]) if vrpt else None
    last = (_node_xy(cell, vrpt[1]["rcnm"], vrpt[1]["rcid"])
            if len(vrpt) > 1 else None)
    if vrpt and vrpt[0].get("topi") == 2:  # file lists end node first
        first, last = last, first
    mid = [(x / cell.comf, y / cell.comf) for x, y in edge["xy"]]
    pts = ([first] if first else []) + mid + ([last] if last else [])
    if len(pts) < 2:
        return None
    arr = np.asarray(pts, dtype=np.float64)
    if ornt == 2:
        arr = arr[::-1]
    return arr


def _same_pt(a, b) -> bool:
    return abs(a[0] - b[0]) <= 1e-8 and abs(a[1] - b[1]) <= 1e-8


def _assemble_line(cell: _Cell, fspt: List[dict]):
    parts: List[np.ndarray] = []
    for p in fspt:
        if p["rcnm"] != RCNM_VE:
            continue
        seg = _edge_coords(cell, p["rcid"], p["ornt"])
        if seg is None:
            continue
        if parts and _same_pt(parts[-1][-1], seg[0]):
            parts[-1] = np.vstack([parts[-1], seg[1:]])
        else:
            parts.append(seg)
    if not parts:
        return None
    if len(parts) == 1:
        return linestring_to_wkb(parts[0])
    return multilinestring_to_wkb(parts)


def _stitch_rings(lines: List[np.ndarray]) -> List[np.ndarray]:
    """Chain edge polylines into closed rings by endpoint matching."""
    rings: List[np.ndarray] = []
    todo = list(lines)
    while todo:
        chain = todo.pop(0)
        progressed = True
        while not _same_pt(chain[0], chain[-1]) and progressed:
            progressed = False
            for i, seg in enumerate(todo):
                if _same_pt(chain[-1], seg[0]):
                    chain = np.vstack([chain, seg[1:]])
                elif _same_pt(chain[-1], seg[-1]):
                    chain = np.vstack([chain, seg[::-1][1:]])
                else:
                    continue
                todo.pop(i)
                progressed = True
                break
        if len(chain) >= 4 and _same_pt(chain[0], chain[-1]):
            rings.append(chain)
    return rings


def _assemble_area(cell: _Cell, fspt: List[dict]):
    ext_lines, int_lines = [], []
    for p in fspt:
        if p["rcnm"] != RCNM_VE:
            continue
        seg = _edge_coords(cell, p["rcid"], 1)  # areas: edges as stored
        if seg is None:
            continue
        (int_lines if p["usag"] == 2 else ext_lines).append(seg)
    ext = _stitch_rings(ext_lines)
    holes = _stitch_rings(int_lines)
    if not ext:
        return None
    if len(ext) == 1:
        return polygon_to_wkb([ext[0]] + holes)
    # multiple exteriors: assign each hole to the exterior containing it
    from lib_gdal_ray.geom.wkb import multipolygon_to_wkb
    polys = [[r] for r in ext]
    for h in holes:
        px, py = np.array([h[0, 0]]), np.array([h[0, 1]])
        for poly in polys:
            if points_in_ring(px, py, poly[0])[0]:
                poly.append(h)
                break
    return multipolygon_to_wkb(polys)


def _multipoint_z_wkb(pts: np.ndarray) -> bytes:
    import struct
    parts = [struct.pack("<BII", 1, 0x80000004, len(pts))]
    for x, y, z in pts:
        parts.append(struct.pack("<BIddd", 1, 0x80000001, x, y, z))
    return b"".join(parts)


def _assemble_point(cell: _Cell, fspt: List[dict]):
    pts3: List[Tuple[float, float, float]] = []
    pt2: Optional[Tuple[float, float]] = None
    for p in fspt:
        node = cell.nodes.get((p["rcnm"], p["rcid"]))
        if node is None:
            continue
        for x, y, z in node["xyz"]:
            pts3.append((x / cell.comf, y / cell.comf, z / cell.somf))
        if node["xy"] and pt2 is None:
            x, y = node["xy"][0]
            pt2 = (x / cell.comf, y / cell.comf)
    if pts3:
        if len(pts3) == 1:
            return point_z_to_wkb(*pts3[0])
        return _multipoint_z_wkb(np.asarray(pts3, dtype=np.float64))
    if pt2 is not None:
        from lib_gdal_ray.geom.wkb import points_to_wkb
        return points_to_wkb(np.array([pt2[0]]), np.array([pt2[1]]))[0]
    return None


def _feature_geometry(cell: _Cell, feat: dict):
    prim = feat["frid"].get("PRIM", 255)
    fspt = feat["fspt"]
    if prim == 1:
        return _assemble_point(cell, fspt)
    if prim == 2:
        return _assemble_line(cell, fspt)
    if prim == 3:
        return _assemble_area(cell, fspt)
    return None


# ------------------------------------------------------------------ layers

def s57_layer_names(path: str,
                    registry_dir: Optional[str] = None) -> List[str]:
    cell = open_s57(path)
    reg = S57Registry(registry_dir)
    seen = []
    for feat in cell.features.values():
        name = reg.acronym(feat["frid"]["OBJL"])
        if name not in seen:
            seen.append(name)
    return ["DSID"] + sorted(seen)


def _typed_value(raw, atype: str, level: int):
    s = _dec_text(raw, level)
    if s is None:
        return None
    if atype == "I":
        try:
            return int(s)
        except ValueError:
            return None
    if atype == "F":
        try:
            return float(s)
        except ValueError:
            return None
    if atype == "L":
        return s.split(",") if s else []
    return s


def _dsid_table(cell: _Cell) -> pa.Table:
    cols: Dict[str, list] = {}
    for k, v in cell.dsid.items():
        cols["DSID_" + k] = [_dec_text(v, 1) if isinstance(v, bytes) else v]
    for k, v in cell.dssi.items():
        cols["DSSI_" + k] = [_dec_text(v, 1) if isinstance(v, bytes) else v]
    return pa.table(cols)


def _layer_table(cell: _Cell, reg: S57Registry, layer: str) -> pa.Table:
    aall = int(cell.dssi.get("AALL", 1) or 1)
    nall = int(cell.dssi.get("NALL", 1) or 1)
    rows = []
    for rcid in sorted(cell.features):
        feat = cell.features[rcid]
        if reg.acronym(feat["frid"]["OBJL"]) != layer:
            continue
        frid, foid = feat["frid"], feat["foid"]
        agen = foid.get("AGEN", 0) or 0
        fidn = foid.get("FIDN", 0) or 0
        fids = foid.get("FIDS", 0) or 0
        row = {
            "RCID": rcid, "PRIM": frid.get("PRIM"), "GRUP": frid.get("GRUP"),
            "OBJL": frid.get("OBJL"), "RVER": frid.get("RVER"),
            "AGEN": agen, "FIDN": fidn, "FIDS": fids,
            "LNAM": f"{agen:04X}{fidn:08X}{fids:04X}",
        }
        attrs = {}
        for code, raw in feat["attf"].items():
            name, atype = reg.attrs.get(code, (f"A{code}", "S"))
            attrs[name] = _typed_value(raw, atype, aall)
        for code, raw in feat["natf"].items():
            name, atype = reg.attrs.get(code, (f"A{code}", "S"))
            attrs[name] = _typed_value(raw, atype, nall)
        row["_attrs"] = attrs
        row["geometry"] = _feature_geometry(cell, feat)
        rows.append(row)
    if not rows:
        return pa.table({"RCID": pa.array([], pa.int32())})
    attr_names = sorted({k for r in rows for k in r["_attrs"]})
    cols: Dict[str, list] = {k: [r[k] for r in rows]
                             for k in ("RCID", "PRIM", "GRUP", "OBJL",
                                       "RVER", "AGEN", "FIDN", "FIDS",
                                       "LNAM")}
    for a in attr_names:
        cols[a] = [r["_attrs"].get(a) for r in rows]
    cols["geometry"] = [r["geometry"] for r in rows]
    arrays, names = [], []
    for k, v in cols.items():
        names.append(k)
        if k in ("RCID", "PRIM", "GRUP", "OBJL", "RVER", "AGEN", "FIDN",
                 "FIDS"):
            arrays.append(pa.array(v, pa.int32()))
        elif k == "geometry":
            arrays.append(pa.array(v, pa.binary()))
        else:
            arrays.append(pa.array(v))
    return pa.Table.from_arrays(arrays, names=names)


def read_s57_table(path: str, layer: Optional[str] = None,
                   registry_dir: Optional[str] = None) -> pa.Table:
    cell = open_s57(path)
    reg = S57Registry(registry_dir)
    if layer in (None, ""):  # default: first (alphabetic) feature layer
        names = [n for n in s57_layer_names(path, registry_dir)
                 if n != "DSID"]
        layer = names[0] if names else "DSID"
    if layer == "DSID":
        return _dsid_table(cell)
    return _layer_table(cell, reg, layer)


def read_s57(path: str, layer: Optional[str] = None,
             registry_dir: Optional[str] = None):
    """S-57 cell(s) -> Dataset. One decode task per cell file."""
    import ray
    import ray.data

    paths = [path] if isinstance(path, str) else list(path)
    ds = ray.data.from_items([{"path": p} for p in paths])

    def decode(batch: pa.Table) -> pa.Table:
        tabs = [read_s57_table(p, layer=layer, registry_dir=registry_dir)
                for p in batch.column("path").to_pylist()]
        return pa.concat_tables(tabs, promote_options="default") \
            if len(tabs) > 1 else tabs[0]

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=1)
