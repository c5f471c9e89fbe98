"""GMT ASCII vector driver (.gmt).

Reference ogr/ogrsf_frmts/gmt/ogrgmtlayer.cpp: '#'-comment header
with @VGMT1.0 @G<GEOMTYPE>, @N field names, @T field types;
FEATURE_DATA; '>' segment separators; a segment whose following
comment is an @D attribute line (pipe-separated, double-quote
wrapped strings) begins a NEW feature, '>' without @D continues the
current feature's multi-geometry; '# @H' marks a polygon hole ring.

Read: features parse fragment-parallel after a cheap driver split on
feature boundaries.  Write: parallel per-block feature rendering,
driver-side ordered concat (one text deliverable)."""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

_GTYPES = {"POINT": "point", "LINESTRING": "linestring",
           "POLYGON": "polygon", "MULTIPOINT": "multipoint",
           "MULTILINESTRING": "multilinestring",
           "MULTIPOLYGON": "multipolygon"}


def _split_fields(line: str) -> List[Optional[str]]:
    out = []
    cur = []
    in_q = False
    for ch in line:
        if ch == '"':
            in_q = not in_q
        elif ch == "|" and not in_q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [v if v != "" else None for v in out]


def parse_gmt(text: str):
    """-> (geom_kind, field_names, field_types, features) where each
    feature is (attr_values, [segments], [hole_flags])."""
    kind = "linestring"
    names: List[str] = []
    types: List[str] = []
    feats = []
    cur_attrs: Optional[List] = None
    cur_segs: List[List] = []
    cur_holes: List[bool] = []
    seg: List[Tuple[float, float]] = []
    pending_new = False
    pending_hole = False
    started = False

    def flush_seg():
        nonlocal seg
        if seg:
            cur_segs.append(seg)
            cur_holes.append(pending_hole)
        seg = []

    def flush_feat():
        nonlocal cur_segs, cur_holes, cur_attrs
        flush_seg()
        if cur_segs or cur_attrs is not None:
            feats.append((cur_attrs, cur_segs, cur_holes))
        cur_segs, cur_holes, cur_attrs = [], [], None

    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("#"):
            body = line[1:].strip()
            m = re.search(r"@G([A-Z]+)", body)
            if m and m.group(1).upper() in _GTYPES:
                kind = _GTYPES.get(m.group(1).upper(), "linestring")
                continue
            if body.startswith("@N"):
                names = body[2:].split("|")
                continue
            if body.startswith("@T"):
                types = body[2:].split("|")
                continue
            if body.startswith("@D"):
                # attribute row => the pending '>' began a NEW feature
                if started:
                    flush_feat()
                started = True
                cur_attrs = _split_fields(body[2:])
                pending_new = False
                continue
            if body.startswith("@H"):
                pending_hole = True
            continue
        if line.startswith(">"):
            flush_seg()
            pending_hole = False
            pending_new = True
            continue
        parts = line.split()
        if len(parts) >= 2:
            try:
                x, y = float(parts[0]), float(parts[1])
            except ValueError:
                continue
            if pending_new and cur_attrs is None and not started:
                started = True
            if pending_new and seg:
                flush_seg()
            pending_new = False
            seg.append((x, y))
    flush_feat()
    return kind, names, types, feats


def _feature_wkb(kind: str, segs, holes) -> Optional[bytes]:
    from ..geom import wkb as wkbm

    if not segs:
        return None
    arrs = [np.array(s, float) for s in segs]
    if kind == "point":
        p = arrs[0][0]
        return wkbm.points_to_wkb(np.array([p[0]]), np.array([p[1]]))[0]
    if kind == "multipoint":
        pts = np.vstack(arrs)
        return wkbm.multipoint_to_wkb(pts)
    if kind == "linestring":
        return wkbm.linestring_to_wkb(np.vstack(arrs))
    if kind == "multilinestring":
        return wkbm.multilinestring_to_wkb(arrs)
    if kind == "polygon":
        rings = [_close(a) for a in arrs]
        return wkbm.polygon_to_wkb(rings)
    # multipolygon: a non-hole segment starts a new polygon
    polys: List[List[np.ndarray]] = []
    for a, h in zip(arrs, holes):
        ring = _close(a)
        if h and polys:
            polys[-1].append(ring)
        else:
            polys.append([ring])
    return wkbm.multipolygon_to_wkb(polys)


def _close(a: np.ndarray) -> np.ndarray:
    if len(a) and not np.array_equal(a[0], a[-1]):
        return np.vstack([a, a[:1]])
    return a


_ARROW_T = {"integer": pa.int64(), "double": pa.float64(),
            "datetime": pa.string(), "string": pa.string()}


def read_gmt(path: str, feats_per_task: int = 20_000) -> ray.data.Dataset:
    with open(path) as fh:
        kind, names, types, feats = parse_gmt(fh.read())
    if not names:
        names, types = [], []
    col_types = [(n, _ARROW_T.get((t or "string").lower(), pa.string()))
                 for n, t in zip(names, (types + ["string"] * len(names)))]

    items = [{"i": i} for i in range(0, max(len(feats), 1),
                                     feats_per_task)]
    import ray as _ray

    feats_ref = _ray.put((kind, col_types, feats))

    def build(batch: pa.Table) -> pa.Table:
        k, ct, all_feats = _ray.get(feats_ref)
        geoms, cols = [], {n: [] for n, _ in ct}
        for row in batch.to_pylist():
            for attrs, segs, holes in \
                    all_feats[row["i"]:row["i"] + feats_per_task]:
                geoms.append(_feature_wkb(k, segs, holes))
                for j, (n, t) in enumerate(ct):
                    v = attrs[j] if attrs and j < len(attrs) else None
                    if v is not None and t == pa.int64():
                        v = int(float(v))
                    elif v is not None and t == pa.float64():
                        v = float(v)
                    cols[n].append(v)
        data = {"geometry": pa.array(geoms, pa.binary())}
        for n, t in ct:
            data[n] = pa.array(cols[n], type=t)
        return pa.table(data)

    return (ray.data.from_items(items)
            .map_batches(build, batch_format="pyarrow", batch_size=1))


_GMT_NAME = {"point": "POINT", "linestring": "LINESTRING",
             "polygon": "POLYGON", "multipoint": "MULTIPOINT",
             "multilinestring": "MULTILINESTRING",
             "multipolygon": "MULTIPOLYGON"}


def write_gmt(ds: ray.data.Dataset, path: str,
              geometry_col: str = "geometry") -> int:
    """Dataset -> one .gmt file (parallel feature render, ordered
    driver concat)."""
    from ..geom import wkb as wkbm

    dsch = ds.schema()
    attr_cols = [c for c in dsch.names if c != geometry_col]
    type_of = dict(zip(dsch.names, dsch.types))

    def gmt_type(t) -> str:
        if pa.types.is_integer(t):
            return "integer"
        if pa.types.is_floating(t):
            return "double"
        return "string"

    def fmt_val(v) -> str:
        if v is None:
            return ""
        if isinstance(v, str):
            return '"' + v.replace('"', "") + '"'
        if isinstance(v, float):
            return repr(v)
        return str(v)

    def seg_text(a) -> str:
        return "\n".join(f"{repr(float(x))} {repr(float(y))}"
                         for x, y in np.asarray(a)[:, :2])

    def render(batch: pa.Table) -> pa.Table:
        out = []
        kinds = set()
        for ri in range(batch.num_rows):
            g = batch[geometry_col][ri].as_py()
            attrs = "|".join(fmt_val(batch[c][ri].as_py())
                             for c in attr_cols)
            lines = [">"]
            if attr_cols:
                lines.append(f"# @D{attrs}")
            if g is not None:
                kind, payload = wkbm.parse_wkb(g)
                kinds.add(kind)
                if kind == "point":
                    lines.append(seg_text(payload))
                elif kind in ("linestring", "multipoint"):
                    lines.append(seg_text(payload))
                elif kind == "polygon":
                    lines.append(seg_text(payload[0]))
                    for r in payload[1:]:
                        lines.extend([">", "# @H", seg_text(r)])
                elif kind == "multilinestring":
                    first = True
                    for ln in payload:
                        if not first:
                            lines.append(">")
                        lines.append(seg_text(ln))
                        first = False
                elif kind == "multipolygon":
                    first = True
                    for rings in payload:
                        if not first:
                            lines.append(">")
                        lines.append(seg_text(rings[0]))
                        for r in rings[1:]:
                            lines.extend([">", "# @H", seg_text(r)])
                        first = False
            out.append("\n".join(lines))
        return pa.table({"txt": pa.array(["\n".join(out)]),
                         "kind": pa.array([kinds.pop() if kinds else ""]),
                         "n": pa.array([batch.num_rows], pa.int64())})

    rendered = ds.map_batches(render, batch_format="pyarrow").take_all()
    total = int(sum(r["n"] for r in rendered))
    kind = next((r["kind"] for r in rendered if r["kind"]), "linestring")
    hdr = [f"# @VGMT1.0 @G{_GMT_NAME.get(kind, 'LINESTRING')}"]
    if attr_cols:
        hdr.append("# @N" + "|".join(attr_cols))
        hdr.append("# @T" + "|".join(
            gmt_type(type_of[c]) for c in attr_cols))
    hdr.append("# FEATURE_DATA")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(hdr) + "\n")
        for r in rendered:
            fh.write(r["txt"] + "\n")
    os.replace(tmp, path)
    return total
