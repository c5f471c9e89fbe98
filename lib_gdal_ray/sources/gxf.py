"""Geosoft GXF grid reader.

Reference frmts/gxf/gxfopen.c: '#'-titled ASCII sections — #POIN(TS)
columns, #ROWS, #GTYPE n (0 = whitespace floats, n>0 = base-90
fixed-width tokens value = Σ(char-37)·90^i scaled by #TRANSFORM
scale/offset; '!' leading char = dummy, '"' = repeat count+value,
lines shorter than the token continue on the next line), #DUMMY,
#SENSE row organization (default lower-left scanning right =>
vertical flip to top-down), #XORIGIN/#YORIGIN +
#PTSEPARATION/#RWSEPARATION node-registered georeferencing."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def identify_gxf(buf: bytes) -> bool:
    head = buf[:256].lstrip()
    return head.startswith(b"#") and (b"#GRID" in buf[:65536]
                                      or b"#POIN" in buf[:4096])


def decode_gxf(buf: bytes) -> Tuple[np.ndarray, Dict]:
    text = buf.decode("latin-1", "replace")
    lines = text.splitlines()
    sections: Dict[str, List[str]] = {}
    cur = None
    grid_start = None
    for i, raw in enumerate(lines):
        if raw.startswith("#"):
            title = raw[1:].strip().upper()
            if title.startswith("GRID"):
                grid_start = i + 1
                cur = None
                continue
            cur = title
            sections[cur] = []
        elif cur is not None:
            sections[cur].append(raw)

    def sec1(*names, default=None):
        for n in names:
            for key in sections:
                if key.startswith(n):
                    vals = [v for v in sections[key] if v.strip()]
                    if vals:
                        return vals[0].strip()
        return default

    ncols = int(sec1("POIN"))
    nrows = int(sec1("ROWS"))
    gtype = int(sec1("GTYPE", default="0") or 0)
    dummy_txt = (sec1("DUMMY", default="") or "").strip()
    dummy_val = float(dummy_txt) if dummy_txt else -1e12  # gxfopen.c:215 default
    sense = int(float(sec1("SENS", default="1") or 1))
    tf = (sec1("TRANSFORM", default="1 0") or "1 0").split()
    scale = float(tf[0]) if len(tf) > 0 else 1.0
    offset = float(tf[1]) if len(tf) > 1 else 0.0

    vals: List[float] = []
    n_need = ncols * nrows
    if gtype == 0:
        for raw in lines[grid_start:]:
            if raw.startswith("#"):
                break
            for tok in raw.split():
                if len(vals) >= n_need:
                    break
                if dummy_txt and tok == dummy_txt:
                    vals.append(dummy_val)
                else:
                    vals.append(float(tok))
    else:
        # base-90 stream: concatenate grid lines but honor the rule
        # that a token never splits across lines (short tails wrap)
        stream: List[str] = []
        for raw in lines[grid_start:]:
            if raw.startswith("#"):
                break
            stream.append(raw)
        li = 0
        line = stream[li] if stream else ""

        def next_tok():
            nonlocal li, line
            if len(line) < gtype:
                li += 1
                line = stream[li]
            tok, line_rest = line[:gtype], line[gtype:]
            line = line_rest
            return tok

        def b90(tok: str, scaled: bool) -> float:
            v = 0
            for ch in tok[:gtype]:
                v = v * 90 + (ord(ch) - 37)
            return v * scale + offset if scaled else float(v)

        dummy_out = dummy_val
        while len(vals) < n_need:
            tok = next_tok()
            if tok[0] == "!":
                vals.append(dummy_out)
            elif tok[0] == '"':
                count = int(b90(next_tok(), False))
                vtok = next_tok()
                v = dummy_out if vtok[0] == "!" else b90(vtok, True)
                vals.extend([v] * min(count, n_need - len(vals)))
            else:
                vals.append(b90(tok, True))

    arr = np.array(vals[:n_need], np.float64).reshape(nrows, ncols)
    if sense in (1, -3):       # lower-left/right origin: flip vertical
        arr = arr[::-1]
    if sense in (3, -3):       # scanning left: flip horizontal
        arr = arr[:, ::-1]
    arr = np.ascontiguousarray(arr)

    meta: Dict = {"nodata": dummy_val}
    xo, yo = sec1("XORIGIN"), sec1("YORIGIN")
    px, py = sec1("PTSEPARATION"), sec1("RWSEPARATION")
    if xo and yo and px and py:
        dx, dy = float(px), float(py)
        meta["transform"] = (float(xo) - dx / 2, dx, 0.0,
                             float(yo) + (nrows - 0.5) * dy, 0.0, -dy)
    return arr, meta
