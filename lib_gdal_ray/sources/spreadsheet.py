"""XLSX / ODS spreadsheet vector drivers (attribute-only layers).

The reference reads Office Open XML workbooks (ogr/ogrsf_frmts/xlsx/
ogrxlsxdatasource.cpp) and OpenDocument spreadsheets
(ogr/ogrsf_frmts/ods) as geometry-less OGR layers: one layer per
sheet, header-line auto-detection (DetectHeaderLine,
ogrxlsxdatasource.cpp:710-760), per-column type autodetection with
the Integer→Integer64→Real / Date|Time→DateTime / else→String
promotion lattice (ogrxlsxdatasource.cpp:1133-1190), and date/time
classification of numeric cells from styles.xml numFmt codes
(ogrxlsxdatasource.cpp:1739-1816: builtin ids 14-17 date, 18-21 time,
22 datetime; custom ids ≥164 by DD/YY vs HH substrings).  XLSX cell
values for date-styled cells are serial days since 1899-12-30
(NUMBER_OF_DAYS_BETWEEN_1900_AND_1970 = 25569).

Ray-Data shape: a sheet is ONE deflate stream inside a zip, so the
scan decompresses driver-side (bounded by the format's 1,048,576-row
hard limit) and row-parses in parallel: the sheet XML splits on
``<row``/``<table:table-row`` boundaries into fragments; pass 1 maps
fragments → per-column type partials (tiny), the driver folds them
through the promotion lattice; pass 2 maps fragments → typed Arrow
tables against the broadcast schema.  Writes render row fragments in
parallel (rows carry no absolute index — the reference itself
accepts row elements without an ``r`` attribute) and the driver
stitches one zip member per sheet.
"""

from __future__ import annotations

import io
import os
import re
import zipfile
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree as ET

import numpy as np
import pyarrow as pa
import ray.data

_DAYS_1900_1970 = 25569  # ogrxlsxdatasource.cpp:26
_SECS_PER_DAY = 86400


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


# ---------------------------------------------------------------------------
# XLSX workbook metadata (driver-side, cheap)
# ---------------------------------------------------------------------------


def _xlsx_book(path: str):
    """-> (ordered [(sheet_name, member)], shared_strings, styles)
    where styles[i] is the value-type of cellXfs entry i
    ('float'|'date'|'time'|'datetime'|'datetime_ms')."""
    zf = zipfile.ZipFile(path)
    names = set(zf.namelist())

    # workbook sheet order + r:id -> target map
    rels = {}
    rel_member = "xl/_rels/workbook.xml.rels"
    if rel_member in names:
        for el in ET.fromstring(zf.read(rel_member)).iter():
            if _local(el.tag) == "Relationship":
                rels[el.get("Id")] = el.get("Target")
    sheets = []
    for el in ET.fromstring(zf.read("xl/workbook.xml")).iter():
        if _local(el.tag) == "sheet":
            rid = next((v for k, v in el.attrib.items()
                        if _local(k) == "id"), None)
            target = rels.get(rid, f"worksheets/sheet{len(sheets) + 1}.xml")
            if target.startswith("/"):  # "absolute" rel target (#6733)
                member = target[1:]
            else:
                member = target if target.startswith("xl/") else "xl/" + target
            sheets.append((el.get("name"), member))

    shared: List[str] = []
    if "xl/sharedStrings.xml" in names:
        for el in ET.fromstring(zf.read("xl/sharedStrings.xml")):
            if _local(el.tag) == "si":
                shared.append("".join(
                    t.text or "" for t in el.iter()
                    if _local(t.tag) == "t"))

    styles: List[str] = []
    if "xl/styles.xml" in names:
        root = ET.fromstring(zf.read("xl/styles.xml"))
        fmt_map: Dict[int, str] = {}
        for el in root.iter():
            if _local(el.tag) == "numFmt":
                code = el.get("formatCode") or ""
                fid = int(el.get("numFmtId", "-1"))
                if fid >= 164:
                    has_d = ("DD" in code or "dd" in code
                             or "YY" in code or "yy" in code)
                    has_t = "HH" in code or "hh" in code
                    if has_d and has_t:
                        fmt_map[fid] = ("datetime_ms"
                                        if "SS.000" in code or "ss.000" in code
                                        else "datetime")
                    elif has_d:
                        fmt_map[fid] = "date"
                    elif has_t:
                        fmt_map[fid] = "time"
                    else:
                        fmt_map[fid] = "float"
        for el in root.iter():
            if _local(el.tag) == "cellXfs":
                for xf in el:
                    if _local(xf.tag) != "xf":
                        continue
                    fid = int(xf.get("numFmtId", "-1"))
                    if 14 <= fid <= 17:
                        styles.append("date")
                    elif 18 <= fid <= 21:
                        styles.append("time")
                    elif fid == 22:
                        styles.append("datetime")
                    else:
                        styles.append(fmt_map.get(fid, "float"))
    zf.close()
    return sheets, shared, styles


def xlsx_layers(path: str) -> List[str]:
    return [n for n, _ in _xlsx_book(path)[0]]


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AA3' -> 26 (ogrxlsxdatasource.cpp:940-952)."""
    n = -1
    for ch in ref:
        if "A" <= ch <= "Z":
            n = (n + 1) * 26 + (ord(ch) - 65)
        else:
            break
    return n


def _split_row_fragments(xml_text: str, row_tag: str,
                         rows_per_frag: int) -> List[str]:
    """Split a sheet document into parse-independent row fragments."""
    starts = [m.start() for m in re.finditer(f"<{row_tag}[ >/]", xml_text)]
    if not starts:
        return []
    # end of the last row: the closing tag or self-closed run end
    tail = xml_text.rfind(f"</{row_tag}>")
    end = tail + len(row_tag) + 3 if tail >= starts[-1] else \
        xml_text.index(">", starts[-1]) + 1
    frags = []
    for i in range(0, len(starts), rows_per_frag):
        a = starts[i]
        b = starts[i + rows_per_frag] if i + rows_per_frag < len(starts) \
            else end
        frags.append(xml_text[a:b])
    return frags


# ---------------------------------------------------------------------------
# XLSX row parsing (runs inside tasks)
# ---------------------------------------------------------------------------


def _parse_xlsx_fragment(frag: str, shared: List[str],
                         styles: List[str]):
    """-> list of rows; each row is list of (col_idx, vtype, value)."""
    root = ET.fromstring(
        "<rows xmlns:x='urn:ignore'>"
        + re.sub(r'xmlns(:\w+)?="[^"]*"', "", frag) + "</rows>")
    rows = []
    for rowel in root:
        if _local(rowel.tag) != "row":
            continue
        rattr = rowel.get("r")
        rnum = int(rattr) - 1 if rattr else None
        cells = []
        cur = -1
        for c in rowel:
            if _local(c.tag) != "c":
                continue
            ref = c.get("r")
            cur = _col_index(ref) if ref else cur + 1
            vtype = "float"
            s = c.get("s")
            if s is not None and styles:
                si = int(s)
                if 0 <= si < len(styles):
                    vtype = styles[si]
            t = c.get("t", "")
            value = None
            if t == "s":
                vtype = "string"
                for v in c:
                    if _local(v.tag) == "v" and v.text is not None:
                        value = shared[int(v.text)]
            elif t == "inlineStr":
                vtype = "string"
                value = "".join(x.text or "" for x in c.iter()
                                if _local(x.tag) == "t")
            else:
                if t == "b":
                    vtype = "bool"
                elif t == "str":
                    vtype = "string"
                for v in c:
                    if _local(v.tag) == "v":
                        value = v.text
            if value is not None and value != "":
                cells.append((cur, vtype, value))
        rows.append((rnum, cells))
    return rows


def _expand_rows(parsed, start_at: Optional[int]):
    """Honor absolute row numbers: skipped `r` indices become empty
    features (the reference pads them — test_missing_row1_data /
    row_without_r_attribute fixtures). -> (rows, next_index)."""
    out = []
    cur = start_at
    for rnum, cells in parsed:
        if cur is None:  # anchor at the first seen row
            cur = rnum if rnum is not None else 0
        if rnum is not None:
            while cur < rnum:
                out.append([])
                cur += 1
        out.append(cells)
        cur += 1
    return out, (cur if cur is not None else 0)


# ---------------------------------------------------------------------------
# ODS content parsing
# ---------------------------------------------------------------------------


def _ods_tables(path: str) -> List[Tuple[str, str]]:
    """-> [(table_name, table_xml_text)] from content.xml (driver-side
    split so each sheet can fragment independently)."""
    with zipfile.ZipFile(path) as zf:
        content = zf.read("content.xml").decode("utf-8")
    out = []
    for m in re.finditer(r"<table:table\s[^>]*?table:name=\"([^\"]*)\"",
                         content):
        end = content.index("</table:table>", m.start())
        out.append((m.group(1), content[m.start():end]))
    return out


def ods_layers(path: str) -> List[str]:
    return [n for n, _ in _ods_tables(path)]


_PT_RE = re.compile(r"PT(?:(\d+)H)?(?:(\d+)M)?(?:([\d.]+)S)?")


def _parse_ods_fragment(frag: str):
    """-> list of rows of (col_idx, vtype, value); value conventions:
    date/datetime ISO strings, time 'HH:MM:SS', float/bool literals."""
    root = ET.fromstring(
        "<rows xmlns:table='t' xmlns:office='o' xmlns:text='x' "
        "xmlns:calcext='c' xmlns:xlink='l' xmlns:style='s' "
        "xmlns:draw='d' xmlns:svg='v' xmlns:dc='dc' xmlns:presentation='p'>"
        + re.sub(r'xmlns(:\w+)?="[^"]*"', "", frag) + "</rows>")
    rows = []
    for rowel in root.iter():
        if _local(rowel.tag) != "table-row":
            continue
        nrep_row = int(next((v for k, v in rowel.attrib.items()
                             if _local(k) == "number-rows-repeated"), "1"))
        cells = []
        cur = 0
        for c in rowel:
            if _local(c.tag) not in ("table-cell", "covered-table-cell"):
                continue
            att = {_local(k): v for k, v in c.attrib.items()}
            nrep = int(att.get("number-columns-repeated", "1"))
            vt = att.get("value-type", "")
            value = None
            vtype = "string"
            if vt in ("float", "currency", "percentage"):
                vtype, value = "float", att.get("value")
            elif vt == "boolean":
                vtype = "bool"
                value = "1" if att.get("boolean-value") == "true" else "0"
            elif vt == "date":
                dv = att.get("date-value", "")
                if "T" in dv:
                    vtype, value = "datetime", dv
                else:
                    vtype, value = "date", dv
            elif vt == "time":
                m = _PT_RE.match(att.get("time-value", "") or "")
                if m:
                    h, mi, s = (int(m.group(1) or 0), int(m.group(2) or 0),
                                float(m.group(3) or 0))
                    vtype = "time"
                    value = f"{h:02d}:{mi:02d}:{int(s):02d}"
            else:
                ps = ["".join(p.itertext()) for p in c
                      if _local(p.tag) == "p"]
                value = "\n".join(ps) if ps else None
            if value is not None and value != "":
                # repeated non-empty cells duplicate (testrepeatedcol…)
                for k in range(nrep if nrep < 1024 else 1):
                    cells.append((cur + k, vtype, value))
            cur += nrep
        for _ in range(min(nrep_row, 1024)):
            rows.append((None, list(cells)))
    return rows


# ---------------------------------------------------------------------------
# shared: header detection + type lattice + typed Arrow assembly
# ---------------------------------------------------------------------------


def _cell_ogr_type(vtype: str, value: str) -> str:
    """GetOGRFieldType analog (ogrxlsxdatasource.cpp:595-643)."""
    if vtype in ("date", "time", "datetime", "datetime_ms", "bool",
                 "string"):
        return "datetime" if vtype == "datetime_ms" else vtype
    # 'float' cells inspect the literal (CPLGetValueType)
    try:
        int(value)
        return "int"
    except ValueError:
        pass
    try:
        float(value)
        return "float"
    except ValueError:
        return "string"


def _merge_type(a: str, b: str) -> str:
    """Commutative promotion lattice mirroring the reference's
    sequential update rules (ogrxlsxdatasource.cpp:1160-1190)."""
    if a == b:
        return a
    pair = {a, b}
    if pair <= {"int", "bool"}:
        return "int"
    if pair <= {"int", "float", "bool"}:
        return "float"
    if "datetime" in pair and pair <= {"date", "time", "datetime"}:
        return "datetime"
    return "string"


def _detect_header(row0, row1) -> bool:
    """DetectHeaderLine (ogrxlsxdatasource.cpp:710-757), AUTO mode."""
    if not row0:
        return False
    t0 = [_cell_ogr_type(v, val) for _, v, val in row0]
    if any(t != "string" for t in t0):
        return False
    t1 = [_cell_ogr_type(v, val) for _, v, val in row1] if row1 else []
    n_text = sum(1 for t in t1 if t == "string")
    n_nonempty_nontext = len(t1) - n_text
    return (len(row0) >= len(row1) and n_text != len(row0)
            and n_nonempty_nontext != 0)


_ARROW_OF = {"string": pa.string(), "int": pa.int64(),
             "float": pa.float64(), "bool": pa.bool_(),
             "date": pa.date32(), "time": pa.time32("s"),
             "datetime": pa.timestamp("ms")}


def _serial_to_unix_secs(value: str) -> float:
    """XLSX serial days -> unix seconds (ogrxlsxdatasource.cpp:658-672
    incl. the <1e-3 rounding snap)."""
    secs = float(value) * _SECS_PER_DAY
    if abs(secs - round(secs)) < 1e-3:
        secs = round(secs)
    return secs - _DAYS_1900_1970 * _SECS_PER_DAY


def _typed_cell(vtype: str, value: str, out_type: str, serial: bool):
    """One raw cell -> python value of the resolved column type."""
    if out_type == "string":
        if serial and vtype in ("date", "time", "datetime", "datetime_ms"):
            value = _render_serial(vtype, value)
        return value
    if out_type in ("int", "float", "bool"):
        try:
            if out_type == "bool":
                return bool(int(value))
            return int(value) if out_type == "int" else float(value)
        except ValueError:
            return None
    import datetime as dtm

    if serial and vtype in ("date", "time", "datetime", "datetime_ms"):
        unix = _serial_to_unix_secs(value)
        dt = (dtm.datetime(1970, 1, 1)
              + dtm.timedelta(seconds=unix))
    else:
        if vtype == "date":
            dt = dtm.datetime.fromisoformat(value)
        elif vtype == "datetime":
            dt = dtm.datetime.fromisoformat(value)
        elif vtype == "time":
            h, m, s = value.split(":")
            dt = dtm.datetime(1970, 1, 1, int(h), int(m), int(float(s)))
        else:
            return None
    if out_type == "date":
        return dt.date()
    if out_type == "time":
        return dt.time()
    return dt


def _render_serial(vtype: str, value: str) -> str:
    import datetime as dtm

    unix = _serial_to_unix_secs(value)
    dt = dtm.datetime(1970, 1, 1) + dtm.timedelta(seconds=unix)
    if vtype == "date":
        return dt.strftime("%Y/%m/%d")
    if vtype == "time":
        return dt.strftime("%H:%M:%S")
    return dt.strftime("%Y/%m/%d %H:%M:%S")


def _schema_from_fragments(all_rows) -> Tuple[List[str], List[str], bool]:
    """rows (ordered) -> (names, types, header_used)."""
    if not all_rows:
        return [], [], False
    header = _detect_header(all_rows[0], all_rows[1]
                            if len(all_rows) > 1 else [])
    data_rows = all_rows[1:] if header else all_rows
    ncols = 0
    for r in all_rows:
        for ci, _, _ in r:
            ncols = max(ncols, ci + 1)
    types: List[Optional[str]] = [None] * ncols
    for r in data_rows:
        for ci, vt, val in r:
            t = _cell_ogr_type(vt, val)
            types[ci] = t if types[ci] is None else _merge_type(types[ci], t)
    types = [t or "string" for t in types]
    if header:
        names = [""] * ncols
        for ci, _, val in all_rows[0]:
            names[ci] = val
        names = [n if n else f"Field{i + 1}" for i, n in enumerate(names)]
    else:
        names = [f"Field{i + 1}" for i in range(ncols)]
    return names, types, header


def _rows_to_table(rows, names, types, serial) -> pa.Table:
    cols = [[None] * len(rows) for _ in names]
    for ri, r in enumerate(rows):
        for ci, vt, val in r:
            if ci < len(names):
                cols[ci][ri] = _typed_cell(vt, val, types[ci], serial)
    return pa.table({n: pa.array(c, type=_ARROW_OF[t])
                     for n, t, c in zip(names, types, cols)})


# ---------------------------------------------------------------------------
# read (both formats share the two-pass fragment pipeline)
# ---------------------------------------------------------------------------


def _read_fragments(frags: List[str], parse_one, serial: bool,
                    headers: str) -> ray.data.Dataset:
    # pass 1: schema (parse fragments in parallel, fold driver-side)
    import ray as _ray

    @_ray.remote
    def _parse(frag):
        return parse_one(frag)

    parsed = _ray.get([_parse.remote(f) for f in frags])
    # expand absolute row indices to padded rows, tracking each
    # fragment's start index so pass 2 reproduces the padding
    starts: List[Optional[int]] = []
    all_rows = []
    cur: Optional[int] = None
    for p in parsed:
        starts.append(cur)
        rows, cur = _expand_rows(p, cur)
        all_rows.extend(rows)
    names, types, header = _schema_from_fragments(all_rows)
    if headers == "FORCE" and not header and all_rows:
        names = [val for _, _, val in all_rows[0]]
        header = True
    elif headers == "DISABLE":
        header = False
        names, types, _ = _schema_with_no_header(all_rows)

    # pass 2: typed tables per fragment (fragment-parallel; the first
    # fragment drops the header row)
    items = [{"idx": i, "frag": f, "start": -1 if s is None else s}
             for i, (f, s) in enumerate(zip(frags, starts))]

    def build(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            start = None if row["start"] < 0 else row["start"]
            rows, _ = _expand_rows(parse_one(row["frag"]), start)
            if header and row["idx"] == 0:
                rows = rows[1:]
            out.append(_rows_to_table(rows, names, types, serial))
        return pa.concat_tables(out) if out else pa.table({})

    return (ray.data.from_items(items)
            .map_batches(build, batch_format="pyarrow", batch_size=1))


def _schema_with_no_header(all_rows):
    ncols = 0
    for r in all_rows:
        for ci, _, _ in r:
            ncols = max(ncols, ci + 1)
    types: List[Optional[str]] = [None] * ncols
    for r in all_rows:
        for ci, vt, val in r:
            t = _cell_ogr_type(vt, val)
            types[ci] = t if types[ci] is None else _merge_type(types[ci], t)
    return ([f"Field{i + 1}" for i in range(ncols)],
            [t or "string" for t in types], False)


def read_xlsx(path: str, layer: Optional[str] = None,
              headers: str = "AUTO",
              rows_per_frag: int = 20_000) -> ray.data.Dataset:
    """One sheet of an .xlsx workbook -> Dataset (attribute layer).

    `headers`: AUTO (reference DetectHeaderLine), FORCE, DISABLE —
    the OGR_XLSX_HEADERS config analog."""
    sheets, shared, styles = _xlsx_book(path)
    if not sheets:
        raise ValueError(f"{path}: no sheets")
    if layer is None:
        member = sheets[0][1]
    else:
        member = next((m for n, m in sheets if n == layer), None)
        if member is None:
            raise ValueError(
                f"{path}: sheet {layer!r} not in {[n for n, _ in sheets]}")
    with zipfile.ZipFile(path) as zf:
        xml_text = zf.read(member).decode("utf-8")
    frags = _split_row_fragments(xml_text, "row", rows_per_frag)

    def parse_one(frag):
        return _parse_xlsx_fragment(frag, shared, styles)

    return _read_fragments(frags, parse_one, serial=True, headers=headers)


def read_ods(path: str, layer: Optional[str] = None,
             headers: str = "AUTO",
             rows_per_frag: int = 20_000) -> ray.data.Dataset:
    """One table of an .ods spreadsheet -> Dataset."""
    tabs = _ods_tables(path)
    if not tabs:
        raise ValueError(f"{path}: no tables")
    if layer is None:
        frag_src = tabs[0][1]
    else:
        frag_src = next((t for n, t in tabs if n == layer), None)
        if frag_src is None:
            raise ValueError(
                f"{path}: table {layer!r} not in {[n for n, _ in tabs]}")
    frags = _split_row_fragments(frag_src, "table:table-row", rows_per_frag)
    return _read_fragments(frags, _parse_ods_fragment, serial=False,
                           headers=headers)


# ---------------------------------------------------------------------------
# write (xlsx, with the reference's own styles table so date/time
# columns survive a roundtrip — ogrxlsxwriter layout, cpp:2468-2512)
# ---------------------------------------------------------------------------

_XLSX_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="4">
<numFmt formatCode="GENERAL" numFmtId="164"/>
<numFmt formatCode="DD/MM/YY" numFmtId="165"/>
<numFmt formatCode="DD/MM/YYYY\\ HH:MM:SS" numFmtId="166"/>
<numFmt formatCode="HH:MM:SS" numFmtId="167"/>
</numFmts>
<fonts count="1"><font><name val="Arial"/><sz val="10"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf numFmtId="164"/></cellStyleXfs>
<cellXfs count="4">
<xf numFmtId="164" xfId="0"/>
<xf numFmtId="165" xfId="0"/>
<xf numFmtId="166" xfId="0"/>
<xf numFmtId="167" xfId="0"/>
</cellXfs>
</styleSheet>"""

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/>
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _xlsx_row_xml(batch: pa.Table) -> str:
    """Rows of one block -> sheet row elements (no r attributes, so
    fragments are order-free until the driver stitches them)."""
    import datetime as dtm

    parts = []
    cols = batch.column_names
    data = [batch[c].to_pylist() for c in cols]
    for ri in range(batch.num_rows):
        cells = []
        for v in (d[ri] for d in data):
            if v is None:
                cells.append("<c/>")
            elif isinstance(v, bool):
                cells.append(f'<c t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float, np.integer, np.floating)):
                cells.append(f"<c><v>{v}</v></c>")
            elif isinstance(v, dtm.datetime):
                serial = (v - dtm.datetime(1899, 12, 30)).total_seconds() \
                    / _SECS_PER_DAY
                cells.append(f'<c s="2"><v>{serial!r}</v></c>')
            elif isinstance(v, dtm.date):
                serial = (v - dtm.date(1899, 12, 30)).days
                cells.append(f'<c s="1"><v>{serial}</v></c>')
            elif isinstance(v, dtm.time):
                serial = (v.hour * 3600 + v.minute * 60 + v.second) \
                    / _SECS_PER_DAY
                cells.append(f'<c s="3"><v>{serial!r}</v></c>')
            else:
                cells.append(f'<c t="inlineStr"><is><t>{_esc(str(v))}'
                             "</t></is></c>")
        parts.append("<row>" + "".join(cells) + "</row>")
    return "".join(parts)


def write_xlsx(ds: ray.data.Dataset, path: str,
               sheet: str = "Sheet1", headers: bool = True) -> int:
    """Dataset -> one .xlsx file. Row XML renders fragment-parallel
    in map_batches; the driver stitches the zip (single deliverable
    file — the zip central directory is inherently single-writer)."""
    schema = ds.schema()
    names = list(schema.names)

    def render(batch: pa.Table) -> pa.Table:
        return pa.table({"xml": pa.array([_xlsx_row_xml(batch)]),
                         "n": pa.array([batch.num_rows], pa.int64())})

    rendered = ds.map_batches(render, batch_format="pyarrow").take_all()
    total = int(sum(r["n"] for r in rendered))

    hdr = ""
    if headers:
        hdr = "<row>" + "".join(
            f'<c t="inlineStr"><is><t>{_esc(n)}</t></is></c>'
            for n in names) + "</row>"
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>' + hdr
        + "".join(r["xml"] for r in rendered)
        + "</sheetData></worksheet>")
    wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main" xmlns:r="http://schemas.'
          'openxmlformats.org/officeDocument/2006/relationships">'
          f'<sheets><sheet name="{_esc(sheet)}" sheetId="1" '
          'r:id="rId1"/></sheets></workbook>')
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/styles.xml", _XLSX_STYLES)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    os.replace(tmp, path)
    return total


# ---------------------------------------------------------------------------
# ODS write (reference ogr/ogrsf_frmts/ods write support: zip with a
# STORED mimetype first member, manifest, single content.xml)
# ---------------------------------------------------------------------------

_ODS_MANIFEST = """<?xml version="1.0" encoding="UTF-8"?>
<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">
<manifest:file-entry manifest:media-type="application/vnd.oasis.opendocument.spreadsheet" manifest:full-path="/"/>
<manifest:file-entry manifest:media-type="text/xml" manifest:full-path="content.xml"/>
</manifest:manifest>"""

_ODS_CONTENT_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<office:document-content '
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'office:version="1.2"><office:body><office:spreadsheet>')

_ODS_CONTENT_TAIL = ("</office:spreadsheet></office:body>"
                     "</office:document-content>")


def _ods_row_xml(batch: pa.Table) -> str:
    import datetime as dtm

    parts = []
    cols = batch.column_names
    data = [batch[c].to_pylist() for c in cols]
    for ri in range(batch.num_rows):
        cells = []
        for v in (d[ri] for d in data):
            if v is None:
                cells.append("<table:table-cell/>")
            elif isinstance(v, bool):
                bv = "true" if v else "false"
                cells.append(
                    f'<table:table-cell office:value-type="boolean" '
                    f'office:boolean-value="{bv}"><text:p>{bv}</text:p>'
                    "</table:table-cell>")
            elif isinstance(v, (int, float, np.integer, np.floating)):
                cells.append(
                    f'<table:table-cell office:value-type="float" '
                    f'office:value="{v}"><text:p>{v}</text:p>'
                    "</table:table-cell>")
            elif isinstance(v, dtm.datetime):
                iso = v.strftime("%Y-%m-%dT%H:%M:%S")
                cells.append(
                    f'<table:table-cell office:value-type="date" '
                    f'office:date-value="{iso}"><text:p>{iso}</text:p>'
                    "</table:table-cell>")
            elif isinstance(v, dtm.date):
                cells.append(
                    f'<table:table-cell office:value-type="date" '
                    f'office:date-value="{v.isoformat()}">'
                    f"<text:p>{v.isoformat()}</text:p></table:table-cell>")
            elif isinstance(v, dtm.time):
                pt = f"PT{v.hour:02d}H{v.minute:02d}M{v.second:02d}S"
                cells.append(
                    f'<table:table-cell office:value-type="time" '
                    f'office:time-value="{pt}"><text:p>{v}</text:p>'
                    "</table:table-cell>")
            else:
                cells.append(
                    f'<table:table-cell office:value-type="string">'
                    f"<text:p>{_esc(str(v))}</text:p></table:table-cell>")
        parts.append("<table:table-row>" + "".join(cells)
                     + "</table:table-row>")
    return "".join(parts)


def write_ods(ds: ray.data.Dataset, path: str, sheet: str = "Sheet1",
              headers: bool = True) -> int:
    """Dataset -> one .ods file (row XML rendered fragment-parallel,
    driver stitches the zip; mimetype member stored uncompressed per
    the OpenDocument package spec)."""
    names = list(ds.schema().names)

    def render(batch: pa.Table) -> pa.Table:
        return pa.table({"xml": pa.array([_ods_row_xml(batch)]),
                         "n": pa.array([batch.num_rows], pa.int64())})

    rendered = ds.map_batches(render, batch_format="pyarrow").take_all()
    total = int(sum(r["n"] for r in rendered))

    hdr = ""
    if headers:
        hdr = ("<table:table-row>" + "".join(
            f'<table:table-cell office:value-type="string">'
            f"<text:p>{_esc(n)}</text:p></table:table-cell>"
            for n in names) + "</table:table-row>")
    content = (_ODS_CONTENT_HEAD
               + f'<table:table table:name="{_esc(sheet)}">' + hdr
               + "".join(r["xml"] for r in rendered)
               + "</table:table>" + _ODS_CONTENT_TAIL)
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        info = zipfile.ZipInfo("mimetype")
        zf.writestr(info,
                    "application/vnd.oasis.opendocument.spreadsheet",
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("META-INF/manifest.xml", _ODS_MANIFEST)
        zf.writestr("content.xml", content)
    os.replace(tmp, path)
    return total
