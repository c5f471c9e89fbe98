"""GeoRSS vector driver: RSS 2.0 / ATOM 1.0 feeds with GeoRSS-simple,
GeoRSS-box or GeoRSS-GML (georss:where) geometries.

Field flattening follows the reference: repeated elements get numbered
suffixes (link, link2, ...), attributes flatten to `elem_attr`
(xml:lang → elem_xml_lang), nested person constructs flatten to
author_name/author_uri/..., content keeps its inner XML verbatim,
date fields render GDAL-style "YYYY/MM/DD HH:MM:SS+TZ".  GeoRSS
coordinates are lat-lon; geometries emit lon-lat WKB.  A `box`
becomes the reference's corner ring POLYGON.

Reference: ogr/ogrsf_frmts/georss/ogrgeorsslayer.cpp; autotest
ogr_georss.py (atom_field_values + simple/GML WKT expectations, all
pinned in tests/test_vector_misc.py). Re-derived; no code copied.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..geom import wkb as wkb_mod

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
     "Oct", "Nov", "Dec"])}


def identify_georss(buf: bytes) -> bool:
    head = buf[:1024]
    return (b"<rss" in head or b"<feed" in head) and \
        (b"georss" in buf[:4096] or b"<feed" in head)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _fmt_date(text: str) -> str:
    """RFC822 or ISO8601 -> 'YYYY/MM/DD HH:MM:SS+TZ' (GDAL render)."""
    text = text.strip()
    m = re.match(r"\w{3}, (\d{1,2}) (\w{3}) (\d{4}) "
                 r"(\d{2}):(\d{2}):(\d{2})\s*([+-]\d{4}|GMT|UTC|Z)?",
                 text)
    if m:
        day, mon, year, hh, mm, ss, tz = m.groups()
        tzs = "+00"
        if tz and tz[0] in "+-":
            tzs = tz[:3]
            if tz[3:5] not in ("00", ""):
                tzs += ":" + tz[3:5]
        return (f"{year}/{_MONTHS[mon]:02d}/{int(day):02d} "
                f"{hh}:{mm}:{ss}{tzs}")
    m = re.match(r"(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2}):(\d{2})"
                 r"(?:\.\d+)?\s*(Z|[+-]\d{2}:?\d{2})?", text)
    if m:
        y, mo, d, hh, mm, ss, tz = m.groups()
        if not tz or tz == "Z":
            tzs = "+00"
        else:
            tzs = tz[:3]
            tail = tz[3:].replace(":", "")
            if tail and tail != "00":
                tzs += ":" + tail
        return f"{y}/{mo}/{d} {hh}:{mm}:{ss}{tzs}"
    return text


def _simple_coords(text: str) -> np.ndarray:
    """lat-lon pair stream -> (N, 2) lon-lat array."""
    vals = [float(v) for v in text.split()]
    a = np.array(vals, dtype=np.float64).reshape(-1, 2)
    return a[:, ::-1].copy()


def _georss_geom(el) -> Optional[bytes]:
    tag = _local(el.tag)
    if tag == "point":
        pts = _simple_coords(el.text or "")
        return bytes(wkb_mod.points_to_wkb(pts[:, 0], pts[:, 1])[0])
    if tag == "line":
        return wkb_mod.linestring_to_wkb(_simple_coords(el.text or ""))
    if tag == "polygon":
        return wkb_mod.polygon_to_wkb([_simple_coords(el.text or "")])
    if tag == "box":
        (x1, y1), (x2, y2) = _simple_coords(el.text or "")
        ring = np.array([[x1, y1], [x1, y2], [x2, y2], [x2, y1],
                         [x1, y1]])
        return wkb_mod.polygon_to_wkb([ring])
    if tag == "where":
        for child in el:
            if _local(child.tag) == "Envelope":
                lo = hi = None
                for c in child:
                    if _local(c.tag) == "lowerCorner":
                        lo = [float(v) for v in c.text.split()]
                    elif _local(c.tag) == "upperCorner":
                        hi = [float(v) for v in c.text.split()]
                if lo and hi:  # lat-lon corners, same ring as simple box
                    y1, x1 = lo
                    y2, x2 = hi
                    ring = np.array([[x1, y1], [x1, y2], [x2, y2],
                                     [x2, y1], [x1, y1]])
                    return wkb_mod.polygon_to_wkb([ring])
                return None
            from .gml import gml_geom_to_wkb

            g = gml_geom_to_wkb(child)
            if g is not None:
                # GML inside georss:where is lat-lon; swap to lon-lat
                return wkb_mod.transform_wkb(g, lambda x, y: (y, x))
    return None


_DATE_FIELDS = {"pubDate", "updated", "published", "lastBuildDate",
                "dc:date"}


def _flatten(item, fields: dict, used: dict):
    """One item/entry element -> flat field dict (reference naming)."""
    for child in item:
        tag = _local(child.tag)
        if tag in ("point", "line", "polygon", "box", "where"):
            continue
        n = used.get(tag, 0) + 1
        used[tag] = n
        base = tag if n == 1 else f"{tag}{n}"
        sub = list(child)
        text = (child.text or "").strip()
        if tag == "content":
            parts = []
            for c in sub:
                s = ET.tostring(c, encoding="unicode")
                # render the child's namespace as the default xmlns,
                # the form the reference emits
                s = re.sub(r"<(/?)[A-Za-z_][\w.-]*:", r"<\1", s)
                s = re.sub(r'xmlns:[A-Za-z_][\w.-]*=', "xmlns=", s)
                parts.append(s)
            fields[base] = ((child.text or "") + "".join(parts)).strip()
        elif sub:  # person construct: author/name → author_name
            for s in sub:
                fields[f"{base}_{_local(s.tag)}"] = (s.text or "").strip()
        elif text:
            fields[base] = _fmt_date(text) if tag in _DATE_FIELDS or \
                tag in ("updated", "published") else text
        for attr, aval in child.attrib.items():
            aname = _local(attr)
            if attr.startswith("{http://www.w3.org/XML/1998/namespace}"):
                aname = "xml_" + aname
            fields[f"{base}_{aname}"] = aval


def read_georss(path: str) -> pa.Table:
    """GeoRSS/ATOM file -> Arrow table (flattened fields + WKB)."""
    tree = ET.parse(path)
    root = tree.getroot()
    rows: List[dict] = []
    geoms: List[Optional[bytes]] = []
    if _local(root.tag) == "feed":
        items = [e for e in root if _local(e.tag) == "entry"]
    else:
        channel = next((e for e in root if _local(e.tag) == "channel"),
                       root)
        items = [e for e in channel if _local(e.tag) == "item"]
    for item in items:
        fields: dict = {}
        _flatten(item, fields, {})
        g = None
        for child in item:
            if _local(child.tag) in ("point", "line", "polygon", "box",
                                     "where"):
                g = _georss_geom(child)
                if g is not None:
                    break
        rows.append(fields)
        geoms.append(g)

    names: List[str] = []
    for r in rows:
        for k in r:
            if k not in names:
                names.append(k)
    cols = {n: pa.array([r.get(n) for r in rows], pa.string())
            for n in names}
    cols["geometry"] = pa.array(geoms, pa.binary())
    return pa.table(cols)


def write_georss(table: pa.Table, path: str,
                 geometry_col: str = "geometry",
                 title: str = "OGR export") -> int:
    """Arrow table -> RSS 2.0 + GeoRSS-simple document."""
    from ..geom.wkt import wkb_to_wkt

    def esc(s):
        return (str(s).replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    out = ['<?xml version="1.0"?>',
           '<rss version="2.0" '
           'xmlns:georss="http://www.georss.org/georss">',
           "  <channel>", f"    <title>{esc(title)}</title>"]
    cols = [c for c in table.column_names if c != geometry_col]
    data = table.to_pylist()
    for row in data:
        out.append("    <item>")
        for c in cols:
            v = row.get(c)
            if v is not None:
                out.append(f"      <{c}>{esc(v)}</{c}>")
        g = row.get(geometry_col)
        if g:
            kind, payload = wkb_mod.parse_wkb(g)
            if kind == "point":
                x, y = payload[0]
                out.append(f"      <georss:point>{y:.10g} {x:.10g}"
                           "</georss:point>")
            elif kind == "linestring":
                txt = " ".join(f"{p[1]:.10g} {p[0]:.10g}"
                               for p in payload)
                out.append(f"      <georss:line>{txt}</georss:line>")
            elif kind == "polygon":
                txt = " ".join(f"{p[1]:.10g} {p[0]:.10g}"
                               for p in payload[0])
                out.append(f"      <georss:polygon>{txt}"
                           "</georss:polygon>")
            else:
                out.append(f"      <!-- {esc(wkb_to_wkt(g)[:40])} -->")
        out.append("    </item>")
    out += ["  </channel>", "</rss>", ""]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out))
    return len(data)


def write_georss_ds(ds, path: str, geometry_col: str = "geometry",
                    name_col: str = "name") -> int:
    """Ray Dataset -> ONE RSS 2.0 + GeoRSS-simple document,
    distributed one-item-per-line rendering (shared _concat_xml)."""
    import pyarrow as pa2

    from .xml_vectors import _concat_xml

    def to_lines(batch: pa2.Table) -> pa2.Table:
        names = batch[name_col].to_pylist()
        out = []
        for i, g in enumerate(batch[geometry_col].to_pylist()):
            kind, payload = wkb_mod.parse_wkb(g)
            x, y = payload[0]
            out.append(f"<item><title>{names[i]}</title>"
                       f"<georss:point>{y!r} {x!r}</georss:point>"
                       "</item>")
        return pa2.table({"text": pa2.array(out)})

    header = ('<?xml version="1.0"?>\n'
              '<rss version="2.0" '
              'xmlns:georss="http://www.georss.org/georss">\n'
              "<channel>\n<title>export</title>\n")
    return _concat_xml(ds, to_lines, path, header=header,
                       footer="</channel>\n</rss>\n")


def read_georss_fragments(path: str):
    """Parallel GeoRSS read for line-per-item documents (the
    write_georss_ds layout)."""
    import pyarrow as pa2

    from .xml_vectors import _fragment_lines

    lines = _fragment_lines(path, "<item>")

    def parse(batch: pa2.Table) -> pa2.Table:
        import xml.etree.ElementTree as ET2

        titles, geoms = [], []
        for ln in batch["text"].to_pylist():
            el = ET2.fromstring(
                '<R xmlns:georss="http://www.georss.org/georss">'
                + ln + "</R>")[0]
            title, g = None, None
            for c in el:
                t = _local(c.tag)
                if t == "title":
                    title = c.text
                elif t in ("point", "line", "polygon", "box"):
                    g = _georss_geom(c)
            titles.append(title)
            geoms.append(g)
        return pa2.table({"name": pa2.array(titles, pa2.string()),
                          "geometry": pa2.array(geoms, pa2.binary())})

    return lines.map_batches(parse, batch_format="pyarrow")
