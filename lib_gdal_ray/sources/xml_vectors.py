"""GPX and KML vector drivers (XML point/track interchange).

Parity targets: `ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp` (waypoints /
routes / tracks layer split, trkseg→MULTILINESTRING assembly) and
`ogr/ogrsf_frmts/kml/` (Placemark traversal through Document/Folder
nesting, "lon,lat[,alt]" coordinate tuples, MultiGeometry).

Geometry carrier is WKB like every other vector driver here. Ray
shape mirrors `vector_formats.py`: reads parallelize per FILE (an XML
document is one parse unit by construction — the same granularity the
reference's drivers have), writes serialize features distributed per
block and assemble the single-document output with a driver-side
streaming byte concat (the `write_geojson` pattern; fragments never
materialize as Python objects on the driver).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import xml.etree.ElementTree as ET
from typing import List, Optional, Union
from xml.sax.saxutils import escape

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import wkb as wkbm
from .vector_formats import _TextLineDatasink

_GPX_NS = "{http://www.topografix.com/GPX/1/1}"
_KML_NS = "{http://www.opengis.net/kml/2.2}"


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


# ---------------------------------------------------------------- GPX

def _parse_gpx(text: str) -> List[dict]:
    root = ET.fromstring(text)
    feats: List[dict] = []

    def pt_fields(el):
        out = {"lon": float(el.get("lon")), "lat": float(el.get("lat"))}
        for ch in el:
            t = _strip(ch.tag)
            if t == "ele":
                out["ele"] = float(ch.text)
            elif t in ("name", "desc", "time", "cmt", "sym", "type"):
                out[t] = (ch.text or "").strip()
        return out

    for el in root:
        t = _strip(el.tag)
        if t == "wpt":
            f = pt_fields(el)
            f["layer"] = "waypoints"
            f["geometry"] = wkbm.points_to_wkb(
                np.array([f["lon"]]), np.array([f["lat"]]))[0]
            feats.append(f)
        elif t == "rte":
            coords, name = [], ""
            for ch in el:
                ct = _strip(ch.tag)
                if ct == "rtept":
                    coords.append((float(ch.get("lon")),
                                   float(ch.get("lat"))))
                elif ct == "name":
                    name = (ch.text or "").strip()
            feats.append({"layer": "routes", "name": name,
                          "n_points": len(coords),
                          "geometry": wkbm.linestring_to_wkb(coords)})
        elif t == "trk":
            segs, name = [], ""
            for ch in el:
                ct = _strip(ch.tag)
                if ct == "name":
                    name = (ch.text or "").strip()
                elif ct == "trkseg":
                    seg = [(float(p.get("lon")), float(p.get("lat")))
                           for p in ch if _strip(p.tag) == "trkpt"]
                    if seg:
                        segs.append(seg)
            feats.append({"layer": "tracks", "name": name,
                          "n_points": sum(len(s) for s in segs),
                          "geometry": wkbm.multilinestring_to_wkb(segs)})
    return feats


def read_gpx(paths: Union[str, List[str]],
             layer: Optional[str] = None, **kwargs) -> ray.data.Dataset:
    """GPX file(s) -> feature rows (layer, name, lon/lat/ele for
    waypoints, n_points for lines, WKB geometry). One parse task per
    file; `layer` filters to waypoints/routes/tracks."""
    kwargs.setdefault("file_extensions", ["gpx"])
    raw = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"path": [], "layer": [], "name": [], "lon": [], "lat": [],
                "ele": [], "n_points": [], "geometry": []}
        for path, buf in zip(batch["path"].to_pylist(),
                             batch["bytes"].to_pylist()):
            for f in _parse_gpx(buf.decode("utf-8")):
                if layer and f["layer"] != layer:
                    continue
                rows["path"].append(path)
                rows["layer"].append(f["layer"])
                rows["name"].append(f.get("name", ""))
                rows["lon"].append(f.get("lon", np.nan))
                rows["lat"].append(f.get("lat", np.nan))
                rows["ele"].append(f.get("ele", np.nan))
                rows["n_points"].append(f.get("n_points", 1))
                rows["geometry"].append(f["geometry"])
        return pa.table({
            "path": pa.array(rows["path"], pa.string()),
            "layer": pa.array(rows["layer"], pa.string()),
            "name": pa.array(rows["name"], pa.string()),
            "lon": pa.array(rows["lon"], pa.float64()),
            "lat": pa.array(rows["lat"], pa.float64()),
            "ele": pa.array(rows["ele"], pa.float64()),
            "n_points": pa.array(rows["n_points"], pa.int64()),
            "geometry": pa.array(rows["geometry"], pa.binary()),
        })

    return raw.map_batches(parse, batch_format="pyarrow")


def write_gpx(ds: ray.data.Dataset, path: str,
              geometry_col: str = "geometry",
              name_col: Optional[str] = None) -> int:
    """Point-WKB Dataset -> ONE GPX file of <wpt> elements (tracks for
    linestring WKB). Distributed fragment serialization + driver-side
    streaming concat. Returns the feature count."""

    def to_lines(batch: pa.Table) -> pa.Table:
        names = (batch[name_col].to_pylist()
                 if name_col and name_col in batch.column_names
                 else [None] * len(batch))
        out = []
        for g, nm in zip(batch[geometry_col].to_pylist(), names):
            kind, payload = wkbm.parse_wkb(g)
            nm_xml = f"<name>{escape(str(nm))}</name>" if nm else ""
            if kind == "point":
                x, y = float(payload[0][0]), float(payload[0][1])
                out.append(f'<wpt lat="{y!r}" lon="{x!r}">{nm_xml}</wpt>')
            elif kind == "linestring":
                pts = "".join(
                    f'<trkpt lat="{float(p[1])!r}" lon="{float(p[0])!r}"/>'
                    for p in payload)
                out.append(f"<trk>{nm_xml}<trkseg>{pts}</trkseg></trk>")
            elif kind == "multilinestring":
                segs = "".join(
                    "<trkseg>" + "".join(
                        f'<trkpt lat="{float(p[1])!r}" lon="{float(p[0])!r}"/>'
                        for p in seg) + "</trkseg>"
                    for seg in payload)
                out.append(f"<trk>{nm_xml}{segs}</trk>")
            else:
                raise ValueError(f"GPX cannot carry {kind}")
        return pa.table({"text": pa.array(out)})

    return _concat_xml(ds, to_lines, path,
                       header='<?xml version="1.0"?>\n'
                              '<gpx version="1.1" creator="lib_gdal_ray" '
                              'xmlns="http://www.topografix.com/GPX/1/1">\n',
                       footer="</gpx>\n")


# ---------------------------------------------------------------- KML

def _kml_coords(text: str) -> List[tuple]:
    out = []
    for tok in (text or "").split():
        parts = tok.split(",")
        out.append((float(parts[0]), float(parts[1])))
    return out


def _kml_geom_to_wkb(el) -> Optional[bytes]:
    t = _strip(el.tag)
    if t == "Point":
        c = _kml_coords(el.findtext(f"{_KML_NS}coordinates")
                        or el.findtext("coordinates"))
        return wkbm.points_to_wkb(np.array([c[0][0]]),
                                  np.array([c[0][1]]))[0]
    if t == "LineString":
        c = _kml_coords(el.findtext(f"{_KML_NS}coordinates")
                        or el.findtext("coordinates"))
        return wkbm.linestring_to_wkb(c)
    if t == "Polygon":
        rings = []
        for b in el.iter():
            if _strip(b.tag) == "LinearRing":
                rings.append(_kml_coords(b.findtext(f"{_KML_NS}coordinates")
                                         or b.findtext("coordinates")))
        return wkbm.polygon_to_wkb(rings)
    if t == "MultiGeometry":
        members = [_kml_geom_to_wkb(ch) for ch in el]
        members = [m for m in members if m is not None]
        return wkbm.geometrycollection_to_wkb(members)
    return None


def _parse_kml(text: str) -> List[dict]:
    root = ET.fromstring(text)
    feats: List[dict] = []
    for pm in root.iter():
        if _strip(pm.tag) != "Placemark":
            continue
        name = ""
        desc = ""
        geom = None
        for ch in pm:
            t = _strip(ch.tag)
            if t == "name":
                name = (ch.text or "").strip()
            elif t == "description":
                desc = (ch.text or "").strip()
            elif t in ("Point", "LineString", "Polygon", "MultiGeometry"):
                geom = _kml_geom_to_wkb(ch)
        if geom is not None:
            feats.append({"name": name, "description": desc,
                          "geometry": geom})
    return feats


def read_kml(paths: Union[str, List[str]], **kwargs) -> ray.data.Dataset:
    """KML file(s) -> feature rows (name, description, WKB geometry).
    Placemarks are found through any Document/Folder nesting."""
    kwargs.setdefault("file_extensions", ["kml"])
    raw = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"path": [], "name": [], "description": [], "geometry": []}
        for path, buf in zip(batch["path"].to_pylist(),
                             batch["bytes"].to_pylist()):
            for f in _parse_kml(buf.decode("utf-8")):
                rows["path"].append(path)
                rows["name"].append(f["name"])
                rows["description"].append(f["description"])
                rows["geometry"].append(f["geometry"])
        return pa.table({
            "path": pa.array(rows["path"], pa.string()),
            "name": pa.array(rows["name"], pa.string()),
            "description": pa.array(rows["description"], pa.string()),
            "geometry": pa.array(rows["geometry"], pa.binary()),
        })

    return raw.map_batches(parse, batch_format="pyarrow")


def _wkb_to_kml(g: bytes) -> str:
    kind, payload = wkbm.parse_wkb(g)

    def coords(pts):
        return " ".join(f"{float(p[0])!r},{float(p[1])!r}" for p in pts)

    if kind == "point":
        x, y = float(payload[0][0]), float(payload[0][1])
        return (f"<Point><coordinates>{x!r},{y!r}"
                f"</coordinates></Point>")
    if kind == "linestring":
        return (f"<LineString><coordinates>{coords(payload)}"
                f"</coordinates></LineString>")
    if kind == "polygon":
        parts = [f"<outerBoundaryIs><LinearRing><coordinates>"
                 f"{coords(payload[0])}</coordinates></LinearRing>"
                 f"</outerBoundaryIs>"]
        for hole in payload[1:]:
            parts.append(f"<innerBoundaryIs><LinearRing><coordinates>"
                         f"{coords(hole)}</coordinates></LinearRing>"
                         f"</innerBoundaryIs>")
        return f"<Polygon>{''.join(parts)}</Polygon>"
    if kind == "multipolygon":
        inner = "".join(_wkb_to_kml(wkbm.polygon_to_wkb(rings))
                        for rings in payload)
        return f"<MultiGeometry>{inner}</MultiGeometry>"
    if kind == "multilinestring":
        inner = "".join(
            f"<LineString><coordinates>{coords(seg)}</coordinates>"
            f"</LineString>" for seg in payload)
        return f"<MultiGeometry>{inner}</MultiGeometry>"
    raise ValueError(f"KML writer: unsupported {kind}")


def write_kml(ds: ray.data.Dataset, path: str,
              geometry_col: str = "geometry",
              name_col: Optional[str] = None) -> int:
    """WKB Dataset -> ONE KML Document of Placemarks."""

    def to_lines(batch: pa.Table) -> pa.Table:
        names = (batch[name_col].to_pylist()
                 if name_col and name_col in batch.column_names
                 else [None] * len(batch))
        out = []
        for g, nm in zip(batch[geometry_col].to_pylist(), names):
            nm_xml = f"<name>{escape(str(nm))}</name>" if nm else ""
            out.append(f"<Placemark>{nm_xml}{_wkb_to_kml(g)}</Placemark>")
        return pa.table({"text": pa.array(out)})

    return _concat_xml(
        ds, to_lines, path,
        header='<?xml version="1.0" encoding="UTF-8"?>\n'
               '<kml xmlns="http://www.opengis.net/kml/2.2">\n<Document>\n',
        footer="</Document>\n</kml>\n")


def _concat_xml(ds: ray.data.Dataset, to_lines, path: str,
                header: str, footer: str) -> int:
    """Distributed fragment shards -> one XML document (streaming
    driver-side byte concat, the write_geojson assembly pattern)."""
    out_dir = os.path.dirname(os.path.abspath(path)) or "."
    shard_dir = tempfile.mkdtemp(prefix=".xml_shards_", dir=out_dir)
    tmp_path = path + ".tmp"
    try:
        sink = _TextLineDatasink.get()(shard_dir)
        ds.map_batches(to_lines, batch_format="pyarrow").write_datasink(sink)
        n = 0
        with open(tmp_path, "wb") as out:
            out.write(header.encode())
            # bulk byte copy — the shards are newline-terminated
            # fragments already; counting is a buffer scan, never a
            # per-line Python loop
            for name in sorted(os.listdir(shard_dir)):
                with open(os.path.join(shard_dir, name), "rb") as f:
                    while True:
                        chunk = f.read(1 << 20)
                        if not chunk:
                            break
                        n += chunk.count(b"\n")
                        out.write(chunk)
            out.write(footer.encode())
        os.replace(tmp_path, path)
        return n
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)


# ------------------------------------------------------- fragment reads

def _fragment_lines(paths, needle: str, n_blocks: int = 32, **kwargs):
    """Line-split parallel read of single-document XML whose features
    were written one per line (this module's own writers and GDAL's
    pretty-printed output): read_text streams line blocks, each batch
    keeps only feature lines — the XML document parses in PARALLEL
    instead of one ET.fromstring task.

    A SINGLE input file arrives as one block (read_text does not split
    within files), which would serialize the downstream per-feature
    XML parse; the cheap line repartition fans the parse out across
    the cluster (lines are small — the exchange is ~the file size)."""
    ds = ray.data.read_text(paths, **kwargs)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        mask = pc2.match_substring(batch["text"], needle)
        return batch.filter(mask)

    out = ds.map_batches(keep, batch_format="pyarrow")
    n_files = len(paths) if isinstance(paths, (list, tuple)) else 1
    if n_blocks and n_files < n_blocks:
        out = out.repartition(n_blocks)
    return out


def read_kml_fragments(paths: Union[str, List[str]],
                       **kwargs) -> ray.data.Dataset:
    """Parallel KML read for line-per-Placemark documents (the
    write_kml layout). Same schema as read_kml."""
    lines = _fragment_lines(paths, "<Placemark", **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        rows = {"name": [], "description": [], "geometry": []}
        for ln in batch["text"].to_pylist():
            el = ET.fromstring(ln)
            name = desc = ""
            geom = None
            for ch in el:
                t = _strip(ch.tag)
                if t == "name":
                    name = (ch.text or "").strip()
                elif t == "description":
                    desc = (ch.text or "").strip()
                elif t in ("Point", "LineString", "Polygon",
                           "MultiGeometry"):
                    geom = _kml_geom_to_wkb(ch)
            if geom is not None:
                rows["name"].append(name)
                rows["description"].append(desc)
                rows["geometry"].append(geom)
        return pa.table({
            "name": pa.array(rows["name"], pa.string()),
            "description": pa.array(rows["description"], pa.string()),
            "geometry": pa.array(rows["geometry"], pa.binary()),
        })

    return lines.map_batches(parse, batch_format="pyarrow")


def read_gpx_fragments(paths: Union[str, List[str]],
                       **kwargs) -> ray.data.Dataset:
    """Parallel GPX read for line-per-wpt documents (the write_gpx
    layout). Waypoint schema of read_gpx."""
    lines = _fragment_lines(paths, "<wpt", **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        names, lons, lats, geoms = [], [], [], []
        for ln in batch["text"].to_pylist():
            el = ET.fromstring(ln)
            lon, lat = float(el.get("lon")), float(el.get("lat"))
            nm = ""
            for ch in el:
                if _strip(ch.tag) == "name":
                    nm = (ch.text or "").strip()
            names.append(nm)
            lons.append(lon)
            lats.append(lat)
            geoms.append(wkbm.points_to_wkb(np.array([lon]),
                                            np.array([lat]))[0])
        return pa.table({
            "name": pa.array(names, pa.string()),
            "lon": pa.array(lons, pa.float64()),
            "lat": pa.array(lats, pa.float64()),
            "geometry": pa.array(geoms, pa.binary()),
        })

    return lines.map_batches(parse, batch_format="pyarrow")
