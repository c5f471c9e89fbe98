"""OGR vector VRT (<OGRVRTDataSource>) — XML layer definitions over
any registered vector source.

Parity target: `ogr/ogrsf_frmts/vrt/ogrvrtlayer.cpp` — SrcDataSource
(relativeToVRT), SrcLayer, GeometryField encodings WKT /
PointFromColumns / Direct, LayerSRS, field passthrough. The
reference's own test suite leans on these files (e.g.
autotest/utilities/data/cutline.vrt), so a user switching engines
brings them on day one.

`read_vector` is the library-level OGROpen analog: extension-
dispatched to the registered drivers, WKB geometry column out. The
VRT layer is a *plan* over it — the source Dataset streams through a
map_batches geometry-derivation stage; nothing materializes
driver-side.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import ray.data


def _is_gtfs_zip(path: str) -> bool:
    """GTFS identify probe: the zip carries the required feed members
    (ogrgtfsdriver.cpp:536-538 apszRequiredFiles)."""
    import zipfile
    try:
        with zipfile.ZipFile(path) as zf:
            names = set(zf.namelist())
    except Exception:
        return False
    return {"agency.txt", "stops.txt", "trips.txt"} <= names


def read_vector(path: str, fmt: Optional[str] = None,
                geometry_col: str = "geometry") -> ray.data.Dataset:
    """OGROpen analog: one call, any registered vector format,
    WKB geometry column named `geometry_col` where the format carries
    geometry. Formats: parquet/lance, gpkg, shp, fgb, geojson(+seq),
    csv-wkt, gpx, kml, osm/pbf (points layer), and nested .vrt."""
    p = path.lower()
    fmt = fmt or (
        "gpkg" if p.endswith(".gpkg") else
        "shapefile" if p.endswith(".shp") else
        "fgb" if p.endswith(".fgb") else
        "geojsonseq" if p.endswith((".geojsonl", ".geojsons", ".ndjson"))
        else "geojson" if p.endswith((".geojson", ".json")) else
        "csvwkt" if p.endswith(".csv") else
        "gpx" if p.endswith(".gpx") else
        "kml" if p.endswith(".kml") else
        "gml" if p.endswith(".gml") else
        "osm" if p.endswith((".osm", ".pbf", ".osm.pbf")) else
        "mif" if p.endswith((".mif", ".mid")) else
        "tab" if p.endswith(".tab") else
        "dxf" if p.endswith(".dxf") else
        "filegdb" if (p.endswith(".gdbtable") or ".gdb/" in p
                      or ".gdb" + os.sep in p) else
        "spatialite" if p.endswith((".sqlite", ".db")) else
        "xlsx" if p.endswith(".xlsx") else
        "ods" if p.endswith(".ods") else
        "topojson" if p.endswith(".topojson") else
        "gtfs" if (p.endswith(".zip") and _is_gtfs_zip(path)) else
        "dgn" if p.endswith(".dgn") else
        "sxf" if p.endswith(".sxf") else
        "s57" if p.endswith(".000") else
        "gmt" if p.endswith(".gmt") else
        "e00" if p.endswith(".e00") else
        "idf" if p.endswith(".idf") else
        "jml" if p.endswith(".jml") else
        "georss" if p.endswith((".rss", ".atom")) else
        "idrisi" if p.endswith(".vct") else
        "arrow" if p.endswith((".feather", ".arrow", ".arrows")) else
        "dbf" if p.endswith(".dbf") else
        "vrt" if p.endswith(".vrt") else
        "parquet")
    if fmt == "gpkg":
        from .gpkg import read_gpkg
        return read_gpkg(path)
    if fmt == "shapefile":
        from .shapefile import read_shapefile
        return read_shapefile(path)
    if fmt == "fgb":
        from .flatgeobuf import read_flatgeobuf
        return read_flatgeobuf(path)
    if fmt == "geojsonseq":
        from .vector_formats import read_geojson_seq
        return read_geojson_seq(path)
    if fmt == "geojson":
        # JSON-FG documents also use .json: probe for conformsTo /
        # place members (like OGR's driver ordering JSONFG > GeoJSON)
        try:
            head = open(path, "r", errors="replace").read(10000)
        except OSError:
            head = ""
        if "json-fg" in head or '"place"' in head:
            from .jsonfg import read_jsonfg
            return read_jsonfg(path)
        if "esriGeometry" in head or ('"attributes"' in head
                                      and '"features"' in head):
            from .esrijson import read_esrijson
            return ray.data.from_arrow(read_esrijson(path))
        from .vector_formats import read_geojson
        return read_geojson(path)
    if fmt == "jsonfg":
        from .jsonfg import read_jsonfg
        return read_jsonfg(path)
    if fmt == "csvwkt":
        from .vector_formats import read_csv_wkt
        # plain CSV (no wkt column) reads generic — header peek,
        # the OGR CSV driver's GEOM_POSSIBLE_NAMES probe
        try:
            with open(path) as fh:
                header = fh.readline()
            cols = [c.strip().strip('"').lower()
                    for c in header.split(",")]
        except OSError:
            cols = []
        if "wkt" in cols:
            return read_csv_wkt(path, wkt_col="wkt")
        from .vector_formats import _CSV_X_NAMES, _CSV_Y_NAMES

        if any(c in _CSV_X_NAMES for c in cols) and \
                any(c in _CSV_Y_NAMES for c in cols):
            from .vector_formats import read_csv_points

            return read_csv_points(path)
        return ray.data.read_csv(path)
    if fmt == "csv":
        return ray.data.read_csv(path)
    if fmt == "gpx":
        from .xml_vectors import read_gpx
        return read_gpx(path)
    if fmt == "kml":
        from .xml_vectors import read_kml
        return read_kml(path)
    if fmt == "gml":
        from .gml import read_gml
        return read_gml(path)
    if fmt == "filegdb":
        # "<dir>.gdb/<layer>" or a bare .gdbtable file
        from .filegdb import read_filegdb, read_gdbtable
        if path.endswith(".gdbtable"):
            return read_gdbtable(path)
        gdb_dir, layer = os.path.split(path.rstrip("/"))
        if layer.endswith(".gdb"):
            raise ValueError("read_vector: pass '<x>.gdb/<layer>'")
        return read_filegdb(gdb_dir, layer)
    if fmt == "dxf":
        from .dxf import read_dxf
        return read_dxf(path)
    if fmt == "mif":
        from .mitab import read_mif
        return read_mif(path)
    if fmt == "tab":
        from .tab import read_tab
        return read_tab(path, geometry_col=geometry_col)
    if fmt == "osm":
        # default layer for the one-Dataset API: points (the other
        # four layers hang off sources.osm.osm_layers)
        from .osm import points_layer
        return points_layer(path)
    if fmt == "spatialite":
        from .spatialite import read_spatialite
        return read_spatialite(path)
    if fmt == "xlsx":
        from .spreadsheet import read_xlsx
        return read_xlsx(path)
    if fmt == "ods":
        from .spreadsheet import read_ods
        return read_ods(path)
    if fmt == "topojson":
        from .topojson import read_topojson
        return read_topojson(path)
    if fmt == "dgn":
        from .dgn import read_dgn
        return read_dgn(path)
    if fmt == "gmt":
        from .gmt import read_gmt
        return read_gmt(path)
    if fmt == "sxf":
        from .sxf import read_sxf
        return read_sxf(path, geometry_col=geometry_col)
    if fmt == "s57":
        from .s57 import read_s57
        return read_s57(path)
    if fmt == "gtfs":
        # default layer for the one-Dataset API: stops (points); the
        # other layers hang off sources.gtfs.read_gtfs(path, layer)
        from .gtfs import read_gtfs
        return read_gtfs(path, "stops")
    if fmt == "e00":
        # default layer for the one-Dataset API: ARC if present, else
        # LAB (point coverages); all layers via sources.avce00.read_e00
        from .avce00 import read_e00
        layers = read_e00(path)
        return ray.data.from_arrow(
            layers.get("ARC") or layers.get("LAB")
            or next(iter(layers.values())))
    if fmt == "idf":
        from .idf import read_idf
        layers = read_idf(path)
        return ray.data.from_arrow(
            layers.get("Node") or next(iter(layers.values())))
    if fmt == "jml":
        from .jml import read_jml
        return ray.data.from_arrow(read_jml(path))
    if fmt == "georss":
        from .georss import read_georss
        return ray.data.from_arrow(read_georss(path))
    if fmt == "esrijson":
        from .esrijson import read_esrijson
        return ray.data.from_arrow(read_esrijson(path))
    if fmt == "idrisi":
        from .idrisi_vct import read_idrisi_vct
        return ray.data.from_arrow(read_idrisi_vct(path))
    if fmt == "arrow":
        from .arrow_ipc import read_arrow_ipc
        return read_arrow_ipc(path)
    if fmt == "dbf":
        from .shapefile import read_dbf_table
        return ray.data.from_arrow(read_dbf_table(path))
    if fmt == "vrt":
        return read_vrt_vector(path)
    return ray.data.read_parquet(path)


@dataclass
class VRTVectorLayer:
    name: str
    src: str
    src_layer: Optional[str] = None
    relative: bool = False
    encoding: str = "Direct"            # WKT | PointFromColumns | Direct
    wkt_field: Optional[str] = None
    x_field: Optional[str] = None
    y_field: Optional[str] = None
    srs: Optional[str] = None
    fid: Optional[str] = None
    geometry_type: Optional[str] = None
    fields: List[str] = field(default_factory=list)  # explicit <Field>s


def parse_vrt_vector(text: str) -> List[VRTVectorLayer]:
    root = ET.fromstring(text)
    if root.tag != "OGRVRTDataSource":
        raise ValueError(f"not an OGRVRTDataSource (root <{root.tag}>)")
    layers = []
    for lel in root.findall("OGRVRTLayer"):
        lay = VRTVectorLayer(name=lel.get("name", ""), src="")
        sds = lel.find("SrcDataSource")
        if sds is None or not (sds.text or "").strip():
            raise ValueError(f"layer {lay.name!r}: missing SrcDataSource")
        lay.src = sds.text.strip()
        lay.relative = sds.get("relativeToVRT", "0") == "1"
        sl = lel.findtext("SrcLayer")
        if sl:
            lay.src_layer = sl.strip()
        srs = lel.findtext("LayerSRS")
        if srs:
            lay.srs = srs.strip()
        fid = lel.findtext("FID")
        if fid:
            lay.fid = fid.strip()
        gt = lel.findtext("GeometryType")
        if gt:
            lay.geometry_type = gt.strip()
        gf = lel.find("GeometryField")
        if gf is not None:
            lay.encoding = gf.get("encoding", "Direct")
            lay.wkt_field = gf.get("field")
            lay.x_field = gf.get("x")
            lay.y_field = gf.get("y")
        for fel in lel.findall("Field"):
            nm = fel.get("name")
            if nm:
                lay.fields.append(nm)
    # (OpenOptions / SrcSQL intentionally out of scope — documented)
        layers.append(lay)
    return layers


def read_vrt_vector(path: str, layer: Optional[str] = None,
                    geometry_col: str = "geometry") -> ray.data.Dataset:
    """OGR VRT file -> feature Dataset of the named (or first) layer.
    The source streams through the registered driver; the geometry
    derivation (WKT parse / point-from-columns) is one map_batches
    stage on top."""
    with open(path) as f:
        layers = parse_vrt_vector(f.read())
    if not layers:
        raise ValueError("VRT has no OGRVRTLayer")
    if layer is not None:
        match = [l for l in layers if l.name == layer]
        if not match:
            raise KeyError(f"layer {layer!r} not in "
                           f"{[l.name for l in layers]}")
        lay = match[0]
    else:
        lay = layers[0]
    src_path = lay.src
    if lay.relative:
        src_path = os.path.join(os.path.dirname(path), src_path)
    ds = read_vector(src_path, geometry_col=geometry_col)

    if lay.encoding == "WKT" and lay.wkt_field:
        from ..geom import wkt as wktm

        fieldname = lay.wkt_field

        def derive_wkt(batch: pa.Table) -> pa.Table:
            if fieldname not in batch.column_names:
                # the source driver already derived geometry from this
                # column (e.g. the CSV reader's own WKT probe)
                return batch
            geoms = [wktm.wkt_to_wkb(s) if s else None
                     for s in batch[fieldname].to_pylist()]
            batch = batch.drop_columns([fieldname])
            if geometry_col in batch.column_names:
                batch = batch.drop_columns([geometry_col])
            return batch.append_column(geometry_col,
                                       pa.array(geoms, pa.binary()))

        ds = ds.map_batches(derive_wkt, batch_format="pyarrow")
    elif lay.encoding == "PointFromColumns" and lay.x_field and lay.y_field:
        from ..geom import wkb as wkbm

        xf, yf = lay.x_field, lay.y_field

        def derive_xy(batch: pa.Table) -> pa.Table:
            x = np.asarray(batch[xf].to_pylist(), dtype=np.float64)
            y = np.asarray(batch[yf].to_pylist(), dtype=np.float64)
            geoms = wkbm.points_to_wkb(x, y)
            if geometry_col in batch.column_names:
                batch = batch.drop_columns([geometry_col])
            return batch.append_column(geometry_col,
                                       pa.array(list(geoms), pa.binary()))

        ds = ds.map_batches(derive_xy, batch_format="pyarrow")

    if lay.fields:
        keep = list(lay.fields)
        if geometry_col not in keep:
            keep.append(geometry_col)

        def project(batch: pa.Table) -> pa.Table:
            cols = [c for c in keep if c in batch.column_names]
            return batch.select(cols)

        ds = ds.map_batches(project, batch_format="pyarrow")
    return ds
