"""ogr2ogr analog: translate vector layers between formats with
filtering / projection / reprojection / geometry cleanup, all as one
streaming Ray Data pipeline (reference: `apps/ogr2ogr_bin.cpp` +
`apps/gdalvectortranslate*` — same argument surface for the core
options, Ray-Data-first execution).

Usage (GDAL argument order — destination first):
    python scripts/ogr2ogr.py DST SRC
        [-f parquet|gpkg|shapefile|geojsonseq|csvwkt]   # else inferred
        [-select col1,col2,...] [-where "OGR SQL expr"]
        [-sql "SELECT ... FROM src ..."]                # ExecuteSQL plan
        [-s_srs EPSG:4326] [-t_srs EPSG:3857]           # WKB reprojection
        [-spat xmin ymin xmax ymax]                     # envelope filter
        [-simplify tol] [-segmentize maxlen] [-makevalid]
        [-explodecollections] [-limit N] [-nln layername]
        [--geometry-col geometry] [--num-cpus 8]

Formats:
    parquet    file or directory (hive partitions pass through)
    gpkg       .gpkg file (shards merged driver-side) or shard dir
    shapefile  .shp or directory of .shp/.shx/.dbf triples
    geojsonseq newline-delimited GeoJSON features (.geojsonl/.ndjson)
    csvwkt     CSV with a WKT geometry column

Everything between read and write is a lazy `map_batches` chain over
zero-copy Arrow blocks — no driver materialization at any size.
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray workers do NOT inherit driver sys.path — propagate via env.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def _infer_format(path: str, explicit):
    if explicit:
        return explicit
    p = path.lower()
    if p.endswith(".gpkg"):
        return "gpkg"
    if p.endswith(".shp"):
        return "shapefile"
    if p.endswith((".geojsonl", ".geojsons", ".ndjson")):
        return "geojsonseq"
    if p.endswith(".geojson") or p.endswith(".json"):
        return "geojson"
    if p.endswith(".csv"):
        return "csvwkt"
    if p.endswith(".vrt"):
        return "vrt"
    if p.endswith(".fgb"):
        return "fgb"
    if p.endswith(".gml"):
        return "gml"
    if p.endswith(".kml"):
        return "kml"
    if p.endswith((".mif", ".mid")):
        return "mif"
    if p.endswith(".tab"):
        return "tab"
    if p.endswith(".dxf"):
        return "dxf"
    if p.endswith((".osm", ".pbf")):
        return "osm"
    if p.endswith(".gdbtable") or ".gdb/" in p:
        return "filegdb"
    if p.endswith((".sqlite", ".db")):
        return "spatialite"
    if p.endswith(".xlsx"):
        return "xlsx"
    if p.endswith(".ods"):
        return "ods"
    if p.endswith(".sql"):
        return "pgdump"
    if p.endswith(".topojson"):
        return "topojson"
    if p.endswith(".dgn"):
        return "dgn"
    if p.endswith(".sxf"):
        return "sxf"
    if p.endswith(".000"):
        return "s57"
    if p.endswith(".gmt"):
        return "gmt"
    if p.endswith(".gpx"):
        return "gpx"
    if p.endswith(".e00"):
        return "e00"
    if p.endswith(".idf"):
        return "idf"
    if p.endswith(".jml"):
        return "jml"
    if p.endswith((".rss", ".atom")):
        return "georss"
    if p.endswith(".vct"):
        return "idrisi"
    if p.endswith((".feather", ".arrow", ".arrows")):
        return "arrow"
    if os.path.isdir(path):
        names = os.listdir(path) if os.path.exists(path) else []
        if any(n.endswith(".gpkg") for n in names):
            return "gpkg"
        if any(n.endswith(".shp") for n in names):
            return "shapefile"
    return "parquet"


def _read(path: str, fmt: str, geometry_col: str):
    import ray.data

    if fmt == "gpkg":
        from lib_gdal_ray.sources.gpkg import read_gpkg

        return read_gpkg(path)
    if fmt == "shapefile":
        from lib_gdal_ray.sources.shapefile import read_shapefile

        return read_shapefile(path)
    if fmt == "geojsonseq":
        from lib_gdal_ray.sources.vector_formats import read_geojson_seq

        return read_geojson_seq(path)
    if fmt == "geojson":
        from lib_gdal_ray.sources.vector_formats import read_geojson

        return read_geojson(path)
    if fmt == "csvwkt":
        from lib_gdal_ray.sources.vector_formats import (_CSV_X_NAMES,
                                                         _CSV_Y_NAMES,
                                                         read_csv_points,
                                                         read_csv_wkt)

        try:
            with open(path, encoding="utf-8-sig",
                      errors="replace") as fh:
                cols = [c.strip().strip('"').lower()
                        for c in fh.readline().split(",")]
        except OSError:
            cols = []
        if "wkt" in cols:
            ds = read_csv_wkt(path, wkt_col="wkt")
        elif any(c in _CSV_X_NAMES for c in cols) and \
                any(c in _CSV_Y_NAMES for c in cols):
            ds = read_csv_points(path)
        else:
            ds = read_csv_wkt(path, wkt_col="wkt")
        if geometry_col != "geometry":
            ds = ds.rename_columns({"geometry": geometry_col})
        return ds
    if fmt == "vrt":
        from lib_gdal_ray.sources.vrt_vector import read_vrt_vector

        return read_vrt_vector(path, geometry_col=geometry_col)
    if fmt in ("tab", "mif", "dxf", "osm", "filegdb", "spatialite",
               "xlsx", "ods", "topojson", "dgn", "gtfs", "gmt", "sxf",
               "s57", "e00", "idf", "jml", "georss", "esrijson",
               "idrisi", "arrow"):
        from lib_gdal_ray.sources.vrt_vector import read_vector

        return read_vector(path, fmt=fmt, geometry_col=geometry_col)
    return ray.data.read_parquet(path)


def _write(ds, path: str, fmt: str, layer: str, geometry_col: str,
           srs_id: int = 4326) -> int:
    if fmt == "gpkg" and ds.schema() is not None and \
            "fid" in ds.schema().names:
        # the GPKG sink owns the fid rowid column (OGR keeps source
        # FIDs out of the attribute schema too): carry it renamed
        ds = ds.rename_columns({"fid": "src_fid"})
    if fmt == "gpkg":
        from lib_gdal_ray.sources.gpkg import merge_gpkg_dir, write_gpkg

        if path.endswith(".gpkg"):
            shard_dir = path + ".shards"
            write_gpkg(ds, shard_dir, layer=layer, geometry_col=geometry_col,
                       srs_id=srs_id)
            return merge_gpkg_dir(shard_dir, path, layer=layer,
                                  geometry_col=geometry_col)
        write_gpkg(ds, path, layer=layer, geometry_col=geometry_col,
                   srs_id=srs_id)
        return -1
    if fmt == "shapefile":
        from lib_gdal_ray.sources.shapefile import write_shapefile

        write_shapefile(ds, path if not path.endswith(".shp")
                        else os.path.dirname(path) or ".",
                        geometry_col=geometry_col)
        return -1
    if fmt == "geojsonseq":
        from lib_gdal_ray.sources.vector_formats import write_geojson_seq

        write_geojson_seq(ds, path, geometry_col=geometry_col)
        return -1
    if fmt == "csvwkt":
        from lib_gdal_ray.sources.vector_formats import write_csv_wkt

        write_csv_wkt(ds, path, geometry_col=geometry_col)
        return -1
    if fmt == "geojson":
        from lib_gdal_ray.sources.vector_formats import write_geojson

        return write_geojson(ds, path, geometry_col=geometry_col)
    if fmt == "fgb":
        from lib_gdal_ray.sources.flatgeobuf import write_flatgeobuf

        return write_flatgeobuf(ds, path, wkb_col=geometry_col, name=layer)
    if fmt == "gml":
        from lib_gdal_ray.sources.gml import write_gml

        return write_gml(ds, path, geometry_col=geometry_col, layer=layer)
    if fmt == "kml":
        from lib_gdal_ray.sources.xml_vectors import write_kml

        return write_kml(ds, path, geometry_col=geometry_col)
    if fmt == "gpx":
        from lib_gdal_ray.sources.xml_vectors import write_gpx

        return write_gpx(ds, path, geometry_col=geometry_col)
    if fmt == "pgdump":
        from lib_gdal_ray.sources.pgdump import write_pgdump

        return write_pgdump(ds, path, layer=layer,
                            geometry_col=geometry_col, srid=srs_id)
    if fmt == "xlsx":
        from lib_gdal_ray.sources.spreadsheet import write_xlsx

        # attribute-only sink: drop the geometry column if present
        if ds.schema() is not None and geometry_col in ds.schema().names:
            ds = ds.drop_columns([geometry_col])
        return write_xlsx(ds, path)
    if fmt == "spatialite":
        from lib_gdal_ray.sources.spatialite import (merge_spatialite_dir,
                                                     write_spatialite)

        if path.endswith((".sqlite", ".db")):
            shard_dir = path + ".shards"
            write_spatialite(ds, shard_dir, layer=layer,
                             geometry_col=geometry_col, srid=srs_id)
            return merge_spatialite_dir(shard_dir, path, layer=layer)
        write_spatialite(ds, path, layer=layer, geometry_col=geometry_col,
                         srid=srs_id)
        return -1
    if fmt == "gmt":
        from lib_gdal_ray.sources.gmt import write_gmt

        return write_gmt(ds, path, geometry_col=geometry_col)
    if fmt == "mif":
        from lib_gdal_ray.sources.mitab import write_mif

        return write_mif(ds, path, geometry_col=geometry_col)
    if fmt == "dxf":
        from lib_gdal_ray.sources.dxf import write_dxf

        write_dxf(ds, path, geometry_col=geometry_col)
        return -1
    if fmt == "jml":
        from lib_gdal_ray.sources.jml import write_jml_ds

        name_col = "name" if ds.schema() is not None and \
            "name" in ds.schema().names else \
            next(c for c in ds.schema().names if c != geometry_col)
        return write_jml_ds(ds, path, geometry_col=geometry_col,
                            name_col=name_col)
    if fmt == "georss":
        from lib_gdal_ray.sources.georss import write_georss_ds

        name_col = "name" if ds.schema() is not None and \
            "name" in ds.schema().names else \
            next(c for c in ds.schema().names if c != geometry_col)
        return write_georss_ds(ds, path, geometry_col=geometry_col,
                               name_col=name_col)
    if fmt == "arrow":
        from lib_gdal_ray.sources.arrow_ipc import write_arrow_ipc

        return write_arrow_ipc(ds, path)
    raise ValueError(f"unsupported output format: {fmt!r} "
                     f"(writable: {sorted(_WRITABLE)})")


_WRITABLE = {"parquet", "gpkg", "shapefile", "geojson", "geojsonseq",
             "csvwkt", "fgb", "gml", "kml", "gpx", "mif", "dxf",
             "spatialite", "xlsx", "pgdump", "gmt", "jml", "georss",
             "arrow"}


def _epsg(s: str) -> int:
    return int(s.split(":")[-1])


def _source_epsg(path: str, fmt: str):
    """SRS from source metadata where the format carries one (GDAL reads
    the source layer SRS; we mirror that for gpkg)."""
    if fmt == "gpkg" and os.path.isfile(path):
        import sqlite3

        try:
            con = sqlite3.connect(path)
            row = con.execute(
                "SELECT srs_id FROM gpkg_geometry_columns LIMIT 1").fetchone()
            con.close()
            if row and row[0] and int(row[0]) > 0:
                return int(row[0])
        except Exception:
            pass
    return None


def main():
    ap = argparse.ArgumentParser(
        description="ogr2ogr analog over Ray Data (dst first, like GDAL)")
    ap.add_argument("dst")
    ap.add_argument("src")
    ap.add_argument("-f", dest="fmt", default=None,
                    help="output format (inferred from dst if omitted)")
    ap.add_argument("-select", default=None)
    ap.add_argument("-where", default=None)
    ap.add_argument("-sql", default=None)
    ap.add_argument("-s_srs", default=None,
                    help="source CRS; default: source metadata, else "
                         "EPSG:4326 with a warning")
    ap.add_argument("-t_srs", default=None)
    ap.add_argument("-spat", nargs=4, type=float, default=None,
                    metavar=("XMIN", "YMIN", "XMAX", "YMAX"))
    ap.add_argument("-simplify", type=float, default=None)
    ap.add_argument("-segmentize", type=float, default=None)
    ap.add_argument("-makevalid", action="store_true")
    ap.add_argument("-explodecollections", action="store_true")
    ap.add_argument("-limit", type=int, default=None)
    ap.add_argument("-nln", default="layer", help="output layer name")
    ap.add_argument("-partition-by", dest="partition_by", default=None,
                    help="comma list: Hive-partitioned parquet output")
    ap.add_argument("--geometry-col", default="geometry")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import json
    import time

    t0 = time.perf_counter()
    src_fmt = _infer_format(args.src, None)
    dst_fmt = _infer_format(args.dst, args.fmt)
    ds = _read(args.src, src_fmt, args.geometry_col)

    if args.sql:
        from lib_gdal_ray.functions.ogrsql import execute_sql

        name = os.path.splitext(os.path.basename(args.src))[0]
        ds = execute_sql(args.sql, {name: ds, "src": ds})
    g = args.geometry_col
    steps = []
    if args.where:
        steps.append({"op": "filter", "where": args.where})
    if args.spat:
        x0, y0, x1, y1 = args.spat
        steps.append({"op": "spat_filter", "xmin": x0, "ymin": y0,
                      "xmax": x1, "ymax": y1, "wkb_col": g})
    if args.makevalid:
        steps.append({"op": "makevalid", "wkb_col": g})
    if args.explodecollections:
        steps.append({"op": "explode_collections", "wkb_col": g})
    if args.simplify is not None:
        steps.append({"op": "simplify", "tol": args.simplify, "wkb_col": g})
    if args.segmentize is not None:
        steps.append({"op": "segmentize", "max_length": args.segmentize,
                      "wkb_col": g})
    if args.s_srs:
        src_epsg = _epsg(args.s_srs)
    else:
        src_epsg = _source_epsg(args.src, src_fmt)
        if src_epsg is None and args.t_srs:
            print("Warning: source CRS not in metadata; assuming "
                  "EPSG:4326 (pass -s_srs to override)", file=sys.stderr)
        src_epsg = src_epsg or 4326
    out_epsg = _epsg(args.t_srs) if args.t_srs else src_epsg
    if args.t_srs:
        steps.append({"op": "reproject_geometry", "src": src_epsg,
                      "dst": out_epsg, "wkb_col": g})
    if args.select:
        steps.append({"op": "select_columns",
                      "columns": args.select.split(",")})
    if args.limit is not None:
        steps.append({"op": "limit", "n": args.limit})

    if steps:
        from lib_gdal_ray.pipelines.spec import _OPS

        for step in steps:
            step = dict(step)
            op = step.pop("op")
            ds = _OPS[op](ds, **step)

    if dst_fmt == "parquet":
        from lib_gdal_ray.sources.sinks import write_partitioned

        write_partitioned(ds, args.dst,
                          args.partition_by.split(",")
                          if args.partition_by else None)
        rows = -1
    else:
        rows = _write(ds, args.dst, dst_fmt, args.nln, g, srs_id=out_epsg)
    print(json.dumps({"src": args.src, "src_format": src_fmt,
                      "dst": args.dst, "dst_format": dst_fmt,
                      "rows": rows, "steps": len(steps),
                      "sec": round(time.perf_counter() - t0, 3)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
