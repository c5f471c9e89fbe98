"""Vector format drivers: GeoJSON / GeoJSONSeq / CSV-with-WKT.

OGR driver parity (reference `ogr/ogrsf_frmts/geojson/*`,
`ogr/ogrsf_frmts/csv/*`) re-expressed Ray-Data-first: every reader is a
streaming Dataset source (`read_text` / `read_csv` /
`read_binary_files`) followed by a vectorized `map_batches` parse that
lands geometry as WKB binary — the engine's canonical geometry carrier
— plus flattened property columns. Writers are the inverse
`map_batches` + `write_json`/`write_csv`.

Scale notes: GeoJSONSeq (RFC 8142, one Feature per line) is the
scalable path — `read_text` splits by line across blocks, so a 100-TB
feature log streams. A classic FeatureCollection file must be parsed
whole (the JSON array wraps everything), so `read_geojson` parallelizes
per FILE (read_binary_files) and is documented for many-small-files
layouts, not one giant file.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import wkb as wkb_mod
from ..geom import wkt as wkt_mod


def geojson_geom_to_wkb(g: Optional[dict]) -> Optional[bytes]:
    """GeoJSON geometry object -> WKB bytes (null geometry -> None)."""
    if g is None:
        return None
    t = g["type"]
    c = g.get("coordinates")
    if t == "Point":
        if len(c) >= 3:
            return wkb_mod.point_z_to_wkb(c[0], c[1], c[2])
        return wkb_mod.points_to_wkb(np.array([c[0]]), np.array([c[1]]))[0]
    if t == "LineString":
        a = np.asarray(c, dtype=np.float64)
        return (wkb_mod.linestring_z_to_wkb(a) if a.shape[1] >= 3
                else wkb_mod.linestring_to_wkb(a))
    if t == "Polygon":
        return wkb_mod.polygon_to_wkb(
            [np.asarray(r, dtype=np.float64)[:, :2] for r in c])
    if t == "MultiPoint":
        return wkb_mod.multipoint_to_wkb(np.asarray(c, dtype=np.float64)[:, :2])
    if t == "MultiLineString":
        return wkb_mod.multilinestring_to_wkb(
            [np.asarray(l, dtype=np.float64)[:, :2] for l in c])
    if t == "MultiPolygon":
        return wkb_mod.multipolygon_to_wkb(
            [[np.asarray(r, dtype=np.float64)[:, :2] for r in poly] for poly in c])
    if t == "GeometryCollection":
        return wkb_mod.geometrycollection_to_wkb(
            [geojson_geom_to_wkb(m) for m in g["geometries"]])
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def wkb_to_geojson_geom(buf: Optional[bytes]) -> Optional[dict]:
    """WKB bytes -> GeoJSON geometry object (2-D, OGR-flatten)."""
    if buf is None:
        return None
    kind, payload = wkb_mod.parse_wkb(buf)
    return _parsed_to_geojson(kind, payload)


def _parsed_to_geojson(kind: str, payload) -> dict:
    if kind == "point":
        a = np.asarray(payload, dtype=np.float64)
        return {"type": "Point", "coordinates": list(a[0])}
    if kind == "linestring":
        return {"type": "LineString",
                "coordinates": np.asarray(payload, dtype=np.float64).tolist()}
    if kind == "polygon":
        return {"type": "Polygon",
                "coordinates": [np.asarray(r).tolist() for r in payload]}
    if kind == "multipoint":
        return {"type": "MultiPoint",
                "coordinates": np.asarray(payload, dtype=np.float64).tolist()}
    if kind == "multilinestring":
        return {"type": "MultiLineString",
                "coordinates": [np.asarray(l).tolist() for l in payload]}
    if kind == "multipolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[np.asarray(r).tolist() for r in poly]
                                for poly in payload]}
    if kind == "geometrycollection":
        return {"type": "GeometryCollection",
                "geometries": [_parsed_to_geojson(k, p) for k, p in payload]}
    raise ValueError(f"cannot export geometry kind {kind!r}")


def _features_to_table(features: List[dict],
                       properties: Optional[Sequence[str]]) -> pa.Table:
    if properties is None:
        seen = {}
        for f in features:
            for k in (f.get("properties") or {}):
                seen.setdefault(k, None)
        properties = list(seen)
    cols: dict = {p: [] for p in properties}
    geoms = []
    for f in features:
        props = f.get("properties") or {}
        for p in properties:
            cols[p].append(props.get(p))
        geoms.append(geojson_geom_to_wkb(f.get("geometry")))
    out = {p: pa.array(v) for p, v in cols.items()}
    out["geometry"] = pa.array(geoms, type=pa.binary())
    return pa.table(out)


def read_geojson_seq(paths: Union[str, List[str]],
                     properties: Optional[Sequence[str]] = None,
                     **kwargs) -> ray.data.Dataset:
    """RFC 8142 GeoJSONSeq / NDJSON features -> Dataset with WKB
    `geometry` + property columns. Line-splittable: scales to arbitrary
    file sizes. Pass `properties` for a stable schema across blocks
    (else each block infers the union of its own lines — fine for
    homogeneous feature logs)."""
    text = ray.data.read_text(paths, **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        feats = [json.loads(line.lstrip("\x1e")) for line
                 in batch["text"].to_pylist() if line.strip()]
        return _features_to_table(feats, properties)

    return text.map_batches(parse, batch_format="pyarrow")


def read_geojson(paths: Union[str, List[str]],
                 properties: Optional[Sequence[str]] = None,
                 **kwargs) -> ray.data.Dataset:
    """Classic GeoJSON FeatureCollection file(s) -> Dataset.
    Parallelizes per file (whole-file JSON parse)."""
    raw = ray.data.read_binary_files(paths, **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        feats: List[dict] = []
        for buf in batch["bytes"].to_pylist():
            doc = json.loads(buf)
            if doc.get("type") == "FeatureCollection":
                feats.extend(doc["features"])
            elif doc.get("type") == "Feature":
                feats.append(doc)
            else:  # bare geometry
                feats.append({"geometry": doc, "properties": {}})
        return _features_to_table(feats, properties)

    return raw.map_batches(parse, batch_format="pyarrow")


class _TextLineDatasink:
    """Lazy import holder — ray.data.datasource at module import time
    would pay the full datasource import in every worker."""

    _cls = None

    @classmethod
    def get(cls):
        if cls._cls is None:
            from ray.data.datasource import BlockBasedFileDatasink

            class TextLines(BlockBasedFileDatasink):
                def __init__(self, path, column="text", **kw):
                    super().__init__(path, file_format="geojsonl", **kw)
                    self.column = column

                def write_block_to_file(self, block, file):
                    col = block.to_arrow().column(self.column)
                    for chunk in col.chunks if hasattr(col, "chunks") else [col]:
                        for v in chunk.to_pylist():
                            file.write((v + "\n").encode())

            cls._cls = TextLines
        return cls._cls


def write_geojson_seq(ds: ray.data.Dataset, path: str,
                      geometry_col: str = "geometry") -> None:
    """Dataset (WKB geometry + property columns) -> GeoJSONSeq files
    (one Feature per line, one file per block — resumable layout)."""

    def to_lines(batch: pa.Table) -> pa.Table:
        names = [c for c in batch.column_names if c != geometry_col]
        cols = {c: batch[c].to_pylist() for c in names}
        geoms = batch[geometry_col].to_pylist()
        lines = []
        for i, g in enumerate(geoms):
            feat = {"type": "Feature",
                    "geometry": wkb_to_geojson_geom(g),
                    "properties": {c: cols[c][i] for c in names}}
            lines.append(json.dumps(feat, separators=(",", ":")))
        return pa.table({"text": pa.array(lines)})

    sink = _TextLineDatasink.get()(path)
    ds.map_batches(to_lines, batch_format="pyarrow").write_datasink(sink)


def write_geojson(ds: ray.data.Dataset, path: str,
                  geometry_col: str = "geometry") -> int:
    """Dataset (WKB geometry + property columns) -> ONE classic GeoJSON
    FeatureCollection file. Feature serialization runs distributed (the
    same per-block stage as write_geojson_seq); the final assembly is a
    driver-side streaming byte concat of the shard files — features
    never materialize as Python objects on the driver. Classic GeoJSON
    is a single JSON document by spec, so the output is inherently one
    file; prefer write_geojson_seq for large outputs. Returns the
    feature count."""
    out_dir = os.path.dirname(os.path.abspath(path)) or "."
    shard_dir = tempfile.mkdtemp(prefix=".gj_shards_", dir=out_dir)
    tmp_path = path + ".tmp"
    try:
        write_geojson_seq(ds, shard_dir, geometry_col=geometry_col)
        n = 0
        with open(tmp_path, "wb") as out:
            out.write(b'{"type":"FeatureCollection","features":[\n')
            for name in sorted(os.listdir(shard_dir)):
                with open(os.path.join(shard_dir, name), "rb") as f:
                    for line in f:
                        line = line.strip()
                        if not line:
                            continue
                        if n:
                            out.write(b",\n")
                        out.write(line)
                        n += 1
            out.write(b"\n]}\n")
        os.replace(tmp_path, path)
        return n
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)


def read_csv_wkt(paths: Union[str, List[str]], wkt_col: str = "wkt",
                 keep_wkt: bool = False, **kwargs) -> ray.data.Dataset:
    """CSV with a WKT geometry column (OGR CSV driver GEOM_POSSIBLE_NAMES
    analog) -> Dataset with WKB `geometry`."""
    ds = ray.data.read_csv(paths, **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        wkts = batch[wkt_col].to_pylist()
        geoms = pa.array([None if w is None else wkt_mod.wkt_to_wkb(w)
                          for w in wkts], type=pa.binary())
        if not keep_wkt:
            batch = batch.drop_columns([wkt_col])
        return batch.append_column("geometry", geoms)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_csv_wkt(ds: ray.data.Dataset, path: str,
                  geometry_col: str = "geometry",
                  wkt_col: str = "wkt") -> None:
    """Dataset with WKB geometry -> CSV files with a WKT column."""

    def to_wkt(batch: pa.Table) -> pa.Table:
        geoms = batch[geometry_col].to_pylist()
        wkts = pa.array([None if g is None else wkt_mod.wkb_to_wkt(g)
                         for g in geoms])
        return batch.drop_columns([geometry_col]).append_column(wkt_col, wkts)

    ds.map_batches(to_wkt, batch_format="pyarrow").write_csv(path)


_CSV_X_NAMES = ("x", "lon", "long", "longitude", "easting")
_CSV_Y_NAMES = ("y", "lat", "latitude", "northing")


def _read_csvt(csv_path: str):
    """.csvt sidecar -> list of declared types (OGR CSV driver:
    Integer/Integer64/Real/String/Date/Time/DateTime[,(width.prec)])."""
    import os
    import re as _re

    base = os.path.splitext(csv_path)[0]
    for cand in (base + ".csvt", base + ".CSVT"):
        if os.path.exists(cand):
            with open(cand, "r", encoding="utf-8", errors="replace") as f:
                line = f.readline()
            return [_re.sub(r"\s*\(.*", "", t.strip().strip('"'))
                    for t in line.strip().split(",")]
    return None


def read_csv_points(paths: Union[str, List[str]],
                    x_col: str = None, y_col: str = None,
                    **kwargs) -> ray.data.Dataset:
    """CSV with X/Y (or lon/lat family) columns -> Dataset with WKB
    point `geometry`, typed by the .csvt sidecar when present
    (ogr/ogrsf_frmts/csv X_POSSIBLE_NAMES/Y_POSSIBLE_NAMES + .csvt
    analog)."""
    import numpy as np

    first = paths if isinstance(paths, str) else paths[0]
    with open(first, "r", encoding="utf-8-sig",
              errors="replace") as fh:
        header = fh.readline()
    cols = [c.strip().strip('"') for c in header.rstrip("\n").split(",")]
    low = [c.lower() for c in cols]
    if x_col is None:
        x_col = next((cols[i] for i, c in enumerate(low)
                      if c in _CSV_X_NAMES), None)
    if y_col is None:
        y_col = next((cols[i] for i, c in enumerate(low)
                      if c in _CSV_Y_NAMES), None)
    csvt = _read_csvt(first)
    ds = ray.data.read_csv(paths, **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        if csvt and len(csvt) == len(batch.column_names):
            typed = {}
            for i, name in enumerate(batch.column_names):
                col = batch[name]
                t = csvt[i]
                try:
                    if t in ("Integer", "Integer64"):
                        # empty CSV cells read as NaN floats; null them
                        # so the int cast succeeds
                        f64 = pc2.cast(col, pa.float64())
                        f64 = pc2.if_else(
                            pc2.is_nan(f64),
                            pa.nulls(len(f64), pa.float64()), f64)
                        col = pc2.cast(f64, pa.int64())
                    elif t == "Real":
                        col = pc2.cast(col, pa.float64())
                    elif t in ("String", "Date", "Time", "DateTime"):
                        col = pc2.cast(col, pa.string())
                except pa.ArrowInvalid:
                    pass
                typed[name] = col
            batch = pa.table(typed)
        if x_col and y_col and x_col in batch.column_names and \
                y_col in batch.column_names:
            x = np.asarray(batch[x_col].to_pylist(), dtype=np.float64)
            y = np.asarray(batch[y_col].to_pylist(), dtype=np.float64)
            from ..geom import wkb as wkb_mod

            geoms = [bytes(g) for g in wkb_mod.points_to_wkb(x, y)]
            batch = batch.append_column(
                "geometry", pa.array(geoms, pa.binary()))
        return batch

    return ds.map_batches(parse, batch_format="pyarrow")
