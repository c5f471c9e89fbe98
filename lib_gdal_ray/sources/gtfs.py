"""GTFS (General Transit Feed Specification) vector driver.

The reference's GTFS driver (ogr/ogrsf_frmts/gtfs/ogrgtfsdriver.cpp)
exposes a feed zip/directory as one layer per parseable .txt CSV
member plus a derived ``shapes_geom`` layer, with name-driven field
typing (ogrgtfsdriver.cpp:128-168: stop_lat/lon and
shape_dist_traveled real; shape_pt_sequence, stop_sequence, *_type
and the weekday flags integer; date/start_date/end_date YYYYMMDD →
Date; arrival/departure_time Time), point geometry on stops/shapes
from the lat/lon columns, trip LineStrings from the
stop_times(stop_sequence)→stops join (PrepareTripsData,
ogrgtfsdriver.cpp:192-255), and per-shape LineStrings ordered by
shape_pt_sequence.

arrival_time/departure_time stay strings here (normalized HH:MM:SS):
GTFS times legally exceed 24:00:00 for after-midnight service, which
Arrow time32 cannot carry — the reference's OFTTime renders the same
text.

Ray-Data shape: a member is one deflate stream, so member text
extracts driver-side (feeds are small by construction) and row
typing/geometry runs vectorized in map_batches; the trips join
broadcasts the stop/stop_times lookup once via ray.put.
"""

from __future__ import annotations

import io
import os
import zipfile
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv
import ray
import ray.data

_REQUIRED = {"agency.txt", "routes.txt", "trips.txt", "stop_times.txt",
             "stops.txt", "calendar.txt"}
_WEEKDAYS = {"monday", "tuesday", "wednesday", "thursday", "friday",
             "saturday", "sunday"}


def _members(path: str) -> Dict[str, bytes]:
    """feed zip or directory -> {basename.txt: bytes}."""
    out = {}
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith(".txt"):
                with open(os.path.join(path, f), "rb") as fh:
                    out[f] = fh.read()
    else:
        with zipfile.ZipFile(path) as zf:
            for n in sorted(zf.namelist()):
                if n.endswith(".txt") and "/" not in n:
                    out[n] = zf.read(n)
    return out


def _parseable(data: bytes) -> bool:
    """The reference keeps a .txt only when the CSV driver found a
    real header (no field_1 fallback) — a comma-less or non-text
    first line is not a GTFS table."""
    head = data.split(b"\n", 1)[0]
    return b"," in head


def gtfs_layers(path: str) -> List[str]:
    members = _members(path)
    names = [f[:-4] for f, d in members.items() if _parseable(d)]
    if "shapes" in names:
        names.append("shapes_geom")
    return names


def _read_csv(data: bytes) -> pa.Table:
    return pacsv.read_csv(
        io.BytesIO(data),
        convert_options=pacsv.ConvertOptions(
            column_types={}, strings_can_be_null=False),
        parse_options=pacsv.ParseOptions(newlines_in_values=True))


def _col_str(tab: pa.Table, name: str) -> np.ndarray:
    import pyarrow.compute as pc

    return np.asarray(
        pc.cast(tab[name], pa.string()).to_pandas().fillna("").to_numpy(
            dtype=object))


def _field_type(name: str) -> str:
    n = name.lower()
    if n in ("stop_lat", "stop_lon", "shape_pt_lat", "shape_pt_lon",
             "shape_dist_traveled"):
        return "float"
    if n in ("shape_pt_sequence", "stop_sequence") or "_type" in n \
            or n in _WEEKDAYS:
        return "int"
    if n in ("date", "start_date", "end_date"):
        return "date"
    if n in ("arrival_time", "departure_time"):
        return "time"
    return "string"


def _typed_columns(tab: pa.Table) -> pa.Table:
    import datetime as dtm

    import pyarrow.compute as pc

    cols = {}
    for name in tab.column_names:
        t = _field_type(name)
        if t == "float":
            cols[name] = pc.cast(tab[name], pa.float64(), safe=False)
        elif t == "int":
            cols[name] = pc.cast(
                pc.cast(tab[name], pa.string()), pa.int64(), safe=False) \
                if pa.types.is_string(tab[name].type) \
                else pc.cast(tab[name], pa.int64(), safe=False)
        elif t == "date":
            raw = _col_str(tab, name)
            vals = []
            for v in raw:
                v = str(v)
                vals.append(dtm.date(int(v[:4]), int(v[4:6]), int(v[6:8]))
                            if len(v) == 8 and v.isdigit() else None)
            cols[name] = pa.array(vals, pa.date32())
        elif t == "time":
            raw = _col_str(tab, name)
            vals = []
            for v in raw:
                parts = str(v).split(":")
                vals.append("%02d:%02d:%02d" % tuple(int(p) for p in parts)
                            if len(parts) == 3 else (str(v) or None))
            cols[name] = pa.array(vals, pa.string())
        else:
            cols[name] = pc.cast(tab[name], pa.string())
    return pa.table(cols)


def read_gtfs(path: str, layer: str,
              rows_per_block: int = 200_000) -> ray.data.Dataset:
    """One GTFS layer -> Dataset (WKB `geometry` where the layer
    carries one: stops/shapes points, trips/shapes_geom
    linestrings)."""
    members = _members(path)
    if layer == "shapes_geom":
        return _shapes_geom(members)
    fname = layer + ".txt"
    if fname not in members or not _parseable(members[fname]):
        raise ValueError(f"{path}: no GTFS layer {layer!r} "
                         f"(have {gtfs_layers(path)})")
    tab = _typed_columns(_read_csv(members[fname]))

    lat_col = lon_col = None
    if layer == "stops":
        lat_col, lon_col = "stop_lat", "stop_lon"
    elif layer == "shapes":
        lat_col, lon_col = "shape_pt_lat", "shape_pt_lon"
    if lat_col and lat_col in tab.column_names \
            and lon_col in tab.column_names:
        from ..geom.wkb import points_to_wkb

        def add_points(batch: pa.Table) -> pa.Table:
            lon = batch[lon_col].to_numpy(zero_copy_only=False)
            lat = batch[lat_col].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "geometry",
                pa.array(list(points_to_wkb(lon, lat)), pa.binary()))

        return (ray.data.from_arrow(tab)
                .map_batches(add_points, batch_format="pyarrow"))

    if layer == "trips" and "trip_id" in tab.column_names:
        return _trips_with_geometry(tab, members)

    return ray.data.from_arrow(tab)


def _trips_with_geometry(trips: pa.Table, members) -> ray.data.Dataset:
    """Trip LineStrings: stop_times(trip_id→ordered stop_ids) joined
    to stops lon/lat (PrepareTripsData analog). The two lookup
    tables broadcast once; trip rows fan out."""
    from ..geom.wkb import linestring_to_wkb

    stops = _read_csv(members["stops.txt"])
    st = _read_csv(members["stop_times.txt"])
    stop_lookup = dict(zip(
        _col_str(stops, "stop_id"),
        zip(np.asarray(stops["stop_lon"], float),
            np.asarray(stops["stop_lat"], float))))
    trip_ids = _col_str(st, "trip_id")
    stop_ids = _col_str(st, "stop_id")
    seqs = np.asarray(st["stop_sequence"]).astype(np.int64)
    order = np.lexsort((seqs, trip_ids))
    trip_map: Dict[str, List[str]] = {}
    for i in order:
        trip_map.setdefault(trip_ids[i], []).append(stop_ids[i])
    lookups = ray.put((stop_lookup, trip_map))

    def build(batch: pa.Table) -> pa.Table:
        s_lookup, t_map = ray.get(lookups)
        geoms = []
        for tid in batch["trip_id"].to_pylist():
            pts = [s_lookup[s] for s in t_map.get(str(tid), [])
                   if s in s_lookup]
            geoms.append(
                linestring_to_wkb(np.array(pts, float).reshape(-1, 2)))
        return batch.append_column("geometry",
                                   pa.array(geoms, pa.binary()))

    return (ray.data.from_arrow(trips)
            .map_batches(build, batch_format="pyarrow"))


def _shapes_geom(members) -> ray.data.Dataset:
    """One LineString per shape_id, vertices ordered by
    shape_pt_sequence (OGRGTFSShapesGeomLayer analog) — vectorized
    lexsort + split, one task per shape chunk."""
    from ..geom.wkb import linestring_to_wkb

    tab = _read_csv(members["shapes.txt"])
    sid = _col_str(tab, "shape_id")
    seq = np.asarray(tab["shape_pt_sequence"]).astype(np.int64)
    lon = np.asarray(tab["shape_pt_lon"], float)
    lat = np.asarray(tab["shape_pt_lat"], float)
    order = np.lexsort((seq, sid))
    sid, lon, lat = sid[order], lon[order], lat[order]
    cuts = np.nonzero(sid[1:] != sid[:-1])[0] + 1
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [len(sid)]])
    items = [{"s": int(s), "e": int(e), "shape_id": str(sid[s])}
             for s, e in zip(starts, ends)]
    coords_ref = ray.put((lon, lat))

    def build(batch: pa.Table) -> pa.Table:
        lo, la = ray.get(coords_ref)
        ids, geoms = [], []
        for row in batch.to_pylist():
            s, e = row["s"], row["e"]
            ids.append(row["shape_id"])
            geoms.append(linestring_to_wkb(
                np.stack([lo[s:e], la[s:e]], axis=1)))
        return pa.table({"shape_id": pa.array(ids),
                         "geometry": pa.array(geoms, pa.binary())})

    return (ray.data.from_items(items)
            .map_batches(build, batch_format="pyarrow"))
