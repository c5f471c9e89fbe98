"""PostgreSQL dump (PGDump) vector sink.

The reference's PGDump driver (ogr/ogrsf_frmts/pgdump) writes a SQL
script restorable with psql: DROP/CREATE TABLE + AddGeometryColumn
preamble, then either COPY ... FROM STDIN blocks (PG_USE_COPY, the
fast path) or one INSERT per feature, with geometries as hex EWKB
(SRID flag 0x20000000, Z flag 0x80000000).  Layout pinned against
autotest/ogr/ogr_pgdump.py:83-199 token-for-token.

Ray-Data shape: feature rendering (hex EWKB + COPY escaping) is the
hot cost and runs fragment-parallel in map_batches; the driver
stitches preamble + rendered blocks + epilogue into the one .sql
deliverable (inherently a single ordered text file).
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional

import numpy as np
import pyarrow as pa
import ray.data

_EWKB_SRID = 0x20000000
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000


def wkb_to_hex_ewkb(wkb: Optional[bytes], srid: int) -> Optional[str]:
    """ISO WKB -> uppercase hex EWKB with an SRID word (the PG wire
    form the reference emits, ogrpgdumplayer.cpp GeometryToHex)."""
    if wkb is None:
        return None
    fmt = "<" if wkb[0] == 1 else ">"
    (raw,) = struct.unpack_from(fmt + "I", wkb, 1)
    base = raw & 0x0FFFFFFF
    flags = raw & 0xF0000000
    iso = base // 1000
    base = base % 1000
    if iso in (1, 3):
        flags |= _EWKB_Z
    if iso in (2, 3):
        flags |= _EWKB_M
    if srid > 0:
        flags |= _EWKB_SRID
    head = wkb[:1] + struct.pack(fmt + "I", base | flags)
    if srid > 0:
        head += struct.pack(fmt + "I", srid)
    return (head + wkb[5:]).hex().upper()


def _ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _lit(name: str) -> str:
    return name.replace("'", "''")


_PG_TYPE = [
    (pa.types.is_boolean, "BOOLEAN"),
    (lambda t: pa.types.is_integer(t) and t.bit_width <= 32, "INTEGER"),
    (pa.types.is_integer, "INT8"),
    (lambda t: pa.types.is_floating(t) and t.bit_width <= 32, "FLOAT4"),
    (pa.types.is_floating, "FLOAT8"),
    (pa.types.is_string, "VARCHAR"),
    (pa.types.is_binary, "BYTEA"),
    (pa.types.is_timestamp, "timestamp with time zone"),
    (pa.types.is_date, "date"),
]


def _pg_type(t: pa.DataType) -> str:
    for pred, name in _PG_TYPE:
        if pred(t):
            return name
    return "VARCHAR"


def _copy_escape(v) -> str:
    if v is None or (isinstance(v, float) and v != v):
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, bytes):
        return "\\\\x" + v.hex()
    if isinstance(v, float):
        return repr(v)
    s = str(v)
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


def _insert_literal(v) -> str:
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, bytes):
        return "'\\x" + v.hex() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def write_pgdump(ds: ray.data.Dataset, path: str, layer: str = "layer",
                 geometry_col: str = "geometry", srid: int = 4326,
                 schema: str = "public", geometry_type: str = "GEOMETRY",
                 dim: int = 2, use_copy: bool = True,
                 geometry_name: str = "wkb_geometry",
                 create_gist: bool = True) -> int:
    """Dataset -> one psql-restorable .sql file. Rendering is
    fragment-parallel; the stitch is a driver-side ordered concat.
    Returns rows written."""
    dsch = ds.schema()  # ray.data Schema: parallel .names/.types
    names = list(dsch.names)
    type_of = dict(zip(dsch.names, dsch.types))
    attr_cols = [c for c in names if c != geometry_col]
    has_geom = geometry_col in names
    types = {c: _pg_type(type_of[c]) for c in attr_cols}

    tq = f"{_ident(schema)}.{_ident(layer)}"
    out_cols = ([geometry_name] if has_geom else []) + attr_cols
    col_list = ", ".join(_ident(c) for c in out_cols)

    def render(batch: pa.Table) -> pa.Table:
        data = []
        if has_geom:
            data.append([wkb_to_hex_ewkb(g, srid)
                         for g in batch[geometry_col].to_pylist()])
        for c in attr_cols:
            data.append(batch[c].to_pylist())
        lines = []
        if use_copy:
            for row in zip(*data) if data else []:
                cells = []
                for i, v in enumerate(row):
                    if i == 0 and has_geom:
                        cells.append("\\N" if v is None else v)
                    else:
                        cells.append(_copy_escape(v))
                lines.append("\t".join(cells))
        else:
            for row in zip(*data) if data else []:
                vals = []
                for i, v in enumerate(row):
                    if i == 0 and has_geom:
                        vals.append("NULL" if v is None else f"'{v}'")
                    else:
                        vals.append(_insert_literal(v))
                lines.append(f"INSERT INTO {tq} ({col_list}) "
                             f"VALUES ({', '.join(vals)});")
        return pa.table({"txt": pa.array(["\n".join(lines)]),
                         "n": pa.array([batch.num_rows], pa.int64())})

    rendered = ds.map_batches(render, batch_format="pyarrow").take_all()
    total = int(sum(r["n"] for r in rendered))

    pre = [
        "SET standard_conforming_strings = OFF;",
        f"DROP TABLE IF EXISTS {tq} CASCADE;",
        f"DELETE FROM geometry_columns WHERE f_table_name = '{_lit(layer)}'"
        f" AND f_table_schema = '{_lit(schema)}';",
        "BEGIN;",
        f"CREATE TABLE {tq}();",
        f"ALTER TABLE {tq} ADD COLUMN \"ogc_fid\" SERIAL "
        f"CONSTRAINT {_ident(layer + '_pk')} PRIMARY KEY;",
    ]
    if has_geom:
        pre.append(
            f"SELECT AddGeometryColumn('{_lit(schema)}','{_lit(layer)}',"
            f"'{_lit(geometry_name)}',{srid},'{geometry_type}',{dim});")
    for c in attr_cols:
        pre.append(f"ALTER TABLE {tq} ADD COLUMN {_ident(c)} {types[c]};")

    body: List[str] = []
    if use_copy:
        body.append(f"COPY {tq} ({col_list}) FROM STDIN;")
        body.extend(r["txt"] for r in rendered if r["txt"])
        body.append("\\.")
    else:
        body.extend(r["txt"] for r in rendered if r["txt"])

    post = []
    if has_geom and create_gist:
        post.append(
            f"CREATE INDEX {_ident(layer + '_' + geometry_name + '_geom_idx')}"
            f" ON {tq} USING GIST ({_ident(geometry_name)});")
    post.append("COMMIT;")

    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(pre + body + post) + "\n")
    os.replace(tmp, path)
    return total
