"""PGDump sink parity (sources/pgdump.py) vs the reference's
autotest/ogr/ogr_pgdump.py:83-199 expected SQL tokens."""

import struct

import numpy as np
import pyarrow as pa

from lib_gdal_ray.sources import pgdump as pgd

# the exact COPY-mode geometry hex the reference emits for poly.shp
# feature 0 with SRID=4326 (ogr_pgdump.py:197)
REF_HEX = (
    "0103000020E61000000100000014000000000000602F491D41000000207F2D5241"
    "000000C028471D41000000E0922D5241000000007C461D4100000060AE2D5241"
    "00000080C9471D4100000020B62D5241000000209C4C1D41000000E0D82D5241"
    "000000608D4C1D41000000A0DD2D5241000000207F4E1D41000000A0EA2D5241"
    "00000020294F1D4100000080CA2D524100000000B4511D41000000E0552D5241"
    "000000C016521D4100000080452D5241000000E0174E1D41000000202E2D5241"
    "00000020414D1D41000000E04C2D5241000000E04B4D1D41000000605E2D5241"
    "00000040634D1D41000000E0742D5241000000A0EF4C1D41000000E08D2D5241"
    "000000E04E4C1D41000000E0A12D5241000000E0B04B1D4100000060B82D5241"
    "00000080974A1D4100000080AE2D524100000080CF491D4100000080952D5241"
    "000000602F491D41000000207F2D5241")


def test_hex_ewkb_exact():
    """EWKB header transform is byte-exact: strip the reference hex's
    SRID word back to ISO WKB, re-encode, compare to the original."""
    ewkb = bytes.fromhex(REF_HEX)
    assert struct.unpack_from("<I", ewkb, 1)[0] == 0x20000003
    assert struct.unpack_from("<i", ewkb, 5)[0] == 4326
    iso = ewkb[:1] + struct.pack("<I", 3) + ewkb[9:]
    assert pgd.wkb_to_hex_ewkb(iso, 4326) == REF_HEX
    # srid=0 drops the SRID word entirely
    assert pgd.wkb_to_hex_ewkb(iso, 0) == iso.hex().upper()


def test_hex_ewkb_z_flag():
    """ISO 1003 (polygon Z) -> EWKB 0x80000003 (ogr_pgdump.py:103
    uses DIM=3 with SRID -1: hex starts 0103000080)."""
    iso_z = b"\x01" + struct.pack("<I", 1003) + struct.pack("<I", 0)
    out = pgd.wkb_to_hex_ewkb(iso_z, 0)
    assert out.startswith("0103000080")


def _poly_layer(ray_session):
    import ray

    from lib_gdal_ray.sources.shapefile import read_shapefile

    ds = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
    return ds.rename_columns({"AREA": "area", "EAS_ID": "eas_id",
                              "PRFEDEA": "prfedea"})


def test_copy_mode_tokens(ray_session, tmp_path):
    """ogr_pgdump.py:170-199 — COPY-mode script structure."""
    path = str(tmp_path / "tpoly.sql")
    n = pgd.write_pgdump(_poly_layer(ray_session), path, layer="tpoly",
                         srid=4326, geometry_type="POLYGON", dim=2)
    assert n == 10
    sql = open(path).read()
    pos = -1
    for tok in [
        'DROP TABLE IF EXISTS "public"."tpoly" CASCADE;',
        "DELETE FROM geometry_columns WHERE f_table_name = 'tpoly'"
        " AND f_table_schema = 'public';",
        "BEGIN;",
        'CREATE TABLE "public"."tpoly"();',
        'ALTER TABLE "public"."tpoly" ADD COLUMN "ogc_fid" SERIAL '
        'CONSTRAINT "tpoly_pk" PRIMARY KEY;',
        "SELECT AddGeometryColumn('public','tpoly','wkb_geometry',"
        "4326,'POLYGON',2);",
        'ALTER TABLE "public"."tpoly" ADD COLUMN "area" FLOAT8;',
        'COPY "public"."tpoly" ("wkb_geometry", "area", "eas_id", '
        '"prfedea") FROM STDIN;',
        "\t215229.266\t168\t35043411",
        "\\.",
        'CREATE INDEX "tpoly_wkb_geometry_geom_idx" ON '
        '"public"."tpoly" USING GIST ("wkb_geometry");',
        "COMMIT;",
    ]:
        nxt = sql.find(tok, pos + 1)
        assert nxt > pos, f"missing/misordered: {tok}"
        pos = nxt
    # every COPY line carries an SRID-flagged polygon hex
    lines = [ln for ln in sql.splitlines() if ln.startswith("0103000020")]
    assert len(lines) == 10


def test_insert_mode_and_escaping(ray_session, tmp_path):
    import ray

    tab = pa.table({
        "name": pa.array(["it's", "tab\there", None]),
        "k": pa.array([1, 2, 3], pa.int64()),
        "geometry": pa.array([None, None, None], pa.binary()),
    })
    path = str(tmp_path / "ins.sql")
    pgd.write_pgdump(ray.data.from_arrow(tab), path, layer="t",
                     srid=0, use_copy=False, create_gist=False)
    sql = open(path).read()
    assert "VALUES (NULL, 'it''s', 1);" in sql
    assert "NULL, 'tab\there', 2" in sql
    assert "NULL, NULL, 3" in sql

    path2 = str(tmp_path / "cp.sql")
    pgd.write_pgdump(ray.data.from_arrow(tab), path2, layer="t",
                     srid=0, use_copy=True, create_gist=False)
    cp = open(path2).read()
    assert "\\N\tit's\t1" in cp
    assert "\\N\ttab\\there\t2" in cp
    assert "\\N\t\\N\t3" in cp
