"""SpatiaLite driver parity (sources/spatialite.py) vs the
reference's own fixtures (autotest/ogr/data/sqlite/): GAIA blob codec
incl. the compressed float32-delta family
(ogrsqlitelayer.cpp:1403-1470), rowid-split parallel read, and the
partitioned write + merge path."""

import os
import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.sources import spatialite as sl

FIX = "/root/reference/autotest/ogr/data/sqlite"

# poly.shp golden attributes (autotest reuses these across drivers)
EAS_IDS = [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]


def _fixture_blobs(path):
    con = sqlite3.connect(path)
    try:
        return con.execute(
            "SELECT GEOMETRY, area, eas_id, prfedea FROM poly").fetchall()
    finally:
        con.close()


@pytest.mark.parametrize("fname,compressed", [
    ("poly_spatialite.sqlite", True),     # class 1000003 (compressed)
    ("poly_spatialite4.sqlite", False),   # class 3 (v4, uncompressed)
])
def test_gaia_decode_fixture(fname, compressed):
    rows = _fixture_blobs(os.path.join(FIX, fname))
    assert len(rows) == 10
    cls = struct.unpack_from("<i", rows[0][0], 39)[0]
    assert (cls >= 1000000) == compressed
    for blob, area, _eas, _prf in rows:
        kind, rings = wkbm.parse_wkb(sl.gaia_to_wkb(blob))
        assert kind == "polygon"
        r = rings[0]
        shoelace = 0.5 * abs(np.sum(r[:-1, 0] * r[1:, 1]
                                    - r[1:, 0] * r[:-1, 1]))
        # stored `area` attr is the authoritative value
        assert shoelace == pytest.approx(area, rel=2e-4)


def test_gaia_roundtrip_exact():
    """wkb -> gaia -> wkb is byte-identical; the gaia re-encode of a
    decompressed fixture geometry decodes back to the same coords."""
    rows = _fixture_blobs(os.path.join(FIX, "poly_spatialite.sqlite"))
    for blob, *_ in rows:
        w = sl.gaia_to_wkb(blob)
        g = sl.wkb_to_gaia(w, sl.gaia_srid(blob))
        assert sl.gaia_to_wkb(g) == w
        assert sl.gaia_srid(g) == 32631
        # MBR in the re-encoded header matches the coords
        xs = np.vstack(wkbm.parse_wkb(w)[1])
        mbr = struct.unpack_from("<4d", g, 6)
        assert mbr == (xs[:, 0].min(), xs[:, 1].min(),
                       xs[:, 0].max(), xs[:, 1].max())


def test_gaia_multis_and_collections():
    mp = wkbm.multipoint_to_wkb(np.array([[0.0, 1.0], [2.0, 3.0]]))
    ml = wkbm.multilinestring_to_wkb(
        [np.array([[0.0, 0.0], [1.0, 1.0]]),
         np.array([[2.0, 2.0], [3.0, 3.0], [4.0, 4.0]])])
    mpoly = wkbm.multipolygon_to_wkb(
        [[np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float)],
         [np.array([[5, 5], [6, 5], [6, 6], [5, 5]], float)]])
    gc = wkbm.geometrycollection_to_wkb(
        [wkbm.points_to_wkb(np.array([9.0]), np.array([9.0]))[0],
         wkbm.linestring_to_wkb(np.array([[0.0, 0.0], [1.0, 2.0]]))])
    for w in (mp, ml, mpoly, gc):
        g = sl.wkb_to_gaia(w, 4326)
        assert g[0] == 0 and g[38] == 0x7C and g[-1] == 0xFE
        assert sl.gaia_to_wkb(g) == w


def test_gaia_point_z():
    w = wkbm.point_z_to_wkb(1.5, 2.5, 3.5)
    g = sl.wkb_to_gaia(w, 4326)
    assert struct.unpack_from("<i", g, 39)[0] == 1001
    assert sl.gaia_to_wkb(g) == w


def test_read_fixture_parallel(ray_session):
    ds = sl.read_spatialite(
        os.path.join(FIX, "poly_spatialite.sqlite"), rows_per_task=3)
    df = ds.to_pandas()
    assert len(df) == 10
    assert sorted(df["eas_id"].astype(int)) == sorted(EAS_IDS)
    assert df["geometry"].map(
        lambda b: wkbm.parse_wkb(b)[0]).eq("polygon").all()


def test_read_vector_dispatch(ray_session):
    from lib_gdal_ray.sources.vrt_vector import read_vector

    df = read_vector(
        os.path.join(FIX, "poly_spatialite4.sqlite")).to_pandas()
    assert len(df) == 10 and "geometry" in df.columns


def test_write_read_roundtrip(ray_session, tmp_path):
    import ray

    n = 57
    x = np.linspace(-10.0, 10.0, n)
    tab = pa.table({
        "pid": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array([f"f{i}" for i in range(n)]),
        "val": pa.array(np.sqrt(np.arange(n, dtype=np.float64))),
        "geometry": pa.array(
            [bytes(g) for g in wkbm.points_to_wkb(x, x * 0.25)],
            pa.binary()),
    })
    ds = ray.data.from_arrow(tab).repartition(4)
    out_dir = str(tmp_path / "shards")
    sl.write_spatialite(ds, out_dir, layer="pts", geometry_type="POINT")
    shards = [f for f in os.listdir(out_dir) if f.endswith(".sqlite")]
    assert len(shards) >= 2  # partitioned layout

    back = sl.read_spatialite(out_dir).to_pandas()
    assert len(back) == n
    back = back.sort_values("pid").reset_index(drop=True)
    lon, lat = wkbm.wkb_to_points(
        np.asarray(back["geometry"].to_list(), dtype=object))
    np.testing.assert_allclose(np.sort(lon), x, atol=0)
    np.testing.assert_allclose(lat, lon * 0.25, atol=0)
    assert back["val"].tolist() == pytest.approx(
        np.sqrt(np.arange(n)).tolist())

    # merge to one deliverable file; registry tables spec-shaped
    merged = str(tmp_path / "one.sqlite")
    total = sl.merge_spatialite_dir(out_dir, merged, layer="pts")
    assert total == n
    con = sqlite3.connect(merged)
    gc = con.execute("SELECT * FROM geometry_columns").fetchall()
    assert gc == [("pts", "GEOMETRY", "POINT", "XY", 4326, 0)]
    assert con.execute("SELECT count(*) FROM pts").fetchone()[0] == n
    con.close()
    again = sl.read_spatialite(merged, rows_per_task=20).to_pandas()
    assert len(again) == n
