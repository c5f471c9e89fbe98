"""OpenFileGDB driver tests — pinned against the reference's own
testopenfilegdb.gdb fixture (the layer/value expectations hardcoded
in `autotest/ogr/ogr_openfilegdb.py`)."""

import os
import zipfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.sources import filegdb as fg

ZIP = "/root/reference/autotest/ogr/data/filegdb/testopenfilegdb.gdb.zip"


@pytest.fixture(scope="module")
def gdb(tmp_path_factory):
    d = tmp_path_factory.mktemp("fgdb")
    zipfile.ZipFile(ZIP).extractall(d)
    return str(d / "testopenfilegdb.gdb")


def _driver_read(path):
    meta = fg.parse_table_header(path)
    offs = fg.row_offsets(path)
    rows = np.flatnonzero(offs != 0)
    cols = fg.decode_rows(path, meta, rows, offs[rows])
    return fg._cols_to_table(meta, cols).to_pandas()


def test_catalog(gdb):
    layers = fg.list_layers(gdb)
    for expected in ["point", "linestring", "polygon", "multipolygon",
                     "point25D", "big_layer", "hole", "none",
                     "several_polygons", "GDB_SystemCatalog"]:
        assert expected in layers


def test_point_layer_values(gdb):
    df = _driver_read(fg.list_layers(gdb)["point"])
    assert len(df) == 5
    r = df.iloc[0]
    assert r["id"] == 1 and r["str"] == "foo_é"
    assert r["smallint"] == -13 and r["int"] == 123
    assert r["float"] == 1.5 and r["real"] == 4.56
    assert str(r["adate"]) == "2013-12-26 12:34:56"
    assert r["guid"] == "{12345678-9ABC-DEF0-1234-567890ABCDEF}"
    assert r["xml"] == "<foo></foo>"
    assert bytes(r["binary"]) == b"\x00\xFF\x7F"
    assert bytes(r["binary2"]) == b"\x12\x34\x56"
    assert np.isnan(r["nullint"])
    k, p = wkbm.parse_wkb(r["geometry"])
    assert k == "point" and np.allclose(p[0], [1, 2])
    # dtypes carried as declared
    assert df["smallint"].dtype == np.int16
    assert df["int"].dtype == np.int32
    assert df["float"].dtype == np.float32


def test_geometries(gdb):
    layers = fg.list_layers(gdb)

    k, p = wkbm.parse_wkb_z(
        _driver_read(layers["point25D"])["geometry"].iloc[0])
    assert k == "point" and np.allclose(p[0], [1, 2, 3])

    k, p = wkbm.parse_wkb(
        _driver_read(layers["multipoint"])["geometry"].iloc[0])
    assert k == "multipoint" and np.allclose(p, [[1, 2], [3, 4]])

    k, p = wkbm.parse_wkb(
        _driver_read(layers["linestring"])["geometry"].iloc[0])
    assert k == "multilinestring"
    assert np.allclose(p[0], [[1, 2], [3, 4]])

    k, p = wkbm.parse_wkb_z(
        _driver_read(layers["linestring25D"])["geometry"].iloc[0])
    assert np.allclose(p[0], [[1, 2, -10], [3, 4, -20]])

    k, p = wkbm.parse_wkb(
        _driver_read(layers["multilinestring_multipart"])
        ["geometry"].iloc[0])
    assert len(p) == 2 and np.allclose(p[1], [[5, 6], [7, 8]])

    k, p = wkbm.parse_wkb(
        _driver_read(layers["polygon"])["geometry"].iloc[0])
    assert k == "multipolygon" and len(p) == 1 and len(p[0]) == 1
    assert np.allclose(p[0][0], [[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]],
                       atol=1e-9)

    k, p = wkbm.parse_wkb(
        _driver_read(layers["multipolygon"])["geometry"].iloc[0])
    # outer+hole polygon, plus a second disjoint polygon
    assert len(p) == 2 and len(p[0]) == 2 and len(p[1]) == 1
    assert np.allclose(p[0][1][0], [0.25, 0.25])

    sev = _driver_read(layers["several_polygons"])
    assert len(sev) == 9
    k, p = wkbm.parse_wkb(sev["geometry"].iloc[8])
    assert np.allclose(np.asarray(p[0][0]).min(axis=0), [4, 4], atol=1e-9)


def test_big_layer_and_holes(gdb):
    layers = fg.list_layers(gdb)
    big = _driver_read(layers["big_layer"])
    assert len(big) == 341
    assert np.array_equal(big["real"].to_numpy(),
                          (np.arange(341) % 4).astype(float))
    hole = _driver_read(layers["hole"])
    assert 1 not in set(hole["fid"])       # deleted feature
    assert hole[hole["fid"] == 2]["str"].iloc[0] == "fid2"
    assert hole[hole["fid"] == 13]["str"].iloc[0] == "fid13"
    none = _driver_read(layers["none"])
    assert len(none) == 6
    assert np.isnan(none["id"].iloc[5])    # the empty feature


def test_ray_read_matches_driver(gdb):
    layers = fg.list_layers(gdb)
    ray_df = fg.read_gdbtable(layers["point"]).to_pandas() \
        .sort_values("fid").reset_index(drop=True)
    drv_df = _driver_read(layers["point"])
    assert ray_df["id"].tolist() == drv_df["id"].tolist()
    assert ray_df["guid"].tolist() == drv_df["guid"].tolist()
    df2 = fg.read_filegdb(gdb, "POINT").to_pandas()   # case-insensitive
    assert len(df2) == 5


def test_ray_split_ranges(gdb):
    layers = fg.list_layers(gdb)
    df = fg.read_gdbtable(layers["big_layer"],
                          rows_per_task=100).to_pandas()
    assert len(df) == 341
    assert sorted(df["fid"]) == list(range(1, 342))


def test_write_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    n = 1000
    x = np.round(rng.uniform(-179, 179, n), 6)
    y = np.round(rng.uniform(-85, 85, n), 6)
    geoms = [bytes(g) for g in wkbm.points_to_wkb(x, y)]
    geoms[7] = None
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array([f"n{i}" if i % 3 else None for i in range(n)]),
        "score": pa.array(np.round(rng.uniform(0, 1, n), 9)),
        "geometry": pa.array(geoms, pa.binary()),
    }))
    path = str(tmp_path / "a00000009.gdbtable")
    count = fg.write_point_gdbtable(ds, path)
    assert count == n
    back = fg.read_gdbtable(path).to_pandas().sort_values("id")
    assert len(back) == n
    assert back["name"].iloc[0] is None or back["name"].isna().iloc[0]
    assert back["name"].iloc[1] == "n1"
    assert np.array_equal(back["score"].to_numpy(),
                          ds.to_pandas()["score"].to_numpy())
    got = back["geometry"].tolist()
    assert got[7] is None
    gx = np.array([wkbm.parse_wkb(g)[1][0][0]
                   for i, g in enumerate(got) if i != 7])
    keep = np.delete(x, 7)
    assert np.allclose(gx, keep, atol=1e-9)  # 1e-9-degree grid


def test_svarint_vectorized():
    # round-trip against a scalar encoder of the FileGDB signed form
    rng = np.random.default_rng(9)
    vals = rng.integers(-(1 << 40), 1 << 40, 500)
    enc = bytearray()
    for v in vals:
        mag = abs(int(v))
        b0 = (mag & 0x3F) | (0x40 if v < 0 else 0)
        mag >>= 6
        if mag:
            enc.append(b0 | 0x80)
            while True:
                b = mag & 0x7F
                mag >>= 7
                if mag:
                    enc.append(b | 0x80)
                else:
                    enc.append(b)
                    break
        else:
            enc.append(b0)
    dec, pos = fg.decode_fgdb_svarints(bytes(enc), 0, 500)
    # decoder returns deltas (pre-cumsum); compare raw values
    assert np.array_equal(dec, vals)
    assert pos == len(enc)
