"""MapInfo MIF/MID driver tests — pinned against the reference's own
golden oracle `autotest/ogr/data/mitab/all_geoms.mif.golden.csv`
(exact WKT, including GDAL's curve linearization) and the
all_possible_fields typed-column fixture."""

import csv

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.geom import wkt as wktm
from lib_gdal_ray.sources import mitab

REF = "/root/reference/autotest/ogr/data/mitab"


def _flat(kind, payload):
    """(kind, payload) -> flattened coordinate array for comparison."""
    if kind == "point":
        return np.asarray(payload).reshape(-1, 2)
    if kind in ("linestring", "multipoint"):
        return np.asarray(payload).reshape(-1, 2)
    if kind == "multilinestring":
        return np.concatenate([np.asarray(s) for s in payload])
    if kind == "polygon":
        return np.concatenate([np.asarray(r) for r in payload])
    if kind == "multipolygon":
        return np.concatenate(
            [np.asarray(r) for poly in payload for r in poly])
    if kind == "geometrycollection":
        return np.concatenate([_flat(k, p) for k, p in payload])
    raise AssertionError(kind)


def test_all_geoms_golden():
    """Every feature of all_geoms.mif matches the golden WKT
    bit-for-bit in structure and to 1e-9 in coordinates — including
    the 180-points-per-circle ellipse, the 45-per-quarter RoundRect
    corners, the 2-degree Arc steps and the duplicated arc end
    points."""
    golden = list(csv.DictReader(open(f"{REF}/all_geoms.mif.golden.csv")))
    df = mitab.read_mif(f"{REF}/all_geoms.mif").to_pandas()
    df = df.sort_values("fid").reset_index(drop=True)
    assert len(df) == len(golden) == 16
    for i, row in enumerate(golden):
        exp_kind, exp_pay = wkbm.parse_wkb(wktm.wkt_to_wkb(row["WKT"]))
        got_kind, got_pay = wkbm.parse_wkb(df["geometry"].iloc[i])
        assert got_kind == exp_kind, f"feature {i}"
        e, g = _flat(exp_kind, exp_pay), _flat(got_kind, got_pay)
        assert e.shape == g.shape, (
            f"feature {i} ({exp_kind}): {e.shape} vs {g.shape}")
        assert np.allclose(e, g, atol=1e-9), f"feature {i}"


def test_all_possible_fields():
    df = mitab.read_mif(f"{REF}/all_possible_fields.mif").to_pandas()
    assert len(df) == 2
    assert df["field1"].tolist() == ["test", "test"]
    assert df["Field2"].tolist() == [120, 120]
    assert df["Field3"].tolist() == [12345, 12345]
    assert df["Field4"].tolist() == [123456789012345] * 2
    assert df["Field5"].tolist() == [12.34, 12.34]
    assert df["Field10"].tolist() == [True, False]
    assert df["geometry"].isna().all()
    # dtypes carried as declared
    tab = ray.data.from_pandas(df)  # no-op, just dtype sanity via arrow
    assert df["Field2"].dtype == np.int32
    assert df["Field4"].dtype == np.int64


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n = 200
    x = np.round(rng.uniform(-180, 180, n), 6)
    y = np.round(rng.uniform(-85, 85, n), 6)
    geoms = [bytes(g) for g in wkbm.points_to_wkb(x, y)]
    geoms[0] = wkbm.linestring_to_wkb([(0, 0), (1, 1), (2, 0)])
    geoms[1] = wkbm.polygon_to_wkb(
        [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])])
    ds = ray.data.from_arrow(pa.table({
        "name": pa.array([f"f{i}" for i in range(n)]),
        "val": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array(np.round(rng.uniform(0, 1, n), 6)),
        "flag": pa.array((np.arange(n) % 2 == 0)),
        "geometry": pa.array(geoms, pa.binary()),
    }))
    path = str(tmp_path / "rt.mif")
    count = mitab.write_mif(ds, path)
    assert count == n
    back = mitab.read_mif(path).to_pandas().sort_values("val")
    assert len(back) == n
    assert back["name"].tolist() == [f"f{i}" for i in range(n)]
    assert back["flag"].tolist() == [(i % 2 == 0) for i in range(n)]
    assert np.allclose(back["score"].to_numpy(),
                       np.sort(ds.to_pandas()["val"]) * 0 +
                       ds.to_pandas()["score"].to_numpy())
    k, pay = wkbm.parse_wkb(back["geometry"].iloc[0])
    assert k == "linestring" and np.allclose(
        pay, [[0, 0], [1, 1], [2, 0]])
    k, pay = wkbm.parse_wkb(back["geometry"].iloc[1])
    assert k == "polygon"
    # points recovered exactly (repr round-trip)
    pts = back.iloc[2:]
    gx = np.array([wkbm.parse_wkb(g)[1][0][0] for g in pts["geometry"]])
    gy = np.array([wkbm.parse_wkb(g)[1][0][1] for g in pts["geometry"]])
    assert np.array_equal(gx, x[2:])
    assert np.array_equal(gy, y[2:])


def test_region_with_hole_roundtrip(tmp_path):
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                     float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    ds = ray.data.from_arrow(pa.table({
        "geometry": pa.array([wkbm.polygon_to_wkb([outer, hole])],
                             pa.binary())}))
    path = str(tmp_path / "hole.mif")
    mitab.write_mif(ds, path)
    back = mitab.read_mif(path).to_pandas()
    k, rings = wkbm.parse_wkb(back["geometry"].iloc[0])
    assert k == "polygon" and len(rings) == 2
    assert np.allclose(rings[0], outer)
    assert np.allclose(rings[1], hole)


def test_multi_outer_region():
    """Two disjoint rings in one Region -> MULTIPOLYGON."""
    mif = """Version 300
Charset "Neutral"
Delimiter ","
Columns 0
Data

Region 2
  4
  0 0
  1 0
  1 1
  0 0
  4
  5 5
  6 5
  6 6
  5 5
"""
    import tempfile, os
    d = tempfile.mkdtemp()
    p = os.path.join(d, "two.mif")
    open(p, "w").write(mif)
    df = mitab.read_mif(p).to_pandas()
    k, polys = wkbm.parse_wkb(df["geometry"].iloc[0])
    assert k == "multipolygon" and len(polys) == 2
