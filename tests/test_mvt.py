"""Mapbox Vector Tile codec + Ray sink/source (ogr/ogrsf_frmts/mvt)."""
import json
import os

import numpy as np
import pytest

from lib_gdal_ray.codecs import protobuf as pb
from lib_gdal_ray.sources import mvt


def test_varint_roundtrip():
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        buf = pb.write_varint(n)
        v, pos = pb.read_varint(buf, 0)
        assert v == n and pos == len(buf)


def test_zigzag():
    for n in (0, -1, 1, -2, 2, 2**31, -2**31):
        assert pb.unzigzag(pb.zigzag(n)) == n


def test_negative_int64_varint():
    buf = pb.write_varint(-5)
    v, _ = pb.read_varint(buf, 0)
    assert v - (1 << 64) == -5
    assert len(buf) == 10  # protobuf negative int64 = 10 bytes


def test_point_feature_roundtrip():
    feats = [{"id": 7, "type": mvt.GEOM_POINT,
              "parts": [np.array([[100, 200], [150, 250]])],
              "properties": {"name": "a", "rank": 3, "score": 1.5,
                             "ok": True}}]
    buf = mvt.encode_mvt_tile({"pts": feats})
    back = mvt.decode_mvt_tile(buf)
    layer = back["pts"]
    assert layer["extent"] == 4096
    f = layer["features"][0]
    assert f["id"] == 7 and f["type"] == mvt.GEOM_POINT
    np.testing.assert_array_equal(f["parts"][0], [[100, 200], [150, 250]])
    assert f["properties"] == {"name": "a", "rank": 3, "score": 1.5,
                               "ok": True}


def test_linestring_and_polygon_roundtrip():
    line = {"type": mvt.GEOM_LINESTRING,
            "parts": [np.array([[0, 0], [10, 5], [20, 0]]),
                      np.array([[5, 5], [6, 6]])]}
    poly = {"type": mvt.GEOM_POLYGON,
            "parts": [np.array([[0, 0], [100, 0], [100, 100], [0, 100]]),
                      np.array([[20, 20], [20, 40], [40, 40], [40, 20]])]}
    buf = mvt.encode_mvt_tile({"l": [line], "p": [poly]})
    back = mvt.decode_mvt_tile(buf)
    lp = back["l"]["features"][0]["parts"]
    assert len(lp) == 2
    np.testing.assert_array_equal(lp[0], line["parts"][0])
    np.testing.assert_array_equal(lp[1], line["parts"][1])
    pp = back["p"]["features"][0]["parts"]
    assert len(pp) == 2
    np.testing.assert_array_equal(pp[0], poly["parts"][0])
    np.testing.assert_array_equal(pp[1], poly["parts"][1])


def test_value_dedup():
    feats = [{"type": 1, "parts": [np.array([[0, 0]])],
              "properties": {"k": "same"}} for _ in range(50)]
    buf = mvt.encode_mvt_tile({"d": feats})
    # 50 features sharing one key+value: the layer stores them once
    assert buf.count(b"same") == 1


def test_write_read_mvt_points(ray_session, tmp_path):
    import ray.data

    rng = np.random.default_rng(3)
    n = 500
    lon = rng.uniform(-170, 170, n)
    lat = rng.uniform(-80, 80, n)
    ds = ray.data.from_items([
        {"lon": float(lon[i]), "lat": float(lat[i]), "name": f"p{i}"}
        for i in range(n)])
    out = str(tmp_path / "tiles")
    manifest = mvt.write_mvt_points(ds, out, z=2, prop_cols=["name"])
    m = manifest.to_pandas()
    assert m["n_features"].sum() == n
    assert all(os.path.exists(p) for p in m["path"])
    back = mvt.read_mvt_features(out).to_pandas()
    assert len(back) == n
    assert set(back["layer"]) == {"points"}
    names = {json.loads(p)["name"] for p in back["properties"]}
    assert names == {f"p{i}" for i in range(n)}
    # tile assignment matches the shared web-mercator tiling math
    from lib_gdal_ray.geom.cells import lonlat_to_tile
    tx, ty = lonlat_to_tile(lon, lat, 2)
    import collections
    exp = collections.Counter(zip(tx.tolist(), ty.tolist()))
    got = collections.Counter(zip(back["tile_x"], back["tile_y"]))
    assert got == exp


def test_resume_skips_existing(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_items([{"lon": 10.0, "lat": 10.0}])
    out = str(tmp_path / "t2")
    m1 = mvt.write_mvt_points(ds, out, z=1).to_pandas()
    path = m1["path"][0]
    mtime = os.path.getmtime(path)
    m2 = mvt.write_mvt_points(ds, out, z=1, skip_existing=True).to_pandas()
    assert os.path.getmtime(path) == mtime  # not rewritten
    assert m2["n_features"].sum() == 1
