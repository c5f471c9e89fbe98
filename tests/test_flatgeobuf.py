"""FlatGeobuf: flatbuffer codec, packed Hilbert R-tree, Ray read/write."""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.geom import wkb as W
from lib_gdal_ray.sources import flatgeobuf as FG


def test_feature_codec_all_kinds():
    cols = [("id", FG.CT_LONG), ("name", FG.CT_STRING),
            ("v", FG.CT_DOUBLE), ("ok", FG.CT_BOOL),
            ("small", FG.CT_INT)]
    geoms = [
        W.points_to_wkb(np.array([1.5]), np.array([-2.5]))[0],
        W.linestring_to_wkb(np.array([[0., 0.], [1., 1.], [2., 0.]])),
        W.polygon_to_wkb([
            np.array([[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]]),
            np.array([[1., 1.], [2., 1.], [2., 2.], [1., 2.], [1., 1.]])]),
        W.multipolygon_to_wkb(
            [[np.array([[0., 0.], [1., 0.], [1., 1.], [0., 0.]])],
             [np.array([[5., 5.], [6., 5.], [6., 6.], [5., 5.]])]]),
        W.multilinestring_to_wkb([np.array([[0., 0.], [1., 1.]]),
                                  np.array([[2., 2.], [3., 3.]])]),
        W.multipoint_to_wkb(np.array([[0., 1.], [2., 3.]])),
    ]
    for i, g in enumerate(geoms):
        props = {"id": i, "name": f"row{i}", "v": i * 1.5,
                 "ok": i % 2 == 0, "small": -i}
        buf = FG.encode_feature(g, props, cols)
        g2, p2 = FG.decode_feature(buf, cols)
        assert W.parse_wkb(g)[0] == W.parse_wkb(g2)[0]
        assert p2 == props
        b1 = W.wkb_bbox([g])[0]
        b2 = W.wkb_bbox([g2])[0]
        np.testing.assert_array_equal(b1, b2)


def test_null_properties():
    cols = [("a", FG.CT_LONG), ("b", FG.CT_STRING)]
    g = W.points_to_wkb(np.array([0.0]), np.array([0.0]))[0]
    buf = FG.encode_feature(g, {"a": None, "b": "x"}, cols)
    _g2, p = FG.decode_feature(buf, cols)
    assert p == {"b": "x"}  # null column simply absent


def test_hilbert_matches_reference_values():
    # packedrtree.cpp hilbert(x, y) spot values (computed from the
    # public flatbush algorithm): order-preserving bit interleave
    h = FG.hilbert_u32(np.array([0, 1, 0xFFFF]),
                       np.array([0, 1, 0xFFFF]))
    assert h[0] == 0
    # distinct centers must produce distinct keys on a diagonal sweep
    xs = np.arange(0, 0xFFFF, 257, dtype=np.uint32)
    hv = FG.hilbert_u32(xs, xs[::-1].copy())
    assert len(np.unique(hv)) == len(xs)


def test_packed_rtree_level_math():
    bounds, num = FG._level_bounds(179, 16)
    # 179 leaves -> 12 parents -> 1 root = 192 nodes; root stored first
    assert num == 179 + 12 + 1
    assert bounds[-1] == (0, 1)
    assert bounds[0] == (13, 13 + 179)
    idx = FG._build_index(
        np.array([[0., 0., 1., 1.]] * 179),
        np.arange(179, dtype=np.uint64) * np.uint64(100))
    assert len(idx) == num * FG.NODE_SIZE_BYTES
    # root bbox covers everything
    xmin, ymin, xmax, ymax, off = struct.unpack_from("<4dQ", idx, 0)
    assert (xmin, ymin, xmax, ymax) == (0., 0., 1., 1.)


def _points_ds(n=2000, seed=5):
    rng = np.random.default_rng(seed)
    x, y = rng.uniform(-170, 170, n), rng.uniform(-80, 80, n)
    geoms = W.points_to_wkb(x, y)
    tbl = pa.table({
        "geometry": pa.array(list(geoms), type=pa.binary()),
        "id": pa.array(np.arange(n)),
        "val": pa.array(rng.normal(size=n)),
        "tag": pa.array([f"t{i % 7}" for i in range(n)])})
    return ray.data.from_arrow(tbl).repartition(6), tbl


def test_roundtrip_with_index(ray_session, tmp_path):
    ds, tbl = _points_ds()
    path = str(tmp_path / "p.fgb")
    n = FG.write_flatgeobuf(ds, path, hilbert_sort=True, index=True)
    assert n == 2000
    hdr, _ = FG.read_header(path)
    assert hdr["features_count"] == 2000
    assert hdr["index_node_size"] == FG.DEFAULT_NODE_SIZE

    out = FG.read_flatgeobuf(path).to_pandas().sort_values(
        "id").reset_index(drop=True)
    assert len(out) == 2000
    ids = out["id"].to_numpy()
    np.testing.assert_array_equal(ids, np.arange(2000))
    np.testing.assert_array_equal(out["val"].to_numpy(),
                                  tbl["val"].to_numpy())
    assert (out["tag"].to_numpy()
            == np.array([f"t{i % 7}" for i in range(2000)])).all()
    # hilbert order = neighboring features adjacent in the file:
    # parallel read split bboxes should be localized, spot-check leaves
    offs, fstart = FG._read_leaf_offsets(path, hdr, FG.read_header(
        path)[1])
    assert (np.diff(offs) > 0).all()  # offsets strictly increasing


def test_roundtrip_no_index(ray_session, tmp_path):
    ds, _tbl = _points_ds(300, seed=9)
    path = str(tmp_path / "ni.fgb")
    FG.write_flatgeobuf(ds, path, hilbert_sort=False, index=False)
    hdr, _ = FG.read_header(path)
    assert hdr["index_node_size"] == 0
    out = FG.read_flatgeobuf(path).to_pandas()
    assert sorted(out["id"]) == list(range(300))


def test_roundtrip_polygons(ray_session, tmp_path):
    polys = [W.polygon_to_wkb([np.array(
        [[i, 0.], [i + 1, 0.], [i + 1, 1.], [i, 1.], [i, 0.]])])
        for i in range(50)]
    tbl = pa.table({"geometry": pa.array(polys, type=pa.binary()),
                    "pid": pa.array(np.arange(50))})
    path = str(tmp_path / "poly.fgb")
    FG.write_flatgeobuf(ray.data.from_arrow(tbl), path)
    out = FG.read_flatgeobuf(path).to_pandas().sort_values(
        "pid").reset_index(drop=True)
    from lib_gdal_ray.stages.geom_ops import wkb_centroid_area

    areas = [wkb_centroid_area(g)[2] for g in out["geometry"]]
    assert areas == [1.0] * 50
