"""PMTiles v3 archive (ogr/ogrsf_frmts/pmtiles; public v3 spec)."""
import gzip
import os

import numpy as np
import pytest

from lib_gdal_ray.sources import mvt, pmtiles as pm


def test_tileid_roundtrip():
    for z, x, y in [(0, 0, 0), (1, 0, 0), (1, 1, 1), (5, 17, 9),
                    (12, 4000, 123), (15, 32767, 0)]:
        tid = pm.zxy_to_tileid(z, x, y)
        assert pm.tileid_to_zxy(tid) == (z, x, y)


def test_tileid_spec_anchors():
    # spec: z0 -> 0; z1 starts at 1; z2 starts at 5 (1+4)
    assert pm.zxy_to_tileid(0, 0, 0) == 0
    # the official pmtiles implementations' z1 ordering
    assert [pm.zxy_to_tileid(1, x, y)
            for (x, y) in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [1, 2, 3, 4]
    z2 = sorted(pm.zxy_to_tileid(2, x, y) for x in range(4)
                for y in range(4))
    assert z2 == list(range(5, 21))


def test_directory_roundtrip():
    entries = [(1, 0, 100, 1), (5, 100, 50, 1), (6, 150, 50, 1),
               (9, 200, 10, 1)]
    blob = pm._serialize_dir(entries)
    assert pm._parse_dir(blob) == entries
    # contiguity special case encodes offset 0
    assert pm._parse_dir(pm._serialize_dir(
        [(1, 0, 7, 1), (2, 7, 3, 1)])) == [(1, 0, 7, 1), (2, 7, 3, 1)]


def test_archive_roundtrip(ray_session, tmp_path):
    import ray.data

    rng = np.random.default_rng(9)
    n = 300
    ds = ray.data.from_items([
        {"lon": float(rng.uniform(-170, 170)),
         "lat": float(rng.uniform(-80, 80)), "name": f"p{i}"}
        for i in range(n)])
    tdir = str(tmp_path / "tiles")
    mvt.write_mvt_points(ds, tdir, z=3, prop_cols=["name"]).materialize()
    out = str(tmp_path / "a.pmtiles")
    stats = pm.write_pmtiles(tdir, out, metadata={"name": "test"})
    assert stats["n_tiles"] >= 1 and os.path.getsize(out) == stats["bytes"]
    idx = pm.read_pmtiles_index(out)
    assert len(idx) == stats["n_tiles"]
    back = pm.read_pmtiles_features(out).to_pandas()
    assert len(back) == n
    assert set(back["z"]) == {3}
    # identical tile membership as reading the loose .pbf tree
    loose = mvt.read_mvt_features(tdir).to_pandas()
    a = back.sort_values(["tile_x", "tile_y", "properties"]).reset_index(drop=True)
    b = loose.sort_values(["tile_x", "tile_y", "properties"]).reset_index(drop=True)
    assert a[["tile_x", "tile_y", "x", "y", "properties"]].equals(
        b[["tile_x", "tile_y", "x", "y", "properties"]])


def test_dedup_identical_tiles(tmp_path):
    # two tiles with identical bytes are stored once (n_contents)
    feats = [{"type": 1, "parts": [np.array([[5, 5]])],
              "properties": {}}]
    blob = mvt.encode_mvt_tile({"l": feats})
    for (z, x, y) in [(2, 0, 0), (2, 3, 3)]:
        d = tmp_path / "t" / str(z) / str(x)
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{y}.pbf").write_bytes(blob)
    stats = pm.write_pmtiles(str(tmp_path / "t"), str(tmp_path / "d.pmtiles"))
    assert stats["n_tiles"] == 2 and stats["n_contents"] == 1
    idx = pm.read_pmtiles_index(str(tmp_path / "d.pmtiles"))
    offs = {o for _t, o, _l in idx}
    assert len(offs) == 1


def test_leaf_directory_split(tmp_path, monkeypatch):
    # force a tiny root budget to exercise the leaf path
    monkeypatch.setattr(pm, "_MAX_ROOT_ENTRIES", 4)
    feats = [{"type": 1, "parts": [np.array([[1, 1]])], "properties": {}}]
    for i in range(10):
        d = tmp_path / "t" / "4" / str(i)
        d.mkdir(parents=True, exist_ok=True)
        (d / "0.pbf").write_bytes(
            mvt.encode_mvt_tile({"l": feats}, extent=256 + i))
    stats = pm.write_pmtiles(str(tmp_path / "t"), str(tmp_path / "s.pmtiles"))
    assert stats["n_tiles"] == 10
    idx = pm.read_pmtiles_index(str(tmp_path / "s.pmtiles"))
    assert len(idx) == 10
    zxys = sorted(pm.tileid_to_zxy(t) for t, _o, _l in idx)
    assert zxys == sorted((4, i, 0) for i in range(10))
