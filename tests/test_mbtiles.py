"""MBTiles sqlite tile archives (frmts/mbtiles/mbtilesdataset.cpp)."""
import os
import sqlite3

import numpy as np
import pytest

from lib_gdal_ray.sources import mbtiles as mb
from lib_gdal_ray.sources import mvt


def _tile_tree(tmp_path, n=300, z=3):
    import ray.data

    rng = np.random.default_rng(2)
    ds = ray.data.from_items([
        {"lon": float(rng.uniform(-170, 170)),
         "lat": float(rng.uniform(-80, 80)), "name": f"p{i}"}
        for i in range(n)])
    tdir = str(tmp_path / "tiles")
    mvt.write_mvt_points(ds, tdir, z=z, prop_cols=["name"]).materialize()
    return tdir


def test_write_read_roundtrip(ray_session, tmp_path):
    tdir = _tile_tree(tmp_path)
    out = str(tmp_path / "a.mbtiles")
    n_tiles = mb.write_mbtiles(tdir, out, metadata={"name": "t"})
    assert n_tiles >= 1
    md = mb.read_mbtiles_meta(out)
    assert md["format"] == "pbf" and md["name"] == "t"
    assert md["minzoom"] == "3" and md["maxzoom"] == "3"
    tiles = mb.read_mbtiles_tiles(out).to_pandas()
    assert len(tiles) == n_tiles
    feats = mb.read_mbtiles_features(out).to_pandas()
    assert len(feats) == 300
    # identical membership vs reading the loose tree
    loose = mvt.read_mvt_features(tdir).to_pandas()
    a = feats.sort_values(["tile_x", "tile_y", "properties"]).reset_index(drop=True)
    b = loose.sort_values(["tile_x", "tile_y", "properties"]).reset_index(drop=True)
    assert a[["tile_x", "tile_y", "x", "y"]].equals(
        b[["tile_x", "tile_y", "x", "y"]])


def test_tms_row_flip(ray_session, tmp_path):
    """tile_row is TMS (flipped) in the sqlite table but XYZ in the
    Dataset — the mbtilesdataset.cpp convention."""
    tdir = _tile_tree(tmp_path, n=50, z=2)
    out = str(tmp_path / "f.mbtiles")
    mb.write_mbtiles(tdir, out)
    con = sqlite3.connect(out)
    rows = con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles").fetchall()
    con.close()
    stored = {(z, x, (1 << z) - 1 - ty) for z, x, ty in rows}
    got = mb.read_mbtiles_tiles(out).to_pandas()
    assert {(z, x, y) for z, x, y in
            zip(got["z"], got["tile_x"], got["tile_y"])} == stored


def test_zoom_filter_and_empty(ray_session, tmp_path):
    tdir = _tile_tree(tmp_path, n=40, z=1)
    out = str(tmp_path / "z.mbtiles")
    mb.write_mbtiles(tdir, out)
    assert len(mb.read_mbtiles_tiles(out, zoom=1).to_pandas()) >= 1
    assert len(mb.read_mbtiles_tiles(out, zoom=9).to_pandas()) == 0
