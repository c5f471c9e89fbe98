"""GPKG raster tile pyramids (sources/gpkg_tiles.py).

Parity: reference GPKG raster side (`ogr/ogrsf_frmts/gpkg/`
gdalgeopackagerasterband.cpp) on the autotest fixture
`autotest/gdrivers/data/gpkg/byte.gpkg` — band-1 checksum 4672
(autotest/gdrivers/gpkg.py:2830) — plus write→read roundtrips on our
own WebMercatorQuad pyramids.
"""

import os
import sqlite3

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lib_gdal_ray.pipelines.rasterize import (gdal_checksum, pack_pixel,
                                              unpack_pixel)
from lib_gdal_ray.sources import gpkg_tiles as gt

REF = "/root/reference/autotest/gdrivers/data/gpkg/byte.gpkg"


class TestByteFixture:
    def test_info(self):
        info = gt.gpkg_raster_info(REF)
        assert info["table"] == "byte"
        assert info["srs_id"] == 26711
        assert info["contents"] == (440720.0, 3750120.0,
                                    441920.0, 3751320.0)
        assert info["zooms"][0]["px_x"] == 60.0

    def test_dense_read_checksum_4672(self):
        arr, meta = gt.read_gpkg_raster(REF)
        assert arr.shape == (20, 20)
        assert meta["transform"][0] == 440720.0
        assert meta["transform"][1] == 60.0
        assert meta["epsg"] == 26711
        assert gdal_checksum(arr.astype(np.float64)) == 4672

    def test_pixel_read_checksum_4672(self):
        px = gt.read_gpkg_raster_pixels(REF, drop_zero=False).to_pandas()
        # byte.tif has no zero pixels, so drop_zero=True is identical
        z, gx, gy = unpack_pixel(px.pix_id.values.astype(np.uint64))
        assert (z == 0).all()
        dense = np.zeros((20, 20))
        dense[gy, gx] = px.burn.values
        assert gdal_checksum(dense) == 4672
        px2 = gt.read_gpkg_raster_pixels(REF).to_pandas()
        assert len(px2) == (px.burn.values != 0).sum()


def _pyramid_pixels(z):
    """Deterministic sparse pixels across 4 tiles at zoom z."""
    rng = np.random.default_rng(7)
    n = 2000
    gx = rng.integers(0, 2 * 256, n)
    gy = rng.integers(0, 2 * 256, n)
    v = rng.integers(1, 200, n).astype(np.float64)
    # dedup pixel ids, keep first
    pix = pack_pixel(z, gx, gy)
    _, idx = np.unique(pix, return_index=True)
    return pa.table({"pix_id": pa.array(pix[idx]),
                     "burn": pa.array(v[idx])})


class TestRoundtrip:
    def test_write_read_exact(self, tmp_path):
        z = 4
        tbl = _pyramid_pixels(z)
        tiles = gt.render_tile_blobs(rd.from_arrow(tbl).repartition(4))
        out = str(tmp_path / "r.gpkg")
        n = gt.write_gpkg_raster(tiles, out)
        assert n == 4  # 2x2 tile window
        # registry shape
        con = sqlite3.connect(out)
        assert con.execute("SELECT data_type FROM gpkg_contents")\
            .fetchone()[0] == "tiles"
        tms = con.execute("SELECT min_x, max_y FROM gpkg_tile_matrix_set")\
            .fetchone()
        assert tms == (-gt.WEBMERC_HALF, gt.WEBMERC_HALF)
        zl, mw, pxs = con.execute(
            "SELECT zoom_level, matrix_width, pixel_x_size "
            "FROM gpkg_tile_matrix").fetchone()
        assert (zl, mw) == (z, 1 << z)
        assert pxs == pytest.approx(2 * gt.WEBMERC_HALF / ((1 << z) * 256))
        con.close()
        # pixel-exact read-back (contents window covers the 2x2 tiles)
        back = gt.read_gpkg_raster_pixels(out).to_pandas()
        exp = tbl.to_pandas()
        got = back.sort_values("pix_id").reset_index(drop=True)
        want = exp.sort_values("pix_id").reset_index(drop=True)
        assert (got.pix_id.values == want.pix_id.values).all()
        assert (got.burn.values == want.burn.values).all()

    def test_tile_read_raw(self, tmp_path):
        z = 3
        tbl = _pyramid_pixels(z)
        tiles = gt.render_tile_blobs(rd.from_arrow(tbl))
        out = str(tmp_path / "r.gpkg")
        gt.write_gpkg_raster(tiles, out)
        raw = gt.read_gpkg_tiles(out).to_pandas()
        assert len(raw) == 4
        assert set(raw.z) == {z}
        # tile_row stored top-down: matches the XYZ tile_y exactly
        exp = tiles.to_pandas()
        assert (set(zip(raw.tile_x, raw.tile_y))
                == set(zip(exp.tile_x, exp.tile_y)))
        for b in raw.data:
            assert bytes(b)[:8] == b"\x89PNG\r\n\x1a\n"

    def test_checksums_survive_roundtrip(self, tmp_path):
        z = 4
        tbl = _pyramid_pixels(z)
        tiles = gt.render_tile_blobs(rd.from_arrow(tbl)).materialize()
        out = str(tmp_path / "r.gpkg")
        gt.write_gpkg_raster(tiles, out)
        # re-render from the read-back pixels: identical per-tile
        # checksums (bit-exact tile payload cycle)
        back = gt.render_tile_blobs(
            gt.read_gpkg_raster_pixels(out)).to_pandas()
        exp = tiles.to_pandas()
        key = lambda df: df.sort_values(["tile_x", "tile_y"])  # noqa: E731
        assert (key(back).checksum.values == key(exp).checksum.values).all()

    def test_merge_shards(self, tmp_path):
        z = 4
        tbl = _pyramid_pixels(z).to_pandas()
        zs, gx, gy = unpack_pixel(tbl.pix_id.values.astype(np.uint64))
        top = gy < 256
        paths = []
        for i, m in enumerate((top, ~top)):
            part = pa.table({"pix_id": pa.array(tbl.pix_id.values[m]),
                             "burn": pa.array(tbl.burn.values[m])})
            p = str(tmp_path / f"shard{i}.gpkg")
            gt.write_gpkg_raster(gt.render_tile_blobs(rd.from_arrow(part)),
                                 p)
            paths.append(p)
        merged = str(tmp_path / "m.gpkg")
        n = gt.merge_gpkg_tiles(paths, merged)
        assert n == 4
        back = gt.read_gpkg_raster_pixels(merged).to_pandas()
        assert len(back) == len(tbl)
        got = back.sort_values("pix_id")
        want = tbl.sort_values("pix_id")
        assert (got.pix_id.values == want.pix_id.values).all()
        assert (got.burn.values == want.burn.values).all()
