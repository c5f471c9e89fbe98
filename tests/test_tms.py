"""OGC TileMatrixSet registry (geom/tms.py).

Parity: `gcore/tilematrixset.cpp` well-known scheme constants and the
`gdal raster tile --tiling-scheme` expectations of
`autotest/utilities/test_gdalalg_raster_tile.py` (GoogleCRS84Quad
small_world -> z1 tiles {0,1}x{0,1}).
"""

import json
import math

import numpy as np
import pytest

from lib_gdal_ray.geom import cells
from lib_gdal_ray.geom.tms import (HALF_CIRCUMFERENCE, TileMatrixSet,
                                   get_tms, parse_tms_json)


class TestRegistry:
    def test_aliases(self):
        assert get_tms("WebMercatorQuad") is get_tms("GoogleMapsCompatible")
        assert get_tms("WorldCRS84Quad") is get_tms("InspireCRS84Quad")
        assert get_tms("WorldCRS84Quad") is get_tms(
            "PseudoTMS_GlobalGeodetic")
        with pytest.raises(ValueError, match="unknown tiling scheme"):
            get_tms("NoSuchScheme")

    def test_reference_constants(self):
        # tilematrixset.cpp:96-101 (WebMercatorQuad), :203-214
        # (WorldCRS84Quad), :236-247 (GoogleCRS84Quad)
        wm = get_tms("WebMercatorQuad")
        assert wm.res(0) == 2 * HALF_CIRCUMFERENCE / 256
        assert wm.res(10) == 2 * HALF_CIRCUMFERENCE / 256 / (1 << 10)
        assert wm.matrix_width(5) == 32 and wm.matrix_height(5) == 32
        wc = get_tms("WorldCRS84Quad")
        assert wc.res(0) == 180.0 / 256
        assert wc.matrix_width(3) == 16 and wc.matrix_height(3) == 8
        assert wc.top_left == (-180.0, 90.0)
        gq = get_tms("GoogleCRS84Quad")
        assert gq.res(0) == 360.0 / 256
        assert gq.matrix_width(3) == 8 and gq.matrix_height(3) == 8
        assert gq.top_left == (-180.0, 180.0)
        assert HALF_CIRCUMFERENCE == pytest.approx(6378137 * math.pi)

    def test_webmercator_delegates_to_cells(self):
        # bit parity with the SQL-oracle tile math
        rng = np.random.default_rng(3)
        lon = rng.uniform(-179.9, 179.9, 500)
        lat = rng.uniform(-84.9, 84.9, 500)
        tms = get_tms("mercator")
        for z in (2, 7, 12):
            tx, ty = tms.lonlat_to_tile(lon, lat, z)
            ex, ey = cells.lonlat_to_tile(lon, lat, z)
            assert (tx == ex).all() and (ty == ey).all()


class TestGoogleCRS84Quad:
    def test_small_world_z1_tiles(self):
        # test_gdalalg_raster_tile.py:261-282: a global extent image
        # tiled at z1 produces exactly 1/{0,1}/{0,1}.png
        tms = get_tms("GoogleCRS84Quad")
        rng = np.random.default_rng(5)
        lon = rng.uniform(-179.99, 179.99, 4000)
        lat = rng.uniform(-89.99, 89.99, 4000)
        tx, ty = tms.lonlat_to_tile(lon, lat, 1)
        assert set(zip(tx.tolist(), ty.tolist())) == {
            (0, 0), (0, 1), (1, 0), (1, 1)}

    def test_row_math_square_grid(self):
        # the grid spans -180..180 in y: +-90 lat falls inside rows
        # z1: row = floor((180 - lat) / 180)
        tms = get_tms("GoogleCRS84Quad")
        _, ty = tms.lonlat_to_tile(np.zeros(3),
                                   np.array([89.0, 1.0, -89.0]), 1)
        assert ty.tolist() == [0, 0, 1]
        # z2 rows 0 and 3 are entirely outside +-90 -> never produced
        _, ty2 = tms.lonlat_to_tile(np.zeros(2), np.array([89.9, -89.9]), 2)
        assert ty2.tolist() == [1, 2]

    def test_tile_bounds_and_transform(self):
        tms = get_tms("GoogleCRS84Quad")
        assert tms.tile_bounds(1, 0, 0) == (-180.0, 0.0, 0.0, 180.0)
        assert tms.tile_bounds(1, 1, 1) == (0.0, -180.0, 180.0, 0.0)
        gt = tms.tile_transform(2, 1, 1)
        assert gt[0] == -90.0 and gt[3] == 90.0
        assert gt[1] == pytest.approx(360.0 / 256 / 4)
        assert gt[5] == -gt[1]


class TestWorldCRS84Quad:
    def test_two_tiles_at_z0(self):
        tms = get_tms("WorldCRS84Quad")
        tx, ty = tms.lonlat_to_tile(np.array([-90.0, 90.0]),
                                    np.array([0.0, 0.0]), 0)
        assert tx.tolist() == [0, 1]
        assert ty.tolist() == [0, 0]
        assert tms.extent() == (-180.0, -90.0, 180.0, 90.0)

    def test_pixel_assignment_linear(self):
        tms = get_tms("WorldCRS84Quad")
        # res at z1 = 180/512 deg/px; pixel (gx, gy) floors linearly
        gx, gy = tms.lonlat_to_pixel(np.array([-180.0, 0.0, 179.999]),
                                     np.array([90.0, 0.0, -89.999]), 1)
        r = 180.0 / 512
        assert gx.tolist() == [0, int(180 / r), int(359.999 / r)]
        assert gy.tolist() == [0, int(90 / r), int(179.999 / r)]


class TestJsonParse:
    def _doc(self):
        return {
            "id": "CustomQuad",
            "crs": "http://www.opengis.net/def/crs/EPSG/0/3857",
            "tileMatrices": [
                {"id": str(i),
                 "cellSize": 100.0 / (1 << i),
                 "pointOfOrigin": [-5000.0, 5000.0],
                 "matrixWidth": 1 << i, "matrixHeight": 1 << i,
                 "tileWidth": 512, "tileHeight": 512}
                for i in range(4)
            ],
        }

    def test_tms2_roundtrip(self):
        tms = parse_tms_json(json.dumps(self._doc()))
        assert tms.identifier == "CustomQuad"
        assert tms.crs == "EPSG:3857"
        assert tms.res0 == 100.0
        assert tms.tile_size == 512
        assert tms.zmax == 3
        assert tms.top_left == (-5000.0, 5000.0)
        # get_tms accepts the raw JSON string too
        assert get_tms(json.dumps(self._doc())).res0 == 100.0

    def test_non_quadtree_rejected(self):
        doc = self._doc()
        doc["tileMatrices"][2]["cellSize"] = 33.0
        with pytest.raises(ValueError, match="quad-tree"):
            parse_tms_json(json.dumps(doc))


class TestRasterizeWithScheme:
    def test_rasterize_pixels_geodetic(self):
        import pyarrow as pa
        import ray.data as rd

        from lib_gdal_ray.pipelines.rasterize import (rasterize_pixels,
                                                      unpack_pixel)

        lon = np.array([-179.0, -1.0, 1.0, 179.0])
        lat = np.array([89.0, 1.0, -1.0, -89.0])
        ds = rd.from_arrow(pa.table({"lon": pa.array(lon),
                                     "lat": pa.array(lat)}))
        out = rasterize_pixels(ds, 0, merge_alg="count",
                               tms="WorldCRS84Quad").to_pandas()
        z, gx, gy = unpack_pixel(out.pix_id.values.astype(np.uint64))
        r = 180.0 / 256
        exp_gx = np.floor((lon + 180.0) / r).astype(int)
        exp_gy = np.floor((90.0 - lat) / r).astype(int)
        assert set(zip(gx, gy)) == set(zip(exp_gx, exp_gy))

    def test_tiling_job_gpkg_geodetic_registry(self, tmp_path):
        import pyarrow as pa
        import ray.data as rd
        import sqlite3

        from lib_gdal_ray.pipelines.tiling_job import run_tiling_job

        rng = np.random.default_rng(9)
        n = 3000

        def src():
            return rd.from_arrow(pa.table({
                "lon": pa.array(rng.uniform(-179, 179, n)),
                "lat": pa.array(rng.uniform(-89, 89, n)),
            })).repartition(4)

        out = str(tmp_path / "geo")
        res = run_tiling_job(src, out, z=2, lineage="T1", n_bands=2,
                             output_format="gpkg",
                             tms="WorldCRS84Quad")
        assert sorted(res["ran"]) == [0, 1]
        import os

        shard = os.path.join(out, "part=0", "tiles.gpkg")
        con = sqlite3.connect(shard)
        srs = con.execute("SELECT srs_id FROM gpkg_contents").fetchone()[0]
        assert srs == 4326
        ext = con.execute("SELECT min_x, min_y, max_x, max_y "
                          "FROM gpkg_tile_matrix_set").fetchone()
        assert ext == (-180.0, -90.0, 180.0, 90.0)
        mw, mh, pxs = con.execute(
            "SELECT matrix_width, matrix_height, pixel_x_size "
            "FROM gpkg_tile_matrix WHERE zoom_level=2").fetchone()
        assert (mw, mh) == (8, 4)
        assert pxs == pytest.approx(180.0 / 256 / 4)
        con.close()
