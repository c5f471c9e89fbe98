"""Unit tests for the pure-numpy geometry kernels."""

import numpy as np
import pytest

from lib_gdal_ray.geom import cells, pip, proj, wkb
from lib_gdal_ray.functions import derive


def brute_point_in_ring(x, y, ring):
    """Independent textbook crossing-number oracle."""
    inside = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y):
            xint = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
            if x < xint:
                inside = not inside
    return inside


class TestWkb:
    def test_point_roundtrip(self):
        rng = np.random.default_rng(42)
        x = rng.uniform(-180, 180, 1000)
        y = rng.uniform(-85, 85, 1000)
        enc = wkb.points_to_wkb(x, y)
        x2, y2 = wkb.wkb_to_points(enc)
        np.testing.assert_array_equal(x, x2)
        np.testing.assert_array_equal(y, y2)

    def test_polygon_roundtrip(self):
        ring = np.asarray([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64)
        hole = np.asarray([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=np.float64)
        buf = wkb.polygon_to_wkb([ring, hole])
        kind, rings = wkb.parse_wkb(buf)
        assert kind == "polygon"
        np.testing.assert_array_equal(rings[0], ring)
        np.testing.assert_array_equal(rings[1], hole)

    def test_multipolygon_and_bbox(self):
        p1 = [np.asarray([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=np.float64)]
        p2 = [np.asarray([[5, 5], [7, 5], [7, 8], [5, 8], [5, 5]], dtype=np.float64)]
        buf = wkb.multipolygon_to_wkb([p1, p2])
        kind, polys = wkb.parse_wkb(buf)
        assert kind == "multipolygon" and len(polys) == 2
        bbox = wkb.wkb_bbox(np.asarray([buf], dtype=object))
        np.testing.assert_array_equal(bbox[0], [0, 0, 7, 8])

    def test_big_endian_parse(self):
        import struct

        buf = struct.pack(">BIdd", 0, 1, 3.5, -7.25)
        kind, coords = wkb.parse_wkb(buf)
        assert kind == "point"
        assert coords[0, 0] == 3.5 and coords[0, 1] == -7.25


class TestPip:
    def test_square(self):
        ring = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)
        px = np.asarray([5.0, 15.0, -1.0, 5.0])
        py = np.asarray([5.0, 5.0, 5.0, 15.0])
        np.testing.assert_array_equal(
            pip.points_in_ring(px, py, ring), [True, False, False, False]
        )

    def test_vs_brute_force_random(self):
        rng = np.random.default_rng(7)
        # random star-shaped polygon
        k = 17
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(1, 5, k)
        xs, ys = r * np.cos(ang), r * np.sin(ang)
        ring = np.stack([np.append(xs, xs[0]), np.append(ys, ys[0])], axis=1)
        px = rng.uniform(-6, 6, 500)
        py = rng.uniform(-6, 6, 500)
        got = pip.points_in_ring(px, py, ring)
        want = np.asarray([brute_point_in_ring(px[i], py[i], ring) for i in range(500)])
        np.testing.assert_array_equal(got, want)

    def test_holes(self):
        outer = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)
        hole = np.asarray([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=np.float64)
        px = np.asarray([5.0, 2.0])
        py = np.asarray([5.0, 2.0])
        np.testing.assert_array_equal(
            pip.points_in_polygon(px, py, [outer, hole]), [False, True]
        )

    def test_zone_polygons_vs_brute(self):
        for nk in range(0, 25, 5):
            rings = derive.zone_polygon_rings(nk)
            rng = np.random.default_rng(nk)
            bbox = np.asarray(
                [rings[0][:, 0].min(), rings[0][:, 1].min(), rings[0][:, 0].max(), rings[0][:, 1].max()]
            )
            px = rng.uniform(bbox[0] - 1, bbox[2] + 1, 200)
            py = rng.uniform(bbox[1] - 1, bbox[3] + 1, 200)
            got = pip.points_in_polygon(px, py, rings)
            want = np.asarray([brute_point_in_ring(px[i], py[i], rings[0]) for i in range(200)])
            np.testing.assert_array_equal(got, want)


class TestCells:
    def test_tile_known_values(self):
        # lon 0, lat 0 at z=1 -> tile (1, 0)? center maps to (1,1) boundary;
        # use classic reference points
        tx, ty = cells.lonlat_to_tile(np.asarray([0.0]), np.asarray([0.0]), 0)
        assert (tx[0], ty[0]) == (0, 0)
        tx, ty = cells.lonlat_to_tile(np.asarray([-180.0]), np.asarray([85.0]), 2)
        assert (tx[0], ty[0]) == (0, 0)
        tx, ty = cells.lonlat_to_tile(np.asarray([179.9]), np.asarray([-85.0]), 2)
        assert (tx[0], ty[0]) == (3, 3)

    def test_pack_roundtrip(self):
        z = np.asarray([8, 12])
        tx = np.asarray([100, 4000])
        ty = np.asarray([200, 3999])
        c = cells.pack_tile(z, tx, ty)
        z2, tx2, ty2 = cells.unpack_tile(c)
        np.testing.assert_array_equal(z, z2)
        np.testing.assert_array_equal(tx, tx2)
        np.testing.assert_array_equal(ty, ty2)

    def test_parent_tile(self):
        c = cells.pack_tile(np.asarray([3]), np.asarray([5]), np.asarray([6]))
        z, x, y = cells.unpack_tile(cells.parent_tile(c))
        assert (z[0], x[0], y[0]) == (2, 2, 3)

    def test_grid_covering(self):
        offs, cc = cells.covering_grid(
            np.asarray([-0.5]), np.asarray([-0.5]), np.asarray([1.5]), np.asarray([1.5]), 1.0
        )
        assert offs[-1] == 9  # 3x3 cells
        assert len(set(cc.tolist())) == 9

    def test_grid_point_in_covering(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-170, 170, 100)
        lat = rng.uniform(-80, 80, 100)
        c = cells.grid_cell(lon, lat, 5.0)
        offs, cc = cells.covering_grid(lon - 0.01, lat - 0.01, lon + 0.01, lat + 0.01, 5.0)
        for i in range(100):
            assert c[i] in cc[offs[i]:offs[i + 1]]

    def test_ring_cells(self):
        res = 5.0
        c = cells.grid_cell(np.asarray([0.0]), np.asarray([0.0]), res)[0]
        r0 = cells.ring_cells(c, 0, res)
        assert list(r0) == [c]
        r1 = cells.ring_cells(c, 1, res)
        assert len(r1) == 8
        r2 = cells.ring_cells(c, 2, res)
        assert len(r2) == 16
        # all distinct, none equal to center
        assert c not in set(r1.tolist()) | set(r2.tolist())


class TestProj:
    def test_mercator_roundtrip(self):
        rng = np.random.default_rng(11)
        lon = rng.uniform(-179, 179, 1000)
        lat = rng.uniform(-84, 84, 1000)
        x, y = proj.lonlat_to_mercator(lon, lat)
        lon2, lat2 = proj.mercator_to_lonlat(x, y)
        np.testing.assert_allclose(lon, lon2, atol=1e-9)
        np.testing.assert_allclose(lat, lat2, atol=1e-9)

    def test_known_point(self):
        x, y = proj.lonlat_to_mercator(np.asarray([180.0]), np.asarray([0.0]))
        np.testing.assert_allclose(x[0], 20037508.342789244)
        assert abs(y[0]) < 1e-6

    def test_transformer_registry(self):
        t = proj.Transformer.get(4326, 3857)
        x, y = t.transform([0.0], [45.0])
        np.testing.assert_allclose(y[0], 5621521.486192, atol=1e-5)
        # UTM codes resolve dynamically since round 2 (test_proj_utm.py);
        # unregistered codes still raise
        proj.Transformer.get(4326, 32631)
        with pytest.raises(NotImplementedError):
            proj.Transformer.get(4326, 2154)

    def test_geotransform(self):
        gt = proj.GeoTransform([100.0, 0.5, 0.0, 200.0, 0.0, -0.5])
        x, y = gt.pixel_to_geo([0, 10], [0, 4])
        np.testing.assert_array_equal(x, [100.0, 105.0])
        np.testing.assert_array_equal(y, [200.0, 198.0])
        c, r = gt.geo_to_pixel(x, y)
        np.testing.assert_allclose(c, [0, 10])
        np.testing.assert_allclose(r, [0, 4])


class TestDerive:
    def test_ranges(self):
        ids = np.arange(1, 10001)
        lon, lat = derive.event_lonlat(ids)
        assert lon.min() >= -180 and lon.max() < 180
        assert lat.min() >= -85 and lat.max() < 85

    def test_zone_boxes_shape(self):
        nk = np.arange(25)
        xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
        assert (xmax > xmin).all() and (ymax > ymin).all()
        assert xmin.min() >= -185 and xmax.max() <= 185


class TestExtendedWkb:
    def test_z_point_parse_and_z(self):
        b = wkb.point_z_to_wkb(1.5, 2.5, 99.0)
        k, p = wkb.parse_wkb(b)
        assert k == "point"
        np.testing.assert_array_equal(p, [[1.5, 2.5]])
        assert wkb.wkb_point_z(b) == 99.0
        # 2-D point has no z
        b2 = wkb.points_to_wkb(np.asarray([1.0]), np.asarray([2.0]))[0]
        assert np.isnan(wkb.wkb_point_z(b2))

    def test_z_linestring_xy_slice(self):
        b = wkb.linestring_z_to_wkb(np.array([[0, 0, 5], [3, 4, 6]], dtype=float))
        k, p = wkb.parse_wkb(b)
        assert k == "linestring"
        np.testing.assert_array_equal(p, [[0, 0], [3, 4]])

    def test_multipoint_multilinestring(self):
        mp = wkb.multipoint_to_wkb(np.array([[1, 2], [3, 4]], dtype=float))
        k, p = wkb.parse_wkb(mp)
        assert k == "multipoint" and p.shape == (2, 2)
        ml = wkb.multilinestring_to_wkb([np.array([[0, 0], [1, 1]], dtype=float),
                                         np.array([[2, 2], [3, 3]], dtype=float)])
        k, p = wkb.parse_wkb(ml)
        assert k == "multilinestring" and len(p) == 2

    def test_geometrycollection_and_polygon_extract(self):
        gc = wkb.geometrycollection_to_wkb([
            wkb.points_to_wkb(np.asarray([9.0]), np.asarray([9.0]))[0],
            wkb.box_to_wkb(0, 0, 2, 2),
            wkb.multipolygon_to_wkb([[np.array(
                [[5, 5], [6, 5], [6, 6], [5, 5]], dtype=float)]]),
        ])
        k, members = wkb.parse_wkb(gc)
        assert k == "geometrycollection" and len(members) == 3
        polys = wkb.collection_polygons(members)
        assert len(polys) == 2
        bbox = wkb.wkb_bbox(np.asarray([gc], dtype=object))[0]
        np.testing.assert_array_equal(bbox, [0, 0, 9, 9])

    def test_ewkb_flags(self):
        import struct
        # EWKB point with Z flag + SRID
        raw = struct.pack("<BIIddd", 1, 1 | 0x80000000 | 0x20000000,
                          4326, 7.0, 8.0, 9.0)
        k, p = wkb.parse_wkb(raw)
        assert k == "point"
        np.testing.assert_array_equal(p, [[7.0, 8.0]])

    def test_collection_in_pip_join(self):
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.pipelines.spatial_join import broadcast_pip_join

        gc = wkb.geometrycollection_to_wkb([wkb.box_to_wkb(0, 0, 10, 10)])
        zones = pa.table({"zone_id": pa.array([1], type=pa.int64()),
                          "geometry": pa.array([gc], type=pa.binary())})
        pts = ray.data.from_arrow(pa.table({
            "event_id": pa.array([1, 2], type=pa.int64()),
            "lon": pa.array([5.0, 50.0]), "lat": pa.array([5.0, 50.0])}))
        out = broadcast_pip_join(pts, zones, "geometry", ["zone_id"],
                                 res=50.0).to_pandas()
        assert list(out["event_id"]) == [1]


class TestCurvedWkb:
    def test_circularstring_half_circle(self):
        cs = wkb.circularstring_to_wkb(np.array([[1, 0], [0, 1], [-1, 0]],
                                                dtype=np.float64))
        k, c = wkb.parse_wkb(cs)
        assert k == "linestring"
        r = np.hypot(c[:, 0], c[:, 1])
        np.testing.assert_allclose(r, 1.0, atol=1e-12)  # all points on the arc
        np.testing.assert_allclose(c[0], [1, 0])
        np.testing.assert_allclose(c[-1], [-1, 0], atol=1e-12)
        assert len(c) >= 45  # 180 deg at 4 deg steps

    def test_clockwise_arc(self):
        # p1 below the chord -> clockwise sweep
        cs = wkb.circularstring_to_wkb(np.array([[1, 0], [0, -1], [-1, 0]],
                                                dtype=np.float64))
        _k, c = wkb.parse_wkb(cs)
        assert c[:, 1].min() < -0.99  # passes through (0,-1)

    def test_curvepolygon_area_approximates_circle(self):
        from lib_gdal_ray.stages.geom_ops import wkb_centroid_area

        ring = wkb.circularstring_to_wkb(np.array(
            [[1, 0], [0, 1], [-1, 0], [0, -1], [1, 0]], dtype=np.float64))
        cp = wkb.curvepolygon_to_wkb([ring])
        k, rings = wkb.parse_wkb(cp)
        assert k == "polygon"
        area = wkb_centroid_area(wkb.polygon_to_wkb(rings))[2]
        np.testing.assert_allclose(area, np.pi, rtol=2e-3)  # 4-deg facets

    def test_compoundcurve_concatenates(self):
        seg = wkb.linestring_to_wkb(np.array([[0, 0], [1, 0]], dtype=np.float64))
        arc = wkb.circularstring_to_wkb(np.array([[1, 0], [2, 1], [3, 0]],
                                                 dtype=np.float64))
        cc = wkb.compoundcurve_to_wkb([seg, arc])
        k, c = wkb.parse_wkb(cc)
        assert k == "linestring"
        np.testing.assert_allclose(c[0], [0, 0])
        np.testing.assert_allclose(c[-1], [3, 0], atol=1e-12)

    def test_collinear_arc_degenerates(self):
        cs = wkb.circularstring_to_wkb(np.array([[0, 0], [1, 0], [2, 0]],
                                                dtype=np.float64))
        _k, c = wkb.parse_wkb(cs)
        assert len(c) == 3
