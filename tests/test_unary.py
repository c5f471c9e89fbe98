"""Geometry unary operator tests (hull, segmentize, simplify, buffer)."""

import numpy as np
import pytest

from lib_gdal_ray.geom import unary, wkb as wkb_mod
from lib_gdal_ray.geom.triangulate import _signed_area
from lib_gdal_ray.stages.geom_ops import wkb_centroid_area


def box_ring(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)


class TestConvexHull:
    def test_square_plus_interior(self):
        pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]])
        hull = unary.convex_hull_points(pts)
        assert abs(_signed_area(hull)) == 16.0
        assert len(hull) == 5  # 4 corners + closure

    def test_collinear_dropped(self):
        pts = np.array([[0, 0], [1, 0], [2, 0], [2, 2], [0, 2]])
        hull = unary.convex_hull_points(pts)
        assert len(hull) == 5
        assert abs(_signed_area(hull)) == 4.0

    def test_wkb_roundtrip(self):
        buf = wkb_mod.polygon_to_wkb([np.array(
            [[0, 0], [4, 0], [2, 1], [4, 4], [0, 4], [0, 0]], dtype=np.float64)])
        out = unary.convex_hull_wkb(buf)
        _c, _c2, area = wkb_centroid_area(out)
        assert area == 16.0  # notch filled by the hull


class TestSegmentize:
    def test_max_length_bound(self):
        coords = np.array([[0.0, 0.0], [10.0, 0.0]])
        out = unary.segmentize_coords(coords, 3.0)
        seg = np.hypot(*np.diff(out, axis=0).T)
        assert seg.max() <= 3.0 + 1e-12
        np.testing.assert_array_equal(out[0], coords[0])
        np.testing.assert_array_equal(out[-1], coords[-1])

    def test_polygon_preserves_area(self):
        buf = wkb_mod.polygon_to_wkb([box_ring(0, 0, 6, 4)])
        out = unary.segmentize_wkb(buf, 1.0)
        _c, _c2, area = wkb_centroid_area(out)
        np.testing.assert_allclose(area, 24.0)


class TestSimplify:
    def test_removes_near_collinear(self):
        line = np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.001], [4, 0]],
                        dtype=np.float64)
        buf = wkb_mod.linestring_to_wkb(line)
        out = unary.simplify_wkb(buf, 0.01)
        _k, coords = wkb_mod.parse_wkb(out)
        assert len(coords) == 2

    def test_keeps_significant_vertex(self):
        line = np.array([[0, 0], [2, 3], [4, 0]], dtype=np.float64)
        out = unary.simplify_wkb(wkb_mod.linestring_to_wkb(line), 0.5)
        _k, coords = wkb_mod.parse_wkb(out)
        assert len(coords) == 3

    def test_ring_collapse_returns_none(self):
        ring = np.array([[0, 0], [1, 0.001], [2, 0], [0, 0]], dtype=np.float64)
        assert unary.simplify_wkb(wkb_mod.polygon_to_wkb([ring]), 0.1) is None


class TestBuffer:
    def test_point_buffer_is_kgon(self):
        buf = wkb_mod.points_to_wkb(np.asarray([3.0]), np.asarray([4.0]))[0]
        out = unary.buffer_wkb(buf, 2.0, quadsegs=8)
        _c, _c2, area = wkb_centroid_area(out)
        k = 32
        want = 0.5 * k * 4.0 * np.sin(2 * np.pi / k)  # inscribed k-gon area
        np.testing.assert_allclose(area, want, rtol=1e-9)

    def test_box_buffer_area(self):
        buf = wkb_mod.polygon_to_wkb([box_ring(0, 0, 10, 6)])
        out = unary.buffer_wkb(buf, 1.0, quadsegs=8)
        _c, _c2, area = wkb_centroid_area(out)
        # exact: 60 + perimeter*d + k-gon corner area (4 quarter k-gons = 1 k-gon)
        k = 32
        corner = 0.5 * k * 1.0 * np.sin(2 * np.pi / k)
        want = 60.0 + 32.0 * 1.0 + corner
        np.testing.assert_allclose(area, want, rtol=1e-6)

    def test_line_buffer_area(self):
        line = np.array([[0.0, 0.0], [8.0, 0.0]])
        out = unary.buffer_wkb(wkb_mod.linestring_to_wkb(line), 1.0, quadsegs=8)
        _c, _c2, area = wkb_centroid_area(out)
        k = 32
        want = 16.0 + 0.5 * k * np.sin(2 * np.pi / k)  # rect + two half k-gons
        np.testing.assert_allclose(area, want, rtol=1e-6)

    def test_buffer_superset_of_input(self):
        from lib_gdal_ray.geom.pip import points_in_multipolygon

        buf = wkb_mod.polygon_to_wkb([box_ring(0, 0, 5, 5)])
        out = unary.buffer_wkb(buf, 0.5)
        _k, polys = wkb_mod.parse_wkb(out)
        rng = np.random.default_rng(1)
        px = rng.uniform(0.1, 4.9, 200)
        py = rng.uniform(0.1, 4.9, 200)
        inside = points_in_multipolygon(px, py, polys)
        assert inside.all()

    def test_negative_raises(self):
        buf = wkb_mod.polygon_to_wkb([box_ring(0, 0, 5, 5)])
        with pytest.raises(NotImplementedError):
            unary.buffer_wkb(buf, -1.0)


class TestDelaunayTriangulation:
    def test_parabola_counts_and_area(self):
        # strictly convex position: m-2 triangles covering the hull
        from lib_gdal_ray.geom.triangulate import _signed_area
        m = 9
        pts = np.array([[i, i * i] for i in range(m)], float)
        p, tris = unary.delaunay_triangles(wkb_mod.multipoint_to_wkb(pts))
        assert len(tris) == m - 2
        area = sum(abs(_signed_area(np.vstack([p[t], p[t][:1]]))) for t in tris)
        assert area == (m - 2) * (m - 1) * m / 6

    def test_geometrycollection_output(self):
        pts = np.array([[0, 0], [4, 0], [0, 4], [4, 4], [2, 1]], float)
        gc = unary.delaunay_triangulation_wkb(wkb_mod.multipoint_to_wkb(pts))
        kind, members = wkb_mod.parse_wkb(gc)
        assert kind == "geometrycollection"
        assert all(k == "polygon" for k, _ in members)

    def test_edges_output(self):
        pts = np.array([[0, 0], [2, 0], [1, 2]], float)
        ml = unary.delaunay_triangulation_wkb(
            wkb_mod.multipoint_to_wkb(pts), only_edges=True)
        kind, lines = wkb_mod.parse_wkb(ml)
        assert kind == "multilinestring" and len(lines) == 3

    def test_polygon_vertices_used(self):
        ring = np.array([[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]], float)
        gc = unary.delaunay_triangulation_wkb(wkb_mod.polygon_to_wkb([ring]))
        _, members = wkb_mod.parse_wkb(gc)
        assert len(members) == 2  # square -> 2 triangles


class TestConcaveHull:
    def _notched(self, m):
        mid = (m - 1) // 2
        return np.asarray([(x, y) for y in range(3) for x in range(m)
                           if not (x == mid and y == 2)], float)

    def test_notch_erodes(self):
        from lib_gdal_ray.geom.triangulate import _signed_area
        m = 13
        buf = wkb_mod.multipoint_to_wkb(self._notched(m))
        kind, rings = wkb_mod.parse_wkb(unary.concave_hull_wkb(buf, ratio=0.5))
        assert kind == "polygon"
        assert abs(_signed_area(rings[0])) == 2 * (m - 1) - 1

    def test_ratio_one_is_convex_hull(self):
        from lib_gdal_ray.geom.triangulate import _signed_area
        m = 9
        buf = wkb_mod.multipoint_to_wkb(self._notched(m))
        _, rings = wkb_mod.parse_wkb(unary.concave_hull_wkb(buf, ratio=1.0))
        assert abs(_signed_area(rings[0])) == 2 * (m - 1)

    def test_all_points_inside_or_on_hull(self):
        from lib_gdal_ray.geom.pip import points_in_ring
        pts = self._notched(11)
        _, rings = wkb_mod.parse_wkb(
            unary.concave_hull_wkb(wkb_mod.multipoint_to_wkb(pts), ratio=0.5))
        ring = rings[0]
        # every input point within the hull (allow boundary: shrink test
        # by checking a slightly inflated hull via distance)
        inside = points_in_ring(pts[:, 0], pts[:, 1], ring)
        on_edge = np.zeros(len(pts), bool)
        for i, p in enumerate(pts):
            a, b = ring[:-1], ring[1:]
            d = np.abs((b[:, 0] - a[:, 0]) * (a[:, 1] - p[1])
                       - (a[:, 0] - p[0]) * (b[:, 1] - a[:, 1]))
            seg = ((np.minimum(a, b) - 1e-9 <= p) & (p <= np.maximum(a, b) + 1e-9)).all(axis=1)
            on_edge[i] = bool((seg & (d < 1e-9)).any())
        assert (inside | on_edge).all()


class TestWrapDateline:
    def test_crossing_polygon_splits(self):
        from lib_gdal_ray.geom.triangulate import _signed_area
        ring = np.array([[175, 0], [-175, 0], [-175, 10], [175, 10], [175, 0]], float)
        kind, polys = wkb_mod.parse_wkb(
            unary.wrap_dateline_wkb(wkb_mod.polygon_to_wkb([ring])))
        assert kind == "multipolygon" and len(polys) == 2
        areas = sorted(abs(_signed_area(r[0])) for r in polys)
        assert areas == [50.0, 50.0]
        xs = np.concatenate([r[0][:, 0] for r in polys])
        assert xs.min() >= -180 and xs.max() <= 180

    def test_noncrossing_passthrough(self):
        ring = np.array([[10, 0], [20, 0], [20, 10], [10, 10], [10, 0]], float)
        buf = wkb_mod.polygon_to_wkb([ring])
        assert unary.wrap_dateline_wkb(buf) == buf

    def test_crossing_linestring(self):
        ls = np.array([[178, 0], [-178, 2]], float)
        kind, lines = wkb_mod.parse_wkb(
            unary.wrap_dateline_wkb(wkb_mod.linestring_to_wkb(ls)))
        assert kind == "multilinestring" and len(lines) == 2
        for ln in lines:
            assert np.abs(ln[:, 0]).max() <= 180

    def test_point_normalization(self):
        import struct
        buf = struct.pack("<BIdd", 1, 1, 190.0, 5.0)
        out = unary.wrap_dateline_wkb(buf)
        kind, payload = wkb_mod.parse_wkb(out)
        assert kind == "point" and payload[0][0] == -170.0


class TestSwapExplode:
    def test_swap_roundtrip(self):
        import numpy as np
        from lib_gdal_ray.geom import wkb as W
        from lib_gdal_ray.geom.unary import swap_xy_wkb

        g = W.polygon_to_wkb([
            np.array([[0, 1], [4, 1], [4, 5], [0, 1]], float),
            np.array([[1, 2], [2, 2], [2, 3], [1, 2]], float)])
        assert swap_xy_wkb(swap_xy_wkb(g)) == g
        k, p = W.parse_wkb(swap_xy_wkb(g))
        assert p[0][0][0] == 1.0 and p[0][0][1] == 0.0

    def test_explode_all_types(self):
        import numpy as np
        from lib_gdal_ray.geom import wkb as W
        from lib_gdal_ray.geom.unary import explode_collection_wkb

        mp = W.multipoint_to_wkb(np.array([[0, 1], [2, 3]], float))
        assert [W.parse_wkb(x)[0] for x in explode_collection_wkb(mp)] == \
            ["point", "point"]
        single = W.points_to_wkb(np.array([9.0]), np.array([9.0]))[0]
        assert explode_collection_wkb(single) == [single]
        gc = W.geometrycollection_to_wkb([single, mp])
        assert len(explode_collection_wkb(gc)) == 3

    def test_explode_stage_replicates_attrs(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from lib_gdal_ray.geom import wkb as W
        from lib_gdal_ray.stages.geom_ops import explode_collections

        mp = W.multipoint_to_wkb(np.array([[0, 1], [2, 3], [4, 5]], float))
        single = W.points_to_wkb(np.array([7.0]), np.array([8.0]))[0]
        ds = ray.data.from_arrow(pa.table({
            "fid": pa.array([10, 20]),
            "geometry": pa.array([mp, single], type=pa.binary())}))
        out = explode_collections(ds).to_pandas().sort_values("fid")
        assert list(out["fid"]) == [10, 10, 10, 20]
