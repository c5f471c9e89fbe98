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
