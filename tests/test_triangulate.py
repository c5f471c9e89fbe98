"""Triangulation + general polygon intersection vs area oracles."""

import numpy as np
import pytest

from lib_gdal_ray.geom import pip, wkb
from lib_gdal_ray.geom.triangulate import (intersect_simple_polygons,
                                           polygon_intersection_area,
                                           triangulate_ring)
from lib_gdal_ray.stages.geom_ops import wkb_centroid_area


def ring_area(ring):
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return (x * y1 - x1 * y).sum() / 2.0


def close(pts):
    return np.asarray(pts + [pts[0]], dtype=np.float64)


L_SHAPE = close([(0, 0), (4, 0), (4, 2), (2, 2), (2, 6), (0, 6)])
STAR = None


def make_star(seed=3, k=9):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    r = rng.uniform(2, 6, k)
    xs, ys = r * np.cos(ang), r * np.sin(ang)
    return np.stack([np.append(xs, xs[0]), np.append(ys, ys[0])], axis=1)


class TestTriangulate:
    @pytest.mark.parametrize("ring", [L_SHAPE, make_star(1), make_star(5, 12)])
    def test_area_preserved(self, ring):
        tris = triangulate_ring(ring)
        assert len(tris) == len(ring) - 3  # n-2 triangles for n vertices
        total = sum(abs(ring_area(t)) for t in tris)
        np.testing.assert_allclose(total, abs(ring_area(ring)), rtol=1e-9)

    def test_cw_input(self):
        tris = triangulate_ring(L_SHAPE[::-1].copy())
        total = sum(abs(ring_area(t)) for t in tris)
        np.testing.assert_allclose(total, abs(ring_area(L_SHAPE)), rtol=1e-9)

    def test_triangle_centers_inside(self):
        ring = make_star(7)
        for t in triangulate_ring(ring):
            cx, cy = t[:-1, 0].mean(), t[:-1, 1].mean()
            assert pip.points_in_ring(np.asarray([cx]), np.asarray([cy]), ring)[0]


class TestGeneralIntersection:
    def test_lshape_square_mc(self):
        a = wkb.polygon_to_wkb([L_SHAPE])
        sq = close([(1, 1), (3, 1), (3, 5), (1, 5)])
        b = wkb.polygon_to_wkb([sq])
        got = polygon_intersection_area(a, b)
        rng = np.random.default_rng(2)
        px = rng.uniform(0, 4, 200000)
        py = rng.uniform(0, 6, 200000)
        inside = pip.points_in_ring(px, py, L_SHAPE) & pip.points_in_ring(px, py, sq)
        mc = inside.mean() * 24.0
        np.testing.assert_allclose(got, mc, rtol=0.02)

    def test_concave_concave_mc(self):
        s1 = make_star(11)
        s2 = make_star(13) + np.asarray([1.5, 0.5])
        got = polygon_intersection_area(wkb.polygon_to_wkb([s1]), wkb.polygon_to_wkb([s2]))
        rng = np.random.default_rng(4)
        px = rng.uniform(-7, 9, 300000)
        py = rng.uniform(-7, 8, 300000)
        inside = pip.points_in_ring(px, py, s1) & pip.points_in_ring(px, py, s2)
        mc = inside.mean() * (16.0 * 15.0)
        np.testing.assert_allclose(got, mc, rtol=0.03)

    def test_disjoint_and_contained(self):
        a = wkb.polygon_to_wkb([close([(0, 0), (2, 0), (2, 2), (0, 2)])])
        b = wkb.polygon_to_wkb([close([(10, 10), (12, 10), (12, 12), (10, 12)])])
        assert intersect_simple_polygons(a, b) is None
        inner = wkb.polygon_to_wkb([close([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)])])
        np.testing.assert_allclose(polygon_intersection_area(a, inner), 1.0, rtol=1e-9)

    def test_holes_supported(self):
        outer = close([(0, 0), (10, 0), (10, 10), (0, 10)])
        hole = close([(4, 4), (6, 4), (6, 6), (4, 6)])
        withhole = wkb.polygon_to_wkb([outer, hole])
        window = wkb.polygon_to_wkb([close([(3, 3), (7, 3), (7, 7), (3, 7)])])
        # window ∩ donut = 16 - 4 (the hole is fully inside the window)
        np.testing.assert_allclose(
            polygon_intersection_area(withhole, window), 12.0, rtol=1e-9)
        # donut ∩ donut = donut area
        np.testing.assert_allclose(
            polygon_intersection_area(withhole, withhole), 96.0, rtol=1e-9)


class TestPolygonIntersectionJoin:
    def test_polys_vs_12gon_zones(self):
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.functions import derive
        from lib_gdal_ray.pipelines.spatial_join import broadcast_polygon_intersection

        zones = pa.table({
            "zone_id": pa.array(np.arange(25, dtype=np.int64)),
            "geometry": pa.array(
                [wkb.polygon_to_wkb(derive.zone_polygon_rings(int(k))) for k in range(25)],
                type=pa.binary()),
        })
        rng = np.random.default_rng(21)
        polys = []
        for i in range(25):
            c = np.asarray([rng.uniform(-150, 150), rng.uniform(-60, 60)])
            polys.append(wkb.polygon_to_wkb([make_star(100 + i, 8) * 1.5 + c]))
        ds = ray.data.from_arrow(pa.table({
            "gid": pa.array(np.arange(25, dtype=np.int64)),
            "geometry": pa.array(polys, type=pa.binary())}))
        out = broadcast_polygon_intersection(ds, zones, ["zone_id"], res=10.0).to_pandas()
        # oracle: direct kernel per pair (kernel itself MC-validated above)
        want = {}
        for i in range(25):
            for z in range(25):
                a = polygon_intersection_area(
                    polys[i], zones["geometry"][z].as_py())
                if a > 1e-9:
                    want[(i, z)] = a
        got = {(int(r["gid"]), int(r["zone_id"])): r["intersection_area"]
               for _, r in out.iterrows()}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-9)
        assert len(want) > 0  # some overlaps actually occurred
