"""Polygon clipping vs area oracles."""

import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.geom import wkb
from lib_gdal_ray.geom.clip import clip_ring_to_box, clip_to_box, clip_wkb_to_box
from lib_gdal_ray.stages.geom_ops import wkb_centroid_area


def square(x0, y0, x1, y1):
    return np.asarray([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def area_of(buf):
    return wkb_centroid_area(buf)[2]


def test_box_box_intersection():
    buf = wkb.polygon_to_wkb([square(0, 0, 10, 10)])
    out = clip_wkb_to_box(buf, 5, 5, 20, 20)
    assert abs(area_of(out) - 25.0) < 1e-12


def test_fully_inside_unchanged():
    buf = wkb.polygon_to_wkb([square(2, 2, 4, 4)])
    out = clip_wkb_to_box(buf, 0, 0, 10, 10)
    kind, rings = wkb.parse_wkb(out)
    assert abs(area_of(out) - 4.0) < 1e-12


def test_fully_outside_dropped():
    buf = wkb.polygon_to_wkb([square(20, 20, 30, 30)])
    assert clip_wkb_to_box(buf, 0, 0, 10, 10) is None


def test_triangle_clip_area():
    tri = np.asarray([[0, 0], [10, 0], [0, 10], [0, 0]], float)
    buf = wkb.polygon_to_wkb([tri])
    out = clip_wkb_to_box(buf, 0, 0, 5, 100)
    # clipped region: trapezoid x in [0,5] under y = 10 - x → area 37.5
    assert abs(area_of(out) - 37.5) < 1e-9


def test_hole_clipped():
    outer = square(0, 0, 10, 10)
    hole = square(4, 4, 6, 6)
    buf = wkb.polygon_to_wkb([outer, hole])
    out = clip_wkb_to_box(buf, 0, 0, 5, 5)
    # outer clipped to 25; hole contributes its overlap 1 → 24
    assert abs(area_of(out) - 24.0) < 1e-9


def test_point_semantics():
    p_in = wkb.points_to_wkb(np.asarray([1.0]), np.asarray([1.0]))[0]
    p_out = wkb.points_to_wkb(np.asarray([99.0]), np.asarray([1.0]))[0]
    assert clip_wkb_to_box(p_in, 0, 0, 10, 10) == p_in
    assert clip_wkb_to_box(p_out, 0, 0, 10, 10) is None


def test_stage_drops_and_rewrites():
    bufs = [wkb.polygon_to_wkb([square(0, 0, 4, 4)]),
            wkb.polygon_to_wkb([square(100, 100, 104, 104)])]
    ds = ray.data.from_arrow(pa.table({
        "gid": pa.array([1, 2], type=pa.int64()),
        "geometry": pa.array(bufs, type=pa.binary())}))
    out = clip_to_box(ds, 2, 2, 10, 10).to_pandas()
    assert list(out["gid"]) == [1]
    assert abs(area_of(out["geometry"].iloc[0]) - 4.0) < 1e-12


class TestBoxIntersectionJoin:
    def test_polygon_box_overlay(self):
        from lib_gdal_ray.functions import derive
        from lib_gdal_ray.pipelines.spatial_join import broadcast_box_intersection

        # input polygons: squares straddling zone boxes
        nk = np.arange(25, dtype=np.int64)
        xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
        boxes = pa.table({
            "zone_id": pa.array(nk),
            "geometry": pa.array([wkb.box_to_wkb(float(a), float(b), float(c), float(d))
                                  for a, b, c, d in zip(xmin, ymin, xmax, ymax)],
                                 type=pa.binary()),
        })
        rng = np.random.default_rng(17)
        polys = []
        for i in range(60):
            cx, cy = rng.uniform(-160, 160), rng.uniform(-70, 70)
            s = rng.uniform(2, 12)
            polys.append(wkb.polygon_to_wkb([square(cx - s, cy - s, cx + s, cy + s)]))
        ds = ray.data.from_arrow(pa.table({
            "gid": pa.array(np.arange(60, dtype=np.int64)),
            "geometry": pa.array(polys, type=pa.binary())}))
        out = broadcast_box_intersection(ds, boxes, ["zone_id"], res=10.0).to_pandas()
        # oracle: rectangle-rectangle intersection areas
        in_bb = wkb.wkb_bbox(np.asarray(polys, dtype=object))
        want = {}
        for i in range(60):
            for z in range(25):
                w = min(in_bb[i, 2], xmax[z]) - max(in_bb[i, 0], xmin[z])
                h = min(in_bb[i, 3], ymax[z]) - max(in_bb[i, 1], ymin[z])
                if w > 0 and h > 0:
                    want[(i, z)] = w * h
        got = {(int(r["gid"]), int(r["zone_id"])): r["intersection_area"]
               for _, r in out.iterrows()}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-9)


def regular_ngon(cx, cy, r, n, phase=0.0):
    ang = phase + 2 * np.pi * np.arange(n) / n
    xs = cx + r * np.cos(ang)
    ys = cy + r * np.sin(ang)
    return np.stack([np.append(xs, xs[0]), np.append(ys, ys[0])], axis=1)


class TestConvexClip:
    def test_box_via_convex_path_matches(self):
        from lib_gdal_ray.geom.clip import clip_ring_to_convex

        ring = square(0, 0, 10, 10)
        clipper = square(5, 5, 20, 20)
        out = clip_ring_to_convex(ring, clipper)
        buf = wkb.polygon_to_wkb([out])
        assert abs(area_of(buf) - 25.0) < 1e-9

    def test_hexagon_intersection_monte_carlo(self):
        from lib_gdal_ray.geom import pip
        from lib_gdal_ray.geom.clip import clip_ring_to_convex

        a = regular_ngon(0, 0, 6, 7, phase=0.3)   # heptagon subject
        b = regular_ngon(3, 1, 5, 6, phase=0.1)   # hexagon clipper
        out = clip_ring_to_convex(a, b)
        got = area_of(wkb.polygon_to_wkb([out]))
        rng = np.random.default_rng(5)
        px = rng.uniform(-7, 9, 200000)
        py = rng.uniform(-7, 7, 200000)
        inside = pip.points_in_ring(px, py, a) & pip.points_in_ring(px, py, b)
        mc = inside.mean() * (16.0 * 14.0)
        np.testing.assert_allclose(got, mc, rtol=0.02)

    def test_cw_clipper_supported(self):
        from lib_gdal_ray.geom.clip import clip_ring_to_convex

        ring = square(0, 0, 4, 4)
        clipper_cw = square(2, 2, 10, 10)[::-1].copy()
        out = clip_ring_to_convex(ring, clipper_cw)
        assert abs(area_of(wkb.polygon_to_wkb([out])) - 4.0) < 1e-9

    def test_nonconvex_clipper_rejected(self):
        import pytest as _pytest

        from lib_gdal_ray.geom.clip import clip_ring_to_convex

        concave = np.asarray([[0, 0], [4, 0], [2, 1], [4, 4], [0, 4], [0, 0]], float)
        with _pytest.raises(ValueError):
            clip_ring_to_convex(square(0, 0, 2, 2), concave)

    def test_disjoint_none(self):
        from lib_gdal_ray.geom.clip import clip_ring_to_convex

        assert clip_ring_to_convex(square(0, 0, 1, 1), regular_ngon(50, 50, 2, 6)) is None
