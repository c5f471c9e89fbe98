"""Polygon boolean ops: exact area identities + PIP membership checks."""

import numpy as np
import pytest

from lib_gdal_ray.geom import pip, wkb
from lib_gdal_ray.geom.boolean import (convex_difference, polygon_difference,
                                       polygon_symmetric_difference, polygon_union)
from lib_gdal_ray.geom.triangulate import polygon_intersection_area
from lib_gdal_ray.stages.geom_ops import wkb_centroid_area


def close(pts):
    return np.asarray(pts + [pts[0]], dtype=np.float64)


def area(buf):
    return 0.0 if buf is None else wkb_centroid_area(buf)[2]


def make_star(seed, k=8, scale=1.0, off=(0.0, 0.0)):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    r = rng.uniform(2, 6, k) * scale
    xs, ys = r * np.cos(ang) + off[0], r * np.sin(ang) + off[1]
    return np.stack([np.append(xs, xs[0]), np.append(ys, ys[0])], axis=1)


SQ_A = wkb.polygon_to_wkb([close([(0, 0), (4, 0), (4, 4), (0, 4)])])
SQ_B = wkb.polygon_to_wkb([close([(2, 2), (6, 2), (6, 6), (2, 6)])])


class TestConvexDifference:
    def test_square_minus_square(self):
        a = close([(0, 0), (4, 0), (4, 4), (0, 4)])
        b = close([(2, 2), (6, 2), (6, 6), (2, 6)])
        frags = convex_difference(a, b)
        total = sum(abs(np.cross(f[i + 1] - f[0], f[i + 2] - f[0]) / 2)
                    for f in frags for i in range(len(f) - 3))
        got = sum(area(wkb.polygon_to_wkb([f])) for f in frags)
        np.testing.assert_allclose(got, 12.0, rtol=1e-12)  # 16 - 4 overlap

    def test_disjoint_keeps_piece(self):
        a = close([(0, 0), (1, 0), (1, 1), (0, 1)])
        b = close([(5, 5), (6, 5), (6, 6), (5, 6)])
        frags = convex_difference(a, b)
        np.testing.assert_allclose(sum(area(wkb.polygon_to_wkb([f])) for f in frags),
                                   1.0, rtol=1e-12)

    def test_covered_empty(self):
        a = close([(1, 1), (2, 1), (2, 2), (1, 2)])
        b = close([(0, 0), (5, 0), (5, 5), (0, 5)])
        assert convex_difference(a, b) == []


class TestBooleanIdentities:
    @pytest.mark.parametrize("seed_a,seed_b,off", [
        (31, 41, (1.5, 0.5)), (32, 42, (3.0, -1.0)), (33, 43, (0.0, 0.0))])
    def test_area_identities(self, seed_a, seed_b, off):
        a = wkb.polygon_to_wkb([make_star(seed_a)])
        b = wkb.polygon_to_wkb([make_star(seed_b, off=off)])
        area_a = area(a)
        area_b = area(b)
        inter = polygon_intersection_area(a, b)
        diff = area(polygon_difference(a, b))
        un = area(polygon_union(a, b))
        sym = area(polygon_symmetric_difference(a, b))
        np.testing.assert_allclose(diff, area_a - inter, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(un, area_a + area_b - inter, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(sym, area_a + area_b - 2 * inter, rtol=1e-9, atol=1e-9)

    def test_membership_difference(self):
        out = polygon_difference(SQ_A, SQ_B)
        _k, polys = wkb.parse_wkb(out)
        rng = np.random.default_rng(9)
        px = rng.uniform(-1, 7, 5000)
        py = rng.uniform(-1, 7, 5000)
        in_frag = np.zeros(len(px), dtype=bool)
        for rings in polys:
            in_frag |= pip.points_in_polygon(px, py, rings)
        ka, ra = wkb.parse_wkb(SQ_A)
        kb, rb = wkb.parse_wkb(SQ_B)
        want = pip.points_in_polygon(px, py, ra) & ~pip.points_in_polygon(px, py, rb)
        # fragment edges may disagree pointwise exactly ON shared borders;
        # exclude points within 1e-9 of boundary lines x/y in {0,2,4,6}
        near = np.zeros(len(px), dtype=bool)
        for v in (0, 2, 4, 6):
            near |= (np.abs(px - v) < 1e-6) | (np.abs(py - v) < 1e-6)
        m = ~near
        np.testing.assert_array_equal(in_frag[m], want[m])

    def test_disjoint_union_total(self):
        a = wkb.polygon_to_wkb([close([(0, 0), (1, 0), (1, 1), (0, 1)])])
        b = wkb.polygon_to_wkb([close([(5, 5), (7, 5), (7, 7), (5, 7)])])
        np.testing.assert_allclose(area(polygon_union(a, b)), 5.0, rtol=1e-12)
        assert polygon_difference(a, b) is not None
        np.testing.assert_allclose(area(polygon_difference(a, b)), 1.0, rtol=1e-12)

    def test_self_difference_empty(self):
        assert polygon_difference(SQ_A, SQ_A) is None


class TestPolygonEraseJoin:
    def test_erase_vs_mc(self):
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.pipelines.spatial_join import broadcast_polygon_erase

        # input: one big star; method: two overlapping stars
        a_ring = make_star(51, scale=1.5)
        m1 = make_star(52, off=(2.0, 1.0))
        m2 = make_star(53, off=(-2.0, -1.0))
        subject = ray.data.from_arrow(pa.table({
            "gid": pa.array([0], type=pa.int64()),
            "geometry": pa.array([wkb.polygon_to_wkb([a_ring])], type=pa.binary())}))
        method = pa.table({"geometry": pa.array(
            [wkb.polygon_to_wkb([m1]), wkb.polygon_to_wkb([m2])], type=pa.binary())})
        out = broadcast_polygon_erase(subject, method, res=20.0).to_pandas()
        assert len(out) == 1
        got = out["remaining_area"].iloc[0]
        rng = np.random.default_rng(6)
        px = rng.uniform(-10, 10, 400000)
        py = rng.uniform(-10, 10, 400000)
        want_mask = (pip.points_in_ring(px, py, a_ring)
                     & ~pip.points_in_ring(px, py, m1)
                     & ~pip.points_in_ring(px, py, m2))
        mc = want_mask.mean() * 400.0
        np.testing.assert_allclose(got, mc, rtol=0.03)

    def test_fully_erased_dropped(self):
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.pipelines.spatial_join import broadcast_polygon_erase

        small = wkb.polygon_to_wkb([close([(1, 1), (2, 1), (2, 2), (1, 2)])])
        big = wkb.polygon_to_wkb([close([(0, 0), (5, 0), (5, 5), (0, 5)])])
        subject = ray.data.from_arrow(pa.table({
            "gid": pa.array([0], type=pa.int64()),
            "geometry": pa.array([small], type=pa.binary())}))
        method = pa.table({"geometry": pa.array([big], type=pa.binary())})
        out = broadcast_polygon_erase(subject, method, res=20.0).to_pandas()
        assert len(out) == 0


class TestHoles:
    def test_donut_difference_union(self):
        outer = close([(0, 0), (10, 0), (10, 10), (0, 10)])
        hole = close([(4, 4), (6, 4), (6, 6), (4, 6)])
        donut = wkb.polygon_to_wkb([outer, hole])
        np.testing.assert_allclose(area_of_frag := area(polygon_union(donut, donut)), 96.0, rtol=1e-9)
        sq = wkb.polygon_to_wkb([close([(3, 3), (7, 3), (7, 7), (3, 7)])])
        # donut ∖ square: 96 - (16 - 4) = 84
        np.testing.assert_allclose(area(polygon_difference(donut, sq)), 84.0, rtol=1e-9)
        # square ∖ donut = the hole part inside the square = 4
        np.testing.assert_allclose(area(polygon_difference(sq, donut)), 4.0, rtol=1e-9)
        # union = 96 + 16 - 12 = 100
        np.testing.assert_allclose(area(polygon_union(donut, sq)), 100.0, rtol=1e-9)


class TestLayerUpdate:
    def test_update_semantics(self):
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.pipelines.spatial_join import layer_update

        a1 = wkb.polygon_to_wkb([close([(0, 0), (4, 0), (4, 4), (0, 4)])])     # overlaps m
        a2 = wkb.polygon_to_wkb([close([(20, 20), (22, 20), (22, 22), (20, 22)])])  # disjoint
        a3 = wkb.polygon_to_wkb([close([(2.5, 2.5), (3, 2.5), (3, 3), (2.5, 3)])])  # covered
        m = wkb.polygon_to_wkb([close([(2, 2), (6, 2), (6, 6), (2, 6)])])
        subject = ray.data.from_arrow(pa.table({
            "gid": pa.array([1, 2, 3], type=pa.int64()),
            "geometry": pa.array([a1, a2, a3], type=pa.binary())}))
        method = pa.table({"geometry": pa.array([m], type=pa.binary())})
        out = layer_update(subject, method, res=20.0).to_pandas()
        srcs = out["src"].value_counts().to_dict()
        assert srcs == {"input": 2, "method": 1}   # a3 fully covered -> dropped
        total = sum(wkb_centroid_area(g)[2] for g in out["geometry"])
        # (16-4) + 4 + 16 = 28 ; covered a3 contributes 0
        np.testing.assert_allclose(total, 32.0, rtol=1e-9)
        assert out[out["src"] == "method"]["gid"].isna().all()


class TestLayerUnion:
    def _setup(self):
        import pyarrow as pa
        import ray.data

        a1 = wkb.polygon_to_wkb([close([(0, 0), (4, 0), (4, 4), (0, 4)])])
        m = wkb.polygon_to_wkb([close([(2, 2), (6, 2), (6, 6), (2, 6)])])
        subject = ray.data.from_arrow(pa.table({
            "gid": pa.array([1], type=pa.int64()),
            "geometry": pa.array([a1], type=pa.binary())}))
        method = pa.table({"zone": pa.array([9], type=pa.int64()),
                           "geometry": pa.array([m], type=pa.binary())})
        return subject, method

    def test_union_three_parts(self):
        from lib_gdal_ray.pipelines.spatial_join import layer_union

        subject, method = self._setup()
        out = layer_union(subject, method, res=20.0).to_pandas()
        areas = {r["src"]: wkb_centroid_area(r["geometry"])[2] for _, r in out.iterrows()}
        np.testing.assert_allclose(areas["input_only"], 12.0, rtol=1e-9)
        np.testing.assert_allclose(areas["intersection"], 4.0, rtol=1e-9)
        np.testing.assert_allclose(areas["method_only"], 12.0, rtol=1e-9)
        # field semantics: intersection carries both; *_only rows null the other side
        inter = out[out["src"] == "intersection"].iloc[0]
        assert inter["gid"] == 1 and inter["zone"] == 9
        assert np.isnan(out[out["src"] == "method_only"]["gid"].iloc[0])

    def test_symmetric_difference(self):
        from lib_gdal_ray.pipelines.spatial_join import layer_symmetric_difference

        subject, method = self._setup()
        out = layer_symmetric_difference(subject, method, res=20.0).to_pandas()
        assert set(out["src"]) == {"input_only", "method_only"}
        total = sum(wkb_centroid_area(g)[2] for g in out["geometry"])
        np.testing.assert_allclose(total, 24.0, rtol=1e-9)  # 16 + 16 - 2*4


class TestShuffleErase:
    def test_matches_broadcast_erase_areas(self):
        """Cell-partitioned big-big erase: per-feature remaining area
        equals the broadcast path (cells partition the plane, so
        per-cell differences sum exactly)."""
        import pyarrow as pa
        import ray.data

        from lib_gdal_ray.geom import wkb as wkb_mod
        from lib_gdal_ray.pipelines.spatial_join import (
            broadcast_polygon_erase, shuffle_polygon_erase)

        rng = np.random.default_rng(21)
        def rand_box(lo, hi):
            x0, y0 = rng.uniform(lo, hi - 8, 2)
            w, h = rng.uniform(2, 8, 2)
            return wkb_mod.box_to_wkb(x0, y0, x0 + w, y0 + h)

        a_bufs = [rand_box(-20, 20) for _ in range(12)]
        b_bufs = [rand_box(-20, 20) for _ in range(10)]
        a_ds = ray.data.from_arrow(pa.table({
            "pid": pa.array(np.arange(12, dtype=np.int64)),
            "geometry": pa.array(a_bufs, type=pa.binary())}))
        b_ds = ray.data.from_arrow(pa.table({
            "geometry": pa.array(b_bufs, type=pa.binary())}))
        b_tbl = pa.table({"geometry": pa.array(b_bufs, type=pa.binary())})

        bc = broadcast_polygon_erase(a_ds, b_tbl, res=5.0).to_pandas()
        want = dict(zip(bc["pid"], bc["remaining_area"]))

        sh = shuffle_polygon_erase(a_ds, b_ds, ["pid"], res=5.0).to_pandas()
        got = sh.groupby("pid")["fragment_area"].sum().to_dict()
        assert set(got) == set(want)
        for pid, area in want.items():
            np.testing.assert_allclose(got[pid], area, rtol=1e-9,
                                       err_msg=f"pid {pid}")
