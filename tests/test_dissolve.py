"""Dissolve (fragment-merge) + hole-aware boolean identity tests."""

import numpy as np

from lib_gdal_ray.geom import dissolve, triangulate, wkb as wkb_mod
from lib_gdal_ray.geom.triangulate import _signed_area
from lib_gdal_ray.stages.geom_ops import wkb_centroid_area


def box_ring(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)


def donut(x0, y0, x1, y1, hx0, hy0, hx1, hy1):
    return wkb_mod.polygon_to_wkb([box_ring(x0, y0, x1, y1),
                                   box_ring(hx0, hy0, hx1, hy1)])


def poly_area(polys):
    a = 0.0
    for rings in polys:
        a += abs(_signed_area(rings[0]))
        for h in rings[1:]:
            a -= abs(_signed_area(h))
    return a


def test_two_triangles_merge_to_square():
    t1 = np.array([[0, 0], [4, 0], [4, 4], [0, 0]], dtype=np.float64)
    t2 = np.array([[0, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64)
    polys = dissolve.dissolve_fragments([t1, t2])
    assert len(polys) == 1
    assert len(polys[0]) == 1  # no holes
    assert abs(_signed_area(polys[0][0])) == 4 * 4
    # exactly the 4 square corners
    corners = {tuple(p) for p in polys[0][0][:-1]}
    assert corners == {(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)}


def test_grid_of_boxes_merges():
    frags = [box_ring(i, j, i + 1, j + 1)
             for i in range(3) for j in range(2)]
    polys = dissolve.dissolve_fragments(frags)
    assert len(polys) == 1 and len(polys[0]) == 1
    assert abs(_signed_area(polys[0][0])) == 6.0


def test_disjoint_fragments_stay_separate():
    frags = [box_ring(0, 0, 1, 1), box_ring(5, 5, 6, 6)]
    polys = dissolve.dissolve_fragments(frags)
    assert len(polys) == 2
    assert poly_area(polys) == 2.0


def test_frame_fragments_reconstruct_hole():
    # four fragments forming a picture frame (outer 6x6, hole 2x2)
    frags = [
        box_ring(0, 0, 6, 2),   # bottom
        box_ring(0, 4, 6, 6),   # top
        box_ring(0, 2, 2, 4),   # left
        box_ring(4, 2, 6, 4),   # right
    ]
    polys = dissolve.dissolve_fragments(frags)
    assert len(polys) == 1
    assert len(polys[0]) == 2  # shell + hole
    assert abs(_signed_area(polys[0][0])) == 36.0
    assert abs(_signed_area(polys[0][1])) == 4.0
    assert poly_area(polys) == 32.0


def test_donut_x_donut_intersection_identity():
    """Hole-aware intersection + dissolve: two offset donuts. Checks
    exact area identity and that the dissolved output is clean."""
    a = donut(0, 0, 10, 10, 3, 3, 7, 7)
    b = donut(5, 5, 15, 15, 8, 8, 12, 12)
    out = triangulate.intersect_simple_polygons(a, b)
    assert out is not None
    # analytic: A∩B region = [5,10]x[5,10] minus (A hole ∩ box: [5,7]x[5,7])
    # minus (B hole ∩ box: [8,10]x[8,10])
    want = 25.0 - 4.0 - 4.0
    _cx, _cy, area = wkb_centroid_area(out)
    np.testing.assert_allclose(area, want, rtol=1e-9)
    dout = dissolve.dissolve_wkb(out)
    _k, polys = wkb_mod.parse_wkb(dout)
    np.testing.assert_allclose(poly_area(polys), want, rtol=1e-9)
    # dissolved output has far fewer rings than raw fragments
    _k2, raw = wkb_mod.parse_wkb(out)
    assert sum(len(r) for r in polys) < len(raw)


def test_donut_difference_dissolved():
    from lib_gdal_ray.geom.boolean import polygon_difference

    a = wkb_mod.polygon_to_wkb([box_ring(0, 0, 10, 10)])
    b = wkb_mod.polygon_to_wkb([box_ring(3, 3, 7, 7)])
    out = polygon_difference(a, b)
    dout = dissolve.dissolve_wkb(out)
    _k, polys = wkb_mod.parse_wkb(dout)
    np.testing.assert_allclose(poly_area(polys), 100.0 - 16.0, rtol=1e-9)
    # the dissolved difference is one shell with one hole
    assert len(polys) == 1
    assert len(polys[0]) == 2


def test_dissolve_preserves_area_random_overlay():
    rng = np.random.default_rng(11)
    for _ in range(5):
        ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
        r = rng.uniform(2, 8, 7)
        ring = np.stack([10 + r * np.cos(ang), 10 + r * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        buf = wkb_mod.polygon_to_wkb([ring])
        box = wkb_mod.polygon_to_wkb([box_ring(6, 6, 14, 14)])
        out = triangulate.intersect_simple_polygons(buf, box)
        if out is None:
            continue
        _cx, _cy, area = wkb_centroid_area(out)
        dout = dissolve.dissolve_wkb(out)
        _k, polys = wkb_mod.parse_wkb(dout)
        np.testing.assert_allclose(poly_area(polys), area, rtol=1e-6)
