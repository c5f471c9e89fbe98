"""Binary spatial predicate tests (DE-9IM-style truth table cases)."""

import numpy as np

from lib_gdal_ray.geom import predicates as P
from lib_gdal_ray.geom import wkb as wkb_mod


def box(x0, y0, x1, y1):
    return wkb_mod.box_to_wkb(float(x0), float(y0), float(x1), float(y1))


def test_overlapping_boxes():
    a, b = box(0, 0, 4, 4), box(2, 2, 6, 6)
    assert P.intersects(a, b)
    assert P.overlaps(a, b)
    assert not P.contains(a, b)
    assert not P.touches(a, b)
    assert not P.disjoint(a, b)


def test_containment():
    outer, inner = box(0, 0, 10, 10), box(2, 2, 4, 4)
    assert P.contains(outer, inner)
    assert P.within(inner, outer)
    assert not P.contains(inner, outer)
    assert P.intersects(outer, inner)
    assert not P.overlaps(outer, inner)  # containment is not overlap


def test_edge_touching_boxes():
    a, b = box(0, 0, 4, 4), box(4, 0, 8, 4)
    assert P.touches(a, b)
    assert P.intersects(a, b)
    assert not P.overlaps(a, b)
    assert not P.disjoint(a, b)


def test_corner_touching_boxes():
    a, b = box(0, 0, 4, 4), box(4, 4, 8, 8)
    assert P.touches(a, b)
    assert P.intersects(a, b)


def test_disjoint_boxes():
    a, b = box(0, 0, 2, 2), box(10, 10, 12, 12)
    assert P.disjoint(a, b)
    assert not P.intersects(a, b)
    assert not P.touches(a, b)


def test_multipolygon_contains():
    mp = wkb_mod.multipolygon_to_wkb([
        [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64)],
        [np.array([[10, 10], [14, 10], [14, 14], [10, 14], [10, 10]],
                  dtype=np.float64)],
    ])
    assert P.contains(mp, box(1, 1, 2, 2))
    assert P.contains(mp, box(11, 11, 13, 13))
    assert not P.contains(mp, box(5, 5, 6, 6))


def test_hole_excludes_containment():
    donut = wkb_mod.polygon_to_wkb([
        np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64),
        np.array([[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], dtype=np.float64),
    ])
    assert not P.contains(donut, box(4, 4, 6, 6))  # inside the hole
    assert P.contains(donut, box(1, 1, 2, 2))      # in the ring
    assert P.point_within(1.5, 1.5, donut)
    assert not P.point_within(5.0, 5.0, donut)
