"""Coverage operators (check / clean / simplify) — semantics per
`apps/gdalalg_vector_{check,clean,simplify}_coverage.cpp`."""

import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.geom import wkb as wkb_mod
from lib_gdal_ray.geom.triangulate import _signed_area
from lib_gdal_ray.pipelines.coverage import (
    check_coverage,
    clean_coverage,
    simplify_coverage,
    snap_round_geometry,
)


def box_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)
    return wkb_mod.polygon_to_wkb([ring])


def make_ds(ids, geoms, nparts=4):
    return ray.data.from_arrow(pa.table({
        "id": pa.array(np.asarray(ids, np.int64)),
        "geometry": pa.array(geoms, type=pa.binary()),
    })).repartition(nparts)


# ---------------------------------------------------------------------------
# check-coverage
# ---------------------------------------------------------------------------

def test_check_coverage_valid_layer_is_empty():
    # 4 disjoint abutting boxes: a valid coverage -> no overlap pairs
    geoms = [box_wkb(i * 10.0, 0.0, i * 10.0 + 10.0, 5.0) for i in range(4)]
    out = check_coverage(make_ds([1, 2, 3, 4], geoms), res=50.0).to_pandas()
    assert len(out) == 0


def test_check_coverage_reports_each_overlap_once():
    # box 1 overlaps box 2 by a 2x5 strip; 3 is disjoint
    geoms = [box_wkb(0, 0, 12, 5), box_wkb(10, 0, 20, 5),
             box_wkb(40, 0, 50, 5)]
    out = check_coverage(make_ds([1, 2, 3], geoms), res=50.0).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert abs(row.overlap_area - 10.0) < 1e-9


def test_check_coverage_cross_cell_pair_unique():
    # an overlap straddling a cell boundary (res=10 -> boundary at x=0
    # in grid space) must still be reported exactly once
    geoms = [box_wkb(-4, -4, 6, 6), box_wkb(2, -4, 14, 6)]
    out = check_coverage(make_ds([7, 9], geoms, nparts=2),
                         res=10.0).to_pandas()
    assert len(out) == 1
    assert abs(out.iloc[0].overlap_area - 4.0 * 10.0) < 1e-9


# ---------------------------------------------------------------------------
# clean-coverage
# ---------------------------------------------------------------------------

def test_clean_coverage_min_index_resolves_overlap():
    # 12-wide box 1 overlaps 10-wide box 2 on [10,12]; min-index gives
    # the strip to id 1: areas 60 and 40
    geoms = [box_wkb(0, 0, 12, 5), box_wkb(10, 0, 20, 5)]
    frags = clean_coverage(make_ds([1, 2], geoms), res=50.0).to_pandas()
    areas = frags.groupby("id")["fragment_area"].sum()
    assert abs(areas[1] - 60.0) < 1e-9
    assert abs(areas[2] - 40.0) < 1e-9


def test_clean_coverage_fragments_partition_across_cells():
    # one box straddling 4 cells at res=10: fragment areas sum to the
    # full area and every fragment has the same id
    geoms = [box_wkb(-5, -5, 5, 5)]
    frags = clean_coverage(make_ds([3], geoms, nparts=1),
                           res=10.0).to_pandas()
    assert (frags["id"] == 3).all()
    assert len(frags) == 4
    assert abs(frags["fragment_area"].sum() - 100.0) < 1e-9


def test_snap_round_collapses_and_drops():
    # vertices within snap/2 of grid collapse; a sliver thinner than the
    # grid degenerates away entirely
    ring = np.array([[0.1, 0.0], [9.9, 0.1], [10.1, 5.0], [0.0, 4.9],
                     [0.1, 0.0]])
    sliver = np.array([[0.0, 0.0], [10.0, 0.1], [0.0, 0.2], [0.0, 0.0]])
    ds = make_ds([1, 2], [wkb_mod.polygon_to_wkb([ring]),
                          wkb_mod.polygon_to_wkb([sliver])], nparts=1)
    out = snap_round_geometry(ds, snap=1.0).to_pandas()
    assert list(out["id"]) == [1]
    _k, rings = wkb_mod.parse_wkb(out["geometry"].iloc[0])
    r = np.asarray(rings[0])
    assert np.allclose(r, np.round(r))
    assert abs(abs(_signed_area(r)) - 50.0) < 1e-9


# ---------------------------------------------------------------------------
# simplify-coverage
# ---------------------------------------------------------------------------

def zig_box(x0, y0, x1, y1, left_mid=False, right_mid=False, amp=0.3):
    midy = (y0 + y1) / 2.0
    ring = [[x0, y0], [x1, y0]]
    if right_mid:
        ring.append([x1 + amp, midy])
    ring += [[x1, y1], [x0, y1]]
    if left_mid:
        ring.append([x0 + amp, midy])
    ring.append([x0, y0])
    return wkb_mod.polygon_to_wkb([np.asarray(ring, dtype=np.float64)])


def test_simplify_coverage_shared_edge_identical_both_sides():
    # two boxes share a zigzag edge at x=10; tol=1 removes the midpoint
    # identically on both owners -> exact rectangles, no gap/overlap
    geoms = [zig_box(0, 0, 10, 8, right_mid=True),
             zig_box(10, 0, 20, 8, left_mid=True)]
    out = simplify_coverage(make_ds([1, 2], geoms, nparts=2),
                            tol=1.0).to_pandas()
    assert len(out) == 2
    for _, row in out.iterrows():
        _k, rings = wkb_mod.parse_wkb(row["geometry"])
        r = np.asarray(rings[0])
        assert len(r) == 5  # closed rectangle
        assert abs(abs(_signed_area(r)) - 80.0) < 1e-9


def test_simplify_coverage_outer_edges_simplified_too():
    # a lone polygon (uniform signature ring) still simplifies, with the
    # canonical lexicographic start making the result deterministic
    ring = np.array([[0, 0], [5, 0.2], [10, 0], [10, 8], [5, 8.2],
                     [0, 8], [0, 0]], dtype=np.float64)
    ds = make_ds([1], [wkb_mod.polygon_to_wkb([ring])], nparts=1)
    out = simplify_coverage(ds, tol=1.0).to_pandas()
    _k, rings = wkb_mod.parse_wkb(out["geometry"].iloc[0])
    r = np.asarray(rings[0])
    assert len(r) == 5
    assert abs(abs(_signed_area(r)) - 80.0) < 1e-9


def test_simplify_coverage_below_tol_keeps_vertices():
    # tol smaller than the zigzag amplitude keeps the midpoints
    geoms = [zig_box(0, 0, 10, 8, right_mid=True),
             zig_box(10, 0, 20, 8, left_mid=True)]
    out = simplify_coverage(make_ds([1, 2], geoms, nparts=2),
                            tol=0.01).to_pandas()
    for _, row in out.iterrows():
        _k, rings = wkb_mod.parse_wkb(row["geometry"])
        assert len(np.asarray(rings[0])) == 6  # midpoint retained
