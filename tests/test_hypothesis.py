"""Property-based tests (hypothesis) for the core kernels."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lib_gdal_ray.functions.swq import compile_filter
from lib_gdal_ray.geom import cells, pip, proj, wkb

coords = st.floats(min_value=-179.999, max_value=179.999,
                   allow_nan=False, allow_infinity=False)
lats = st.floats(min_value=-84.999, max_value=84.999,
                 allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(coords, lats), min_size=1, max_size=50))
def test_wkb_point_roundtrip(pts):
    x = np.asarray([p[0] for p in pts])
    y = np.asarray([p[1] for p in pts])
    enc = wkb.points_to_wkb(x, y)
    x2, y2 = wkb.wkb_to_points(enc)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)


@settings(max_examples=200, deadline=None)
@given(coords, lats, st.integers(min_value=0, max_value=18))
def test_tile_roundtrip_contains_point(lon, lat, z):
    tx, ty = cells.lonlat_to_tile(np.asarray([lon]), np.asarray([lat]), z)
    n = 1 << z
    assert 0 <= tx[0] < n and 0 <= ty[0] < n
    c = cells.pack_tile(np.asarray([z]), tx, ty)
    z2, tx2, ty2 = cells.unpack_tile(c)
    assert (z2[0], tx2[0], ty2[0]) == (z, tx[0], ty[0])
    # parent tile contains the same point at z-1
    if z > 0:
        ptx, pty = cells.lonlat_to_tile(np.asarray([lon]), np.asarray([lat]), z - 1)
        pz, px, py = cells.unpack_tile(cells.parent_tile(c))
        assert (px[0], py[0]) == (ptx[0], pty[0])


@settings(max_examples=100, deadline=None)
@given(coords, lats)
def test_mercator_roundtrip(lon, lat):
    x, y = proj.lonlat_to_mercator(np.asarray([lon]), np.asarray([lat]))
    lon2, lat2 = proj.mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon, lon2[0], atol=1e-8)
    np.testing.assert_allclose(lat, lat2[0], atol=1e-8)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(-10, 10, allow_nan=False),
                          st.floats(-10, 10, allow_nan=False)),
                min_size=3, max_size=12),
       st.floats(-12, 12, allow_nan=False), st.floats(-12, 12, allow_nan=False))
def test_pip_matches_crossing_oracle(ring_pts, px, py):
    from hypothesis import assume

    ring = np.asarray(ring_pts + [ring_pts[0]], dtype=np.float64)
    # boundary-degenerate points are defined by a separate predicate in
    # GDAL (isPointOnRingBoundary) — exclude near-edge points
    for i in range(len(ring) - 1):
        ax, ay = ring[i]
        bx, by = ring[i + 1]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        t = 0.0 if L2 == 0 else np.clip(((px - ax) * dx + (py - ay) * dy) / L2, 0, 1)
        d2 = (ax + t * dx - px) ** 2 + (ay + t * dy - py) ** 2
        assume(d2 > 1e-12)
    got = pip.points_in_ring(np.asarray([px]), np.asarray([py]), ring)[0]
    # textbook crossing-number oracle
    inside = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > py) != (y2 > py):
            xi = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
            if px < xi:
                inside = not inside
    assert got == inside


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-1000, max_value=1000),
       st.integers(min_value=-1000, max_value=1000))
def test_swq_arith_consistency(a, b):
    import pyarrow as pa

    t = pa.table({"a": pa.array([a], type=pa.int64()),
                  "b": pa.array([b], type=pa.int64())})
    expr = "a + b >= a * 1 + b * 1"
    assert compile_filter(expr)(t).to_pylist() == [True]
    expr2 = f"a > {b}"
    assert compile_filter(expr2)(t).to_pylist() == [a > b]


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000), st.integers(5, 60), st.integers(1, 5),
       st.sampled_from([2.0, 5.0, 10.0, 20.0]))
def test_knn_cell_ring_expansion_exact(seed, n_sites, k, res):
    """The cell-ring expansion bound must reproduce brute-force kNN for
    any site layout, k, and grid resolution."""
    import pyarrow as pa

    from lib_gdal_ray.geom import cells as cellsm
    from lib_gdal_ray.pipelines.knn import SiteIndex

    rng = np.random.default_rng(seed)
    sx = rng.uniform(-170, 170, n_sites)
    sy = rng.uniform(-80, 80, n_sites)
    sid = np.arange(n_sites, dtype=np.int64)
    idx = SiteIndex(pa.table({"id": pa.array(sid), "x": pa.array(sx),
                              "y": pa.array(sy)}), "id", "x", "y", res)
    px = rng.uniform(-170, 170, 5)
    py = rng.uniform(-80, 80, 5)
    cell = cellsm.grid_cell(px, py, res)
    for u in np.unique(cell):
        rows = np.flatnonzero(cell == u)
        got_i, got_d = idx.knn_cell(px[rows], py[rows], int(u), k)
        for r, row in enumerate(rows):
            d2 = (idx.x - px[row]) ** 2 + (idx.y - py[row]) ** 2
            want = np.lexsort((idx.ids, d2))[:min(k, n_sites)]
            assert list(got_i[r]) == list(want), (seed, row)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coords, lats), min_size=3, max_size=12),
       st.sampled_from(["polygon", "linestring", "multipoint"]))
def test_transform_wkb_identity_and_shape(pts, kind):
    """transform_wkb with the identity fn reproduces every vertex and
    the geometry type for all core SFA kinds."""
    c = np.asarray(pts, dtype=np.float64)
    if kind == "polygon":
        ring = np.vstack([c, c[:1]])
        buf = wkb.polygon_to_wkb([ring])
    elif kind == "linestring":
        buf = wkb.linestring_to_wkb(c)
    else:
        buf = wkb.multipoint_to_wkb(c)
    out = wkb.transform_wkb(buf, lambda x, y: (x, y))
    k1, p1 = wkb.parse_wkb(buf)
    k2, p2 = wkb.parse_wkb(out)
    assert k1 == k2
    a1 = wkb._all_coords(k1, p1)
    a2 = wkb._all_coords(k2, p2)
    np.testing.assert_allclose(a1, a2, rtol=0, atol=0)


@pytest.mark.parametrize("seed,n_nodes,n_edges",
                         [(1, 8, 6), (7, 25, 40), (42, 30, 12)])
def test_near_dup_clusters_matches_union_find(seed, n_nodes, n_edges):
    """Distributed CC == single-process union-find on random graphs
    (seeded cases, not hypothesis — each case runs a full multi-round
    distributed pipeline)."""
    import pyarrow as pa
    import ray.data

    from lib_gdal_ray.pipelines import dedup as dd

    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    if len(a) == 0:
        return
    pairs = ray.data.from_arrow(pa.table({"id_a": pa.array(a),
                                          "id_b": pa.array(b)}))
    got = dict(zip(*[dd.near_dup_clusters(pairs).to_pandas()[c]
                     for c in ("doc_id", "cluster_id")]))
    # reference union-find
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    nodes = set(a.tolist()) | set(b.tolist())
    want = {n: find(n) for n in nodes}
    assert got == want
